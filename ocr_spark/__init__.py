"""ocr_spark — a brand-new PySpark-native document-extraction analytics engine.

Re-expresses the data-processing semantics of stjiris/OCR (reference at
/root/reference, studied read-only) as an idiomatic Spark DataFrame pipeline:

* one row = one document: ``documents(doc_id string, spans array<struct<
  kind string, text string, media_ref string, offset int>>)``
* per-document kernels (classification, reading order, dehyphenation,
  assembly, word index) run as vectorized Arrow kernels (``mapInArrow``) or
  Catalyst higher-order array functions — never per-row Python
* the only cross-document shuffles are the corpus-level aggregations, which
  are salted two-stage aggs

See SURVEY.md for the operator inventory and the reference citations.
"""

__version__ = "0.1.0"

from ocr_spark.session import get_spark  # noqa: F401
