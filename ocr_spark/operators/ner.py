"""S10 NER sink analog — the reference POSTs each document's text to an
external anonymizer service and stores the returned entity list as
``_entities.json`` (server/src/utils/file.py:57-73).  An external HTTP
dependency has no analytics semantics to rebuild, so the engine ships
the artifact-PRODUCING half behind the same seam: a deterministic
pattern-NER over the extracted text emitting the per-document typed
entity table the JSON artifact serializes.  A real deployment swaps
``ENTITY_PATTERNS`` for a model/service call behind the same
``(doc_id, text) → (doc_id, etype, entity, cnt)`` signature — exactly
the multimodal codec-seam discipline.

Patterns live in the Java↔RE2-agreeing subset (functions/pii.py rules —
character classes, counted repetition, ASCII ``\\b``; no lookaround),
so the whole extractor has an exact DuckDB twin.  PER is the classic
capitalized-run heuristic — deliberately cheap, deterministic, and
honest about being a heuristic.

One scan: a map literal of per-type match arrays exploded twice, then
one (doc_id, etype, entity) aggregation — map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.pii import EMAIL_RE, IPV4_RE, LONGNUM_RE

DATE_RE = r"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b"
PER_RE = r"\b[A-Z][a-z]+( [A-Z][a-z]+)+\b"

ENTITY_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", EMAIL_RE),
    ("IP", IPV4_RE),
    ("NUM", LONGNUM_RE),
    ("DATE", DATE_RE),
    ("PER", PER_RE),
)


def ner_entities(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, etype, entity, cnt): every typed match
    with its occurrence count — the relational form of the reference's
    ``_entities.json``."""
    entries: list = []
    for etype, pat in ENTITY_PATTERNS:
        # F.lit patterns sidestep SQL-literal backslash mangling (\b, \.)
        entries += [
            F.lit(etype),
            F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)),
        ]
    return (
        docs.select(
            "doc_id",
            F.explode(F.create_map(*entries)).alias("etype", "_matches"),
        )
        .select("doc_id", "etype", F.explode("_matches").alias("entity"))
        .groupBy("doc_id", "etype", "entity")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
