"""The reference's complete "download my results" journey as ONE
composed operator: page IR → every export format → METS manifest with
real checksums → one deterministic ZIP bundle per document.

This is the user flow the reference serves across half a dozen
endpoints (/get_txt /get_hocr /get_alto /get_pdf(+_indexed) /get_mets
/export_zip — server/app.py:440-520, export.py:987-998), composed from
the engine's writers:

  txt     — word texts in reading order + the E1 page delimiter
  hOCR    — sources/exporters.hocr_pages          (E4b)
  ALTO    — sources/exporters.alto_pages          (E4)
  PDF     — sources/pdf.pdf_documents             (E3)
  METS    — sources/exporters.mets_documents      (E5), whose file
            entries carry the REAL md5 + size of each sibling artifact
            in the same bundle (the reference's checksum semantics)
  bundle  — sources/exporters.zip_bundles         (E6), deterministic

Per-page artifacts build narrowly; one doc_id aggregation makes the
PDF, one makes the METS (slim fragments), one ships the bundle — the
binary payloads ride the doc_id shuffle once, in the bundling stage
only.  The whole chain is gated end-to-end in tests/test_export_all.py:
every artifact is re-parsed out of the unzipped bundle (hOCR → IR
equality, ALTO → word equality, PDF offset/text validation, METS md5
verification against the actual entry bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.sources.exporters import (
    alto_pages,
    hocr_pages,
    mets_documents,
    zip_bundles,
)
from ocr_spark.sources.pdf import pdf_documents

#: fixed manifest timestamp — bundles are content-addressed, not
#: wall-clock-stamped (the determinism contract of zip_bundles).
CREATION = "2026-01-01 00:00:00"

_ARTIFACTS = (
    # (name in bundle, grp tag, mimetype)
    ("_export/_txt.txt", "TXT", "text/plain"),
    ("_export/_hocr.hocr", "HOCR", "text/xml"),
    ("_export/_alto.xml", "ALTO2", "text/xml"),
    ("_export/_pdf.pdf", "PDF", "application/pdf"),
)


def document_bundle(page_ir: DataFrame) -> DataFrame:
    """page IR (doc_id, page_no, paragraphs) → ``doc_id, n_entries,
    n_bytes, zip`` — one complete result bundle per document."""
    txt = page_ir.select(
        "doc_id",
        "page_no",
        F.expr(
            "concat(array_join(transform(flatten(flatten(paragraphs)), "
            "w -> w.text), ' '), '\\n\\n')"
        ).alias("payload"),
    ).groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("page_no", "payload"))),
                lambda p: p["payload"],
            ),
            "",
        ).alias("payload")
    )
    hocr = (
        hocr_pages(page_ir)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("page_no", "hocr_xml"))
                    ),
                    lambda p: p["hocr_xml"],
                ),
                "",
            ).alias("payload")
        )
    )
    alto = (
        alto_pages(page_ir)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("page_no", "alto_xml"))
                    ),
                    lambda p: p["alto_xml"],
                ),
                "",
            ).alias("payload")
        )
    )
    pdf = pdf_documents(page_ir).select(
        "doc_id", F.col("pdf").alias("payload")
    )

    named = None
    for df, (name, _grp, _mime) in zip((txt, hocr, alto, pdf), _ARTIFACTS):
        part = df.select(
            "doc_id",
            F.lit(name).alias("entry_name"),
            F.col("payload").cast("binary").alias("payload"),
        )
        named = part if named is None else named.unionByName(part)

    # METS entries carry each sibling artifact's real md5 + byte size
    grp_map = {name: (grp, mime) for name, grp, mime in _ARTIFACTS}
    manifest = named.select(
        "doc_id",
        F.lit(CREATION).cast("timestamp").alias("creation"),
        F.element_at(
            F.create_map(
                *[
                    c
                    for name, (grp, _m) in grp_map.items()
                    for c in (F.lit(name), F.lit(grp))
                ]
            ),
            F.col("entry_name"),
        ).alias("grp"),
        F.lit(1).alias("seq"),
        F.col("entry_name").alias("href"),
        F.octet_length("payload").cast("bigint").alias("size"),
        F.md5("payload").alias("md5"),
        F.element_at(
            F.create_map(
                *[
                    c
                    for name, (_g, mime) in grp_map.items()
                    for c in (F.lit(name), F.lit(mime))
                ]
            ),
            F.col("entry_name"),
        ).alias("mimetype"),
    )
    mets = mets_documents(manifest).select(
        "doc_id",
        F.lit("_mets.xml").alias("entry_name"),
        F.col("mets_xml").cast("binary").alias("payload"),
    )
    return zip_bundles(named.unionByName(mets))
