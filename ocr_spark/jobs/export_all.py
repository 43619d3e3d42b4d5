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


#: format → bundle entry name (the reference's ``_export/_{ext}.{ext}``
#: layout, export.py:92-116)
FORMAT_ENTRY = {
    "txt": "_export/_txt.txt",
    "hocr": "_export/_hocr.hocr",
    "alto": "_export/_alto.xml",
    "pdf": "_export/_pdf.pdf",
}


def adopt_artifacts(
    adopted: DataFrame, output_types: list[str]
) -> DataFrame:
    """E7 — the reference's ``export_from_existing``
    (server/src/utils/export.py:79-126) as a relational operator:
    externally-produced result artifacts are REGISTERED rather than
    regenerated.

    Input rows carry ``doc_id``, ``content binary`` and either a
    ``format`` column (the dict form — extension keys to bytes) or a
    ``filename`` column (the list form — extension split off the name,
    ``os.path.splitext(...).strip('.')``, export.py:110-112).  Exactly
    like the reference, entries whose extension is not in
    ``output_types`` are IGNORED (case-sensitive, as
    ``ext in output_types`` is).  Duplicate (doc, format) rows collapse
    bytewise-max — the table rebuild of filesystem last-write-wins, the
    sources/upload.py discipline.

    Output: one registry row per adopted (doc_id, format) —
    ``entry_name`` (the ``_export/_{ext}.{ext}`` path), ``payload``,
    ``n_bytes``, ``md5``, ``size_h`` (the reference's humanized
    ``_data.json`` size string, functions/units.size_human),
    ``creation`` (the fixed bundle timestamp — content-addressed, not
    wall-clock), ``complete`` = true, ``origin`` = 'adopted'
    (export.py:99-105's data_update entry).  The reference additionally
    introspects PDF page counts (``get_page_count``); callers holding
    that metadata pass it alongside — registry semantics don't depend
    on it.

    Scale shape: one shuffle on (doc_id, format) for the overwrite
    dedup; the payload rides it once (the sink's job, as in
    chunk_assembly)."""
    from ocr_spark.functions.units import size_human

    cols = set(adopted.columns)
    if "format" not in cols:
        src = adopted.withColumn(
            "format",
            F.regexp_extract(F.col("filename"), r"\.([^./\\]+)$", 1),
        )
    else:
        src = adopted
    src = src.where(
        F.col("format").isin(list(output_types))
    )
    dedup = src.groupBy("doc_id", "format").agg(
        F.max("content").alias("payload")
    )
    entry = F.element_at(
        F.create_map(
            *[
                c
                for fmt, name in FORMAT_ENTRY.items()
                for c in (F.lit(fmt), F.lit(name))
            ]
        ),
        F.col("format"),
    )
    return dedup.select(
        "doc_id",
        "format",
        F.coalesce(
            entry, F.concat(F.lit("_export/_"), "format", F.lit("."), "format")
        ).alias("entry_name"),
        "payload",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("md5"),
        size_human("octet_length(payload)").alias("size_h"),
        F.lit(CREATION).cast("timestamp").alias("creation"),
        F.lit(True).alias("complete"),
        F.lit("adopted").alias("origin"),
    )


def merge_registry(existing: DataFrame, adopted: DataFrame) -> DataFrame:
    """The reference's ``update_json_file(data_file, data_update)``
    overwrite (export.py:126): an adopted entry REPLACES any existing
    registry row for the same (doc_id, format); untouched formats
    survive.  Pure anti-join + union — no payload comparison, exactly
    the JSON-key overwrite."""
    keep = existing.join(
        adopted.select("doc_id", "format"), ["doc_id", "format"],
        "left_anti",
    )
    return keep.unionByName(adopted.select(*existing.columns))


def pending_exports(
    docs: DataFrame,
    formats: list[str],
    registry: DataFrame,
    force_recreate: bool = False,
) -> DataFrame:
    """The skip-if-exists gate every reference exporter opens with
    (``os.path.exists(filename) and not force_recreate`` →  return the
    existing file, export.py:142-143): which (doc_id, format) pairs
    still need GENERATION.  ``force_recreate`` regenerates everything,
    reference flag-for-flag.  The (doc × format) domain is an explode of
    a literal array — a narrow projection, no join — and the gate itself
    is an anti-join on the slim key columns only; the registry's
    payloads never move."""
    want = (
        docs.select("doc_id")
        .distinct()
        .withColumn(
            "format",
            F.explode(F.array(*[F.lit(f) for f in formats])),
        )
    )
    if force_recreate:
        return want
    return want.join(
        registry.where(F.col("complete")).select("doc_id", "format"),
        ["doc_id", "format"],
        "left_anti",
    )


def document_bundle(
    page_ir: DataFrame, adopted: DataFrame | None = None
) -> DataFrame:
    """page IR (doc_id, page_no, paragraphs) → ``doc_id, n_entries,
    n_bytes, zip`` — one complete result bundle per document.

    With ``adopted`` (an ``adopt_artifacts`` registry), E7 semantics
    apply: for each (doc_id, format) present there the bundle ships the
    adopted payload VERBATIM and the generation pipeline for that
    format never runs over that document (the anti-join lands before
    the per-format aggregation, so the skip is real work saved, not a
    post-hoc overwrite).  METS checksums cover adopted entries too —
    they hash the actual sibling bytes, whatever their origin."""
    def _src(fmt: str) -> DataFrame:
        """Page IR minus the docs whose ``fmt`` artifact was adopted —
        the skip gate applied BEFORE the format's aggregation."""
        if adopted is None:
            return page_ir
        ids = adopted.where(F.col("format") == fmt).select("doc_id")
        return page_ir.join(ids, "doc_id", "left_anti")

    txt = _src("txt").select(
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
        hocr_pages(_src("hocr"))
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
        alto_pages(_src("alto"))
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
    pdf = pdf_documents(_src("pdf")).select(
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
    if adopted is not None:
        # adopted payloads ship verbatim under their entry names; only
        # formats the bundle lays out participate (reference bundles the
        # known artifact set, export.py:987-998)
        named = named.unionByName(
            adopted.where(
                F.col("format").isin(list(FORMAT_ENTRY))
            ).select("doc_id", "entry_name", "payload")
        )

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
