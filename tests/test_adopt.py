"""E7 adopt analog (jobs/export_all.py adopt_artifacts /
merge_registry / pending_exports / document_bundle(adopted=...)):
the reference's export_from_existing (server/src/utils/export.py:79-126)
and the skip-if-exists gate (export.py:142-143) as relational ops —
externally-produced artifacts register, survive re-derivation verbatim,
and suppress regeneration unless force_recreate."""

from __future__ import annotations

import hashlib
import io
import zipfile

from pyspark.sql import functions as F

from ocr_spark.jobs.export_all import (
    adopt_artifacts,
    document_bundle,
    merge_registry,
    pending_exports,
)

ADOPT_SCHEMA = "doc_id string, filename string, content binary"


def test_adopt_filters_extensions_and_dedups(spark):
    rows = [
        ("d1", "/incoming/d1-result.txt", b"adopted text one"),
        ("d1", "/incoming/d1-second.txt", b"zz later wins"),   # dup (d1, txt)
        ("d1", "/incoming/d1.tmp", b"ignored ext"),
        ("d2", "/incoming/d2.PDF", b"case-sensitive: ignored"),
        ("d2", "/incoming/d2.pdf", b"%PDF-1.4 adopted"),
        ("d3", "noext", b"no extension: ignored"),
    ]
    reg = adopt_artifacts(
        spark.createDataFrame(rows, ADOPT_SCHEMA), ["txt", "pdf"]
    )
    got = {(r["doc_id"], r["format"]): r for r in reg.collect()}
    # .tmp / .PDF (case) / extension-less rows ignored, dup collapsed
    assert set(got) == {("d1", "txt"), ("d2", "pdf")}
    r = got[("d1", "txt")]
    assert bytes(r["payload"]) == b"zz later wins"  # bytewise-max overwrite
    assert r["md5"] == hashlib.md5(b"zz later wins").hexdigest()
    assert r["n_bytes"] == 13
    assert r["size_h"] == "13 B"
    assert r["entry_name"] == "_export/_txt.txt"
    assert r["complete"] and r["origin"] == "adopted"
    assert got[("d2", "pdf")]["entry_name"] == "_export/_pdf.pdf"


def test_adopt_dict_form_with_format_column(spark):
    rows = [("d9", "alto", b"<alto/>"), ("d9", "xml", b"ignored")]
    reg = adopt_artifacts(
        spark.createDataFrame(
            rows, "doc_id string, format string, content binary"
        ),
        ["alto"],
    )
    [r] = reg.collect()
    assert r["format"] == "alto"
    assert r["entry_name"] == "_export/_alto.xml"


def test_merge_registry_overwrite_semantics(spark):
    existing = adopt_artifacts(
        spark.createDataFrame(
            [
                ("d1", "txt", b"generated-old"),
                ("d1", "alto", b"generated-alto"),
                ("d2", "txt", b"generated-keep"),
            ],
            "doc_id string, format string, content binary",
        ),
        ["txt", "alto"],
    ).withColumn("origin", F.lit("generated"))
    adopted = adopt_artifacts(
        spark.createDataFrame(
            [("d1", "txt", b"adopted-new")],
            "doc_id string, format string, content binary",
        ),
        ["txt"],
    )
    merged = {
        (r["doc_id"], r["format"]): r
        for r in merge_registry(existing, adopted).collect()
    }
    assert len(merged) == 3
    # adopted replaced the (d1, txt) entry; others untouched
    assert merged[("d1", "txt")]["origin"] == "adopted"
    assert bytes(merged[("d1", "txt")]["payload"]) == b"adopted-new"
    assert merged[("d1", "alto")]["origin"] == "generated"
    assert merged[("d2", "txt")]["origin"] == "generated"


def test_pending_exports_skip_gate_and_force(spark):
    docs = spark.createDataFrame([("d1",), ("d2",)], "doc_id string")
    reg = adopt_artifacts(
        spark.createDataFrame(
            [("d1", "txt", b"have-it")],
            "doc_id string, format string, content binary",
        ),
        ["txt"],
    )
    pend = {
        (r["doc_id"], r["format"])
        for r in pending_exports(docs, ["txt", "pdf"], reg).collect()
    }
    assert pend == {("d1", "pdf"), ("d2", "txt"), ("d2", "pdf")}
    forced = pending_exports(docs, ["txt", "pdf"], reg, force_recreate=True)
    assert forced.count() == 4  # force_recreate regenerates everything


def _page_ir(spark):
    from ocr_spark.sources.hocr import PAGE_IR_DDL

    from tests.test_hocr_writer import _PAGE_A

    rows = [(f"doc{i:02d}", 1, _PAGE_A) for i in range(6)]
    return spark.createDataFrame(rows, PAGE_IR_DDL)


def test_adopted_artifacts_survive_rederivation(spark):
    """The E7 acceptance test: re-deriving the bundle with an adopted
    txt artifact ships the adopted bytes VERBATIM for that doc (no
    regeneration), leaves every other doc's bundle byte-identical to
    the no-adoption run, and the METS checksum covers the adopted
    bytes."""
    ir = _page_ir(spark)
    some_doc = ir.select("doc_id").orderBy("doc_id").first()["doc_id"]
    adopted_bytes = b"EXTERNALLY PRODUCED TXT - do not regenerate\n"
    adopted = adopt_artifacts(
        spark.createDataFrame(
            [(some_doc, "txt", adopted_bytes)],
            "doc_id string, format string, content binary",
        ),
        ["txt"],
    )
    base = {r["doc_id"]: r for r in document_bundle(ir).collect()}
    got = {r["doc_id"]: r for r in document_bundle(ir, adopted).collect()}
    assert set(base) == set(got)
    for d in base:
        if d != some_doc:
            # untouched docs: bundle bytes identical
            assert bytes(got[d]["zip"]) == bytes(base[d]["zip"]), d
    zf = zipfile.ZipFile(io.BytesIO(bytes(got[some_doc]["zip"])))
    assert zf.read("_export/_txt.txt") == adopted_bytes
    mets = zf.read("_mets.xml").decode()
    assert hashlib.md5(adopted_bytes).hexdigest() in mets
    # the other formats for the adopted doc were still generated
    assert zf.read("_export/_alto.xml").startswith(b"<?xml")
