"""Retention job: expired rows vanish, only their buckets rewrite, the
manifest records the retention commit, a re-run is a no-op, and the
extraction kernel tolerates null/empty spans rows (error-robustness
analog of the reference's poison-flag path, celery_app.py:1213-1224)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark import datagen
from ocr_spark.jobs.extract_job import run_extraction
from ocr_spark.jobs.retention import expire_where

N_BUCKETS = 8


def _bucket_files(output_path):
    out = {}
    for d in os.listdir(output_path):
        if d.startswith("bucket="):
            full = os.path.join(output_path, d)
            out[d] = tuple(
                sorted(
                    (f, os.stat(os.path.join(full, f)).st_mtime_ns)
                    for f in os.listdir(full)
                    if not f.startswith(".")
                )
            )
    return out


def test_expire_where_rewrites_only_touched_buckets(spark, tmp_path):
    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=100, seed=42, scramble=True)
    assert run_extraction(
        spark, src, out, man, run_id="base", n_buckets=N_BUCKETS
    )["status"] == "ok"

    expired_ids = [
        r["doc_id"]
        for r in spark.read.parquet(out).select("doc_id").orderBy("doc_id").limit(3).collect()
    ]
    before = _bucket_files(out)
    n_before = spark.read.parquet(out).count()

    st = expire_where(
        spark, out, man, "ret-1", F.col("doc_id").isin(expired_ids)
    )
    assert st["status"] == "ok" and st["expired"] == 3
    touched = {f"bucket={b}" for b in st["touched_buckets"]}

    after = _bucket_files(out)
    for b in before:
        if b in touched:
            assert after[b] != before[b]
        else:
            assert after[b] == before[b], f"{b} rewritten unnecessarily"

    remaining = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert not (remaining & set(expired_ids))
    assert len(remaining) == n_before - 3

    m = spark.read.parquet(man)
    ret = m.where(F.col("run_id") == "ret-1").collect()
    assert {r["bucket"] for r in ret} == set(st["touched_buckets"])
    assert all(r["status"] == "retention" for r in ret)

    # idempotent: second run matches nothing, touches nothing
    snap = _bucket_files(out)
    st2 = expire_where(
        spark, out, man, "ret-2", F.col("doc_id").isin(expired_ids)
    )
    assert st2 == {"status": "noop", "expired": 0, "touched_buckets": []}
    assert _bucket_files(out) == snap


def test_expire_whole_bucket_actually_deletes(spark, tmp_path):
    """A bucket whose EVERY row expires must vanish — dynamic overwrite
    alone never rewrites a partition absent from the output, so the old
    directory (and its rows) would silently survive without the explicit
    empty-bucket delete."""
    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=60, seed=42, scramble=True)
    run_extraction(spark, src, out, man, run_id="base", n_buckets=4)

    tbl = spark.read.parquet(out)
    victim = tbl.select("bucket").first()["bucket"]
    n_victim = tbl.where(F.col("bucket") == victim).count()
    st = expire_where(spark, out, man, "ret-all", F.col("bucket") == victim)
    assert st["expired"] == n_victim and st["touched_buckets"] == [victim]
    after = spark.read.parquet(out)
    assert after.where(F.col("bucket") == victim).count() == 0
    assert not os.path.exists(os.path.join(out, f"bucket={victim}"))
    assert after.count() > 0  # other buckets intact


def test_expire_null_predicate_rows_survive(spark, tmp_path):
    """Three-valued logic: rows where the predicate evaluates NULL are
    NOT expired (they must neither be counted nor silently dropped from
    the rewritten buckets)."""
    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=40, seed=42, scramble=True)
    run_extraction(spark, src, out, man, run_id="base", n_buckets=4)
    tbl = spark.read.parquet(out)
    n0 = tbl.count()
    ids = sorted(r["doc_id"] for r in tbl.select("doc_id").collect())
    # predicate NULL for the first doc, TRUE for the second, FALSE rest
    pred = (
        F.when(F.col("doc_id") == ids[0], F.lit(None).cast("boolean"))
        .when(F.col("doc_id") == ids[1], F.lit(True))
        .otherwise(F.lit(False))
    )
    st = expire_where(spark, out, man, "ret-null", pred)
    assert st["expired"] == 1
    remaining = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    assert ids[0] in remaining          # NULL row survived
    assert ids[1] not in remaining      # TRUE row expired
    assert len(remaining) == n0 - 1


def test_kernel_tolerates_null_and_empty_spans(spark):
    from ocr_spark.operators.extract import extract_documents

    df = spark.createDataFrame(
        [
            ("d1", None, None),
            ("d2", [], []),
            ("d3", [("text", "hello", None, 0)],
             [(1, 0, 0, 0, 0, 90, [0.0, 0.0, 1.0, 1.0])]),
        ],
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "meta array<struct<page_no:int,segment_pos:int,para_pos:int,"
        "line_pos:int,word_pos:int,confidence:int,box:array<double>>>",
    )
    rows = {r["doc_id"]: r for r in extract_documents(df, order_by="meta").collect()}
    assert rows["d1"]["n_words"] == 0 and rows["d1"]["doc_text"] == ""
    assert rows["d2"]["n_words"] == 0
    assert rows["d3"]["n_words"] == 1 and rows["d3"]["doc_text"].strip() == "hello"


def test_expire_with_input_path_survives_rederivation(spark, tmp_path):
    """A durable delete (input_path given) tombstones the source overlay,
    so neither a co-resident edit nor a fresh full derivation resurrects
    the expired documents.  Without the tombstone, re-deriving the
    bucket from the source would bring them straight back."""
    from ocr_spark.jobs.edits import apply_edits
    from ocr_spark.jobs.extract_job import read_documents

    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=60, seed=46, scramble=True)
    run_extraction(spark, src, out, man, run_id="base", n_buckets=2)

    docs = spark.read.parquet(src)
    dead, live = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()
    ]
    st = expire_where(
        spark, out, man, "gdpr", F.col("doc_id") == dead, input_path=src
    )
    assert st["expired"] == 1
    assert spark.read.parquet(out).where(F.col("doc_id") == dead).count() == 0
    assert read_documents(spark, src).where(F.col("doc_id") == dead).count() == 0

    # co-resident edit re-derives the dead doc's bucket (2 buckets → the
    # edited doc is in the same or the other; edit BOTH docs' neighbors
    # by editing `live` and forcing both buckets via a second doc)
    updates = docs.where(F.col("doc_id") == live).select(
        "doc_id",
        F.expr(
            "transform(spans, s -> struct(s.kind as kind, "
            "upper(s.text) as text, s.media_ref as media_ref, "
            "s.offset as offset))"
        ).alias("spans"),
        "meta",
    )
    apply_edits(spark, updates, src, out, man, run_id="e1", n_buckets=2)
    assert spark.read.parquet(out).where(F.col("doc_id") == dead).count() == 0

    # a fresh full derivation over the source seam also excludes it
    out2, man2 = os.path.join(tmp_path, "out2"), os.path.join(tmp_path, "man2")
    run_extraction(spark, src, out2, man2, run_id="re", n_buckets=2)
    t2 = spark.read.parquet(out2)
    assert t2.where(F.col("doc_id") == dead).count() == 0
    assert t2.count() == 59
