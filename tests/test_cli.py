"""spark-submit CLI entries for the lifecycle jobs: argument parsing and
end-to-end dispatch (in-process, passing the shared test session so the
mains don't stop it)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_spark import datagen
from ocr_spark.jobs import edits as edits_cli
from ocr_spark.jobs import retention as retention_cli
from ocr_spark.jobs.extract_job import run_extraction


def test_lifecycle_clis_dispatch(spark, tmp_path):
    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=30, seed=51, scramble=True)
    run_extraction(spark, src, out, man, run_id="base", n_buckets=2)

    docs = spark.read.parquet(src)
    a, b = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()
    ]

    # apply: edits batch shipped as a parquet path
    upath = os.path.join(tmp_path, "updates.parquet")
    (
        docs.where(F.col("doc_id") == a)
        .selectExpr(
            "doc_id",
            "transform(spans, s -> struct(s.kind as kind, upper(s.text) as "
            "text, s.media_ref as media_ref, s.offset as offset)) as spans",
            "meta",
        )
        .write.parquet(upath)
    )
    st = edits_cli.main(
        ["apply", "--updates", upath, "--input", src, "--output", out,
         "--manifest", man, "--buckets", "2"],
        spark=spark,
    )
    assert st["status"] == "ok" and st["edited_docs"] == 1
    ta = spark.read.parquet(out).where(F.col("doc_id") == a).first()["doc_text"]
    assert ta == ta.upper()

    # retention: SQL predicate, durable via --input
    st = retention_cli.main(
        ["--output", out, "--manifest", man, "--where", f"doc_id = '{b}'",
         "--input", src],
        spark=spark,
    )
    assert st["status"] == "ok" and st["expired"] == 1
    assert spark.read.parquet(out).where(F.col("doc_id") == b).count() == 0

    # compact: folds the edit + tombstone into the base
    st = edits_cli.main(["compact", "--input", src], spark=spark)
    assert st["status"] == "ok" and st["docs"] == 29

    # delete: ids shipped as a parquet path (re-read the base — the
    # pre-compaction DataFrame's file index is stale after the rewrite)
    docs = spark.read.parquet(src)
    ipath = os.path.join(tmp_path, "ids.parquet")
    docs.where(F.col("doc_id") == a).select("doc_id").write.parquet(ipath)
    st = edits_cli.main(
        ["delete", "--doc-ids", ipath, "--input", src], spark=spark
    )
    assert st["deleted"] == 1
    from ocr_spark.jobs.extract_job import read_documents

    assert read_documents(spark, src).count() == 28


def test_streaming_cli_dispatch(spark, tmp_path):
    from ocr_spark.streaming import pipeline as stream_cli

    src = os.path.join(tmp_path, "docs")
    datagen.generate_to_path(src, n_docs=20, seed=54, scramble=True, n_files=2)
    sout = os.path.join(tmp_path, "sout")
    ckpt = os.path.join(tmp_path, "ckpt")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")

    st = stream_cli.main(
        ["extract", "--input", src, "--output", sout, "--checkpoint", ckpt],
        spark=spark,
    )
    assert st["status"] == "drained"
    st = stream_cli.main(
        ["fold", "--stream-output", sout, "--output", out, "--manifest", man,
         "--input", src, "--buckets", "2"],
        spark=spark,
    )
    assert st["status"] == "ok" and st["folded_docs"] == 20
    assert spark.read.parquet(out).count() == 20
