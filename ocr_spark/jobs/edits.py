"""Incremental edit → re-derive (SURVEY.md §3.3).

Reference loop: the editor POSTs corrected nested page JSON
(``/submit-text``, server/app.py:1023-1078), the server overwrites the
chosen ``_ocr_results/*.json`` checkpoints and ``task_make_changes``
(server/celery_app.py:182-360) regenerates every completed export with
``force_recreate=True`` — but only for THAT document; every other
document's artifacts are untouched.

Spark restatement on the parquet + manifest seam (Iceberg MERGE INTO +
changed-snapshot re-derive in the full build, SURVEY.md §7.1): the edited
rows form an overlay DataFrame; the derived table is recomputed only for
the hash buckets the edited doc_ids land in, and the write is a dynamic
partition overwrite of exactly those buckets — untouched buckets' files
are never rewritten (pytest proves this by file listing + mtime).

Granularity note: re-deriving a bucket re-runs its unedited co-resident
docs too — that is the checkpoint granularity trade (buckets are the
commit unit, exactly like extract_job's resume).  At 4096 buckets an
edit batch touching k docs recomputes ≤ k/4096 of the corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.jobs.extract_job import bucketed
from ocr_spark.operators.extract import extract_documents


def apply_edits(
    spark: SparkSession,
    updates: DataFrame,
    input_path: str,
    output_path: str,
    manifest_path: str,
    run_id: str,
    n_buckets: int = 32,
    order_by: str = "meta",
    wave_size: int = 16,
) -> dict:
    """Apply edited documents and re-derive only their buckets.

    ``updates``: replacement rows ``(doc_id, spans, meta)`` — the edited
    nested content (the ``_ocr_results`` overwrite analog).  Returns
    stats including the touched bucket list.

    Touched buckets are processed in waves of ``wave_size`` (the same
    commit granularity as extract_job) — an edit batch whose doc_ids
    spread across most buckets would otherwise re-derive the whole
    corpus in one job and blow executor heap (measured: a 100-doc edit
    over a 400k-doc/64-bucket table touches ~all buckets and OOM'd the
    single-wave form; 16-bucket waves run it comfortably).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    up = bucketed(updates, n_buckets)
    touched = sorted(
        r["bucket"] for r in up.select("bucket").distinct().collect()
    )
    t0 = time.perf_counter()
    src = bucketed(spark.read.parquet(input_path), n_buckets)
    for i in range(0, len(touched), wave_size):
        wave = touched[i : i + wave_size]
        # MERGE INTO analog: co-resident unedited docs + edited overlay
        base = (
            src.where(F.col("bucket").isin(wave))
            .join(updates.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", "spans", "meta")
        )
        overlay = up.where(F.col("bucket").isin(wave)).select(
            "doc_id", "spans", "meta"
        )
        merged = base.unionByName(overlay)
        out = bucketed(extract_documents(merged, order_by=order_by), n_buckets)
        # dynamic overwrite rewrites exactly the partition dirs present
        # in `out` = this wave's buckets; all other buckets' files stay
        out.write.mode("overwrite").partitionBy("bucket").parquet(output_path)
    wall_ms = int((time.perf_counter() - t0) * 1000)

    stats = (
        spark.read.parquet(output_path)
        .where(F.col("bucket").isin(touched))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).alias("span_count"),
            F.sum("n_words").alias("word_count"),
        )
        .collect()
    )
    per_bucket = {r["bucket"]: r for r in stats}
    rows = [
        (
            run_id,
            b,
            per_bucket[b]["doc_count"] if b in per_bucket else 0,
            per_bucket[b]["span_count"] if b in per_bucket else 0,
            per_bucket[b]["word_count"] if b in per_bucket else 0,
            wall_ms // max(len(touched), 1),
            "edited",
        )
        for b in touched
    ]
    (
        spark.createDataFrame(
            rows,
            "run_id string, bucket int, doc_count bigint, span_count bigint, "
            "word_count bigint, wall_ms bigint, status string",
        )
        .withColumn("committed_at", F.current_timestamp())
        .write.mode("append")
        .parquet(manifest_path)
    )
    n_edited = updates.select("doc_id").distinct().count()
    return {
        "status": "ok",
        "edited_docs": n_edited,
        "touched_buckets": touched,
        "wall_ms": wall_ms,
    }
