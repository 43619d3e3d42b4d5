"""Incremental edit → re-derive (SURVEY.md §3.3).

Reference loop: the editor POSTs corrected nested page JSON
(``/submit-text``, server/app.py:1023-1078), the server overwrites the
chosen ``_ocr_results/*.json`` checkpoints IN PLACE and
``task_make_changes`` (server/celery_app.py:182-360) regenerates every
completed export with ``force_recreate=True`` — but only for THAT
document; every other document's artifacts are untouched.

Spark restatement on the parquet + manifest seam: the edited rows are
appended DURABLY to the edit-overlay table beside the input (the
``_ocr_results`` overwrite analog — extract_job.read_documents resolves
base ⊕ latest-overlay, so every later re-derivation of any bucket sees
the edits; a transient overlay would be one co-resident edit away from
silently reverting).  The derived table is then recomputed only for the
hash buckets the edited doc_ids land in, as a dynamic partition
overwrite of exactly those buckets — untouched buckets' files are never
rewritten (pytest proves this by file listing + mtime).

Crash-safety: the overlay append happens BEFORE derivation; a crash
mid-derive is healed by re-running apply_edits (the re-append is a
later edit_seq with identical content — latest-wins makes it a no-op)
or by a plain extract_job resume, which reads through the same seam.

Granularity note: re-deriving a bucket re-runs its unedited co-resident
docs too — that is the checkpoint granularity trade (buckets are the
commit unit, exactly like extract_job's resume).  At 4096 buckets an
edit batch touching k docs recomputes ≤ k/4096 of the corpus.  Touched
buckets are processed in waves of ``wave_size`` (measured: a 100-doc
edit over a 400k-doc/64-bucket table touches ~all buckets and OOM'd the
single-wave form; 16-bucket waves run it comfortably).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.jobs.extract_job import (
    bucketed,
    commit_manifest,
    edits_overlay_path,
    read_documents,
)
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
    """Apply edited documents durably and re-derive only their buckets.

    ``updates``: replacement rows ``(doc_id, spans, meta)`` — the edited
    nested content.  Returns stats including the touched bucket list.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    up = bucketed(updates, n_buckets)
    touched = sorted(
        r["bucket"] for r in up.select("bucket").distinct().collect()
    )
    if not touched:
        return {"status": "noop", "edited_docs": 0, "touched_buckets": []}

    # 1. durable source-of-truth update (the _ocr_results overwrite
    #    analog): append to the overlay with a strictly increasing seq
    #    so the latest edit of a doc wins in read_documents
    (
        updates.select("doc_id", "spans", "meta")
        .withColumn("edit_seq", F.lit(time.time_ns()))
        .write.mode("append")
        .parquet(edits_overlay_path(input_path))
    )

    # 2. re-derive the touched buckets from the merged view, in waves
    t0 = time.perf_counter()
    src = bucketed(read_documents(spark, input_path), n_buckets)
    for i in range(0, len(touched), wave_size):
        wave = touched[i : i + wave_size]
        part = src.where(F.col("bucket").isin(wave)).select(
            "doc_id", "spans", "meta"
        )
        out = bucketed(extract_documents(part, order_by=order_by), n_buckets)
        # dynamic overwrite rewrites exactly the partition dirs present
        # in `out` = this wave's buckets; all other buckets' files stay
        out.write.mode("overwrite").partitionBy("bucket").parquet(output_path)
    wall_ms = int((time.perf_counter() - t0) * 1000)

    commit_manifest(
        spark, output_path, manifest_path, run_id, touched, wall_ms, "edited"
    )
    n_edited = updates.select("doc_id").distinct().count()
    return {
        "status": "ok",
        "edited_docs": n_edited,
        "touched_buckets": touched,
        "wall_ms": wall_ms,
    }
