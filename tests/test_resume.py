"""M4: checkpoint-manifest resume semantics (SURVEY.md §4 X6/X7, §7.2 M4).

Crash mid-run → resume → only unfinished buckets reprocessed, final output
identical to an uninterrupted run, manifest carries per-bucket lineage +
span-count metrics.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark import datagen
from ocr_spark.jobs import extract_job


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume")
    src = os.path.join(d, "documents.parquet")
    datagen.generate_to_path(src, n_docs=120, seed=42, scramble=True)
    return {
        "src": src,
        "out_a": os.path.join(d, "out_a"),
        "man_a": os.path.join(d, "man_a"),
        "out_b": os.path.join(d, "out_b"),
        "man_b": os.path.join(d, "man_b"),
    }


N_BUCKETS = 8


def _collect_out(spark, path):
    rows = (
        spark.read.parquet(path)
        .select("doc_id", F.to_json("spans").alias("sp"), "doc_text", "n_words")
        .collect()
    )
    return sorted((r["doc_id"], r["sp"], r["doc_text"], r["n_words"]) for r in rows)


def test_crash_resume_equals_fresh_run(spark, paths):
    # fresh uninterrupted run
    full = extract_job.run_extraction(
        spark, paths["src"], paths["out_a"], paths["man_a"], "run-full",
        n_buckets=N_BUCKETS, wave_size=None,
    )
    assert full["status"] == "ok" and full["processed"] == N_BUCKETS

    # crashing run: 2-bucket waves, die after 2 waves (4 buckets committed)
    crashed = extract_job.run_extraction(
        spark, paths["src"], paths["out_b"], paths["man_b"], "run-crash",
        n_buckets=N_BUCKETS, wave_size=2, fail_after_waves=2,
    )
    assert crashed["status"] == "crashed"
    assert crashed["processed"] == 4
    done_after_crash = set(
        extract_job.completed_buckets(spark, paths["man_b"])
    )
    assert len(done_after_crash) == 4

    # resume: must process exactly the remaining buckets
    resumed = extract_job.run_extraction(
        spark, paths["src"], paths["out_b"], paths["man_b"], "run-resume",
        n_buckets=N_BUCKETS, wave_size=None,
    )
    assert resumed["status"] == "ok"
    assert resumed["skipped"] == 4
    assert resumed["processed"] == N_BUCKETS - 4

    # identical output to the uninterrupted run
    assert _collect_out(spark, paths["out_b"]) == _collect_out(spark, paths["out_a"])


def test_manifest_lineage_and_metrics(spark, paths):
    m = extract_job.read_manifest(spark, paths["man_b"]).toPandas()
    # every bucket committed exactly once, crash run + resume run both present
    assert sorted(m["bucket"]) == list(range(N_BUCKETS))
    assert set(m["run_id"]) == {"run-crash", "run-resume"}
    assert (m["status"] == "ok").all()
    # metrics reconcile against the actual output table
    out = spark.read.parquet(paths["out_b"])
    agg = out.agg(
        F.count("*").alias("d"), F.sum(F.size("spans")).alias("s"),
        F.sum("n_words").alias("w"),
    ).collect()[0]
    assert m["doc_count"].sum() == agg["d"]
    assert m["span_count"].sum() == agg["s"]
    assert m["word_count"].sum() == agg["w"]


def test_noop_when_all_committed(spark, paths):
    again = extract_job.run_extraction(
        spark, paths["src"], paths["out_b"], paths["man_b"], "run-noop",
        n_buckets=N_BUCKETS,
    )
    assert again["processed"] == 0 and again["skipped"] == N_BUCKETS
