"""Streaming Bloom decontamination (streaming/pipeline.py
run_decontaminate_stream): stream==batch verdict equality over a
multi-file source, batch_id partition layout, and checkpoint-resume
incrementality — the stream-static pattern gated the same way as the
extraction stream.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.contamination import bloom_decontaminate
from ocr_spark.streaming.pipeline import run_decontaminate_stream

EVAL = [
    (9001, "the quick brown fox jumps over the lazy dog tonight"),
    (9002, "pack my box with five dozen liquor jugs right now"),
]
TRAIN_A = [
    (1, "he saw the quick brown fox jumps and kept walking onward"),
    (2, "totally unrelated text with no overlap whatsoever in it"),
]
TRAIN_B = [
    (3, "please pack my box with five dozen pencils instead"),
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bloomstream"))
    src = os.path.join(d, "in")
    os.makedirs(src)
    import pyarrow as pa
    import pyarrow.parquet as pq

    # two plain parquet FILES → two micro-batches at maxFilesPerTrigger=1
    for name, rows in (("f0.parquet", TRAIN_A), ("f1.parquet", TRAIN_B)):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            os.path.join(src, name),
        )
    return d, src


def _eval_df(spark):
    return spark.createDataFrame(EVAL, "doc_id bigint, text string")


def test_stream_matches_batch_verdicts(spark, stream_dirs):
    d, src = stream_dirs
    out, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
    run_decontaminate_stream(spark, src, _eval_df(spark), out, ckpt)

    got = spark.read.parquet(out)
    # batch_id is a discovered partition column; both batches landed
    assert set(r["batch_id"] for r in got.select("batch_id").distinct().collect()) == {0, 1}

    batch = bloom_decontaminate(spark.read.parquet(src), _eval_df(spark))
    b = sorted(map(tuple, batch.collect()))
    s = sorted(
        map(
            tuple,
            got.select("doc_id", "n_grams", "n_hit_grams", "contaminated").collect(),
        )
    )
    assert b == s and len(b) == 4
    by_id = {r[0]: r[3] for r in s}
    # planted overlaps flag, the clean and too-short docs do not
    assert by_id == {1: True, 2: False, 3: True, 4: False}


def test_stream_restart_adds_nothing(spark, stream_dirs):
    d, src = stream_dirs
    out, ckpt = os.path.join(d, "out"), os.path.join(d, "ckpt")
    before = spark.read.parquet(out).count()
    run_decontaminate_stream(spark, src, _eval_df(spark), out, ckpt)
    assert spark.read.parquet(out).count() == before
