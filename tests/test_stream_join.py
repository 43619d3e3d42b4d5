"""interval_join_streams (streaming/pipeline.py): watermarked
stream-stream interval join — stream result equals the equivalent batch
interval join, out-of-interval results never pair, and the physical plan
is a genuine StreamingSymmetricHashJoin with state-watermark bounds.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from ocr_spark.streaming.pipeline import interval_join_streams

SUB_SCHEMA = "doc_id bigint, submit_ts timestamp"
RES_SCHEMA = "doc_id bigint, result_ts timestamp, n_spans bigint"


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2026, 1, 1, 12, minute, second)


SUBS = [
    (1, _ts(0)),
    (2, _ts(1)),
    (3, _ts(2)),  # never answered
    (4, _ts(3)),
]
RESULTS = [
    (1, _ts(5), 10),   # 5 min lag — inside 30 min
    (2, _ts(40), 20),  # 39 min lag — OUTSIDE the interval, must not pair
    (4, _ts(3, 30), 40),  # 30 s lag
    (9, _ts(4), 90),   # result with no submission
]
EXPECTED = {(1, 300, 10), (4, 30, 40)}


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _streams(spark, base):
    sub_p, res_p = os.path.join(base, "subs"), os.path.join(base, "res")
    _write(spark, SUBS, SUB_SCHEMA, sub_p)
    _write(spark, RESULTS, RES_SCHEMA, res_p)
    subs = spark.readStream.schema(SUB_SCHEMA).parquet(sub_p)
    res = spark.readStream.schema(RES_SCHEMA).parquet(res_p)
    return subs, res


def test_stream_equals_batch_interval_join(spark):
    with tempfile.TemporaryDirectory() as base:
        subs, res = _streams(spark, base)
        joined = interval_join_streams(subs, res, max_lag="30 minutes")
        q = (
            joined.writeStream.format("memory")
            .queryName("sj_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from sj_out").collect()
        got = {(r.doc_id, r.lag_sec, r.n_spans) for r in rows}
        assert got == EXPECTED
        # batch twin over the same parquet inputs
        batch = interval_join_streams(
            spark.read.parquet(os.path.join(base, "subs")),
            spark.read.parquet(os.path.join(base, "res")),
            max_lag="30 minutes",
        )
        assert {
            (r.doc_id, r.lag_sec, r.n_spans) for r in batch.collect()
        } == got


def test_plan_is_stateful_symmetric_hash_join(spark):
    with tempfile.TemporaryDirectory() as base:
        subs, res = _streams(spark, base)
        joined = interval_join_streams(subs, res)
        q = (
            joined.writeStream.format("memory")
            .queryName("sj_plan")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = q.lastProgress
        # a real stream-stream join runs a stateful operator with
        # watermark-bounded state on both sides
        assert progress is not None
        ops = progress["stateOperators"]
        assert any(
            "symmetricHashJoin" in (op.get("operatorName") or "")
            for op in ops
        ), ops
