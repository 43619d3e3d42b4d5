"""session_stats_stream (streaming/pipeline.py): native session-window
aggregation — stream result equals the same aggregation run as a batch
job, gap-boundary semantics are pinned (touching windows merge; windows
split iff the gap strictly exceeds the threshold), and the
stateful operator is a real session-window merge with watermark-bounded
state.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

from ocr_spark.streaming.pipeline import session_stats_stream

SCHEMA = "user_id bigint, ts timestamp, value double"


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2026, 1, 1, 12, minute, second)


# User 1: two events 5 min apart (one session), then a 40-min gap (new
# session).  User 2: events exactly 10 min apart with gap=10m — the
# boundary is INCLUSIVE: touching windows merge, matching the batch
# sessionize's `gap > threshold` split test.  User 3: single event.
EVENTS = [
    (1, _ts(0), 1.0),
    (1, _ts(5), 2.0),
    (1, _ts(45), 4.0),
    (2, _ts(0), 8.0),
    (2, _ts(10), 16.0),
    (3, _ts(30), 32.0),
]

GAP = "10 minutes"

EXPECTED = {
    (1, _ts(0), _ts(15), 2, 3.0),
    (1, _ts(45), _ts(55), 1, 4.0),
    (2, _ts(0), _ts(20), 2, 24.0),
    (3, _ts(30), _ts(40), 1, 32.0),
}


def _rows(df):
    return {
        (r.user_id, r.sess_start, r.sess_end, r.n_events, r.sum_value)
        for r in df.collect()
    }


def _run_stream(spark, base, name):
    p = os.path.join(base, "ev")
    spark.createDataFrame(EVENTS, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    stream = spark.readStream.schema(SCHEMA).parquet(p)
    out = session_stats_stream(stream, gap=GAP)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_equals_batch_and_pinned_boundaries(spark):
    with tempfile.TemporaryDirectory() as base:
        _run_stream(spark, base, "sess_eq")
        got = _rows(spark.sql("select * from sess_eq"))
        batch = session_stats_stream(
            spark.createDataFrame(EVENTS, SCHEMA), gap=GAP
        )
        assert got == _rows(batch) == EXPECTED


def test_state_operator_is_session_window_merge(spark):
    with tempfile.TemporaryDirectory() as base:
        q = _run_stream(spark, base, "sess_plan")
        progress = q.lastProgress
        assert progress is not None
        ops = progress["stateOperators"]
        assert any(
            "session" in (op.get("operatorName") or "").lower()
            for op in ops
        ), ops
