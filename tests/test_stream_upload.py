"""Streaming chunked-upload assembly (streaming/stateful.py
streaming_chunk_assembly): chunks split across micro-batches assemble
exactly like the batch operator — the stream==batch gate — with one
completion row per file and in-flight files held in state."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from ocr_spark.sources.upload import chunk_assembly
from ocr_spark.streaming.stateful import streaming_chunk_assembly


def _write_batch(src, name, rows):
    pd.DataFrame(
        {
            "file_id": [r[0] for r in rows],
            "counter": pd.array([r[1] for r in rows], dtype="int32"),
            "total_count": pd.array([r[2] for r in rows], dtype="int32"),
            "data": [r[3] for r in rows],
        }
    ).to_parquet(os.path.join(src, name))


def test_stream_equals_batch_assembly(spark, tmp_path):
    src = os.path.join(tmp_path, "chunks")
    out = os.path.join(tmp_path, "out")
    ck = os.path.join(tmp_path, "ck")
    os.makedirs(src)
    b1 = [
        ("f1", 1, 3, b"A-"), ("f1", 2, 3, b"B-"),
        ("f2", 1, 1, b"solo"),
        ("f3", 1, 2, b"never-finishes"),
        ("f4", 1, 2, b"old"),
    ]
    b2 = [
        ("f1", 3, 3, b"C"),               # completes f1
        ("f4", 1, 2, b"zzz"), ("f4", 2, 2, b"end"),  # re-send + complete
    ]
    _write_batch(src, "b1.parquet", b1)
    _write_batch(src, "b2.parquet", b2)

    stream = (
        spark.readStream.schema(
            "file_id string, counter int, total_count int, data binary"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_chunk_assembly(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["file_id"]: r for r in spark.read.parquet(out).collect()}

    # completion rows only; f3 stays in flight
    assert set(got) == {"f1", "f2", "f4"}
    assert got["f1"]["assembly_md5"] == hashlib.md5(b"A-B-C").hexdigest()
    assert got["f2"]["assembly_md5"] == hashlib.md5(b"solo").hexdigest()
    # bytewise-max re-send overwrite, same as batch
    assert got["f4"]["assembly_md5"] == hashlib.md5(b"zzzend").hexdigest()

    # stream == batch on every completed file
    all_rows = b1 + b2
    batch = {
        r["file_id"]: r
        for r in chunk_assembly(
            spark.createDataFrame(
                all_rows,
                "file_id string, counter int, total_count int, data binary",
            )
        ).collect()
        if r["complete"]
    }
    assert set(batch) == set(got)
    for fid in got:
        for col in ("total_count", "n_chunks", "n_bytes", "assembly_md5"):
            assert got[fid][col] == batch[fid][col], (fid, col)


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _assembly_fn's TTL
    branch without running a stream wall-clock long enough to expire."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_assembly_fn_timeout_branch_drops_state():
    """hasTimedOut invocation: abandoned upload's buffered chunks are
    dropped, nothing emitted, no pd.concat on the empty iterator."""
    from ocr_spark.streaming.stateful import _assembly_fn

    st = _FakeState(value=(3, [1], [b"part1"]), timed_out=True)
    out = list(_assembly_fn(("fX",), iter([]), st, ttl_ms=60000))
    assert st.removed
    assert len(out) == 1 and len(out[0]) == 0


def test_assembly_fn_rearms_ttl_on_update():
    """Every state update re-arms the processing-time timeout, so the
    advertised state_ttl_minutes actually fires for abandoned uploads."""
    from ocr_spark.streaming.stateful import _assembly_fn

    st = _FakeState()
    rows = pd.DataFrame(
        {
            "file_id": ["fY"],
            "counter": [1],
            "total_count": [2],
            "data": [b"p1"],
        }
    )
    out = list(_assembly_fn(("fY",), iter([rows]), st, ttl_ms=120000))
    assert st.timeout_set == 120000
    assert st.exists and len(out) == 1 and len(out[0]) == 0


def test_streaming_counter_domain_gate():
    """Mirror of the batch counter-domain rule: counters {0,1} with
    total_count 2 must not complete (missing in-range chunk 2)."""
    from ocr_spark.streaming.stateful import _assembly_fn

    st = _FakeState()
    rows = pd.DataFrame(
        {
            "file_id": ["fZ", "fZ"],
            "counter": [0, 1],
            "total_count": [2, 2],
            "data": [b"zero", b"one"],
        }
    )
    out = list(_assembly_fn(("fZ",), iter([rows]), st))
    assert st.exists          # still in flight, not completed
    assert len(out[0]) == 0
