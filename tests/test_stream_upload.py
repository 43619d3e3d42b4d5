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
