"""S7 chunked-upload sink (sources/upload.py chunk_assembly): in-order
assembly checksums against hashlib, the reference's progress/completion
protocol (app.py:676-760), overwrite semantics, and shuffle-order
invariance."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ocr_spark.sources.upload import chunk_assembly

SCHEMA = "file_id bigint, counter int, total_count int, data binary"


def _rows(spec):
    return [
        (fid, c, tc, data.encode()) for (fid, c, tc, data) in spec
    ]


def test_assembly_matches_hashlib_and_protocol(spark):
    spec = [
        (1, 1, 3, "AAA-"), (1, 2, 3, "BB-"), (1, 3, 3, "C"),
        (2, 1, 1, "single"),
        (3, 1, 4, "p1"), (3, 3, 4, "p3"),          # missing 2 and 4
        (4, 1, 2, "old"), (4, 1, 2, "zzz"), (4, 2, 2, "end"),  # re-send
    ]
    out = {
        r["file_id"]: r
        for r in chunk_assembly(
            spark.createDataFrame(_rows(spec), SCHEMA)
        ).collect()
    }
    # complete file: in-order concat md5 (join_chunks, app.py:676-683)
    assert out[1]["complete"] and out[1]["progress_pct"] == 100.0
    assert out[1]["assembly_md5"] == hashlib.md5(b"AAA-BB-C").hexdigest()
    assert out[1]["n_bytes"] == 8
    # single-chunk fast path (app.py:718-726)
    assert out[2]["complete"]
    assert out[2]["assembly_md5"] == hashlib.md5(b"single").hexdigest()
    # partial: progress 2/4 = 50.00, md5 withheld (app.py:746-751)
    assert not out[3]["complete"]
    assert out[3]["progress_pct"] == 50.0
    assert out[3]["assembly_md5"] is None
    # re-sent counter overwrites (bytewise-max determinism): 'zzz' wins
    assert out[4]["complete"]
    assert out[4]["assembly_md5"] == hashlib.md5(b"zzzend").hexdigest()


def test_assembly_is_partition_invariant(spark):
    spec = [(i, c, 5, f"f{i}c{c}|") for i in range(20) for c in range(1, 6)]
    df1 = spark.createDataFrame(_rows(spec), SCHEMA)
    df2 = spark.createDataFrame(_rows(spec[::-1]), SCHEMA).repartition(13)
    a = sorted(tuple(r) for r in chunk_assembly(df1).collect())
    b = sorted(tuple(r) for r in chunk_assembly(df2).collect())
    assert a == b
    for r in a:
        fid = r[0]
        want = "".join(f"f{fid}c{c}|" for c in range(1, 6)).encode()
        assert r[6] == hashlib.md5(want).hexdigest()


def test_counter_domain_gates_completion(spark):
    """A protocol-violating counter (0 or > total_count) plus a missing
    in-range chunk must NOT fake completion — the reference's
    join_chunks would fail loudly on the missing 1..N chunk file
    (app.py:676-683)."""
    spec = [
        (7, 0, 2, "zero"), (7, 1, 2, "one"),      # counter 0 + missing 2
        (8, 1, 2, "one"), (8, 3, 2, "three"),     # counter 3 + missing 2
        (9, 2, 2, "two"), (9, 3, 2, "three"),     # no counter 1
    ]
    out = {
        r["file_id"]: r
        for r in chunk_assembly(
            spark.createDataFrame(_rows(spec), SCHEMA)
        ).collect()
    }
    for fid in (7, 8, 9):
        assert not out[fid]["complete"], fid
        assert out[fid]["assembly_md5"] is None, fid


def test_banker_progress_ties(spark):
    """progress at .005 exactly: 1/8 chunks = 12.5% ... use totals where
    10000·n/t hits half-centi ties and pin the round-half-even result."""
    # t=8, n=1 → 1250.0 centi → 12.5 exact (no tie); t=3, n=1 →
    # 3333.33.. (no tie); a true tie needs 2·(10000n % t) == t: t=16,
    # n=1 → 10000%16=0 no; t=32,n=1: 10000·1=312.5 centi → r2=16=t tie
    spec = [(9, 1, 32, "x")]
    [r] = chunk_assembly(
        spark.createDataFrame(_rows(spec), SCHEMA)
    ).collect()
    # q0 = 312 (even) → banker keeps 312 → 3.12
    assert r["progress_pct"] == 3.12
