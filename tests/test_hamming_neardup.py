"""Banded Hamming near-dup join (dedup.py hamming_neardup) + the media
average-hash path (multimodal.py media_avg_hash)."""

import itertools

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import hamming_neardup
from ocr_spark.operators.multimodal import (
    average_hash_bits,
    media_avg_hash,
)


def _flip(h, *bits):
    for b in bits:
        h ^= 1 << b
    return h


BASE = 0x0F0F_1234_ABCD_0F0F_0 >> 4  # arbitrary 60-bit value
SIGS = {
    "s0": BASE,
    "s1": _flip(BASE, 3),                      # hamming 1
    "s2": _flip(BASE, 3, 17, 29, 41, 55),      # hamming 5 (boundary)
    "s3": _flip(BASE, 0, 10, 20, 30, 40, 50),  # hamming 6 — excluded,
    #   and every diff lands in a DIFFERENT band (worst pigeonhole case)
    "s4": 0x155_5555_5555_5555,                # far from everything
}


def _brute(max_h=5):
    out = {}
    for (a, ha), (b, hb) in itertools.combinations(sorted(SIGS.items()), 2):
        d = bin(ha ^ hb).count("1")
        if d <= max_h:
            out[(a, b)] = d
    return out


def test_hamming_neardup_exact_recall_and_precision(spark):
    df = spark.createDataFrame(
        list(SIGS.items()), "doc_id string, simhash bigint"
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in hamming_neardup(df).collect()
    }
    exp = _brute()
    assert got == exp
    assert ("s0", "s2") in got and got[("s0", "s2")] == 5  # boundary kept
    assert ("s0", "s3") not in got  # hamming 6 excluded


def test_hamming_neardup_negative_hash_bit63(spark):
    # bit 63 set → negative bigint; banding and bit_count must still work
    def s64(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    rows = [("m0", s64(0x8000000000001234)), ("m1", 0x1234)]  # differ in bit 63
    df = spark.createDataFrame(rows, "doc_id string, h bigint")
    got = hamming_neardup(
        df, hash_col="h", bits=64, max_hamming=5
    ).collect()
    assert len(got) == 1 and got[0]["hamming"] == 1


def test_average_hash_properties():
    g1 = bytes(range(200, 264)) if False else bytes([1] * 32 + [200] * 32)
    # constructed grid: low half below mean, high half above
    import numpy as np

    grid = np.array([1] * 32 + [200] * 32, dtype=np.int64)
    h = average_hash_bits(grid)
    # exactly the top 32 cells set → bits 32..63, value is negative
    assert h < 0
    assert bin(h & (2**64 - 1)).count("1") == 32
    # uniform grid → no cell strictly above mean → 0
    assert average_hash_bits(np.array([7] * 64, dtype=np.int64)) == 0


def test_media_avg_hash_kernel_and_reuse_detection(spark):
    rows = [
        ("d1", "a.png", b"same-bytes", "image/png"),
        ("d2", "b.png", b"same-bytes", "image/png"),
        ("d3", "c.png", b"other-bytes", "image/png"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary, mime string"
    )
    hashed = media_avg_hash(media)
    vals = {r["media_ref"]: r["ahash"] for r in hashed.collect()}
    assert vals["a.png"] == vals["b.png"]  # identical bytes → identical hash
    assert vals["a.png"] != vals["c.png"]
    pairs = hamming_neardup(
        hashed.select(F.col("media_ref").alias("item"), "ahash"),
        hash_col="ahash",
        id_col="item",
        bits=64,
        max_hamming=5,
    ).collect()
    assert {(r["a"], r["b"], r["hamming"]) for r in pairs} == {
        ("a.png", "b.png", 0)
    }
