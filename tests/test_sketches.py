"""Sketch-family approximation contracts: the r4 deterministic sketches
(md5-HLL distinct, count-min heavy hitters, md5-sampled nearest-rank
quantiles) are EXACT-oracled for engine agreement in the parity suite;
these tests gate what no SQL oracle can express — that each sketch's
estimate honestly tracks the exact aggregation within its declared
error.  Spark's native sketch surface (approx_count_distinct /
approx_top_k / percentile_approx) keeps its own error-bound gates here
too: it remains the interchangeable at-scale form even though its
engine-internal state is not cross-engine checkable.
"""

from __future__ import annotations

import hashlib
import math
import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("OCR_SPARK_PARITY_SF", "/root/testdata/sf0.001")

#: r4 deterministic HLL: m=256 → rsd = 1.04/sqrt(256) = 0.065; the
#: linear-counting regime (the fixture's small vocabularies) is far
#: tighter, but the bound must hold for both branches.
HLL_RSD = 1.04 / math.sqrt(256)


@pytest.fixture(scope="module")
def exact(spark):
    rows = entry_mod.q_distinct_stats(spark, SF_DIR).collect()
    return {r["source"]: r.asDict() for r in rows}


def test_hll_within_rsd_bound(spark, exact):
    """Deterministic md5-HLL must land within 3 standard errors of the
    exact distinct count for every group (LC lookup quantization adds
    at most ±1)."""
    got = {
        r["source"]: r["n_vocab_hll"]
        for r in entry_mod.q_vocab_hll(spark, SF_DIR).collect()
    }
    assert set(got) == set(exact)
    for src, approx in got.items():
        true = exact[src]["n_vocab"]
        assert abs(approx - true) <= max(3 * HLL_RSD * true, 2.0), (
            src, approx, true
        )


def test_hll_deterministic(spark):
    a = sorted(map(tuple, entry_mod.q_vocab_hll(spark, SF_DIR).collect()))
    b = sorted(map(tuple, entry_mod.q_vocab_hll(spark, SF_DIR).collect()))
    assert a == b


def test_native_hll_within_rsd_bound(spark, exact):
    """Spark's native HLL++ (the interchangeable at-scale form) at
    rsd=0.02: within 3 standard errors of exact."""
    from pyspark.sql import functions as F

    from ocr_spark.functions.text import norm_tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["source"]: r["n"]
        for r in docs.select(
            "source", F.explode(norm_tokens(F.col("text"))).alias("word")
        )
        .groupBy("source")
        .agg(F.approx_count_distinct("word", rsd=0.02).alias("n"))
        .collect()
    }
    for src, approx in got.items():
        true = exact[src]["n_vocab"]
        assert abs(approx - true) <= max(3 * 0.02 * true, 1.0), (
            src, approx, true
        )


def _sample_keep(doc_id) -> bool:
    h = hashlib.md5(f"qs|{doc_id}".encode()).hexdigest()
    return int(h[:6], 16) % 4 == 0


def test_quantile_sketch_exact_on_sample_and_rank_sane(spark):
    """The r4 sampled sketch's quantiles must equal the nearest-rank
    quantiles of the deterministic md5 sample EXACTLY (recomputed
    independently here), and each must sit near its population rank
    (binomial sampling noise, 4σ + slack)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "doc_id", "n_chars"
    ).collect()
    by_lang_all: dict[str, list[int]] = {}
    by_lang_samp: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        by_lang_all.setdefault(r["lang"], []).append(r["n_chars"])
        if _sample_keep(r["doc_id"]):
            by_lang_samp.setdefault(r["lang"], []).append(
                (r["n_chars"], r["doc_id"])
            )
    got = entry_mod.q_doclen_quantile_sketch(spark, SF_DIR).collect()
    assert {r["lang"] for r in got} == set(by_lang_samp)
    for r in got:
        samp = sorted(by_lang_samp[r["lang"]])
        n = len(samp)
        assert r["n_sample"] == n
        for p, key in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            k = math.ceil(p * n)
            assert r[key] == samp[k - 1][0], (r["lang"], key)
            # population rank sanity
            vals = sorted(by_lang_all[r["lang"]])
            npop = len(vals)
            lo = sum(1 for x in vals if x < r[key])
            hi = sum(1 for x in vals if x <= r[key])
            tol = 4 * math.sqrt(max(p * (1 - p) * npop / 0.25, 1.0)) + 8
            assert lo - tol <= p * npop <= hi + tol, (
                r["lang"], key, r[key], lo, hi, p * npop, tol
            )


def test_vocab_heavy_hitters_cms_contract(spark):
    """Count-min guarantees: est >= exact for every reported word,
    inflation <= d-row min bound (generous eN/w), and every word whose
    exact count strictly exceeds the 10th-highest estimate appears in
    the top-10 (est(h) >= exact(h) > est_10 forces inclusion)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from ocr_spark.functions.text import norm_tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact_rows = (
        docs.select(
            "source", F.explode(norm_tokens(F.col("text"))).alias("word")
        )
        .groupBy("source", "word")
        .count()
        .collect()
    )
    exact: dict[str, Counter] = {}
    for r in exact_rows:
        exact.setdefault(r["source"], Counter())[r["word"]] = r["count"]

    got = entry_mod.q_vocab_heavy_hitters(spark, SF_DIR).collect()
    by_source: dict[str, dict[str, int]] = {}
    for r in got:
        by_source.setdefault(r["source"], {})[r["word"]] = r["est_count"]

    assert set(by_source) == set(exact)
    for source, sketch in by_source.items():
        counts = exact[source]
        n_tokens = sum(counts.values())
        assert len(sketch) == min(10, len(counts))
        infl_bound = math.e * n_tokens / 1024 + 1
        for w, est in sketch.items():
            assert counts[w] <= est <= counts[w] + infl_bound, (
                source, w, est, counts[w]
            )
        boundary_est = min(sketch.values())
        must_have = {w for w, c in counts.items() if c > boundary_est}
        assert must_have <= set(sketch), (source, must_have - set(sketch))
