"""Sketch-family error bounds: the approximate queries (HLL++ distinct,
GK quantiles) must stay within their declared error of the exact
aggregations on the driver testdata.  The exact twin ``distinct_stats`` is
hash-gated by the DuckDB parity suite; these tests gate the sketches'
*approximation contract*, which no SQL oracle can express.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("OCR_SPARK_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def exact(spark):
    rows = entry_mod.q_distinct_stats(spark, SF_DIR).collect()
    return {r["source"]: r.asDict() for r in rows}


def test_hll_within_rsd_bound(spark, exact):
    """HLL++ at rsd=0.02 must land within 3 standard errors (6%) of the
    exact distinct count for every group."""
    got = {
        r["source"]: r["n_vocab_hll"]
        for r in entry_mod.q_vocab_hll(spark, SF_DIR).collect()
    }
    assert set(got) == set(exact)
    for src, approx in got.items():
        true = exact[src]["n_vocab"]
        assert abs(approx - true) <= max(3 * 0.02 * true, 1.0), (
            src, approx, true
        )


def test_hll_deterministic(spark):
    a = sorted(map(tuple, entry_mod.q_vocab_hll(spark, SF_DIR).collect()))
    b = sorted(map(tuple, entry_mod.q_vocab_hll(spark, SF_DIR).collect()))
    assert a == b


def test_quantile_sketch_rank_bound(spark):
    """percentile_approx(accuracy=10000) guarantees rank error <=
    n / accuracy; verify each reported percentile's true rank lands inside
    that window (exact ranks computed from the raw column)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    by_lang = {
        r["lang"]: sorted(v["n_chars"] for v in r["vals"])
        for r in docs.groupBy("lang")
        .agg(F.collect_list(F.struct("n_chars")).alias("vals"))
        .collect()
    }
    got = entry_mod.q_doclen_quantile_sketch(spark, SF_DIR).collect()
    assert {r["lang"] for r in got} == set(by_lang)
    for r in got:
        vals = by_lang[r["lang"]]
        n = len(vals)
        assert r["n_docs"] == n
        tol = max(n / 10000.0, 1.0)  # rank tolerance (>=1 for tiny groups)
        for p, key in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            v = r[key]
            # rank window of v in the sorted data
            lo = sum(1 for x in vals if x < v)
            hi = sum(1 for x in vals if x <= v)
            target = p * n
            assert lo - tol <= target <= hi + tol, (
                r["lang"], key, v, lo, hi, target
            )


def test_vocab_heavy_hitters_containment_and_exactness(spark):
    """Frequent-items guarantee: every word whose exact count strictly
    exceeds the exact 10th-highest count per source must appear in the
    sketch's top-10, and (since maxItemsTracked exceeds the fixture
    vocabulary) every reported est_count equals the exact count."""
    from collections import Counter

    from ocr_spark.functions.text import norm_tokens
    from pyspark.sql import functions as F

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
        assert len(sketch) == min(10, len(counts))
        boundary = sorted(counts.values(), reverse=True)[:10][-1]
        must_have = {w for w, c in counts.items() if c > boundary}
        assert must_have <= set(sketch), (source, must_have - set(sketch))
        for w, est in sketch.items():
            assert est == counts[w], (source, w, est, counts[w])
