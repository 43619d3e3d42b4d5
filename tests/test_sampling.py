"""Deterministic sampling operators (operators/sampling.py): the keep set
must be a pure function of (key, seed, frac) — stable under repartitioning
— with per-stratum rates near their targets, and corpus_mix must fill each
source's token budget minimally in the deterministic hash order."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.sampling import (
    corpus_mix,
    deterministic_sample,
    sample_key,
    stratified_sample,
)


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_sample_repartition_invariant(spark):
    """The same rows are kept no matter how the input is partitioned —
    the property plain DataFrame.sample does NOT have."""
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    base = _ids(deterministic_sample(df, 0.3))
    assert base == _ids(deterministic_sample(df.repartition(17), 0.3))
    assert base == _ids(deterministic_sample(df.coalesce(1), 0.3))
    assert base == _ids(
        deterministic_sample(df.orderBy(F.col("doc_id").desc()), 0.3)
    )


def test_sample_rate_and_seed(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    n = len(_ids(deterministic_sample(df, 0.3)))
    assert abs(n / 20000 - 0.3) < 0.02, n
    # different seed ⇒ a genuinely different (but same-rate) draw
    other = set(_ids(deterministic_sample(df, 0.3, seed=7)))
    assert 0 < len(other & set(_ids(deterministic_sample(df, 0.3)))) < n
    # frac edges
    assert len(_ids(deterministic_sample(df, 0.0))) == 0
    assert len(_ids(deterministic_sample(df, 1.0))) == 20000


def test_sample_is_nested_by_frac(spark):
    """Threshold sampling is monotone: the 10% sample is a subset of the
    30% sample (key ordering is shared) — lets pipelines grow a sample
    without re-drawing."""
    df = spark.range(10000).withColumnRenamed("id", "doc_id")
    s10 = set(_ids(deterministic_sample(df, 0.1)))
    s30 = set(_ids(deterministic_sample(df, 0.3)))
    assert s10 < s30


def test_stratified_rates(spark):
    rows = [(i, ["en", "zh", "de", "fr"][i % 4]) for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_sample(
        df, "lang", {"en": 0.1, "zh": 1.0, "de": 0.0}, default_frac=0.5
    )
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got["zh"] == 2000
    assert "de" not in got
    assert abs(got["en"] / 2000 - 0.1) < 0.03
    assert abs(got["fr"] / 2000 - 0.5) < 0.05


def test_stratified_is_scan_only(spark):
    """The whole stratified sample is one filtered scan: no Exchange."""
    from ocr_spark.plans import checks

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = stratified_sample(df, "lang", {"en": 0.5})
    checks.assert_no_exchange(out, "stratified_sample")


def test_corpus_mix_budget_fill(spark):
    rows = [(i, f"src{i % 3}", 10 + (i * 7) % 50) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    budgets = {"src0": 500, "src1": 1200}
    out = corpus_mix(df, budgets).collect()
    assert {r["source"] for r in out} == set(budgets)
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, budget in budgets.items():
        rows_s = sorted(by_src[src], key=lambda r: r["cum_tokens"])
        total = rows_s[-1]["cum_tokens"]
        # budget reached, and the set is minimal: dropping the last doc
        # falls below budget
        assert total >= budget
        assert total - rows_s[-1]["n_tokens"] < budget
        # every prefix doc is kept: cum_tokens are consistent partial sums
        run = 0
        for r in rows_s:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run


def test_corpus_mix_budget_monotone(spark):
    """A bigger budget keeps a superset (same deterministic hash order)."""
    rows = [(i, "s", 5) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    small = {r["doc_id"] for r in corpus_mix(df, {"s": 100}).collect()}
    big = {r["doc_id"] for r in corpus_mix(df, {"s": 300}).collect()}
    assert small < big
    assert len(small) == 20 and len(big) == 60  # exact fill at 5 tok/doc


def test_corpus_mix_presample_preserves_prefix(spark):
    """The documented 10^12-row recipe — deterministic_sample pre-filter,
    then corpus_mix — selects the SAME docs as the plain window, because
    both order by the same hash key and the pre-sample keeps every key
    below its threshold (a prefix superset of the budget winners)."""
    rows = [(i, "s", 50) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    full = _ids(corpus_mix(df, {"s": 1000}))
    # 1000 tokens / (50/doc * 2000 docs) = 1% of the corpus; 10x headroom
    pre = deterministic_sample(df, 0.1)
    assert _ids(corpus_mix(pre, {"s": 1000})) == full


def test_sample_key_matches_duckdb(spark):
    """Cross-engine bit-parity of the sampling key itself (the driver gate
    checks the full queries; this pins the primitive)."""
    import duckdb

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", sample_key(F.col("doc_id")).alias("k")
        ).collect()
    }
    want = {
        row[0]: row[1]
        for row in duckdb.sql(
            "select i, substr(md5('42|' || cast(i as varchar)), 1, 12) "
            "from range(100) t(i)"
        ).fetchall()
    }
    assert got == want


def test_leakage_safe_split_never_straddles_clusters(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.graph import neardup_clusters
    from ocr_spark.operators.sampling import leakage_safe_split

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "a bigint, b bigint"
    )
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    out = leakage_safe_split(docs, neardup_clusters(pairs))
    assert out.count() == 200
    # every component maps to exactly one split
    straddle = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddle == 0
    # paired docs share their component's split
    by_id = {r["doc_id"]: r["split"] for r in out.collect()}
    for i in range(0, 40, 2):
        assert by_id[i] == by_id[i + 1]
    # all three splits appear and train dominates
    from collections import Counter

    c = Counter(by_id.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
