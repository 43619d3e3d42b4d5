"""CCNet perplexity bucketing (operators/quality.py ccnet_partition)."""

from ocr_spark.operators.quality import ccnet_partition

REF = [(100, "the quick brown fox jumps over the lazy dog " * 3)]
# 8 docs with increasingly reference-unlike text → monotone avg_nll
DOCS = [
    (1, "the quick brown fox jumps"),
    (2, "the quick brown fox zz1"),
    (3, "the quick brown zz1 zz2"),
    (4, "the quick zz1 zz2 zz3"),
    (5, "the zz1 zz2 zz3 zz4"),
    (6, "the zz1 zz2 zz3 zz4 zz5 zz6"),
    (7, "qq1 qq2 qq3 qq4 qq5"),
    (8, "the vv1 vv2 vv3 vv4 vv5 vv6 vv7 vv8 vv9"),
]


def test_ccnet_partition_buckets_and_keep(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    ref = spark.createDataFrame(REF, "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in ccnet_partition(docs, ref).collect()}
    assert len(rows) == 8
    # buckets respect the nll order: head docs all score <= every middle
    # doc, middle <= tail
    by_bucket = {}
    for r in rows.values():
        by_bucket.setdefault(r["bucket"], []).append(r["avg_nll"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # keep policy: all of head, none of tail, a doc_id-hash subset of middle
    for r in rows.values():
        if r["bucket"] == "head":
            assert r["kept"]
        elif r["bucket"] == "tail":
            assert not r["kept"]
    # determinism under repartition
    again = {
        r["doc_id"]: (r["bucket"], r["kept"])
        for r in ccnet_partition(docs.repartition(5), ref).collect()
    }
    assert again == {
        d: (r["bucket"], r["kept"]) for d, r in rows.items()
    }


def test_ccnet_partition_approx_mode_tolerance(spark):
    """approx=True swaps the exact full-sort percentile for the GK sketch
    (the 10^12-row scale path).  avg_nll is identical in both modes; the
    sketch's cutoff is a data value within 1/accuracy rank of the exact
    interpolated cutoff, so bucket labels may flip ONLY for the <=1 doc
    per cutoff sitting between the two candidate cut values."""
    # 101 docs with strictly increasing reference-unlikeness
    data = [
        (i, "the quick brown fox " * max(1, 20 - i // 6) + " ".join(
            f"zz{i}x{j}" for j in range(i // 4)
        ))
        for i in range(1, 102)
    ]
    docs = spark.createDataFrame(data, "doc_id bigint, text string")
    ref = spark.createDataFrame(REF, "doc_id bigint, text string")
    exact = {r["doc_id"]: r for r in ccnet_partition(docs, ref).collect()}
    approx = {
        r["doc_id"]: r
        for r in ccnet_partition(docs, ref, approx=True).collect()
    }
    assert set(exact) == set(approx)
    # scoring itself is mode-independent
    for d in exact:
        assert exact[d]["avg_nll"] == approx[d]["avg_nll"]
        assert exact[d]["n_tokens"] == approx[d]["n_tokens"]
    # at most one doc per cutoff may change bucket
    flips = [d for d in exact if exact[d]["bucket"] != approx[d]["bucket"]]
    assert len(flips) <= 2, flips
    # keep policy stays bucket-consistent in approx mode
    for r in approx.values():
        if r["bucket"] == "head":
            assert r["kept"]
        elif r["bucket"] == "tail":
            assert not r["kept"]
