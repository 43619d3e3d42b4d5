"""Deterministic per-epoch training-order shuffle (operators/sampling.py
epoch_shuffle): reproducibility, per-epoch independence, dense in-shard
ranks, and the no-global-sort plan shape."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.sampling import epoch_shuffle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 200).select(F.col("id").alias("doc_id"))


def test_reproducible_across_runs_and_partitionings(spark, docs):
    a = epoch_shuffle(docs, epochs=2, n_shards=4).collect()
    b = epoch_shuffle(docs.repartition(7), epochs=2, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_epochs_are_distinct_permutations(spark, docs):
    rows = epoch_shuffle(docs, epochs=2, n_shards=1).collect()
    orders = {}
    for e in (0, 1):
        orders[e] = [
            r["doc_id"] for r in sorted(
                (r for r in rows if r["epoch"] == e), key=lambda r: r["pos"]
            )
        ]
    # each epoch is a full permutation of the corpus, and they differ
    assert sorted(orders[0]) == sorted(orders[1]) == list(range(200))
    assert orders[0] != orders[1]


def test_pos_dense_within_each_shard(spark, docs):
    rows = epoch_shuffle(docs, epochs=1, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert len(by_shard) == 4  # md5-uniform keys hit every shard at n=200
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert sum(len(v) for v in by_shard.values()) == 200


def test_seed_changes_the_order(spark, docs):
    a = epoch_shuffle(docs, epochs=1, n_shards=1, seed=1).collect()
    b = epoch_shuffle(docs, epochs=1, n_shards=1, seed=2).collect()
    oa = [r["doc_id"] for r in sorted(a, key=lambda r: r["pos"])]
    ob = [r["doc_id"] for r in sorted(b, key=lambda r: r["pos"])]
    assert oa != ob and sorted(oa) == sorted(ob)


def test_no_global_sort_in_plan(spark, docs):
    out = epoch_shuffle(docs, epochs=2, n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rank window must shuffle on (epoch, shard) — a global
    # row_number would plan Exchange SinglePartition instead
    assert "SinglePartition" not in plan
    import re

    assert re.search(r"hashpartitioning\(epoch#\d+L?, shard#\d+L?", plan)
