"""Connected-components correctness: the large-star/small-star iteration
must reproduce exact union-find semantics on adversarial topologies —
deep chains (diameter >> rounds), hubs, cliques, random graphs, messy
inputs (duplicates, reversed edges, self-loops)."""

from __future__ import annotations

import random

import pytest

from ocr_spark.operators.graph import connected_components, neardup_clusters


def _union_find(edges):
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _spark_cc(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "a bigint, b bigint"
    )
    if not edges:
        df = df.where("a <> a")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


TOPOLOGIES = {
    # deep chain: diameter 60 — naive O(diameter) propagation would need
    # 60 rounds; star contraction must finish well inside max_iter=50
    "chain": [(i, i + 1) for i in range(60)],
    "star_hub_is_max": [(100, i) for i in range(100)],
    "two_cliques_bridge": (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(4, 10)]
    ),
    "disjoint_pairs": [(i, i + 1000) for i in range(0, 40, 2)],
    "messy_input": [(3, 3), (1, 2), (2, 1), (2, 3), (3, 2), (7, 7)],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_cc_matches_union_find(spark, name):
    edges = TOPOLOGIES[name]
    expected = _union_find([(a, b) for a, b in edges if a != b])
    got = _spark_cc(spark, edges)
    assert got == expected, name


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(40, 140))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_cc(spark, edges) == _union_find(edges), trial


def test_neardup_clusters_shape(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a bigint, b bigint"
    )
    rows = {r["doc_id"]: r for r in neardup_clusters(df).collect()}
    assert rows[1]["component"] == 1 and rows[1]["cluster_size"] == 3
    assert rows[3]["component"] == 1
    assert rows[11]["component"] == 10 and rows[11]["cluster_size"] == 2
    assert len(rows) == 5


def test_canonical_select_keeps_best_scored(spark):
    from ocr_spark.operators.graph import canonical_select

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a bigint, b bigint"
    )
    # doc 2 best in cluster {1,2,3}; tie in {10,11} → min doc_id wins
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9 - 2), (10, 4), (11, 4)],
        "doc_id bigint, score bigint",
    )
    got = {
        r["component"]: (r["keep_doc_id"], r["cluster_size"], r["best_score"])
        for r in canonical_select(neardup_clusters(pairs), scores).collect()
    }
    assert got == {1: (2, 3, 9), 10: (10, 2, 4)}
