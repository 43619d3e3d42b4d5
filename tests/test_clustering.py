"""Distributed spherical k-means (operators/clustering.py): model equality
against a driver-side implementation of the SAME quantized-Lloyd's rule,
partitioning invariance (the property the integer-quantized partial sums
exist for), and blob recovery on crafted well-separated clusters.  The
single-step kmeans_assign SQL parity lives in test_driver_contract.py."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.clustering import (
    _QSCALE,
    init_centroids,
    kmeans_assign,
    kmeans_cluster,
)


def _blobs(n_per=20, k=3, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 5.0
    vecs, labels = [], []
    for c in range(k):
        pts = centers[c] + rng.normal(size=(n_per, dim)) * 0.05
        vecs.extend(pts.tolist())
        labels.extend([c] * n_per)
    ids = list(range(len(vecs)))
    return ids, vecs, labels


def _model_lloyd(ids, vecs, cent, iters):
    """Driver-side twin of kmeans_cluster's quantized update rule."""
    mat = np.array(vecs, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    cent = cent.copy()
    for _ in range(iters):
        cl = np.argmax(np.round(mat @ cent.T, 12), axis=1)
        new = cent.copy()
        for ci in range(len(cent)):
            members = mat[cl == ci]
            if len(members):
                qs = np.round(members * _QSCALE).astype(np.int64).sum(axis=0)
                v = qs.astype(np.float64) / (_QSCALE * len(members))
                n = np.linalg.norm(v)
                if n > 0:
                    new[ci] = v / n
        cent = new
    final = np.argmax(np.round(mat @ cent.T, 12), axis=1)
    return {i: int(c) for i, c in zip(ids, final)}, cent


@pytest.fixture(scope="module")
def emb_df(spark):
    ids, vecs, labels = _blobs()
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )
    return df, ids, vecs, labels


def test_kmeans_matches_model_and_recovers_blobs(spark, emb_df):
    df, ids, vecs, labels = emb_df
    assigned, cent = kmeans_cluster(df, k=3, iters=5)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    model_cent = init_centroids(df, k=3)
    expect, expect_cent = _model_lloyd(ids, vecs, model_cent, iters=5)
    assert got == expect
    assert np.array_equal(cent, expect_cent)  # bit-identical centroids

    # blob recovery: each true blob maps to exactly one learned cluster
    by_blob = {}
    for i, lab in zip(ids, labels):
        by_blob.setdefault(lab, set()).add(got[i])
    assert all(len(cs) == 1 for cs in by_blob.values())
    assert len({next(iter(cs)) for cs in by_blob.values()}) == 3


def test_kmeans_is_partitioning_invariant(spark, emb_df):
    df, *_ = emb_df
    a, cent_a = kmeans_cluster(df.repartition(7), k=3, iters=4)
    b, cent_b = kmeans_cluster(df.repartition(2), k=3, iters=4)
    assert np.array_equal(cent_a, cent_b)
    ra = sorted(map(tuple, a.select("vec_id", "cluster").collect()))
    rb = sorted(map(tuple, b.select("vec_id", "cluster").collect()))
    assert ra == rb


def test_kmeans_assign_tie_break_and_rounding(spark):
    # two identical centroids: every vector ties at round-4 → cluster 0
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.6, 0.8]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cent = np.array([[0.6, 0.8], [0.6, 0.8]], dtype=np.float64)
    out = {r["vec_id"]: r for r in kmeans_assign(df, cent).collect()}
    assert all(r["cluster"] == 0 for r in out.values())
    assert out[1]["sim"] == 1.0


def test_empty_cluster_keeps_centroid(spark):
    # k=2 over two identical vectors: one centroid gets all members, the
    # other keeps its seed position (no NaN, no crash)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    assigned, cent = kmeans_cluster(df, k=2, iters=3)
    rows = assigned.collect()
    assert len(rows) == 2
    assert not np.isnan(cent).any()


def test_semantic_dedup_pairs_within_clusters(spark):
    from ocr_spark.operators.clustering import semantic_dedup

    # two tight blobs far apart + one isolated point: near-identical
    # vectors inside a blob pair up; nothing pairs across blobs
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),    # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.01, 0.999, 0.0]),    # near-dup of 2
        (4, [0.0, 0.0, 1.0]),       # isolated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in semantic_dedup(df, k=3, threshold=0.95, iters=3).collect()
    }
    assert set(got) == {(0, 1), (2, 3)}
    assert all(s >= 0.95 for s in got.values())


def test_semantic_dedup_matches_bruteforce_within_cluster(spark):
    from ocr_spark.operators.clustering import (
        init_centroids,
        kmeans_assign,
        semantic_dedup,
    )

    ids, vecs, _ = _blobs(n_per=15, k=3, dim=6, seed=11)
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )
    thr = 0.5
    got = {
        (r["a"], r["b"]): (r["cluster"], r["sim"])
        for r in semantic_dedup(df, k=3, threshold=thr).collect()
    }
    # brute force: same seed-centroid assignment, all within-cluster pairs
    asg = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, init_centroids(df, 3)).collect()
    }
    mat = np.array(vecs, dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    expect = {}
    for i in ids:
        for j in ids:
            if i < j and asg[i] == asg[j]:
                s = round(float(mat[i] @ mat[j]), 4)
                if s >= thr:
                    expect[(i, j)] = (asg[i], s)
    assert got == expect
    assert len(got) > 0  # the gate is exercised
