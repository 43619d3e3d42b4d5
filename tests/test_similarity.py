"""ANN quality tests: the approximate variants (LSH, IVF) must achieve
usable recall against the exact brute-force top-k, deterministically."""

from __future__ import annotations

import pytest

from ocr_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _topk_map(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["vec_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx, exact):
    hits = tot = 0
    for q, nbrs in exact.items():
        tot += len(nbrs)
        hits += len(nbrs & approx.get(q, set()))
    return hits / max(tot, 1)


def test_ivf_recall_and_determinism(spark, emb):
    exact = _topk_map(cosine_topk_bruteforce(emb, emb, k=5))
    ivf1 = _topk_map(cosine_topk_ivf(emb, emb, k=5, n_centroids=16, n_probe=6))
    ivf2 = _topk_map(cosine_topk_ivf(emb, emb, k=5, n_centroids=16, n_probe=6))
    assert ivf1 == ivf2                      # seeded → deterministic
    r = _recall(ivf1, exact)
    assert r >= 0.6, f"IVF recall too low: {r:.3f}"
    # more probes → recall does not decrease
    ivf_all = _topk_map(cosine_topk_ivf(emb, emb, k=5, n_centroids=16, n_probe=16))
    assert _recall(ivf_all, exact) >= r
    # full probing is exhaustive → exact
    assert _recall(ivf_all, exact) == 1.0


def test_ivf_trains_on_bounded_sample(spark, emb):
    """The IVF quantizer must never collect the full index to the driver:
    the training matrix is capped at train_sample rows by construction,
    and the capped build still works end-to-end."""
    from ocr_spark.operators.similarity import _training_sample_matrix

    n = emb.count()
    cap = max(10, n // 4)
    mat = _training_sample_matrix(emb, "embedding", cap, seed=42)
    assert len(mat) <= cap < n
    # end-to-end with the capped quantizer: full probing is still exhaustive
    exact = _topk_map(cosine_topk_bruteforce(emb, emb, k=5))
    ivf = _topk_map(
        cosine_topk_ivf(
            emb, emb, k=5, n_centroids=8, n_probe=8, train_sample=cap
        )
    )
    assert _recall(ivf, exact) == 1.0


def test_lsh_recall(spark, emb):
    exact = _topk_map(cosine_topk_bruteforce(emb, emb, k=5))
    lsh = _topk_map(cosine_topk_lsh(emb, emb, k=5))
    r = _recall(lsh, exact)
    assert r >= 0.6, f"LSH recall too low: {r:.3f}"
