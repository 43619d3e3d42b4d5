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


def test_neardup_lsh_subset_and_recall(spark, emb):
    """LSH-blocked near-dup: (1) NO false positives — every emitted pair
    is in the exact pair set with the identical rounded sim (candidates
    are re-checked exactly); (2) recall vs the exact operator is usable
    at the default tuning; (3) deterministic across runs."""
    from ocr_spark.operators.similarity import (
        embedding_neardup_exact,
        embedding_neardup_lsh,
    )

    # sf0.001's near-uniform embeddings have no pairs above 0.5; 0.35
    # yields ~260 true pairs with per-pair collision prob ≈0.84 at the
    # default 4-plane/12-table tuning
    thr = 0.35
    exact = {
        (r["a"], r["b"]): r["sim"]
        for r in embedding_neardup_exact(emb, threshold=thr).collect()
    }
    got1 = {
        (r["a"], r["b"]): r["sim"]
        for r in embedding_neardup_lsh(emb, threshold=thr).collect()
    }
    got2 = {
        (r["a"], r["b"]): r["sim"]
        for r in embedding_neardup_lsh(emb, threshold=thr).collect()
    }
    assert got1 == got2, "LSH near-dup must be deterministic"
    assert exact, "fixture must contain near-dup pairs at this threshold"
    for pair, sim in got1.items():
        assert pair in exact and exact[pair] == sim, pair
    recall = len(got1) / len(exact)
    assert recall >= 0.6, f"recall {recall:.3f} too low at default tuning"


def test_pq_recall_and_determinism(spark, emb):
    """PQ + exact-refine ANN: deterministic, usable recall at the default
    shortlist, recall monotone in shortlist size, and shortlist=N degrades
    to exact brute-force (the refine step scores true cosines, so a
    full-length shortlist IS the exact result)."""
    from ocr_spark.operators.similarity import cosine_topk_pq

    exact = _topk_map(cosine_topk_bruteforce(emb, emb, k=5))
    pq1 = _topk_map(cosine_topk_pq(emb, emb, k=5))
    pq2 = _topk_map(cosine_topk_pq(emb, emb, k=5))
    assert pq1 == pq2, "PQ must be deterministic"
    r = _recall(pq1, exact)
    assert r >= 0.6, f"PQ recall too low: {r:.3f}"
    n = emb.count()
    pq_wide = _topk_map(cosine_topk_pq(emb, emb, k=5, shortlist=2 * n))
    assert _recall(pq_wide, exact) >= r
    assert _recall(pq_wide, exact) == 1.0


def test_pq_refine_reports_true_cosines(spark, emb):
    """Every (query, neighbor) pair PQ reports must carry the exact
    brute-force sim for that pair — quantization may only cost recall,
    never precision of the reported score."""
    from ocr_spark.operators.similarity import cosine_topk_pq

    exact_all = {
        (r["vec_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_bruteforce(emb, emb, k=500).collect()
    }
    for r in cosine_topk_pq(emb, emb, k=5).collect():
        key = (r["vec_id"], r["neighbor_id"])
        assert key in exact_all and exact_all[key] == r["sim"], key


def test_pq_adc_chunking_is_exact(spark, emb):
    """The ADC scan's N-chunked running shortlist merge is exact: a tiny
    chunk must reproduce the default results bit-for-bit."""
    from ocr_spark.operators.similarity import cosine_topk_pq

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(cosine_topk_pq(emb, emb, k=5, chunk=7)) == rows(
        cosine_topk_pq(emb, emb, k=5)
    )


def test_pq_asserts_its_broadcast_ceiling(spark, emb):
    """cosine_topk_pq is the MID tier: the compressed-code collect is
    BOUNDED and the bound is enforced, not assumed — over the limit it
    must refuse with a pointer at the unbounded IVF-PQ tier instead of
    silently materializing O(N) driver state."""
    import pytest

    from ocr_spark.operators.similarity import cosine_topk_pq

    with pytest.raises(ValueError, match="cosine_topk_ivfpq"):
        cosine_topk_pq(emb, emb, k=5, max_index_rows=3)


def test_chunked_scoring_is_exact(spark, emb):
    """The memory-bounding chunk merge inside the group scorers is
    exact: a tiny chunk size (forcing many merge rounds) must reproduce
    the default single-chunk results bit-for-bit for both the top-k and
    the near-dup kernels."""
    from ocr_spark.operators.similarity import (
        cosine_topk_ivf,
        cosine_topk_lsh,
        embedding_neardup_lsh,
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(cosine_topk_lsh(emb, emb, k=5, chunk=3)) == rows(
        cosine_topk_lsh(emb, emb, k=5)
    )
    assert rows(
        cosine_topk_ivf(emb, emb, k=5, n_centroids=8, n_probe=8, chunk=3)
    ) == rows(cosine_topk_ivf(emb, emb, k=5, n_centroids=8, n_probe=8))
    assert rows(embedding_neardup_lsh(emb, threshold=0.35, chunk=3)) == rows(
        embedding_neardup_lsh(emb, threshold=0.35)
    )


def test_ivfpq_recall_exactness_and_chunking(spark, emb):
    """IVF-PQ (the no-broadcast unbounded-index tier): deterministic,
    usable recall at defaults, reported sims are true cosines, and the
    full probe + full shortlist degrades to exact brute-force — the same
    exactness seam that oracle-gates IVF and PQ."""
    from ocr_spark.operators.similarity import cosine_topk_ivfpq

    exact = _topk_map(cosine_topk_bruteforce(emb, emb, k=5))
    a1 = _topk_map(cosine_topk_ivfpq(emb, emb, k=5))
    a2 = _topk_map(cosine_topk_ivfpq(emb, emb, k=5))
    assert a1 == a2, "IVF-PQ must be deterministic"
    r = _recall(a1, exact)
    assert r >= 0.5, f"IVF-PQ recall too low: {r:.3f}"
    n = emb.count()
    full = cosine_topk_ivfpq(emb, emb, k=5, n_probe=16, shortlist=n)
    assert sorted(tuple(x) for x in full.collect()) == sorted(
        tuple(x) for x in cosine_topk_bruteforce(emb, emb, k=5).collect()
    )
    # ADC chunk merge is exact: tiny chunk reproduces defaults bit-for-bit
    tiny = cosine_topk_ivfpq(emb, emb, k=5, chunk=7)
    assert sorted(tuple(x) for x in tiny.collect()) == sorted(
        tuple(x) for x in cosine_topk_ivfpq(emb, emb, k=5).collect()
    )


def test_ivfpq_reports_true_cosines(spark, emb):
    """Every pair IVF-PQ reports must carry the exact brute-force sim —
    quantization may only cost recall, never score precision."""
    from ocr_spark.operators.similarity import cosine_topk_ivfpq

    exact_all = {
        (r["vec_id"], r["neighbor_id"]): r["sim"]
        for r in cosine_topk_bruteforce(emb, emb, k=500).collect()
    }
    for r in cosine_topk_ivfpq(emb, emb, k=5).collect():
        key = (r["vec_id"], r["neighbor_id"])
        assert key in exact_all and exact_all[key] == r["sim"], key


def test_bruteforce_asserts_its_collect_ceiling(spark, emb):
    """The exact tier's full-index collect is bounded and enforced, like
    the PQ tier — over the limit it refuses with a pointer at the
    distributed tiers instead of materializing O(N) on the driver."""
    import pytest

    from ocr_spark.operators import similarity as S

    with pytest.raises(ValueError, match="distributed"):
        S._normalized_matrix(emb, "vec_id", "embedding", max_rows=3)
