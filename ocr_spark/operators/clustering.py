"""Distributed embedding clustering for corpus curation — the semantic
bucketing stage (SemDeDup / topic-balancing shape, PAPERS.md): spherical
k-means over the FULL embedding table, with every per-document step
distributed and only O(k·dim) state ever on the driver.

This is deliberately a different animal from the coarse quantizers in
``operators/similarity.py`` (IVF/PQ train small codebooks on a bounded
SAMPLE, driver-side): here the whole corpus participates in every Lloyd
iteration, so the iteration itself must be a distributed narrow pass.

Scale + determinism design (the two constraints that shape everything):

* **Per iteration**: ONE ``mapInPandas`` pass — each Arrow batch assigns
  its vectors to the broadcast centroids with a float64 BLAS matmul and
  emits per-cluster partial ``(count, sum)`` rows.  The emitted volume is
  O(batches × k × dim), never O(N); the driver reduces the partials to
  k new centroids.  This is the treeAggregate shape Spark's own MLlib
  k-means uses, expressed over the DataFrame/Arrow path.
* **Order-invariant arithmetic**: float partial sums would make centroids
  (and then assignments) depend on partition boundaries and reduce order.
  Instead each vector's contribution is quantized to int64 micro-units
  (``round(x · 2^40)``, the lm_quality micro-nat trick applied to
  geometry) — integer sums are exact and commutative, so the learned
  centroids are bit-identical for ANY partitioning of the input.  The
  quantization error (≤ 2^-41 per coordinate per member) is ~9 orders of
  magnitude below the data's own noise.
* **Per-row assignment is partition-independent**: a row's cluster is a
  function of (its vector, the centroid matrix) only — numpy matmul row
  results do not depend on batch composition — so the final labeling is
  deterministic end-to-end.  Ties (exactly equal similarity) resolve to
  the lowest centroid index via ``np.argmax`` first-max semantics; the
  single-step ``kmeans_assign`` driver query rounds similarities to 4
  decimals and resolves ties by centroid id so its DuckDB twin agrees
  bit-for-bit (same idiom as the embedding_neardup oracle).

Reference tie-in: the reference clusters nothing (its HDBSCAN usage is
inside the native segmenter, SURVEY §2.10 G3 — n/a by design); this
operator is part of the beyond-reference training-data pipeline surface.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: int64 quantization scale for centroid partial sums (2^40): exact,
#: commutative integer accumulation — see module docstring.
_QSCALE = float(1 << 40)

_PARTIAL_SCHEMA = "cluster int, n long, qsum array<long>"
_ASSIGN_SCHEMA = "vec_id long, cluster int, sim double"


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def init_centroids(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic seeding: the k vectors whose ``md5('c|' || id)`` sorts
    smallest — a pseudo-random, engine-reproducible pick (the
    deterministic-sampling trick from operators/sampling.py).  Collects
    exactly k rows; the index size never matters."""
    rows = (
        embeddings.select(
            F.md5(F.concat(F.lit("c|"), F.col(id_col).cast("string")).cast("binary")).alias("_h"),
            vec_col,
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    return _norm_rows(np.array([r[vec_col] for r in rows], dtype=np.float64))


def kmeans_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_sim: int | None = 4,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid — one narrow
    mapInPandas stage over broadcast centroids, no shuffle, no join (k
    centroid rows never enter the plan, so no NLJ/cartesian either).

    ``round_sim`` rounds similarities before the argmax with ties to the
    LOWEST cluster index — that makes the single-step assignment exactly
    reproducible in the DuckDB twin.  Pass ``None`` for the raw float64
    argmax used inside Lloyd iterations.
    Output: ``vec_id, cluster, sim`` (sim always rounded to 4 for display).
    """
    spark = embeddings.sparkSession
    b_cent = spark.sparkContext.broadcast(np.ascontiguousarray(centroids))
    rs = round_sim

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = b_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = _norm_rows(
                np.array(list(pdf[vec_col]), dtype=np.float64)
            )
            sims = mat @ cent.T
            if rs is not None:
                sims = np.round(sims, rs)
            cl = np.argmax(sims, axis=1)
            best = sims[np.arange(len(cl)), cl]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cluster": cl.astype(np.int32),
                    "sim": np.round(best, 4),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        fn, _ASSIGN_SCHEMA
    )


def kmeans_cluster(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Full distributed spherical k-means (Lloyd's): deterministic md5
    seeding, then ``iters`` rounds of [distributed assign + quantized
    partial-sum reduce → new centroids].  Returns the final assignment
    DataFrame (lazy — one more narrow pass when consumed) and the learned
    centroid matrix.

    Driver state per round: #partition-batches × k rows of (count,
    int64-sum) — megabytes at worst; the embedding table itself never
    leaves the executors.
    """
    spark = embeddings.sparkSession
    cent = init_centroids(embeddings, k, id_col, vec_col)
    src = embeddings.select(id_col, vec_col)

    for _ in range(iters):
        b_cent = spark.sparkContext.broadcast(np.ascontiguousarray(cent))
        dim = cent.shape[1]

        def partials(
            it: Iterator[pd.DataFrame], _bc=b_cent, _dim=dim
        ) -> Iterator[pd.DataFrame]:
            c = _bc.value
            for pdf in it:
                if not len(pdf):
                    continue
                mat = _norm_rows(
                    np.array(list(pdf[vec_col]), dtype=np.float64)
                )
                # round-12 before argmax: BLAS dgemm blocking may differ
                # between batch shapes in the last bits; rounding far below
                # data precision makes the label a pure function of the
                # (vector, centroids) pair — batch/partition invariant.
                cl = np.argmax(np.round(mat @ c.T, 12), axis=1)
                out = []
                for ci in np.unique(cl):
                    members = mat[cl == ci]
                    qsum = np.round(members * _QSCALE).sum(
                        axis=0, dtype=np.int64
                    )
                    out.append((int(ci), len(members), qsum.tolist()))
                yield pd.DataFrame(
                    out, columns=["cluster", "n", "qsum"]
                )

        rows = src.mapInPandas(partials, _PARTIAL_SCHEMA).collect()
        # Python-int accumulation: per-BATCH int64 partials cannot overflow
        # (batch size × 2^40 ≪ 2^63) but a 10^12-member cluster's total
        # would — unbounded ints keep the reduce exact at any scale.
        counts = [0] * len(cent)
        sums = [[0] * dim for _ in range(len(cent))]
        for r in rows:
            ci = r["cluster"]
            counts[ci] += r["n"]
            row = sums[ci]
            for j, q in enumerate(r["qsum"]):
                row[j] += q
        new = cent.copy()
        for ci in range(len(cent)):
            if counts[ci]:
                v = np.array(
                    [s / (_QSCALE * counts[ci]) for s in sums[ci]],
                    dtype=np.float64,
                )
                n = np.linalg.norm(v)
                if n > 0:
                    new[ci] = v / n
        cent = new

    return kmeans_assign(embeddings, cent, id_col, vec_col, round_sim=12), cent


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, PAPERS.md): drop documents whose
    embeddings are near-identical WITHIN a semantic cluster — the cluster
    assignment bounds the pairwise work, turning O(N²) cosine comparison
    into Σ O(|cluster|²), the whole point of the method at 100 TB scale.

    Pipeline: k-means assignment (``iters`` Lloyd rounds; 0 = seed
    centroids only, which keeps the single-step SQL oracle exact) →
    per-cluster pair generation via a cluster-key self-join → exact
    cosine ≥ threshold → keep the smaller ``vec_id`` of each pair.

    Output: one row per duplicate pair — ``cluster, a, b, sim`` with
    a < b (b is the drop candidate).  Scale shape: both join sides
    shuffle on the cluster key only; pair scoring is the per-group
    BLAS-matmul pattern from operators/similarity.py when clusters are
    large — here the exact per-pair form stays relational because the
    oracle gates it (the LSH-blocked scorer remains the documented
    degenerate-cluster escape hatch).
    """
    assigned = (
        kmeans_assign(
            embeddings,
            init_centroids(embeddings, k, id_col, vec_col),
            id_col,
            vec_col,
            round_sim=4,
        )
        if iters == 0
        else kmeans_cluster(embeddings, k, iters, id_col, vec_col)[0]
    )
    vecs = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    sided = assigned.join(vecs, F.col("vec_id") == F.col("vid")).select(
        "cluster", "vec_id", "vec"
    )

    # per-cluster BLAS scoring, NOT a per-pair HOF join condition — the
    # §3.9 lesson from BENCH/BASELINE.md (group matmul measured 49-100×
    # over join+aggregate(zip_with) expressions).  Row-block chunking
    # bounds the sim-matrix memory for degenerate clusters.
    thr = float(threshold)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        mat = _norm_rows(np.array(list(pdf["vec"]), dtype=np.float64))
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        cl = int(pdf["cluster"].iloc[0])
        out_a, out_b, out_s = [], [], []
        chunk = max(1, min(len(ids), 4_000_000 // max(1, len(ids))))
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            sims = np.round(mat[lo:hi] @ mat.T, 4)
            for i in range(lo, hi):
                row = sims[i - lo, i + 1 :]
                hits = np.nonzero(row >= thr)[0]
                if len(hits):
                    out_a.extend([ids[i]] * len(hits))
                    out_b.extend(ids[i + 1 + hits])
                    out_s.extend(row[hits])
        return pd.DataFrame(
            {
                "cluster": np.full(len(out_a), cl, dtype=np.int32),
                "a": np.array(out_a, dtype=np.int64),
                "b": np.array(out_b, dtype=np.int64),
                "sim": np.array(out_s, dtype=np.float64),
            }
        )

    return sided.groupBy("cluster").applyInPandas(
        score, "cluster int, a long, b long, sim double"
    )
