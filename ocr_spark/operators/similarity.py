"""Similarity search over an embedding column (``array<float>``).

Three tiers, per the training-data-pipeline scope:

* **cosine_topk_bruteforce** — exact top-k.  The query side stays a
  DataFrame; the *index* side (all candidate vectors) is collected once,
  L2-normalized into a single numpy matrix, broadcast to executors, and each
  Arrow batch of queries does one BLAS matmul (``Q @ X.T``) + ``argpartition``
  top-k.  This is the right shape when the index fits executor memory
  (≤ a few GB = tens of millions of vectors at 64-dim f32); queries stream
  through at any scale — one narrow ``mapInPandas`` stage, zero shuffle.
* **cosine_topk_lsh** — random-hyperplane LSH bucketing for when the index
  side itself is huge: both sides hash to sign-pattern buckets (multiple
  tables for recall), candidates join per bucket, exact cosine re-rank.
  Approximate (recall < 1) — benchmarked, not oracle-checked.
* **cosine_topk_pq** — product quantization: codebooks train on a bounded
  sample, the index PQ-encodes distributed to m code bytes per vector
  (dim·4/m× compression), ADC scoring over the broadcast *compressed*
  codes shortlists candidates, and an exact join + group-matmul re-rank
  reports true cosines.  Raises the broadcastable-index ceiling ~32× over
  brute-force; composes with the IVF cell layout beyond that.
* **cosine_topk_ivfpq** — that composition (IVFADC): residual-PQ codes live
  in a DISTRIBUTED inverted file (no O(N) broadcast or collect anywhere),
  queries probe cells, cell-local ADC shortlists, exact re-rank.  The
  unbounded-index tier.
* **embedding_neardup_exact** — all-pairs cosine ≥ threshold via block-nested
  matmul (relational blocking on vec_id ranges); exact, oracle-checkable.

Why no HNSW tier (deliberate): graph-based ANN builds and serves a
mutable pointer structure with data-dependent traversal — a shape that
fights Spark's BSP execution (per-query graph walks need either a
broadcast of the whole graph, which reintroduces the O(index) ceiling
IVF-PQ removes, or fine-grained remote lookups Spark does not offer).
The IVF/PQ family reaches the same recall/latency regime with
partition-parallel scans, which is the execution model this engine is
built on; an HNSW serving layer belongs in the online system that
CONSUMES these tables, not in the batch engine that builds them.

Determinism note for oracle parity: all dot products are computed in
float64 after an exact float32→float64 cast, similarity is rounded to 4
decimals, and rankings tie-break on neighbor id — so numpy-vs-DuckDB
last-ulp differences cannot flip results.

Reference tie-in: the reference's only similarity surface is
SequenceMatcher.ratio() (server/src/evaluate.py:5-16) and ES fuzzy search
(server/src/elastic_search.py:158-189) — both replaced by real vector
search here (SURVEY.md §2.8 F14/F15).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Broadcast-tier ceiling for the exact/bruteforce index collect — the
#: bound is ENFORCED (the cosine_topk_pq discipline), not assumed.  At
#: dim 64 float64 this is ~5 GB of driver matrix; raise deliberately on
#: a bigger driver, or use the tiers that never collect the index
#: (embedding_neardup_lsh / cosine_topk_lsh / cosine_topk_ivfpq).
BRUTEFORCE_MAX_INDEX_ROWS = 10_000_000


def _normalized_matrix(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    max_rows: int = BRUTEFORCE_MAX_INDEX_ROWS,
):
    """Collect (ids, L2-normalized float64 matrix) for the broadcast index.

    This is the exact small-index tier's defining step; the row bound is
    asserted so the tier cannot silently become an O(N) driver
    materialization at scale.  The bound is checked on the SAME scan
    that builds the index: collect under limit(max_rows+1) and raise if
    the limit was hit — no separate count() action recomputing the
    upstream pipeline, and the driver never holds more than max_rows+1
    rows either way."""
    rows = embeddings.select(id_col, vec_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"bruteforce/exact tier collects the full index: > "
            f"{max_rows} rows; use embedding_neardup_lsh / cosine_topk_lsh "
            f"/ cosine_topk_ivfpq, which keep the index distributed."
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def cosine_topk_bruteforce(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast normalized index matrix, matmul per
    Arrow batch.  Output: ``vec_id, neighbor_id, sim`` (sim rounded 4dp,
    rank ties broken by neighbor id asc)."""
    spark = queries.sparkSession
    ids, mat = _normalized_matrix(index, id_col, vec_col)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        X, Xids = b_mat.value, b_ids.value
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            sims = (q / qn) @ X.T                       # (B, N) float64
            sims = np.round(sims, 4)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            out_q, out_n, out_s = [], [], []
            for i in range(len(pdf)):
                row = sims[i]
                mask = Xids != qids[i] if exclude_self else np.ones_like(Xids, bool)
                cand = np.flatnonzero(mask)
                # top-k by (-sim, neighbor_id): lexsort is stable + exact
                order = np.lexsort((Xids[cand], -row[cand]))[:k]
                sel = cand[order]
                out_q.extend([qids[i]] * len(sel))
                out_n.extend(Xids[sel].tolist())
                out_s.extend(row[sel].tolist())
            yield pd.DataFrame(
                {"vec_id": out_q, "neighbor_id": out_n, "sim": out_s}
            )

    return queries.mapInPandas(fn, "vec_id bigint, neighbor_id bigint, sim double")


def embedding_neardup_exact(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup.
    Same broadcast-matmul kernel; each batch emits only its ≥-threshold
    pairs, so output volume is the true near-dup set."""
    spark = embeddings.sparkSession
    ids, mat = _normalized_matrix(embeddings, id_col, vec_col)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        X, Xids = b_mat.value, b_ids.value
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            sims = np.round((q / qn) @ X.T, 4)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            qi, xi = np.nonzero((sims >= thr) & (qids[:, None] < Xids[None, :]))
            yield pd.DataFrame(
                {
                    "a": qids[qi],
                    "b": Xids[xi],
                    "sim": sims[qi, xi],
                }
            )

    return embeddings.mapInPandas(fn, "a bigint, b bigint, sim double")


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 2048,
) -> DataFrame:
    """Near-duplicate pairs (a < b, cosine ≥ threshold) via LSH
    blocking — the 100 TB shape of embedding_neardup_exact: no index
    broadcast, both copies of the table shuffle on (table, bucket) only,
    pair generation is bucket-local, AQE splits hot buckets.  Same
    output schema and scoring (4 dp round, float64) as the exact
    operator; approximate only in RECALL — a pair hashed apart in every
    table is missed (never a false positive: every candidate is
    re-checked exactly).  Recall is tunable: fewer planes / more tables
    → higher recall at larger candidate volume.  High-threshold pairs —
    the dedup regime — are the ones random hyperplanes are least likely
    to split, so recall rises with the threshold."""
    spark = embeddings.sparkSession
    dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    b_planes = spark.sparkContext.broadcast(planes)

    bucketed = _lsh_bucketize(
        embeddings, b_planes, n_tables, n_planes, id_col, vec_col
    )
    thr = float(threshold)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        # one bucket of ONE table: ids unique; pairs a<b via the sorted
        # upper triangle of a single whole-bucket matmul
        ids = pdf["id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "a": np.array([], dtype=np.int64),
                    "b": np.array([], dtype=np.int64),
                    "sim": np.array([], dtype=np.float64),
                }
            )
        V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        o = np.argsort(ids)
        ids, V = ids[o], V[o]
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        Vn = V / n
        # chunked upper triangle: the pairwise matrix is bounded at
        # CHUNK·B doubles, so a degenerate hot bucket cannot OOM a task
        CHUNK = chunk
        out_a: list = []
        out_b: list = []
        out_s: list = []
        for c0 in range(0, len(ids), CHUNK):
            c1 = min(c0 + CHUNK, len(ids))
            S = np.round(Vn[c0:c1] @ Vn[c0:].T, 4)
            ri, cj = np.nonzero(S >= thr)
            keep = (cj + c0) > (ri + c0)  # strict upper triangle only
            ri, cj = ri[keep], cj[keep]
            out_a.extend(ids[ri + c0].tolist())
            out_b.extend(ids[cj + c0].tolist())
            out_s.extend(S[ri, cj].tolist())
        return pd.DataFrame(
            {
                "a": np.array(out_a, dtype=np.int64),
                "b": np.array(out_b, dtype=np.int64),
                "sim": np.array(out_s, dtype=np.float64),
            }
        )

    pairs = bucketed.groupBy("table", "bucket").applyInPandas(
        score, "a bigint, b bigint, sim double"
    )
    # the same pair can surface in several tables; sims are identical so
    # max() is a pure dedupe
    return pairs.groupBy("a", "b").agg(F.max("sim").alias("sim"))


def _lsh_bucketize(
    df: DataFrame,
    b_planes,
    n_tables: int,
    n_planes: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Random-hyperplane sign-pattern bucketing: each row lands in one
    bucket per table → rows (id, table, bucket, vec).  Shared by the LSH
    top-k and LSH near-dup operators."""

    def bucketize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = b_planes.value
        pows = (1 << np.arange(n_planes)).astype(np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = []
            for t in range(n_tables):
                signs = (v @ P[t].T) > 0                  # (B, planes)
                bucket = signs.astype(np.int64) @ pows
                out.append(
                    pd.DataFrame(
                        {
                            "id": pdf[id_col].to_numpy(dtype=np.int64),
                            "table": t,
                            "bucket": bucket,
                            "vec": pdf[vec_col],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return df.mapInPandas(
        bucketize, "id bigint, table int, bucket bigint, vec array<float>"
    )


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vec_id": np.array([], dtype=np.int64),
            "neighbor_id": np.array([], dtype=np.int64),
            "sim": np.array([], dtype=np.float64),
        }
    )


def _group_score_topk(
    tagged: DataFrame, group_cols: list[str], k: int, chunk: int = 2048
) -> DataFrame:
    """Per-group exact candidate scoring, Arrow-batched: ``tagged`` rows
    (group_cols…, id, vec, is_q) → one float64 matmul per group of its
    queries against its index rows, emitting each query's GROUP-LOCAL
    top-k (4 dp round, tie-break neighbor id asc, self excluded — the
    identical ranking rule as the brute-force kernel).  The caller
    merges groups with groupBy+window; that merge is lossless because a
    global top-k winner is necessarily a top-k winner inside its own
    group.  This replaces per-pair JVM HOF cosine expressions (measured
    ~100× slower than the whole-group BLAS matmul at sf0.1)."""

    CHUNK = chunk  # bounds the similarity matrix at |Q|·CHUNK doubles —
    # a degenerate hot bucket costs time, never memory (the group's ROWS
    # are O(B·dim); only the pairwise matrix is quadratic)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["is_q"] == 1]
        x = pdf[pdf["is_q"] == 0]
        if not len(q) or not len(x):
            return _empty_topk()
        Q = np.stack(q["vec"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        Qn = Q / qn
        qids = q["id"].to_numpy(dtype=np.int64)
        xids_all = x["id"].to_numpy(dtype=np.int64)
        xo = np.argsort(xids_all)
        x = x.iloc[xo]
        xids_all = xids_all[xo]
        # running per-query top-k across index chunks: exact, memory-
        # bounded (merge of per-chunk winners under the same ordering)
        best_n = [np.array([], dtype=np.int64) for _ in range(len(qids))]
        best_s = [np.array([], dtype=np.float64) for _ in range(len(qids))]
        for c0 in range(0, len(xids_all), CHUNK):
            xc = x.iloc[c0 : c0 + CHUNK]
            X = np.stack(xc["vec"].to_numpy()).astype(np.float64)
            xn = np.linalg.norm(X, axis=1, keepdims=True)
            xn[xn == 0] = 1.0
            S = np.round(Qn @ (X / xn).T, 4)
            xids = xids_all[c0 : c0 + CHUNK]
            for i in range(len(qids)):
                row = S[i]
                cand = np.nonzero(xids != qids[i])[0]
                if not len(cand):
                    continue
                n_all = np.concatenate((best_n[i], xids[cand]))
                s_all = np.concatenate((best_s[i], row[cand]))
                order = np.lexsort((n_all, -s_all))[:k]
                best_n[i], best_s[i] = n_all[order], s_all[order]
        out_q: list = []
        out_n: list = []
        out_s: list = []
        for i in range(len(qids)):
            out_q.extend([qids[i]] * len(best_n[i]))
            out_n.extend(best_n[i].tolist())
            out_s.extend(best_s[i].tolist())
        return pd.DataFrame(
            {"vec_id": out_q, "neighbor_id": out_n, "sim": out_s}
        )

    return tagged.groupBy(*group_cols).applyInPandas(
        score, "vec_id bigint, neighbor_id bigint, sim double"
    )


def _merge_group_topk(per_group: DataFrame, k: int) -> DataFrame:
    """Dedupe candidates seen in several groups (sims identical — max is
    a dedupe) and take the global top-k per query."""
    from pyspark.sql.window import Window

    scored = per_group.groupBy("vec_id", "neighbor_id").agg(
        F.max("sim").alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 2048,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH (sign-pattern buckets,
    ``n_tables`` independent tables for recall), bucket-local exact
    scoring, global re-rank.

    This is the 100 TB shape: no broadcast of the index — both sides
    shuffle on (table, bucket) only, and each bucket's candidates are
    scored in ONE Arrow-batched BLAS matmul (_group_score_topk) instead
    of per-pair JVM expressions.  The hyperplanes are driver-seeded and
    broadcast (tiny: n_tables × n_planes × dim floats).

    Tuning: fewer planes → coarser buckets → higher recall and bigger
    candidate sets; more tables → higher recall at linear cost.  The
    defaults hit ~0.8 recall@5 on the near-uniform synthetic embeddings
    (tight real-world clusters tolerate more planes).
    """
    spark = queries.sparkSession
    dim = len(index.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    b_planes = spark.sparkContext.broadcast(planes)

    qb = _lsh_bucketize(
        queries, b_planes, n_tables, n_planes, id_col, vec_col
    ).withColumn("is_q", F.lit(1))
    xb = _lsh_bucketize(
        index, b_planes, n_tables, n_planes, id_col, vec_col
    ).withColumn("is_q", F.lit(0))
    per_group = _group_score_topk(
        qb.unionByName(xb), ["table", "bucket"], k, chunk=chunk
    )
    return _merge_group_topk(per_group, k)


def _training_sample_matrix(
    embeddings: DataFrame,
    vec_col: str,
    max_rows: int,
    seed: int,
) -> "np.ndarray":
    """Bounded-sample collect for coarse-quantizer training.  By
    construction at most ``max_rows`` vectors ever reach the driver
    (``sample`` + ``limit``), no matter how large the index is — the full
    index is never collected (it only streams through the distributed
    cell-assignment map).  Returns an L2-normalized float64 matrix."""
    n = embeddings.count()
    sample = embeddings.select(vec_col)
    if n > max_rows:
        # oversample 20% so the limit() is almost surely satisfied
        sample = sample.sample(min(1.0, 1.2 * max_rows / n), seed=seed)
    rows = sample.limit(max_rows).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _kmeans_centroids(
    mat: "np.ndarray", n_centroids: int, seed: int, iters: int = 8
) -> "np.ndarray":
    """Small deterministic k-means on L2-normalized vectors (driver-side —
    the coarse quantizer is tiny and is trained on a bounded sample, see
    _training_sample_matrix).  Returns normalized centroids."""
    rng = np.random.default_rng(seed)
    init = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    cent = mat[init].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def _pq_codebooks(
    mat: "np.ndarray", m: int, n_codes: int, seed: int, iters: int = 10
) -> "np.ndarray":
    """Product-quantization codebooks: per-subspace euclidean k-means over
    an L2-normalized bounded sample (driver-side, same discipline as the
    IVF coarse quantizer — never the full index).  Returns
    ``(m, n_codes, dsub)`` float64.  Deterministic: seeded init per
    subspace, argmin ties resolve to the first centroid."""
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    k_eff = min(n_codes, n)
    cbs = np.empty((m, k_eff, dsub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        rng = np.random.default_rng(seed + 1000 * s + 7)
        cent = sub[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c) — no n×k×d blow-up
            d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
            assign = np.argmin(d, axis=1)
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        cbs[s] = cent
    return cbs


def _pq_assign(v: "np.ndarray", cbs: "np.ndarray") -> "np.ndarray":
    """Encode L2-normalized rows ``v`` against codebooks → (B, m) int16."""
    m, _, dsub = cbs.shape
    codes = np.empty((len(v), m), dtype=np.int16)
    for s in range(m):
        sub = v[:, s * dsub : (s + 1) * dsub]
        cent = cbs[s]
        d = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sub @ cent.T)
        codes[:, s] = np.argmin(d, axis=1).astype(np.int16)
    return codes


def pq_encode(
    index: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed PQ encoding: every vector compresses to ``m`` sub-space
    code bytes — a narrow mapInPandas stage, no shuffle.  The compressed
    index is dim·4/m× smaller than the raw float32 table (32× at dim=64,
    m=8): the embedding sketch that makes billion-vector ANN tractable."""
    spark = index.sparkSession
    b_cb = spark.sparkContext.broadcast(codebooks)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cb.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            codes = _pq_assign(v / n, C)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    return index.mapInPandas(fn, "vec_id bigint, codes array<smallint>")


def cosine_topk_pq(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int | None = None,
    train_sample: int = 100_000,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    chunk: int = 65536,
    max_index_rows: int = 50_000_000,
) -> DataFrame:
    """Approximate top-k via product quantization + exact re-rank — the
    MID tier: broadcast ceiling = the compressed code table, bound
    ASSERTED (``max_index_rows``), not assumed.

    Shape: codebooks train on a bounded driver sample (like IVF); the index
    is PQ-encoded DISTRIBUTED (pq_encode) and only the compressed codes —
    dim·4/m× smaller than the raw vectors — are collected and broadcast.
    Queries stream through one narrow mapInPandas stage doing asymmetric
    distance computation (ADC): a per-query (m × n_codes) lookup table,
    then sims = Σ_s LUT[s, code_s] over N-chunked code blocks (memory
    bounded at B·chunk doubles).  Each query emits a ``shortlist``
    (default 10·k) of ADC candidates; an ordinary shuffle join fetches the
    raw vectors of shortlisted neighbors only and the exact group kernel
    (_group_score_topk) re-ranks — so results use TRUE cosine, PQ error
    only costs recall, never precision of reported sims.

    vs cosine_topk_bruteforce: the broadcast ceiling grows by dim·4/m
    (~32× at dim=64, m=8 ⇒ ~1B vectors per 8 GB executor).  The ceiling
    is enforced, not assumed: the slim codes frame is collected under
    ``limit(max_index_rows+1)`` and this raises if the limit was hit —
    checked on the same scan that builds the driver codes, never a
    separate full count() action — with a pointer to
    ``cosine_topk_ivfpq`` — the genuinely unbounded tier, where codes
    stay distributed in the inverted file and NOTHING O(N) ever reaches
    the driver.  Approximate (recall < 1) — recall-gated in pytest like
    LSH/IVF, not oracle-checked.
    """
    spark = queries.sparkSession
    S = shortlist if shortlist is not None else 10 * k
    mat = _training_sample_matrix(index, vec_col, train_sample, seed)
    cbs = _pq_codebooks(mat, m, n_codes, seed)
    b_cb = spark.sparkContext.broadcast(cbs)

    enc = (
        pq_encode(index, cbs, id_col=id_col, vec_col=vec_col)
        .limit(max_index_rows + 1)
        .toPandas()
    )
    if len(enc) > max_index_rows:
        raise ValueError(
            f"cosine_topk_pq is the broadcast-codes MID tier: index has "
            f"> max_index_rows={max_index_rows} rows "
            f"(~{max_index_rows * (m * 8 + 8) // 2**20} MiB of driver "
            f"codes); use cosine_topk_ivfpq, whose inverted file stays "
            f"distributed."
        )
    ids = enc["vec_id"].to_numpy(dtype=np.int64)
    codes = np.stack(enc["codes"].to_numpy()).astype(np.int64)
    order = np.argsort(ids)
    ids, codes = ids[order], codes[order]
    b_ids = spark.sparkContext.broadcast(ids)
    b_codes = spark.sparkContext.broadcast(codes)

    def adc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cb.value
        Xids, Xcodes = b_ids.value, b_codes.value
        mm, _, dsub = C.shape
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            qv = q / qn
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            # batch LUT: (B, m, n_codes) — q_sub · codebook entries
            lut = np.einsum(
                "bsd,skd->bsk", qv.reshape(len(qv), mm, dsub), C
            )
            best_n = [np.array([], dtype=np.int64) for _ in range(len(qv))]
            best_s = [np.array([], dtype=np.float64) for _ in range(len(qv))]
            for c0 in range(0, len(Xids), chunk):
                cc = Xcodes[c0 : c0 + chunk]                # (Nc, m)
                xi = Xids[c0 : c0 + chunk]
                # sims (B, Nc) = Σ_s lut[:, s, cc[:, s]]
                sims = np.zeros((len(qv), len(cc)))
                for s in range(mm):
                    sims += lut[:, s, cc[:, s]]
                sims = np.round(sims, 4)
                for i in range(len(qv)):
                    cand = (
                        np.nonzero(xi != qids[i])[0]
                        if exclude_self
                        else np.arange(len(xi))
                    )
                    if not len(cand):
                        continue
                    n_all = np.concatenate((best_n[i], xi[cand]))
                    s_all = np.concatenate((best_s[i], sims[i][cand]))
                    o = np.lexsort((n_all, -s_all))[:S]
                    best_n[i], best_s[i] = n_all[o], s_all[o]
            out_q: list = []
            out_n: list = []
            for i in range(len(qv)):
                out_q.extend([qids[i]] * len(best_n[i]))
                out_n.extend(best_n[i].tolist())
            yield pd.DataFrame(
                {
                    "vec_id": np.array(out_q, dtype=np.int64),
                    "neighbor_id": np.array(out_n, dtype=np.int64),
                }
            )

    short = queries.mapInPandas(adc, "vec_id bigint, neighbor_id bigint")
    # exact refine: fetch raw vectors of shortlisted neighbors (ordinary
    # shuffle join — no broadcast of the raw index), one group per query
    qrows = queries.select(
        F.col(id_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.lit(1).alias("is_q"),
    )
    xrows = (
        short.join(
            index.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("vec"),
            ),
            "neighbor_id",
        )
        .select(
            F.col("vec_id").alias("g"),
            F.col("neighbor_id").alias("id"),
            "vec",
            F.lit(0).alias("is_q"),
        )
    )
    return _group_score_topk(qrows.unionByName(xrows), ["g"], k)


def cosine_topk_ivfpq(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int | None = None,
    train_sample: int = 100_000,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 65536,
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al., TPAMI'11): the composition the IVF and
    PQ docstrings promise — and the only tier with NO O(N) broadcast or
    collect anywhere:

    * a coarse quantizer (driver k-means on a bounded sample) routes every
      index vector to a cell; PQ codebooks train on the sample's RESIDUALS
      (v − centroid), so the codes spend their bits on within-cell detail;
    * the inverted file is a DataFrame of ``(cell, nid, codes)`` built by
      one narrow distributed encode — codes stay distributed (unlike
      cosine_topk_pq, which broadcasts them), so the index can exceed
      executor memory by any factor;
    * queries replicate to their ``n_probe`` nearest cells; a cell-local
      Arrow kernel scores ADC = q·centroid + Σ_s LUT[s, code_s] over
      code chunks and emits a per-(query, cell) shortlist;
    * shortlisted neighbors' raw vectors arrive by an ordinary shuffle
      join and the exact group kernel re-ranks — reported sims are TRUE
      cosines, PQ/IVF error only costs recall.

    Only broadcasts: centroids (n_centroids × dim) and codebooks
    (m × n_codes × dim/m) — constants, independent of index size.
    Probing every cell with a full-length shortlist makes the result
    EXACT top-k (every vector reaches the true-cosine re-rank), which is
    the driver-oracle gate for the whole machinery (``ann_ivfpq_full``).
    Approximate at default tuning — recall-gated in pytest.
    """
    spark = queries.sparkSession
    S = shortlist if shortlist is not None else 10 * k
    mat = _training_sample_matrix(index, vec_col, train_sample, seed)
    cent = _kmeans_centroids(mat, n_centroids, seed)
    resid = mat - cent[np.argmax(mat @ cent.T, axis=1)]
    cbs = _pq_codebooks(resid, m, n_codes, seed)
    b_cent = spark.sparkContext.broadcast(cent)
    b_cb = spark.sparkContext.broadcast(cbs)

    def encode_index(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C, B = b_cent.value, b_cb.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            vn = v / n
            cell = np.argmax(vn @ C.T, axis=1)
            codes = _pq_assign(vn - C[cell], B)
            yield pd.DataFrame(
                {
                    "cell": cell.astype(np.int32),
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "codes": list(codes),
                }
            )

    def assign_query(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            probes = np.argsort(-((v / n) @ C.T), axis=1)[:, :n_probe]
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            rep = np.repeat(np.arange(len(pdf)), probes.shape[1])
            yield pd.DataFrame(
                {
                    "cell": probes.ravel().astype(np.int32),
                    "id": np.repeat(qids, probes.shape[1]),
                    "vec": pdf[vec_col].iloc[rep].to_numpy(),
                }
            )

    inv = index.mapInPandas(
        encode_index, "cell int, id bigint, codes array<smallint>"
    ).select("cell", "id", F.lit(None).cast("array<float>").alias("vec"),
             "codes", F.lit(0).alias("is_q"))
    qs = queries.mapInPandas(
        assign_query, "cell int, id bigint, vec array<float>"
    ).select("cell", "id", "vec",
             F.lit(None).cast("array<smallint>").alias("codes"),
             F.lit(1).alias("is_q"))

    def adc_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["is_q"] == 1]
        x = pdf[pdf["is_q"] == 0]
        if not len(q) or not len(x):
            return pd.DataFrame(
                {
                    "vec_id": np.array([], dtype=np.int64),
                    "neighbor_id": np.array([], dtype=np.int64),
                }
            )
        C, B = b_cent.value, b_cb.value
        mm, _, dsub = B.shape
        cell = int(pdf["cell"].iloc[0])
        qv = np.stack(q["vec"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(qv, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qv = qv / qn
        qids = q["id"].to_numpy(dtype=np.int64)
        base = qv @ C[cell]                                  # (Q,)
        lut = np.einsum("bsd,skd->bsk", qv.reshape(len(qv), mm, dsub), B)
        xids_all = x["id"].to_numpy(dtype=np.int64)
        xo = np.argsort(xids_all)
        xids_all = xids_all[xo]
        codes_all = np.stack(x["codes"].to_numpy())[xo].astype(np.int64)
        best_n = [np.array([], dtype=np.int64) for _ in range(len(qids))]
        best_s = [np.array([], dtype=np.float64) for _ in range(len(qids))]
        for c0 in range(0, len(xids_all), chunk):
            cc = codes_all[c0 : c0 + chunk]
            xi = xids_all[c0 : c0 + chunk]
            sims = np.broadcast_to(base[:, None], (len(qids), len(cc))).copy()
            for s in range(mm):
                sims += lut[:, s, cc[:, s]]
            for i in range(len(qids)):
                cand = np.nonzero(xi != qids[i])[0]
                if not len(cand):
                    continue
                n_all = np.concatenate((best_n[i], xi[cand]))
                s_all = np.concatenate((best_s[i], sims[i][cand]))
                o = np.lexsort((n_all, -s_all))[:S]
                best_n[i], best_s[i] = n_all[o], s_all[o]
        out_q: list = []
        out_n: list = []
        for i in range(len(qids)):
            out_q.extend([qids[i]] * len(best_n[i]))
            out_n.extend(best_n[i].tolist())
        return pd.DataFrame(
            {
                "vec_id": np.array(out_q, dtype=np.int64),
                "neighbor_id": np.array(out_n, dtype=np.int64),
            }
        )

    short = qs.unionByName(inv).groupBy("cell").applyInPandas(
        adc_cell, "vec_id bigint, neighbor_id bigint"
    )
    # exact refine — identical to the PQ path: shuffle-join raw vectors of
    # shortlisted neighbors only, one group per query, true-cosine top-k.
    # Cells partition the index, so shortlist rows are already unique.
    qrows = queries.select(
        F.col(id_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.lit(1).alias("is_q"),
    )
    xrows = short.join(
        index.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
        ),
        "neighbor_id",
    ).select(
        F.col("vec_id").alias("g"),
        F.col("neighbor_id").alias("id"),
        "vec",
        F.lit(0).alias("is_q"),
    )
    return _group_score_topk(qrows.unionByName(xrows), ["g"], k)


def cosine_topk_ivf(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 100_000,
    chunk: int = 2048,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse k-means quantizer
    partitions the index into ``n_centroids`` cells; each query probes its
    ``n_probe`` nearest cells and re-ranks exactly within them.

    Scale shape: the quantizer trains on a driver sample of at most
    ``train_sample`` vectors (never the full index); the index then
    shuffles ONCE on cell id (building the inverted file) via the
    distributed assignment map; queries shuffle on their probed cell ids;
    the join is cell-local.  Centroids are a broadcast of
    n_centroids × dim floats.  Recall is tunable via n_probe —
    benchmarked, not oracle-checked.
    """
    spark = queries.sparkSession
    mat = _training_sample_matrix(index, vec_col, train_sample, seed)
    cent = _kmeans_centroids(mat, n_centroids, seed)
    b_cent = spark.sparkContext.broadcast(cent)

    def assign_index(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            cell = np.argmax((v / n) @ C.T, axis=1)
            yield pd.DataFrame(
                {"cell": cell.astype(np.int32),
                 "nid": pdf[id_col].to_numpy(dtype=np.int64),
                 "nvec": pdf[vec_col]}
            )

    def assign_query(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cent.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (v / n) @ C.T
            probes = np.argsort(-sims, axis=1)[:, :n_probe]
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            out = {
                "cell": probes.ravel().astype(np.int32),
                "id": np.repeat(qids, probes.shape[1]),
                "vec": pdf[vec_col].iloc[
                    np.repeat(np.arange(len(pdf)), probes.shape[1])
                ].to_numpy(),
            }
            yield pd.DataFrame(out)

    inv = index.mapInPandas(
        assign_index, f"cell int, nid bigint, nvec array<float>"
    ).selectExpr("cell", "nid as id", "nvec as vec", "0 as is_q")
    qs = queries.mapInPandas(
        assign_query, f"cell int, id bigint, vec array<float>"
    ).withColumn("is_q", F.lit(1))
    # cell-local exact scoring in one Arrow-batched matmul per cell,
    # then the lossless global merge — same kernel as the LSH path
    per_cell = _group_score_topk(qs.unionByName(inv), ["cell"], k, chunk=chunk)
    return _merge_group_topk(per_cell, k)
