"""Benchmark decontamination — flag training documents that share any
word n-gram with an evaluation set (the standard LLM-training hygiene pass:
GPT-3 used 13-gram overlap, PaLM/Llama variants of the same shape; see
PAPERS.md).  A training corpus is decontaminated BEFORE training so that
eval numbers measure generalization, not memorized benchmark rows.

Shape at 100 TB: the eval side is a benchmark suite — thousands of
documents, NOT data-scaled — so its distinct n-gram set is tiny and
size-based planning / AQE turns the gram join into a broadcast hash join
automatically (no manual hint: if someone passes a data-scaled "eval" set
the plan degrades to a sane shuffle join instead of a driver OOM).  The
training side streams: one narrow tokenize+shingle projection per doc, one
explode, one join keyed on the gram string, one per-doc count — no
all-pairs anything, O(train tokens) work.

Reference tie-in: the reference has no corpus-hygiene surface; this is
"beyond the reference" training-data-pipeline scope (SURVEY.md), built on
the same normalize/tokenize contract as the dedup family
(export.py:494,521-526).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.operators.dedup import with_shingles


def ngram_decontaminate(
    train: DataFrame, eval_docs: DataFrame, n: int = 13
) -> DataFrame:
    """Contaminated training docs by exact n-gram overlap with ``eval_docs``.

    Output: one row per CONTAMINATED training document —
    ``doc_id, n_grams (distinct n-grams in the doc), n_hit_grams (of those,
    how many appear anywhere in the eval set), contam_frac`` (exact ratio,
    rounded 6) — ordered-by nothing (the driver canonicalizes).  Docs with
    fewer than ``n`` tokens have no n-grams and cannot be flagged, in both
    engines.

    ``n=13`` is the published default; the driver gate runs ``n=4`` because
    the synthetic sf tables carry ~54-token documents (a 13-gram overlap is
    near-impossible there; at 4 the query exercises real hit paths).
    """
    tg = with_shingles(train, n).select(
        "doc_id",
        F.size("sh").cast("bigint").alias("n_grams"),
        F.explode("sh").alias("gram"),
    )
    eg = (
        with_shingles(eval_docs, n)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    # per-doc grams are distinct (shingle sets), eval grams are distinct,
    # so the join emits each (doc, hit-gram) exactly once
    return (
        tg.join(eg, "gram")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
        .withColumn(
            "contam_frac",
            F.round(F.col("n_hit_grams") / F.col("n_grams"), 6),
        )
        .select("doc_id", "n_grams", "n_hit_grams", "contam_frac")
    )


def fuzzy_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    contaminate_at: float = 0.5,
    n: int = 3,
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate benchmark decontamination — the fuzzy upgrade of
    :func:`ngram_decontaminate`: exact n-gram overlap misses eval items a
    training page carries with light edits (reflowed whitespace, swapped
    numbers, prompt templating), which is precisely what MinHash Jaccard
    catches.  This is the published-practice pair: GPT-3 App. C removes
    exact 13-gram collisions, Llama-era reports additionally drop
    training docs whose similarity to an eval item crosses a threshold.

    Built on :func:`ocr_spark.operators.dedup.incremental_minhash_dedup`
    with train as the batch and the eval set as the corpus — so pairs are
    TRAIN×EVAL only (never train×train), the corpus-side degenerate
    bucket guard applies to eval band keys, and every candidate is
    verified by exact Jaccard before it can flag anything.

    Output: one verdict row per train document — ``doc_id,
    n_eval_matches bigint, max_jaccard double, contaminated boolean``
    (``contaminated`` ⇔ some verified eval pair has jaccard ≥
    ``contaminate_at``; match counts keep sub-threshold near-misses
    visible for audit).

    Scale shape: inherits the incremental form's O(train) cost — the
    eval side is tiny by nature, its signature table is bounded, and the
    final verdict join keys on doc_id (uniform).
    """
    from ocr_spark.operators.dedup import incremental_minhash_dedup

    pairs = incremental_minhash_dedup(
        train, eval_docs, n=n, k=k, bands=bands, threshold=0.0
    )
    agg = pairs.groupBy("a").agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return (
        train.select("doc_id")
        .join(agg, train["doc_id"] == agg["a"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_eval_matches"), F.lit(0).cast("bigint")).alias(
                "n_eval_matches"
            ),
            F.coalesce(F.col("max_jaccard"), F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce(F.col("max_jaccard"), F.lit(0.0)) >= contaminate_at).alias(
                "contaminated"
            ),
        )
    )


def _slice_positions(h, k: int, m: int) -> list:
    """k Bloom positions from DISJOINT 40-bit slices of ONE md5 digest
    (hex chars 1-10, 11-20, 21-30) mod m — one digest per gram instead of
    k, because md5 over the gram string is the dominant probe cost.
    Slices of a single digest are independent uniform bits; requires
    k ≤ 3.  The hex→bigint conv is byte-identical across Spark and
    DuckDB, so the filter CONTENT (and therefore every false positive)
    is exactly reproducible by the oracle twin."""
    if not 1 <= k <= 3:
        raise ValueError("k must be 1..3 (three 40-bit md5 slices)")
    return [
        F.conv(F.substring(h, 1 + 10 * j, 10), 16, 10).cast("bigint") % m
        for j in range(k)
    ]


def bloom_eval_filter(
    eval_docs: DataFrame, n: int = 4, k: int = 3, m: int = 1 << 20
) -> DataFrame:
    """The eval suite compressed to its Bloom position set: ``(pos
    bigint, _hit 1)`` — at most m distinct ints (m=2^20 ⇒ ≤ 8 MB), the
    broadcastable dim side of every decontamination probe.  Factored out
    so long-lived consumers (the streaming path, repeated training
    sweeps) build it ONCE and persist it instead of re-deriving the eval
    tokenization per use."""
    return (
        with_shingles(eval_docs, n)
        .select(F.explode("sh").alias("gram"))
        .distinct()
        .withColumn("_h", F.md5(F.col("gram").cast("binary")))
        .select(
            F.explode(F.array(*_slice_positions(F.col("_h"), k, m))).alias(
                "pos"
            )
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame | None = None,
    n: int = 4,
    k: int = 3,
    m: int = 1 << 20,
    filt: DataFrame | None = None,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the Dolma "bff" shape
    (Soldaini et al. 2024, "Dolma", arXiv:2402.00159; same role as
    :func:`ngram_decontaminate` but the eval side is compressed to an
    m-bit filter instead of a gram string set): every eval n-gram sets k
    bit positions; a training gram is flagged iff ALL k of its positions
    are set.  False positives are part of the contract — rate ≈
    (1 - e^(-k·G/m))^k for G distinct eval grams — and because the hash
    basis is deterministic md5, the exact same false positives occur in
    the DuckDB twin, so the gate is still hash-exact.

    Why this survives 100 TB where the string join strains: the filter
    is at most m distinct int positions (m=2^20 ⇒ ≤ 8 MB as a bigint
    dim) NO MATTER how large the eval suite is, so the probe is a
    guaranteed broadcast hash join on ints — and the training side never
    shuffles a gram STRING at all: grams are identified by their
    position index ``gi`` inside the doc's shingle array, so both
    aggregation stages key on compact ints (doc_id, gi).  One
    tokenize+shingle scan total (the md5 is staged as a named column —
    the usual re-inline trap — and costs ONE digest per gram, k slices);
    the verdict join reads only the pruned doc_id column of ``train``.

    Output: one verdict row per training document — ``doc_id, n_grams,
    n_hit_grams, contaminated`` (``n_hit_grams`` counts distinct grams
    whose k positions are all set; docs with fewer than ``n`` tokens
    have ``n_grams = 0`` and are never flagged).

    Pass a prebuilt (optionally persisted) ``filt`` from
    :func:`bloom_eval_filter` to skip the eval-side derivation —
    ``eval_docs`` is then ignored; one of the two must be given.
    """
    if filt is None and eval_docs is None:
        raise ValueError("need eval_docs or a prebuilt filt")
    if filt is None:
        filt = bloom_eval_filter(eval_docs, n=n, k=k, m=m)
    probe = (
        with_shingles(train, n)
        .select(
            "doc_id",
            F.size("sh").cast("bigint").alias("n_grams"),
            F.posexplode("sh").alias("gi", "gram"),
        )
        .withColumn("_h", F.md5(F.col("gram").cast("binary")))
        .select(
            "doc_id",
            "n_grams",
            "gi",
            F.explode(F.array(*_slice_positions(F.col("_h"), k, m))).alias(
                "pos"
            ),
        )
    )
    # left join keeps every slice row; a gram is a full hit iff all k of
    # its slice rows matched (duplicate positions within one gram both
    # match or both miss, so the sum still reaches k exactly on a hit)
    hits = (
        probe.join(F.broadcast(filt), "pos", "left")
        .groupBy("doc_id", "n_grams", "gi")
        .agg((F.sum(F.coalesce(F.col("_hit"), F.lit(0))) == k).alias("_full"))
        .groupBy("doc_id", "n_grams")
        .agg(
            F.sum(F.when(F.col("_full"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hit_grams")
        )
    )
    base = train.select("doc_id").distinct()
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_hit_grams"), F.lit(0))
        .cast("bigint")
        .alias("n_hit_grams"),
        (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias("contaminated"),
    )
