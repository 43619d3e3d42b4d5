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


def _bloom_positions(gram, k: int, m: int):
    """The k Bloom bit positions of one gram: independent hashes via
    md5(gram || ':' || j), first 12 hex chars (48 bits) mod m — string
    concat + md5 + conv are byte-identical across Spark and DuckDB, so
    the filter CONTENT (and therefore every false positive) is exactly
    reproducible by the oracle twin."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(gram, F.lit(f":{j}")).cast("binary")
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % m
            for j in range(k)
        ]
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 4,
    k: int = 3,
    m: int = 1 << 20,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the Dolma "bff" shape
    (Soldaini et al. 2024, "Dolma", arXiv:2402.00159; same role as :func:`ngram_decontaminate` but
    the eval side is compressed to an m-bit filter instead of a gram
    string set): every eval n-gram sets k bit positions; a training gram
    is flagged iff ALL k of its positions are set.  False positives are
    part of the contract — rate ≈ (1 - e^(-k·G/m))^k for G distinct eval
    grams — and because the hash basis is deterministic md5, the exact
    same false positives occur in the DuckDB twin, so the gate is still
    hash-exact.

    Why this survives 100 TB where the string join strains: the filter
    is at most m distinct int positions (m=2^20 ⇒ ≤ 8 MB as a bigint
    dim) NO MATTER how large the eval suite is, so the probe side is a
    guaranteed broadcast hash join on ints — never a shuffle keyed on
    13-gram strings.  The training side stays one narrow
    tokenize+shingle projection + one per-doc count, O(train tokens).

    Output: one verdict row per training document — ``doc_id, n_grams,
    n_hit_grams, contaminated`` (``n_hit_grams`` counts distinct grams
    whose k positions are all set; docs with fewer than ``n`` tokens
    have ``n_grams = 0`` and are never flagged).
    """
    eg = (
        with_shingles(eval_docs, n)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    filt = (
        eg.select(
            F.explode(_bloom_positions(F.col("gram"), k, m)).alias("pos")
        )
        .distinct()
    )
    tg = with_shingles(train, n).select(
        "doc_id",
        F.size("sh").cast("bigint").alias("n_grams"),
        F.explode("sh").alias("gram"),
    )
    probe = tg.select(
        "doc_id",
        "n_grams",
        "gram",
        F.explode(_bloom_positions(F.col("gram"), k, m)).alias("pos"),
    )
    # inner join drops unset positions; a gram survives iff all k of its
    # exploded rows matched (duplicate positions within one gram both
    # match or both drop, so the count stays exactly k on a full hit)
    hits = (
        probe.join(filt, "pos")
        .groupBy("doc_id", "n_grams", "gram")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .where(F.col("n_set") == k)
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit_grams"))
    )
    base = train.select("doc_id").distinct()
    return (
        base.join(hits, "doc_id", "left")
        .join(
            with_shingles(train, n).select(
                "doc_id", F.size("sh").cast("bigint").alias("_ng")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.col("_ng"), F.lit(0))
            .cast("bigint")
            .alias("n_grams"),
            F.coalesce(F.col("n_hit_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
