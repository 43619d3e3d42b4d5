"""The composed training-data curation pipeline — what a user of this
engine actually runs over a web-scale corpus:

    contract docs → extraction (spans → text) → exact dedup →
    MinHash near-dup removal → quality filter → tokenization →
    curated table + per-stage retention stats

Stage shapes (scale notes):

1. **extract** — the narrow Arrow kernel (zero shuffle).
2. **exact dedup** — hash agg on the 32-byte fingerprint; keeps the min
   doc_id representative.
3. **near-dup removal** — MinHash-LSH candidates + Jaccard verify; from
   each verified pair the larger doc_id drops (min-id survivor rule, the
   standard web-dedup convention).  Only the slim pair list shuffles.
4. **quality filter** — pure Catalyst predicates (token count bounds,
   stopword-ratio ceiling, mean-token-length band).
5. **tokenize** — analyzer tokens + counts, still narrow.

Every stage emits a retention count so the run is auditable (the
boilerplate-drop/progress bookkeeping analog of the reference's
``_data.json`` flags, server/celery_app.py:1170-1183).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import analyzer_tokens, doc_fingerprint
from ocr_spark.operators.dedup import minhash_lsh_dedup
from ocr_spark.operators.extract import extract_documents


def curate(
    docs: DataFrame,
    order_by: str = "meta",
    jaccard_threshold: float = 0.5,
    min_tokens: int = 5,
    max_stop_ratio: float = 0.6,
    token_len_band: tuple[float, float] = (1.0, 20.0),
    cache_registry: list | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full pipeline; returns (curated DataFrame, stage counts).

    The stage counts trigger evaluation per stage (each an action).  The
    extraction output is persisted (MEMORY_AND_DISK) before the first
    action so the Arrow kernel executes exactly once for the whole run —
    without the persist, each of the five downstream counts would replay
    extract → fingerprint from the source (tests assert the single
    execution via an executor-side accumulator).  The returned DataFrame
    reads from the same cache; pass ``cache_registry`` (a list) to
    receive the persisted handle so the caller can ``unpersist()``
    exactly this pipeline's cache after materializing — never
    ``spark.catalog.clearCache()``, which would evict every other cache
    in the shared session (run_curation does the targeted release).
    """
    stats: dict[str, int] = {"input": docs.count()}

    extracted = extract_documents(
        docs, order_by=order_by, with_word_index=False
    ).select("doc_id", "doc_text", "n_words")
    text_df = (
        extracted.where(F.col("n_words") > 0)
        .withColumn("fp", doc_fingerprint(F.col("doc_text")))
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(text_df)
    stats["extracted_nonempty"] = text_df.count()

    # 2. exact dedup — min doc_id per fingerprint survives
    reps = text_df.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    exact = text_df.join(reps, "fp").where(F.col("doc_id") == F.col("rep")).drop("rep")
    stats["after_exact_dedup"] = exact.count()

    # 3. near-dup removal — larger id of each verified pair drops
    pairs = minhash_lsh_dedup(
        exact.select("doc_id", F.col("doc_text").alias("text")),
        threshold=jaccard_threshold,
        cache_registry=cache_registry,
    )
    losers = pairs.select(F.col("b").alias("doc_id")).distinct()
    neardup = exact.join(losers, "doc_id", "left_anti")
    stats["after_near_dedup"] = neardup.count()

    # 4. quality filter — Catalyst predicates only
    toks = analyzer_tokens(F.col("doc_text"))
    scored = neardup.withColumn("toks", toks).withColumn(
        "n_tok", F.size("toks")
    )
    n_raw = F.size(F.split(F.trim(F.col("doc_text")), r"\s+"))
    stop_ratio = (n_raw - F.col("n_tok")) / F.greatest(n_raw, F.lit(1))
    avg_len = F.when(
        F.col("n_tok") > 0,
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / F.col("n_tok"),
    ).otherwise(F.lit(0.0))
    lo, hi = token_len_band
    curated = scored.where(
        (F.col("n_tok") >= min_tokens)
        & (stop_ratio <= max_stop_ratio)
        & avg_len.between(lo, hi)
    )
    stats["after_quality"] = curated.count()

    # 5. final projection: curated text + tokens + counts
    out = curated.select(
        "doc_id", "fp", "doc_text", "n_words",
        F.col("toks").alias("tokens"), F.col("n_tok").alias("n_tokens"),
    )
    return out, stats


def run_curation(
    spark: SparkSession, input_path: str, output_path: str, **kw
) -> dict[str, int]:
    # the source seam, not a raw read: a curation run after edits or
    # durable deletes must see the edited content and must not curate
    # tombstoned documents back in
    from ocr_spark.jobs.extract_job import read_documents

    docs = read_documents(spark, input_path)
    caches: list = []
    out, stats = curate(docs, cache_registry=caches, **kw)
    out.write.mode("overwrite").parquet(output_path)
    for df in caches:  # release exactly this pipeline's cache
        df.unpersist()
    stats["written"] = spark.read.parquet(output_path).count()
    return stats
