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
