"""Repetition-based quality filters for the training-data pipeline — the
token-level analogs of the Gopher repetition rules (Rae et al. 2021,
PAPERS.md): documents dominated by repeated n-grams are low-quality
boilerplate/spam and get flagged before tokenization.

Two signals per document, both exact integer ratios (so the DuckDB twin is
bit-exact):

* ``dup_trigram_frac`` — fraction of trigram OCCURRENCES that are repeats
  of an earlier trigram: ``(total - distinct) / total``.  Pure per-row
  array math (no shuffle): raw + distinct n-gram counts from one staged
  token column.
* ``top_bigram_frac`` — share of the single most frequent bigram:
  ``max(count per bigram) / total``.  Needs a mode, so bigrams are
  EXPLODED to rows and aggregated per (doc_id, gram) — one shuffle on
  uniform keys; a mega-doc spreads across its own gram space.  (An
  in-array ``aggregate`` over distinct grams would be O(grams²) per row —
  quadratic for exactly the repetitive documents this operator exists to
  catch.)

Thresholds follow Gopher's shape (flag when the most frequent bigram
covers > 20% of the text, or > 30% of trigrams are repeats) but are
token-level analogs, not the paper's character-fraction constants.

Reference tie-in: the reference has no corpus-quality surface; this is
"beyond the reference" scope (SURVEY.md training-data pipeline), sharing
the normalize/tokenize contract of export.py:494,521-526.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import ngrams, norm_tokens


def doc_repetition(
    docs: DataFrame,
    top_bigram_max: float = 0.20,
    dup_trigram_max: float = 0.30,
) -> DataFrame:
    """Per-document repetition stats + keep/flag verdict.

    Output: ``doc_id, n_tokens, dup_trigram_frac, top_bigram_frac,
    flagged`` — one row per document with ≥ 3 tokens (shorter docs have
    no trigram signal, in both engines).
    """
    base = (
        docs.withColumn("_toks", norm_tokens(F.col("text")))
        .where(F.size("_toks") >= 3)
        .withColumn("_tri", ngrams(F.col("_toks"), 3))
        .withColumn("_bi", ngrams(F.col("_toks"), 2))
        .select(
            "doc_id",
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.round(
                (F.size("_tri") - F.size(F.array_distinct("_tri")))
                / F.size("_tri"),
                6,
            ).alias("dup_trigram_frac"),
            F.explode("_bi").alias("bigram"),
        )
    )
    per_gram = base.groupBy(
        "doc_id", "n_tokens", "dup_trigram_frac", "bigram"
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("doc_id", "n_tokens", "dup_trigram_frac")
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
        )
        .withColumn(
            "flagged",
            (F.col("top_bigram_frac") > top_bigram_max)
            | (F.col("dup_trigram_frac") > dup_trigram_max),
        )
    )
