"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is never trained on wholesale: pipelines draw per-stratum
samples (per language / source / quality bucket) and mix sources to a token
budget.  Spark's ``DataFrame.sample`` is seed-deterministic only per
partitioning — a repartition, AQE re-plan, or re-read changes which rows are
picked, which breaks lineage reproducibility.  These operators instead make
the keep/drop decision a **pure function of the row key**:

    keep  ⇔  first 12 hex chars of md5(seed || "|" || key)  <  threshold(frac)

so the sample is stable under any re-partitioning, re-ordering, or engine
(the DuckDB oracle replays the identical predicate — both engines compare
lowercase-hex strings bytewise, and a 12-hex-digit prefix compares equal to
its 48-bit numeric value when both sides are exactly 12 chars).

Scale shape: the predicate is a pure Catalyst expression on the scan —
no shuffle, no driver state, pushes down past column pruning; a stratified
sample of a 10^12-row table is a single narrow filtered scan.

The reference has no sampling surface (it processes every uploaded page);
this exists for the training-data-pipeline scope (SURVEY.md "beyond the
reference"), same tier as the dedup/ANN family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_DIGITS = 12
_HEX_SPAN = 16**_HEX_DIGITS


def _threshold_hex(frac: float) -> str:
    """frac ∈ (0, 1) → 12-char lowercase hex threshold. Exact halfway
    rounding matches python round() in both the Spark literal and the SQL
    literal because the SAME string is planted in both plans."""
    return format(round(frac * _HEX_SPAN), "x").zfill(_HEX_DIGITS)


def sample_key(key: Column, seed: int = 42) -> Column:
    """The stable per-row sampling key: 12-hex-char md5 prefix of
    ``seed|key``.  Uniform on [0, 16^12) for any key distribution."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, _HEX_DIGITS
    )


def keep_predicate(key: Column, frac: float, seed: int = 42) -> Column:
    """Deterministic Bernoulli(frac) keep predicate on ``key``."""
    if frac <= 0.0:
        return F.lit(False)
    if frac >= 1.0:
        return F.lit(True)
    return sample_key(key, seed) < F.lit(_threshold_hex(frac))


def deterministic_sample(
    df: DataFrame, frac: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Repartition-stable Bernoulli sample: the kept set depends only on
    (key, seed, frac) — identical across runs, partitionings, engines."""
    return df.where(keep_predicate(F.col(key_col), frac, seed))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    default_frac: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 100% of rare
    languages, 10% of English.  The per-stratum threshold is a CASE
    expression, so the whole operator is one filtered scan: no shuffle,
    no per-stratum pass, no driver collect; strata counts never matter
    (unlike ``sampleBy``, which is per-partitioning like ``sample``)."""
    pred = keep_predicate(F.col(key_col), default_frac, seed)
    for value, frac in sorted(fractions.items()):
        pred = F.when(
            F.col(strata_col) == F.lit(value),
            keep_predicate(F.col(key_col), frac, seed),
        ).otherwise(pred)
    return df.where(pred)


def corpus_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Mix sources to per-source token budgets: within each source, take
    documents in the deterministic hash order (an implicit uniform shuffle
    — no systematic bias toward any doc_id range) until the budget is
    reached; the document that crosses the budget line is included, so
    every source with any data reaches ≥ its budget.

    Output: ``(doc_id, source, n_tokens, cum_tokens)`` for kept docs.

    Scale shape: one hash partition by source + a within-source sort by
    the 12-hex sample key (a window cumulative sum).  A giant source makes
    that sort wide — at 10^12 rows pre-filter with ``deterministic_sample``
    at ``~budget / total_tokens`` (the same hash order, so the prefix is
    identical) before the window; at driver/test scale the plain window is
    the exact, oracle-checkable form.
    """
    sources = sorted(budgets)
    budget_expr = F.create_map(
        *[x for s in sources for x in (F.lit(s), F.lit(int(budgets[s])))]
    )[F.col(source_col)]
    w = (
        Window.partitionBy(source_col)
        .orderBy(sample_key(F.col(key_col), seed), key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.where(F.col(source_col).isin(sources))
        .select(
            key_col,
            source_col,
            F.col(token_col).cast("bigint").alias("n_tokens"),
            budget_expr.alias("_budget"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget"))
        .drop("_budget")
    )
