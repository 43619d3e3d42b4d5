"""Model-based quality classification — a multinomial Naive Bayes
log-odds scorer, the declarative analog of the fastText quality
classifiers LLM pipelines train on clean-reference vs corpus text (CCNet's
LM filter's sibling; DCLM/phi-style "classifier trained on good examples";
PAPERS.md).

Why Naive Bayes and not logistic regression: NB *training* is literally a
pair of token-count aggregations and scoring is a join + per-doc sum — the
whole operator (train AND inference) stays inside Catalyst, end-to-end
SQL-expressible, so the driver gate hash-checks the complete pipeline
rather than a frozen-weights inference path.  The model family matches
fastText's bag-of-words mode (linear score over token counts); only the
estimator differs (closed-form counts vs SGD).

Cross-engine exactness (the lm_quality discipline, operators/quality.py):
the ONLY float steps are the per-distinct-token ``ln`` and the single
prior ``ln``, each immediately quantized to integer micro-nats
(``round(±ln·1e6, 0) → bigint``) — per-token deltas are differences of
two individually-quantized bigints (quantize-then-subtract, mirrored
exactly by the oracle), document scores are pure bigint sums, and the
verdict is an integer comparison — so partial-agg summation order can
never flip a hash.

Scale shape (same argument as lm_quality): the vocab table is bounded by
distinct tokens, so AQE broadcasts the score join in the common case; the
per-doc aggregate after the join does map-side partial aggregation, so
hot-token (stopword) skew is bounded to the join itself.  The five model
scalars (N_pos, N_neg, V, D_pos, D_neg) are driver scalars — the
tfidf_top ``n_docs`` precedent.

Reference tie-in: the reference has no corpus-quality surface; this is
beyond-reference training-pipeline scope (SURVEY.md §2 LLM-data table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import norm_tokens


def _micro_nll(count_col: Column, denom: float) -> Column:
    """Quantized token cost: ``round(-ln((c+1)/denom)·1e6) → bigint``.
    Additive (add-1) smoothing; quantization happens per distinct token,
    BEFORE any arithmetic that combines tokens."""
    return F.round(-F.log((count_col + 1) / F.lit(denom)) * 1e6, 0).cast(
        "bigint"
    )


def nb_quality(
    docs: DataFrame,
    pos_docs: DataFrame,
    neg_docs: DataFrame,
) -> DataFrame:
    """Train a multinomial NB on ``pos_docs`` vs ``neg_docs`` (both with a
    ``text`` column), then score every document in ``docs`` by its
    quantized log-odds of being positive-class.

    Output: ``doc_id, n_tokens, n_oov, logodds_micro, pred`` — one row
    per document with ≥ 1 normalized token (same contract as
    lm_quality); ``pred`` is ``logodds_micro > 0``.
    """
    pos_tok = pos_docs.select(F.explode(norm_tokens(F.col("text"))).alias("tok"))
    neg_tok = neg_docs.select(F.explode(norm_tokens(F.col("text"))).alias("tok"))
    cp = pos_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cp"))
    cn = neg_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cn"))
    vocab = cp.join(cn, "tok", "full").fillna(0, ["cp", "cn"])

    n_pos = pos_tok.count()
    n_neg = neg_tok.count()
    v = vocab.count()
    d_pos = pos_docs.count()
    d_neg = neg_docs.count()
    denom_p = float(n_pos + v + 1)
    denom_n = float(n_neg + v + 1)

    # per-token evidence: positive delta ⇒ the token favors the positive
    # class; quantize each class cost separately, THEN subtract
    deltas = vocab.select(
        "tok",
        (
            _micro_nll(F.col("cn"), denom_n) - _micro_nll(F.col("cp"), denom_p)
        ).alias("delta"),
    )
    oov_delta = _micro_nll(F.lit(0), denom_n) - _micro_nll(F.lit(0), denom_p)
    prior = F.round(
        F.log(F.lit(float(d_pos)) / F.lit(float(d_neg))) * 1e6, 0
    ).cast("bigint")

    tok = docs.select(
        "doc_id", F.explode(norm_tokens(F.col("text"))).alias("tok")
    )
    joined = tok.join(deltas, "tok", "left")
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("delta").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.sum(F.coalesce(F.col("delta"), oov_delta))
        .cast("bigint")
        .alias("evidence"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("evidence") + prior).cast("bigint").alias("logodds_micro"),
        ((F.col("evidence") + prior) > 0).alias("pred"),
    )
