"""Distributed BPE tokenizer training (Sennrich et al. 2016, PAPERS.md) —
the vocabulary-learning stage of a training-data pipeline, expressed as
iterated Catalyst aggregations over a distributed word-frequency table.

Shape per merge round (everything distributed, O(1) driver state):

1. adjacent symbol pairs of every vocab word, weighted by corpus word
   frequency — ``slice`` + ``arrays_zip`` (the linear-pass idiom from
   functions/text.shingles) exploded to a ``(left, right, freq)`` agg with
   map-side partial sums;
2. the single best pair — ``freq desc, left asc, right asc`` tie-break —
   collected to the driver (ONE row);
3. the merge applied to the symbol arrays with an ``F.aggregate``
   left-fold — greedy leftmost-first, exactly the reference algorithm's
   scan — as a narrow pure-Catalyst projection (no Python in the loop).

The corpus is tokenized ONCE into (word, freq); every round then costs
O(vocab) not O(corpus) — the standard trainer structure.  At 100 TB the
vocab table stays distributed and cached; a production run learning 30k+
merges would add the pair-delta optimization (only words containing the
merged pair re-emit counts — an incremental refinement of step 1, same
plan shape), noted here and deliberately not implemented: the per-round
full recount is the oracle-checkable ground truth.

Determinism: counts are exact integers, the tie-break is total, and the
fold is order-defined, so learned merges are engine- and
partitioning-invariant — gated by exact equality against a pure-Python
reference trainer in tests/test_bpe.py and the ``bpe_pair_counts`` DuckDB
twin for the round-1 aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import norm_tokens

#: end-of-word marker (Sennrich et al.): distinguishes word-final symbols
#: so merges cannot cross word boundaries when detokenizing.
EOW = "</w>"


def word_vocab(docs: DataFrame) -> DataFrame:
    """(word, freq, syms) — corpus word frequencies with initial
    character-level symbol arrays.  The one O(corpus) pass; every merge
    round after this touches only the vocab."""
    words = docs.select(
        F.explode(norm_tokens(F.col("text"))).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "syms",
            F.concat(
                F.regexp_extract_all(F.col("word"), F.lit("."), 0),
                F.array(F.lit(EOW)),
            ),
        )
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol arrays, weighted by word
    freq — ``(lsym, rsym, freq)``.  slice+arrays_zip keeps the pair build
    a linear pass (HOF-staging rule, see text.shingles)."""
    n = F.size("syms")
    zipped = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("l"),
        F.slice("syms", 2, n - 1).alias("r"),
    )
    return (
        vocab.where(n >= 2)
        .select("freq", F.explode(zipped).alias("p"))
        .groupBy(
            F.col("p.l").alias("lsym"), F.col("p.r").alias("rsym")
        )
        .agg(F.sum("freq").alias("freq"))
    )


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy leftmost-first merge of adjacent (left, right) — the BPE
    scan as a pure-Catalyst left-fold.  A freshly merged symbol never
    re-merges in the same round (``left || right != left`` since symbols
    are non-empty), matching the reference algorithm."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 20
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules.  Returns the ordered merge list
    ``[(left, right, freq), ...]`` and the final vocab DataFrame (word,
    freq, syms) under those merges."""
    # localCheckpoint per round (the connected_components discipline,
    # operators/graph.py): truncates lineage so round R's plan is one fold
    # over materialized round R-1, not R nested folds — analysis time and
    # recompute risk stay O(1) per round.
    vocab = word_vocab(docs).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("freq"), F.asc("lsym"), F.asc("rsym"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, fr = top[0]["lsym"], top[0]["rsym"], int(top[0]["freq"])
        merges.append((l, r, fr))
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), l, r)
        ).localCheckpoint(eager=True)
    return merges, vocab


def apply_merges(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Segment a (…, syms) vocab under an ordered merge list — the
    subword-nmt 'apply operations in sequence' encoder.  Each rule is the
    same pure-Catalyst greedy fold the trainer used, so in-corpus words
    segment exactly as training left them; OOV words get the standard
    sequential-application semantics.

    The fold chain is localCheckpoint'd every few rules: each fold nests
    its input expression, and an M-deep nest would blow past the codegen
    method-size limit into the interpreted path (and make analysis
    O(M²)); checkpointing keeps every pass shallow.  At scale this is M
    narrow passes over the DISTINCT-WORD vocab, never the corpus."""
    out = vocab
    for i, (l, r) in enumerate(merges):
        out = out.withColumn("syms", _apply_merge(F.col("syms"), l, r))
        if (i + 1) % 4 == 0:
            out = out.localCheckpoint(eager=True)
    return out


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Corpus tokenization under a learned merge list: one narrow pass
    builds the distinct-word vocab, the merges segment it (O(vocab), not
    O(corpus)), and a word→subword-count join prices every document —
    ``doc_id, n_words, n_bpe_tokens``.  The join side is the distinct
    vocab projected to two columns; AQE broadcasts it when it fits."""
    vocab = (
        docs.select(F.explode(norm_tokens(F.col("text"))).alias("word"))
        .distinct()
        .withColumn(
            "syms",
            F.concat(
                F.regexp_extract_all(F.col("word"), F.lit("."), 0),
                F.array(F.lit(EOW)),
            ),
        )
    )
    seg = apply_merges(vocab, merges).select(
        "word", F.size("syms").alias("n_sub")
    )
    tok = docs.select(
        "doc_id", F.explode(norm_tokens(F.col("text"))).alias("word")
    )
    return (
        tok.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_bpe_tokens"),
        )
    )


def bpe_merges_df(docs: DataFrame, n_merges: int = 20) -> DataFrame:
    """Driver-gate projection: the learned merge table
    ``(rank, lsym, rsym, merged, freq)``."""
    merges, _vocab = bpe_train(docs, n_merges)
    spark = docs.sparkSession
    rows = [
        (i, l, r, l + r, fr) for i, (l, r, fr) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, lsym string, rsym string, merged string, freq long"
    )
