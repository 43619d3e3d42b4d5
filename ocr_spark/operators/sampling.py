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


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: Gumbel-uniform span: the 48-bit md5 prefix as a denominator.
_GUMBEL_SPAN = float(16**_HEX_DIGITS)


def _gram_bucket(gram: Column, n_buckets: int) -> Column:
    """Hashed-feature bucket of a word n-gram: 48-bit md5 prefix mod B —
    exact in both engines (DuckDB: ``cast('0x'||substr(md5(g),1,12) as
    bigint) % B``)."""
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, _HEX_DIGITS), 16, 10)
        .cast("bigint")
        % n_buckets
    )


def _doc_bucket_counts(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, bucket, c) — hashed unigram+bigram feature counts per doc.
    One narrow scan + explode; the (doc_id, bucket) aggregate is the ONLY
    shuffled shape downstream (both the corpus distribution and the
    per-doc scores derive from it), and its key space is uniform by
    construction (md5 buckets), so no salt is ever needed."""
    from ocr_spark.functions.text import ngrams, norm_tokens

    toks = docs.select(
        "doc_id", norm_tokens(F.col("text")).alias("_t")
    ).where(F.size("_t") > 0)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(F.col("_t"), ngrams(F.col("_t"), 2))
        ).alias("gram"),
    )
    return grams.select(
        "doc_id", _gram_bucket(F.col("gram"), n_buckets).alias("bucket")
    ).groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 256,
    cache_registry: list | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight, in integer micro-nats.

    DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): estimate a target distribution p and the raw
    corpus distribution q over HASHED n-gram features (unigrams + bigrams
    → ``n_buckets`` md5 buckets, Laplace +1 smoothing), then weight every
    raw document by its likelihood ratio

        log w(doc) = Σ_gram  [ ln p(bucket(gram)) − ln q(bucket(gram)) ]

    Output: ``doc_id, n_grams, logw_micro`` — one row per doc with ≥ 1
    token.  Docs that look like the target (e.g. clean reference text)
    get high weight; boilerplate/noise the target lacks gets negative.

    Cross-engine exactness (the lm_quality idiom): both per-bucket lns
    are quantized to bigint micro-nats on the B-row bucket table; every
    doc score is then an exact bigint dot product ``Σ c·(lp_t − lp_q)``,
    immune to partial-agg summation order.

    Scale shape: the feature table is FIXED at ``n_buckets`` rows no
    matter the corpus size (that is the point of hashed features) and is
    broadcast to the scoring join; the corpus contributes one narrow
    explode + one uniform-key aggregate; the target slice is small by
    construction.  N_t / N_q are two driver scalars (tfidf precedent).
    """
    tgt = _doc_bucket_counts(target_docs, n_buckets)
    # The (doc_id, bucket) aggregate is consumed three times (the N_q
    # scalar, the corpus distribution, and the scoring join) — persist it
    # so the corpus tokenize/explode runs ONCE.  It is ≤ |docs|·n_buckets
    # rows of three ints (far smaller than the corpus); the caller can
    # unpersist via cache_registry (the curate.py pattern).
    raw = _doc_bucket_counts(docs, n_buckets).persist()
    if cache_registry is not None:
        cache_registry.append(raw)

    tgt_b = tgt.groupBy("bucket").agg(F.sum("c").alias("ct"))
    raw_b = raw.groupBy("bucket").agg(F.sum("c").alias("cq"))
    n_t = tgt_b.agg(F.sum("ct")).collect()[0][0] or 0
    n_q = raw_b.agg(F.sum("cq")).collect()[0][0] or 0

    def micro_ln(count_col: Column, total: int) -> Column:
        return F.round(
            F.log((count_col + 1) / F.lit(float(total + n_buckets))) * 1e6, 0
        ).cast("bigint")

    spark = docs.sparkSession
    buckets = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(tgt_b, "bucket", "left")
        .join(raw_b, "bucket", "left")
        .select(
            "bucket",
            (
                micro_ln(F.coalesce("ct", F.lit(0)), n_t)
                - micro_ln(F.coalesce("cq", F.lit(0)), n_q)
            ).alias("lw_micro"),
        )
    )
    return (
        raw.join(F.broadcast(buckets), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("lw_micro")).cast("bigint").alias(
                "logw_micro"
            ),
        )
    )


def dsir_select(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int = 256,
    seed: int = 42,
    cache_registry: list | None = None,
) -> DataFrame:
    """DSIR selection: sample ``k`` documents without replacement with
    probability ∝ importance weight, via the Gumbel top-k trick (Vieira
    2014): the ``k`` largest ``log w(doc) + Gumbel(doc)`` ARE a
    w-proportional sample-without-replacement.  The Gumbel noise is
    deterministic — ``u = (md5_48(seed|doc_id) + ½) / 2^48``,
    ``g = −ln(−ln u)`` — so the selection is repartition-, rerun- and
    engine-stable, exactly like ``deterministic_sample``.

    Output: ``doc_id, n_grams, logw_micro, gumbel_micro, key_micro`` —
    the selected k docs, key descending (doc_id tie-break).  Top-k is a
    TakeOrderedAndProject, never a global sort.
    """
    u = (
        F.conv(sample_key(F.col("doc_id"), seed), 16, 10).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(_GUMBEL_SPAN)
    gumbel_micro = F.round(-F.log(-F.log(u)) * 1e6, 0).cast("bigint")
    return (
        dsir_weights(docs, target_docs, n_buckets, cache_registry)
        .withColumn("gumbel_micro", gumbel_micro)
        .withColumn(
            "key_micro", F.col("logw_micro") + F.col("gumbel_micro")
        )
        .orderBy(F.desc("key_micro"), F.asc("doc_id"))
        .limit(k)
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test assignment that can never leak a
    near-duplicate across splits: the split key is the md5 sample key of
    the document's near-dup CLUSTER representative, not of the document —
    every member of a cluster lands in the same split by construction
    (the standard eval-leakage defense; splitting per-doc after dedup
    still leaks whenever dedup keeps borderline pairs).

    ``clusters`` is ``neardup_clusters`` output (``doc_id, component``);
    documents absent from it are singletons and key on their own doc_id
    (``component = coalesce(component, doc_id)``).

    Thresholding reuses the exact sampling discipline of this module:
    one shared 12-hex key per component, cumulative hex thresholds for
    (train, train+val), the SAME literal strings planted in the DuckDB
    twin.  Scale shape: one broadcast-or-shuffle left join onto the
    bounded cluster table + a narrow projection; no aggregation at all.

    Output: ``doc_id, component, split`` with split ∈ train|val|test.
    """
    t_train = _threshold_hex(train_frac)
    t_val = _threshold_hex(train_frac + val_frac)
    j = docs.select("doc_id").join(
        clusters.select("doc_id", "component"), "doc_id", "left"
    )
    comp = F.coalesce(F.col("component"), F.col("doc_id"))
    k = sample_key(comp, seed)
    return j.select(
        "doc_id",
        comp.alias("component"),
        F.when(k < F.lit(t_train), "train")
        .when(k < F.lit(t_val), "val")
        .otherwise("test")
        .alias("split"),
    )


def epoch_shuffle(
    docs: DataFrame,
    epochs: int = 2,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle — the data-loader
    contract of every LLM training run: each epoch must visit the corpus
    in a fresh pseudo-random order, the order must be reproducible from
    (seed, epoch) alone, and at 10^12 docs it must materialize WITHOUT a
    global sort into one reducer.

    Order key: ``md5(seed|epoch|doc_id)`` — a new independent permutation
    per epoch, stable under any partitioning or engine.  The global order
    is expressed as ``(shard, pos)``: shard is the bigint of the key's
    first 12 hex chars mod ``n_shards`` (the shards.py idiom), pos is the
    rank *within* the (epoch, shard) partition.  A consumer reads shards
    0..n-1 sequentially (or round-robins them); because the key is
    md5-uniform, interleaving shards is itself an unbiased shuffle.

    Scale shape: ONE shuffle per epoch — the window partitions by
    (epoch, shard), so rank assignment runs ``epochs × n_shards``
    independent bounded tasks; there is deliberately NO
    ``row_number() OVER (ORDER BY key)`` anywhere — a global dense rank
    would funnel the entire corpus through a single task.  In production
    n_shards is sized so docs/n_shards fits a task (~10^5 shards at
    10^12 docs).

    Output: ``epoch, shard, pos, doc_id`` (pos is 1-based, dense within
    its shard).  Beyond-reference scope (training-data pipeline tier,
    SURVEY.md §2 LLM-data table); the DuckDB twin replays the identical
    key and window.
    """
    e = F.explode(
        F.array(*[F.lit(i).cast("bigint") for i in range(int(epochs))])
    ).alias("epoch")
    keyed = docs.select("doc_id", e).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(int(seed))),
                F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("_key"),
    )
    shard = (
        F.conv(F.substring("_key", 1, _HEX_DIGITS), 16, 10).cast("bigint")
        % F.lit(int(n_shards))
    ).alias("shard")
    w = Window.partitionBy("epoch", "shard").orderBy("_key", "doc_id")
    return (
        keyed.select("epoch", shard, "doc_id", "_key")
        .select(
            "epoch",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "doc_id",
        )
    )


# ---------------------------------------------------------------------------
# UniMax — per-language token-budget allocation (Chung et al. 2023)
# ---------------------------------------------------------------------------


def _lang_token_stats(docs: DataFrame, lang_col: str) -> DataFrame:
    """(lang, c) — total normalized-token count per language.  One tiny
    aggregate: the key space is the language set (dozens), the partial
    agg is map-side, and the output frame is dims-sized forever after."""
    from ocr_spark.functions.text import norm_tokens

    return (
        docs.where(F.col(lang_col).isNotNull())
        .select(
            F.col(lang_col).alias("lang"),
            F.size(norm_tokens(F.col("text"))).cast("bigint").alias("_tok"),
        )
        .groupBy("lang")
        .agg(F.sum("_tok").alias("c"))
    )


def unimax_budget(
    docs: DataFrame,
    budget: int,
    max_epochs: int = 2,
    lang_col: str = "lang",
) -> DataFrame:
    """UniMax per-language budget allocation (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", arXiv:2304.09151): distribute a total token
    ``budget`` across languages as uniformly as possible, capping every
    language at ``max_epochs`` passes over its data — the successor to
    temperature sampling that never over-repeats low-resource languages.

    Closed form instead of the paper's per-language loop: with caps
    ``cap_i = c_i * max_epochs`` sorted ascending, the allocation is the
    water-fill ``alloc_i = min(cap_i, t)`` where the water level ``t``
    makes the total spend the budget.  ``f(i) = cap_i*(L-i) + S_i`` (S =
    prefix cap sum) is nondecreasing in i, so the capped set is the
    longest prefix with ``f(i) ≤ budget`` and every uncapped language
    gets the SAME integer share ``(budget - S_k) // (L - k)`` — all
    bigint cross-multiplication, no float, hash-exact in the DuckDB twin.
    (The ≤ L-1 tokens lost to the floor are undistributed by contract.)

    Output: one row per language — ``lang, n_tokens (=c_i), cap, alloc,
    epochs (=round(alloc/c, 6))``.

    Scale shape: the ONLY data-scaled work is the per-language token
    aggregate (uniform map-side partial agg); the water-fill itself runs
    on a dims-sized frame (L = languages, dozens), so its global windows
    are deliberate — a single-partition window over ≤ hundreds of rows,
    never over documents.
    """
    st = _lang_token_stats(docs, lang_col)
    b = F.lit(int(budget)).cast("bigint")
    wo = Window.orderBy("cap", "lang")
    wall = Window.orderBy("cap", "lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    caps = st.select(
        "lang", "c", (F.col("c") * F.lit(int(max_epochs))).alias("cap")
    )
    w = caps.select(
        "lang",
        "c",
        "cap",
        F.row_number().over(wo).cast("bigint").alias("rn"),
        F.sum("cap").over(wcum).alias("s"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("nl"),
    )
    flagged = w.withColumn(
        "_ok", F.col("cap") * (F.col("nl") - F.col("rn")) + F.col("s") <= b
    ).select(
        "*",
        F.max(F.when(F.col("_ok"), F.col("rn")).otherwise(F.lit(0)))
        .over(wall)
        .alias("k"),
        F.max(F.when(F.col("_ok"), F.col("s")).otherwise(F.lit(0)))
        .over(wall)
        .alias("sk"),
    )
    alloc = F.when(F.col("rn") <= F.col("k"), F.col("cap")).otherwise(
        F.least(
            F.col("cap"),
            F.floor((b - F.col("sk")) / (F.col("nl") - F.col("k"))).cast(
                "bigint"
            ),
        )
    )
    return flagged.select(
        "lang",
        F.col("c").alias("n_tokens"),
        "cap",
        alloc.cast("bigint").alias("alloc"),
        F.when(F.col("c") == 0, F.lit(0.0))
        .otherwise(F.round(alloc / F.col("c"), 6))
        .alias("epochs"),
    )


def unimax_plan(
    docs: DataFrame,
    budget: int,
    max_epochs: int = 2,
    lang_col: str = "lang",
    seed: int = 42,
) -> DataFrame:
    """Materialize the UniMax allocation as a per-document epoch plan:
    every document of language ℓ appears ``alloc_ℓ // c_ℓ`` times (full
    epochs), and the remainder ``alloc_ℓ % c_ℓ`` tokens are filled by the
    deterministic-hash-order prefix of ℓ's documents (the same stable
    md5 order every sampler here uses) — ``n_copies`` per doc, ready to
    drive ``epoch_shuffle``.

    Scale shape — the distributed prefix trick: a naive "window cumsum
    per language" makes one mega-partition per language.  Instead docs
    bucket by the FIRST TWO hex chars of their sample key (256 buckets
    per language); bucket token subtotals cumsum on the dims-sized
    (lang, bucket) frame, and the per-doc window runs within (lang,
    bucket) — 256× finer partitions, same exact math, because the bucket
    is a prefix of the ordering key (order by (bucket, key) ≡ order by
    key).  The oracle twin uses the plain single window, which is
    provably the same prefix.

    Output: ``doc_id, lang, n_tokens, n_copies`` (bigint ≥ 0) for every
    document of a non-null language.
    """
    from ocr_spark.functions.text import norm_tokens

    # integral epoch split: `div` is Spark's exact bigint division
    # (DuckDB twin: `//`); zero-token languages are excluded by contract
    al = (
        unimax_budget(docs, budget, max_epochs, lang_col)
        .where(F.col("n_tokens") > 0)
        .select(
            "lang",
            F.expr("alloc div n_tokens").cast("bigint").alias("e"),
            (F.col("alloc") % F.col("n_tokens")).alias("rem"),
        )
    )
    t = (
        docs.where(F.col(lang_col).isNotNull())
        .select(
            "doc_id",
            F.col(lang_col).alias("lang"),
            F.size(norm_tokens(F.col("text"))).cast("bigint").alias("tok"),
            sample_key(F.col("doc_id"), seed).alias("_k"),
        )
        .withColumn("_bkt", F.substring("_k", 1, 2))
    )
    bt = t.groupBy("lang", "_bkt").agg(F.sum("tok").alias("_btok"))
    wb = Window.partitionBy("lang").orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bstart = bt.select(
        "lang",
        "_bkt",
        (F.sum("_btok").over(wb) - F.col("_btok")).alias("_bstart"),
    )
    wf = Window.partitionBy("lang", "_bkt").orderBy("_k", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fine = t.join(bstart, ["lang", "_bkt"]).select(
        "doc_id",
        "lang",
        "tok",
        (F.col("_bstart") + F.sum("tok").over(wf)).alias("_cend"),
    )
    return fine.join(F.broadcast(al), "lang").select(
        "doc_id",
        "lang",
        F.col("tok").alias("n_tokens"),
        (
            F.col("e")
            + F.when(F.col("_cend") <= F.col("rem"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_copies"),
    )
