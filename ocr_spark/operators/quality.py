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
  ``max(count per bigram) / total``.  The mode of an array is the longest
  run of equal ADJACENT elements after ``array_sort`` — so it computes as
  sort + ``zip_with`` equality flags + one ``aggregate`` run-length scan,
  all per-row Catalyst, O(grams·log grams), ZERO shuffles.  (The naive
  in-array count-per-distinct-gram ``aggregate`` would be O(grams²) per
  row — quadratic for exactly the repetitive documents this operator
  exists to catch; the earlier explode-to-rows formulation was linear but
  paid two corpus-wide shuffles for what is a per-document statistic.)

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
    # staged per the HOF rule: sort once into a named column; the lambdas
    # below only touch accumulator fields and elements
    base = (
        docs.withColumn("_toks", norm_tokens(F.col("text")))
        .where(F.size("_toks") >= 3)
        .withColumn("_tri", ngrams(F.col("_toks"), 3))
        .withColumn("_bi", ngrams(F.col("_toks"), 2))
        .withColumn("_sb", F.array_sort("_bi"))
        .withColumn(
            # equal-adjacent flags over the sorted bigrams; empty when
            # there is exactly one bigram (slice length 0)
            "_eq",
            F.expr(
                "zip_with(slice(_sb, 1, size(_sb) - 1),"
                " slice(_sb, 2, size(_sb) - 1), (a, b) -> a = b)"
            ),
        )
    )
    # mode count = longest TRUE run + 1: one O(grams) scan per row
    top_c = F.expr(
        "aggregate(_eq, named_struct('cur', 1L, 'best', 1L),"
        " (acc, e) -> named_struct("
        "   'cur', if(e, acc.cur + 1L, 1L),"
        "   'best', greatest(acc.best, if(e, acc.cur + 1L, 1L))),"
        " acc -> acc.best)"
    )
    return base.select(
        "doc_id",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.round(
            (F.size("_tri") - F.size(F.array_distinct("_tri")))
            / F.size("_tri"),
            6,
        ).alias("dup_trigram_frac"),
        F.round(top_c / F.size("_bi"), 6).alias("top_bigram_frac"),
    ).withColumn(
        "flagged",
        (F.col("top_bigram_frac") > top_bigram_max)
        | (F.col("dup_trigram_frac") > dup_trigram_max),
    )


def lm_quality(
    docs: DataFrame,
    ref_docs: DataFrame,
    nll_max: float = 9.0,
) -> DataFrame:
    """CCNet-style language-model quality filter (Wenzek et al. 2020):
    score each document by its average negative log-likelihood
    under a unigram LM trained on a reference ("clean") corpus slice —
    high-NLL documents are gibberish/OCR-noise/foreign relative to the
    reference distribution and get flagged before tokenization.  (CCNet
    uses a KenLM 5-gram; the unigram form keeps the operator declarative
    and exactly oracle-checkable while preserving the pipeline shape:
    train once, score the corpus with a join.)

    Model: additive smoothing, ``p(w) = (c_w + 1) / (N + V + 1)`` with
    ``c_w`` the reference count (0 for OOV), ``N`` total reference tokens,
    ``V`` the reference vocabulary size.

    Cross-engine exactness: the ONLY float step is the per-distinct-token
    ``ln``, immediately quantized to integer micro-nats
    (``round(-ln(p)·1e6) → bigint``) — document scores are then pure
    bigint sums and exact integer ratios, so partial-agg summation order
    can never flip a hash.  A last-ulp libm divergence could only matter
    if some token's micro-nat value landed within an ulp of .5 — checked
    never on the deterministic fixture, and frozen thereafter.

    Scale shape: the vocab table is bounded (distinct reference tokens),
    so AQE broadcasts the score join in the common case; at web scale
    with a shuffle join, the hot-token skew (stopwords) is the classic
    salting case, but the per-doc aggregate after the join does map-side
    partial aggregation, so the skew cost is bounded to the join itself.
    ``N``/``V`` are two driver scalars (same precedent as tfidf_top's
    ``n_docs``).

    Output: ``doc_id, n_tokens, n_oov, nll_micro, avg_nll, flagged`` —
    one row per scored document with ≥ 1 normalized token.
    """
    ref_tok = ref_docs.select(
        F.explode(norm_tokens(F.col("text"))).alias("tok")
    )
    vocab = ref_tok.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = ref_tok.count()
    v_size = vocab.count()
    denom = float(n_total + v_size + 1)

    def micro_nll(count_col) -> F.Column:
        return F.round(-F.log((count_col + 1) / F.lit(denom)) * 1e6, 0).cast(
            "bigint"
        )

    scored_vocab = vocab.select("tok", micro_nll(F.col("c")).alias("lp"))
    oov_lp = micro_nll(F.lit(0))

    tok = docs.select(
        "doc_id", F.explode(norm_tokens(F.col("text"))).alias("tok")
    )
    joined = tok.join(scored_vocab, "tok", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("lp").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.sum(F.coalesce(F.col("lp"), oov_lp)).alias("nll_micro"),
        )
        .withColumn(
            "avg_nll",
            F.round(F.col("nll_micro") / F.col("n_tokens") / F.lit(1e6), 6),
        )
        .withColumn("flagged", F.col("avg_nll") > nll_max)
        .select(
            "doc_id", "n_tokens", "n_oov", "nll_micro", "avg_nll", "flagged"
        )
    )


#: round(ln(0.4)·1e6) — the Stupid Backoff discount as a frozen integer
#: constant, identical in the Spark plan and the DuckDB twin.
BACKOFF_MICRO = -916291


def bigram_lm_quality(
    docs: DataFrame,
    ref_docs: DataFrame,
    nll_max: float = 9.0,
) -> DataFrame:
    """Stupid Backoff bigram LM quality score (Brants et al. 2007, "Large
    Language Models in Machine Translation") — the n-gram upgrade of
    ``lm_quality``'s unigram model, using the smoothing that was DESIGNED
    for distributed count-based training: no normalized discounting (no
    Kneser-Ney global pass), just

        S(v | u) = c(u,v) / c(u)                 if c(u,v) > 0
                 = 0.4 · (c(v)+1) / (N+V)        otherwise (backoff to the
                                                  add-one unigram, so OOV
                                                  is defined)

    Each document is scored by the negative mean log-score of its bigram
    transitions; high scores = sequences the reference corpus never makes
    (OCR noise, shuffled boilerplate) even when every unigram looks fine —
    the failure mode a unigram LM cannot see.

    Cross-engine exactness (the lm_quality idiom): ln(c2/c1) is quantized
    to micro-nats per DISTINCT reference bigram, ln of the smoothed
    unigram per distinct reference word, and ln(0.4) is the frozen
    integer ``BACKOFF_MICRO``; per-doc scores are exact bigint sums.

    Scale shape: the model is two count tables (distinct reference
    bigrams / unigrams — bounded by the reference slice, broadcast or
    shuffle-joined on uniform md5-distributed keys); the corpus side is
    one narrow explode of bigram transitions and one per-doc aggregate
    with map-side partial agg.  This is exactly the Brants pipeline:
    counts are the model, scoring is a join.

    Output: ``doc_id, n_bigrams, n_backoff, nll_micro, avg_nll, flagged``
    — one row per document with ≥ 2 normalized tokens.
    """
    ref_tok = ref_docs.select(
        norm_tokens(F.col("text")).alias("_t")
    ).where(F.size("_t") > 0)
    ref_uni = ref_tok.select(F.explode("_t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c1")
    )
    ref_bi = (
        ref_tok.select(F.explode(ngrams(F.col("_t"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    totals = ref_uni.agg(
        F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_ref, v_ref = int(totals["n"]), int(totals["v"])
    denom = float(n_ref + v_ref)

    def micro(col) -> F.Column:
        return F.round(F.log(col) * 1e6, 0).cast("bigint")

    # per-bigram log score needs c(u): join the bigram table to the
    # unigram table on the bigram's first word, once, model-side
    bi_scored = (
        ref_bi.withColumn("u", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
        .join(ref_uni.withColumnRenamed("w", "u"), "u")
        .select("g", micro(F.col("c2") / F.col("c1")).alias("lp2"))
    )
    uni_scored = ref_uni.select(
        F.col("w").alias("v2"),
        micro((F.col("c1") + 1) / F.lit(denom)).alias("lp1"),
    )
    oov_lp1 = micro(F.lit(1) / F.lit(denom))

    doc_bi = (
        docs.select("doc_id", norm_tokens(F.col("text")).alias("_t"))
        .where(F.size("_t") >= 2)
        .select("doc_id", F.explode(ngrams(F.col("_t"), 2)).alias("g"))
        .withColumn("v2", F.split_part(F.col("g"), F.lit(" "), F.lit(2)))
    )
    scored = (
        doc_bi.join(bi_scored, "g", "left")
        .join(uni_scored, "v2", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("lp2"),
                F.lit(BACKOFF_MICRO) + F.coalesce(F.col("lp1"), oov_lp1),
            ).alias("lp"),
            F.col("lp2").isNull().cast("int").alias("is_backoff"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("is_backoff").cast("bigint").alias("n_backoff"),
            (-F.sum("lp")).cast("bigint").alias("nll_micro"),
        )
        .withColumn(
            "avg_nll",
            F.round(F.col("nll_micro") / F.col("n_bigrams") / F.lit(1e6), 6),
        )
        .withColumn("flagged", F.col("avg_nll") > nll_max)
        .select(
            "doc_id", "n_bigrams", "n_backoff", "nll_micro", "avg_nll",
            "flagged",
        )
    )


def ccnet_partition(
    docs: DataFrame,
    ref_docs: DataFrame,
    mid_frac: float = 0.5,
    seed: int = 42,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's perplexity bucketing + selection (Wenzek et al. 2020 §4.4):
    score the corpus with the reference LM, split it into head / middle /
    tail perplexity buckets, keep all of head, a deterministic sample of
    middle, none of tail — the standard recipe for trading corpus size
    against reference-likeness.

    Buckets here are the lowest quartile (head), the inter-quartile band
    (middle) and the top quartile (tail) of ``avg_nll`` (CCNet uses
    per-language tercile cutoffs; quartile fractions are chosen because
    0.25/0.75 are exact binary doubles).  The cutoffs are two driver
    scalars from one exact-percentile action — CCNet likewise computes
    them offline once.  Threshold comparisons are robust to last-ulp
    interpolation differences between engines: an interpolated cutoff
    lies strictly between two adjacent data values (or exactly on one),
    so ``avg_nll <= cut`` cannot flip.

    The middle-bucket sample reuses ``keep_predicate`` — a pure function
    of (doc_id, seed), so the kept set is repartition/engine-stable.

    Scale shape: scoring is ``lm_quality`` (one corpus scan + bounded
    vocab join); the exact percentile is the only wide step.  At 10^12
    rows pass ``approx=True``: the cutoffs come from Spark's
    Greenwald–Khanna sketch (``approx_percentile``, the
    ``doclen_quantile_sketch`` precedent) — a mergeable fixed-size
    per-partition summary, map-side combined, so the quantile step
    becomes one narrow scan + tiny merge instead of a full sort.
    ``accuracy`` bounds the sketch's rank error at 1/accuracy of N; the
    kept set shifts only for docs whose ``avg_nll`` lies within that
    rank band of a cutoff (tolerance-gated in pytest).  Exact mode
    (default) is the DuckDB-oracle twin — the bucket/keep projection
    itself is narrow in both modes.

    Output: ``doc_id, n_tokens, avg_nll, bucket, kept``.
    """
    from ocr_spark.operators.sampling import keep_predicate

    scored = lm_quality(docs, ref_docs)
    if approx:
        pct = F.expr(
            f"approx_percentile(avg_nll, array(0.25d, 0.75d), {int(accuracy)})"
        )
    else:
        pct = F.percentile("avg_nll", F.array(F.lit(0.25), F.lit(0.75)))
    cuts = scored.agg(pct.alias("q")).collect()[0]["q"]
    t1, t2 = float(cuts[0]), float(cuts[1])
    is_head = F.col("avg_nll") <= F.lit(t1)
    is_mid = F.col("avg_nll") <= F.lit(t2)
    return scored.select(
        "doc_id",
        "n_tokens",
        "avg_nll",
        F.when(is_head, F.lit("head"))
        .when(is_mid, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        F.when(is_head, F.lit(True))
        .when(is_mid, keep_predicate(F.col("doc_id"), mid_frac, seed))
        .otherwise(F.lit(False))
        .alias("kept"),
    )


def _drift_counts(a_docs: DataFrame, b_docs: DataFrame):
    """Shared builder for the drift family: full-outer word counts of two
    snapshots plus per-word quantized JSD contributions.

    Returns ``(df, n_a, n_b)`` with columns ``word, cnt_a, cnt_b,
    contrib_a, contrib_b``:

        p = cnt_a/N_a, q = cnt_b/N_b, m = (p+q)/2
        contrib_a = cnt_a · round(ln(p/m)·1e6)   (0 when cnt_a = 0)
        contrib_b = cnt_b · round(ln(q/m)·1e6)   (0 when cnt_b = 0)

    with ``p/m = 2·cnt_a·N_b / (cnt_a·N_b + cnt_b·N_a)`` — a ratio of
    exact integers evaluated in one double division, so (lm_quality rule)
    the ONLY float steps are that ratio and its ``ln``, quantized to
    integer micro-nats immediately; everything downstream is bigint and
    order-independent.  Snapshot totals are two driver scalars (the
    tfidf/doc-count precedent).  Scale shape: one shuffle per snapshot on
    ``word`` + one full-outer merge join on the same key; no broadcast of
    anything corpus-sized.
    """
    def counts(docs: DataFrame, name: str) -> DataFrame:
        return (
            docs.select(F.explode(norm_tokens(F.col("text"))).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca, cb = counts(a_docs, "cnt_a"), counts(b_docs, "cnt_b")
    n_a = int(ca.agg(F.coalesce(F.sum("cnt_a"), F.lit(0))).first()[0])
    n_b = int(cb.agg(F.coalesce(F.sum("cnt_b"), F.lit(0))).first()[0])
    j = (
        ca.join(cb, "word", "full_outer")
        .select(
            "word",
            F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
        )
        .withColumn("ca_nb", F.col("cnt_a") * F.lit(n_b))
        .withColumn("cb_na", F.col("cnt_b") * F.lit(n_a))
    )

    def contrib(cnt: str, num: str) -> F.Column:
        ratio = (F.lit(2.0) * F.col(num).cast("double")) / (
            F.col("ca_nb") + F.col("cb_na")
        ).cast("double")
        micro = F.round(F.log(ratio) * 1e6, 0).cast("bigint")
        return F.when(F.col(cnt) > 0, F.col(cnt) * micro).otherwise(
            F.lit(0).cast("bigint")
        )

    out = j.select(
        "word",
        "cnt_a",
        "cnt_b",
        contrib("cnt_a", "ca_nb").alias("contrib_a"),
        contrib("cnt_b", "cb_na").alias("contrib_b"),
    )
    return out, n_a, n_b


def vocab_drift(
    a_docs: DataFrame, b_docs: DataFrame, top_k: int = 200
) -> DataFrame:
    """Top-k drifted vocabulary between two corpus snapshots — the
    monitoring table a continuously-crawled training corpus needs: which
    words' frequencies moved most between yesterday's and today's crawl
    (new spam campaign, source gone dark, language shift).

    Per-word drift = the word's Jensen-Shannon divergence contribution
    on the common denominator: ``contrib_a·N_b + contrib_b·N_a``
    (bigint; ≥ 0 by JSD pointwise convexity — each word's two KL terms
    can't both be negative).  Deterministic order: drift desc, word asc.
    100 TB note: the rank key is ≤ N_a·N_b·ln2·1e6 — at trillion-token
    snapshots cast the two products to ``decimal(38,0)`` before the sum;
    bigint holds comfortably to ~10⁵-token snapshots per side squared.

    Output: ``word, cnt_a, cnt_b, drift`` (top_k rows).
    """
    d, n_a, n_b = _drift_counts(a_docs, b_docs)
    return (
        d.select(
            "word",
            "cnt_a",
            "cnt_b",
            (
                F.col("contrib_a") * F.lit(n_b)
                + F.col("contrib_b") * F.lit(n_a)
            ).alias("drift"),
        )
        .orderBy(F.col("drift").desc(), F.col("word").asc())
        .limit(top_k)
    )


def corpus_jsd(a_docs: DataFrame, b_docs: DataFrame) -> DataFrame:
    """One-row snapshot-divergence summary: the corpus-level JSD in
    integer micro-nats, ``(Σcontrib_a div N_a + Σcontrib_b div N_b)
    div 2``, plus the vocab and token counts per side — the scalar a
    drift alarm thresholds on.  All-bigint after the per-word
    quantization, so exact across engines.

    The division happens on the NONNEGATIVE common-denominator form
    ``Σ(contrib_a·N_b + contrib_b·N_a) div (2·N_a·N_b)`` — per-word that
    numerator is ≥ 0 (JSD pointwise convexity), while ``Σcontrib_a``
    alone can be negative, and negative integer division is where
    engines disagree (Spark ``div`` truncates toward zero, DuckDB ``//``
    floors)."""
    d, n_a, n_b = _drift_counts(a_docs, b_docs)
    return d.agg(
        F.expr(
            f"cast(sum(contrib_a * {max(n_b, 1)}"
            f" + contrib_b * {max(n_a, 1)}) as bigint)"
            f" div {2 * max(n_a, 1) * max(n_b, 1)}"
        ).alias("jsd_micro"),
        F.count(F.lit(1)).alias("vocab_union"),
        F.sum(F.when(F.col("cnt_a") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_a"),
        F.sum(F.when(F.col("cnt_b") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("vocab_b"),
        F.lit(n_a).cast("bigint").alias("tokens_a"),
        F.lit(n_b).cast("bigint").alias("tokens_b"),
    )


def compression_ratio(
    docs: DataFrame,
    low: float = 0.30,
    high: float = 0.75,
    level: int = 6,
) -> DataFrame:
    """Compression-ratio quality signal (the Gopher-era zlib proxy, Rae
    et al. 2021 App. A): ``compressed_bytes / raw_bytes`` of the UTF-8
    text.  Highly repetitive boilerplate compresses far below normal
    prose (ratio < ``low`` → flagged repetitive); random/binary-ish
    noise barely compresses (ratio > ``high`` → flagged noise; note
    random *ASCII* tops out near 0.78 — entropy coding of a 62-symbol
    alphabet costs ~5.95 bits/char — so the noise bar sits at 0.75,
    not near 1.0 as it would for raw bytes).  It
    catches repetition structures the n-gram rules miss (long-period
    templates, interleaved repeats) at one pass over the bytes.

    Arrow-batched ``mapInArrow`` kernel (zlib is C-speed; the Python loop
    is per-document, not per-token, and each batch is one GIL-held burst)
    — no shuffle, linear scan, the narrow-stage shape of the extraction
    kernel.  Ratios are quantized to integer micro-units
    (``round(c/r·1e6)``) so downstream thresholds are exact integer
    comparisons; zlib output length is deterministic for a fixed level
    and library version, and the container pins one zlib — the gate is
    rows-only + pytest (no SQL engine ships zlib), same class as the
    multimodal kernels.

    Output: ``doc_id, raw_bytes, comp_bytes, ratio_micro, flag``
    (flag ∈ ok|repetitive|noise; empty docs flag ``noise`` — zero signal).
    """
    import pyarrow as pa

    lo_q, hi_q = int(low * 1e6), int(high * 1e6)
    ddl = (
        "doc_id bigint, raw_bytes bigint, comp_bytes bigint, "
        "ratio_micro bigint, flag string"
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("raw_bytes", pa.int64()),
            ("comp_bytes", pa.int64()),
            ("ratio_micro", pa.int64()),
            ("flag", pa.string()),
        ]
    )

    def fn(it):
        import zlib

        for batch in it:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            raw, comp, ratio, flag = [], [], [], []
            for t in texts:
                b = (t or "").encode("utf-8")
                c = zlib.compress(b, level) if b else b""
                r_q = round(len(c) / len(b) * 1e6) if b else 10**6 * 2
                raw.append(len(b))
                comp.append(len(c))
                ratio.append(r_q)
                flag.append(
                    "repetitive"
                    if r_q < lo_q
                    else ("noise" if r_q > hi_q else "ok")
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(raw, pa.int64()),
                    pa.array(comp, pa.int64()),
                    pa.array(ratio, pa.int64()),
                    pa.array(flag, pa.string()),
                ],
                schema=out_schema,
            )

    return docs.select("doc_id", "text").mapInArrow(fn, ddl)


# --- C4 heuristic clean (Raffel et al. 2020 §2.2) -----------------------

# Frozen C4 constants, shared verbatim with the DuckDB twin.
C4_MIN_WORDS = 5          # a line must carry >= 5 whitespace words
C4_MIN_SENTENCES = 3      # a page must keep >= 3 sentences
C4_TERMINAL_RE = '[.!?"]$'  # line must end in terminal punctuation
C4_LINE_BAD = "javascript"  # cookie-warning marker (line-level drop)
C4_PAGE_LOREM = "lorem ipsum"  # page-level drops
C4_PAGE_BRACE = "{"


def c4_line_filter(docs: DataFrame) -> DataFrame:
    """C4 heuristic cleaning (Raffel et al. 2020 §2.2) — the line-level
    rule-set every large text corpus since C4 starts from:

    * keep only lines that end in terminal punctuation (``. ! ? "``),
    * carry >= ``C4_MIN_WORDS`` whitespace words,
    * and do not mention "javascript" (the cookie-warning heuristic);
    * then keep only pages whose retained text has >=
      ``C4_MIN_SENTENCES`` sentences (terminal-punct occurrences — the
      deterministic cross-engine analog of the paper's nltk splitter),
      no "lorem ipsum", and no ``{`` (code page marker).

    Pure Catalyst, zero shuffle: one ``split`` on newline into a staged
    array column, one ``filter`` HOF whose lambda touches only the line
    element (per-element regexps are inherently per-element — the
    HOF-staging rule bars *re-inlined shared* subexpressions, not these),
    one ``array_join`` back.  At 10^12 docs this is a narrow scan stage
    fused into whole-stage codegen — the same shape as `doc_repetition`.

    Output: ``doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, keep, text_clean`` (one row per document; null text =
    empty page, dropped).  The DuckDB twin mirrors every rule from the
    same frozen constants.
    """
    min_w = int(C4_MIN_WORDS)
    lines = F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
    base = docs.select("doc_id", lines.alias("_lines"))
    kept = F.filter(
        F.col("_lines"),
        lambda l: (
            F.rtrim(l).rlike(C4_TERMINAL_RE)
            & (F.size(F.split(F.trim(l), r"\s+")) >= min_w)
            & ~F.lower(l).contains(C4_LINE_BAD)
        ),
    )
    staged = base.select(
        "doc_id",
        F.size("_lines").cast("bigint").alias("n_lines"),
        kept.alias("_kept"),
    ).select(
        "doc_id",
        "n_lines",
        F.size("_kept").cast("bigint").alias("n_kept_lines"),
        F.array_join("_kept", "\n").alias("text_clean"),
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("text_clean"), F.lit("[.!?]"), 0)
    ).cast("bigint")
    has_lorem = F.lower("text_clean").contains(C4_PAGE_LOREM)
    has_brace = F.col("text_clean").contains(C4_PAGE_BRACE)
    return staged.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_sent >= int(C4_MIN_SENTENCES)) & ~has_lorem & ~has_brace
        ).alias("keep"),
        "text_clean",
    )


# C4's remaining §2.2 page rule: any page containing a word on the "bad
# words" blocklist is removed wholesale.  The production pipeline uses the
# LDNOOBW obscenity list (~400 English entries); shipping that list adds
# nothing to the mechanics, so this frozen placeholder stands in — chosen
# to intersect the synthetic corpus vocabulary so the driver fixture
# exercises both the kill and keep branches.  Swap the real list in (or
# pass one) in production.
C4_BADWORDS: tuple[str, ...] = ("dup", "slow")


def c4_badword_filter(
    docs: DataFrame, badwords: tuple[str, ...] = C4_BADWORDS
) -> DataFrame:
    """C4 §2.2 blocklist page-kill (Raffel et al. 2020): drop every page
    whose normalized tokens contain ANY blocklisted word — the companion
    to :func:`c4_line_filter`'s line rules (C4 applies both).

    Zero shuffle, pure Catalyst: normalized tokens staged once, one
    ``filter``-HOF membership count whose lambda touches only the token
    element (the list is a literal IN-set, codegen'd as a hash lookup).
    At a realistic ~400-word list prefer exactly this shape over a
    broadcast join: the list is far below broadcast overhead and the scan
    stays a single narrow stage.

    Output: ``doc_id, n_bad_hits, keep`` (hits counted with multiplicity;
    ``keep = n_bad_hits == 0``).  DuckDB twin mirrors the same frozen
    constants via ``len(list_filter(toks, t -> t in (...)))``.
    """
    from ocr_spark.functions.text import count_in

    staged = docs.select(
        "doc_id",
        norm_tokens(F.coalesce(F.col("text"), F.lit(""))).alias("_toks"),
    )
    hits = count_in(F.col("_toks"), badwords).cast("bigint")
    return staged.select(
        "doc_id",
        hits.alias("n_bad_hits"),
        (hits == 0).alias("keep"),
    )


# --- Gopher quality rules (Rae et al. 2021, App. A1) --------------------

# Frozen constants, shared verbatim with the DuckDB twin.  All ratio
# thresholds are applied as integer cross-multiplications (house rule:
# no float anywhere → bit-identical across engines).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3          # 3 <= sum_len/n_words <= 10
GOPHER_MAX_MEAN_LEN = 10
GOPHER_SYMBOL_RATIO_10 = 1       # n_sym/n_words <= 0.1  ⇔ 10·n_sym <= n_words
GOPHER_BULLET_RATIO_10 = 9       # <= 90% lines bullet-led
GOPHER_ELLIPSIS_RATIO_10 = 3     # <= 30% lines ellipsis-ended
GOPHER_ALPHA_RATIO_5 = 4         # >= 80% words alphabetic ⇔ 5·n_alpha >= 4·n
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("•", "-", "*")


def gopher_rules(
    docs: DataFrame,
    min_words: int = GOPHER_MIN_WORDS,
    keep_cols: tuple = (),
) -> DataFrame:
    """Gopher repetition-free quality rules (Rae et al. 2021 App. A1) —
    the rule-set MassiveText/Gopher filtered on and every corpus since
    (RefinedWeb, Dolma, FineWeb) inherited:

    * r_word_count  — 50 ≤ words ≤ 100,000 (whitespace tokens),
    * r_mean_len    — mean word length in [3, 10],
    * r_symbol      — '#' and '…'/'...' each ≤ 0.1 per word,
    * r_bullet      — ≤ 90% of lines start with a bullet (• - *),
    * r_ellipsis    — ≤ 30% of lines end with an ellipsis,
    * r_alpha       — ≥ 80% of words contain an alphabetic char,
    * r_stop        — ≥ 2 DISTINCT hits from the canonical 8-stopword
      list (the, be, to, of, and, that, have, with),
    * keep = all of the above.

    All ratios are integer cross-multiplications of bigint counts — no
    division, no float, so the DuckDB twin is hash-exact.  Symbol counts
    use the length-difference-after-replace idiom (both engines replace
    non-overlapping left-to-right).  Pure Catalyst, zero shuffle: staged
    array columns (lines, words) + size/filter HOFs fused into the scan
    stage — the same narrow shape as ``c4_line_filter``.

    Output: ``doc_id, n_words, sum_word_len, n_lines, n_bullet_lines,
    n_ellipsis_lines, n_alpha_words, n_hash, n_ellipsis, n_stop_hits,
    r_* flags, keep``.
    """
    txt = F.coalesce(F.col("text"), F.lit(""))
    staged = docs.select(
        "doc_id",
        *keep_cols,
        F.filter(
            F.split(F.trim(txt), r"\s+"), lambda w: w != ""
        ).alias("_words"),
        F.split(txt, "\n").alias("_lines"),
        (
            F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
        ).cast("bigint").alias("n_hash"),
        (
            (
                F.length(txt)
                - F.length(F.replace(txt, F.lit("..."), F.lit("")))
            )
            / 3
            + (
                F.length(txt)
                - F.length(F.replace(txt, F.lit("…"), F.lit("")))
            )
        ).cast("bigint").alias("n_ellipsis"),
    )
    bullet_led = F.filter(
        F.col("_lines"),
        lambda l: F.substring(F.ltrim(l), 1, 1).isin(*GOPHER_BULLETS),
    )
    ellipsis_ended = F.filter(
        F.col("_lines"),
        lambda l: F.rtrim(l).endswith("...")
        | F.rtrim(l).endswith("…"),
    )
    alpha_words = F.filter(
        F.col("_words"), lambda w: w.rlike("[A-Za-z]")
    )
    lower_words = F.transform(F.col("_words"), F.lower)
    stop_hits = sum(
        F.array_contains(lower_words, s).cast("int")
        for s in GOPHER_STOPWORDS
    ).cast("bigint")
    sum_len = F.aggregate(
        F.transform(F.col("_words"), lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    counted = staged.select(
        "doc_id",
        *keep_cols,
        F.size("_words").cast("bigint").alias("n_words"),
        sum_len.alias("sum_word_len"),
        F.size("_lines").cast("bigint").alias("n_lines"),
        F.size(bullet_led).cast("bigint").alias("n_bullet_lines"),
        F.size(ellipsis_ended).cast("bigint").alias("n_ellipsis_lines"),
        F.size(alpha_words).cast("bigint").alias("n_alpha_words"),
        "n_hash",
        "n_ellipsis",
        stop_hits.alias("n_stop_hits"),
    )
    c = F.col
    rules = {
        "r_word_count": (c("n_words") >= int(min_words))
        & (c("n_words") <= GOPHER_MAX_WORDS),
        "r_mean_len": (
            c("sum_word_len") >= GOPHER_MIN_MEAN_LEN * c("n_words")
        )
        & (c("sum_word_len") <= GOPHER_MAX_MEAN_LEN * c("n_words")),
        "r_symbol": (
            10 * c("n_hash") <= GOPHER_SYMBOL_RATIO_10 * c("n_words")
        )
        & (10 * c("n_ellipsis") <= GOPHER_SYMBOL_RATIO_10 * c("n_words")),
        "r_bullet": 10 * c("n_bullet_lines")
        <= GOPHER_BULLET_RATIO_10 * c("n_lines"),
        "r_ellipsis": 10 * c("n_ellipsis_lines")
        <= GOPHER_ELLIPSIS_RATIO_10 * c("n_lines"),
        "r_alpha": 5 * c("n_alpha_words")
        >= GOPHER_ALPHA_RATIO_5 * c("n_words"),
        "r_stop": c("n_stop_hits") >= GOPHER_MIN_STOP_HITS,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return counted.select(
        "*",
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )


# Gopher repetition-rule constants (Rae et al. 2021 App. A1, the
# duplicate-line/paragraph half of the rule set; the n-gram half lives
# in doc_repetition).  Integer cross-multiplication thresholds.
GOPHER_DUP_FRAC_10 = 3        # dup line/para fraction <= 0.30
GOPHER_DUP_CHAR_FRAC_5 = 1    # dup line/para CHAR fraction <= 0.20


def gopher_repetition(docs: DataFrame, keep_cols: tuple = ()) -> DataFrame:
    """Gopher duplicate-line / duplicate-paragraph rules (Rae et al.
    2021 App. A1): a page fails when

    * > 30% of its lines (or paragraphs) are duplicate OCCURRENCES
      (occurrences beyond the first of each distinct value), or
    * > 20% of its characters sit in those duplicate occurrences.

    Per-row, zero shuffle: lines (split on ``\\n``) and paragraphs
    (split on blank line) are sorted once into staged array columns;
    duplicate occurrences and their character mass come from ONE
    adjacent-equality ``zip_with`` over each sorted array (the
    doc_repetition idiom) — no explode, no per-doc groupBy, so at
    10^12 docs this stays a narrow scan stage.  Fractions are never
    materialized: all four rules are integer cross-multiplied bigint
    comparisons, hash-exact against the DuckDB twin.

    Output: ``doc_id, n_lines, dup_lines, dup_line_chars,
    line_chars, n_paras, dup_paras, dup_para_chars, para_chars,
    r_dup_lines, r_dup_line_chars, r_dup_paras, r_dup_para_chars,
    keep``.
    """
    txt = F.coalesce(F.col("text"), F.lit(""))

    def dup_stats(arr_col: str, prefix: str) -> list:
        dup_flags = F.expr(
            f"zip_with(slice({arr_col}, 1, size({arr_col}) - 1),"
            f" slice({arr_col}, 2, size({arr_col}) - 1), (a, b) -> a = b)"
        )
        dup_n = F.aggregate(
            dup_flags,
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + F.when(e, 1).otherwise(0).cast("bigint"),
        )
        dup_chars = F.expr(
            f"aggregate(zip_with(slice({arr_col}, 1, size({arr_col}) - 1),"
            f" slice({arr_col}, 2, size({arr_col}) - 1),"
            " (a, b) -> if(a = b, length(b), 0)),"
            " 0L, (acc, v) -> acc + cast(v as bigint))"
        )
        total_chars = F.aggregate(
            F.transform(F.col(arr_col), lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        return [
            F.size(arr_col).cast("bigint").alias(f"n_{prefix}s"),
            dup_n.alias(f"dup_{prefix}s"),
            dup_chars.alias(f"dup_{prefix}_chars"),
            total_chars.alias(f"{prefix}_chars"),
        ]

    staged = docs.select(
        "doc_id",
        *keep_cols,
        F.array_sort(F.split(txt, "\n")).alias("_sl"),
        F.array_sort(F.split(txt, "\n\n")).alias("_sp"),
    )
    counted = staged.select(
        "doc_id",
        *keep_cols,
        *dup_stats("_sl", "line"),
        *dup_stats("_sp", "para"),
    )
    c = F.col
    rules = {
        "r_dup_lines": 10 * c("dup_lines")
        <= GOPHER_DUP_FRAC_10 * c("n_lines"),
        "r_dup_line_chars": 5 * c("dup_line_chars")
        <= GOPHER_DUP_CHAR_FRAC_5 * c("line_chars"),
        "r_dup_paras": 10 * c("dup_paras")
        <= GOPHER_DUP_FRAC_10 * c("n_paras"),
        "r_dup_para_chars": 5 * c("dup_para_chars")
        <= GOPHER_DUP_CHAR_FRAC_5 * c("para_chars"),
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return counted.select(
        "*",
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )


def quality_stack(docs: DataFrame, min_words: int = 10) -> DataFrame:
    """The standard web-text filter funnel, composed: C4 line/page clean
    → Gopher quality rules → Gopher repetition rules, with stages 2–3
    reading the C4-CLEANED text (the order every production pipeline
    uses — rule stats over text whose boilerplate lines are already
    gone).  ``min_words`` relaxes the Gopher word floor for short-page
    corpora (frozen 50 default upstream).

    The whole stack is projections over staged array columns — the
    composed job is still ONE narrow scan stage, zero Exchange
    (plan-asserted in tests): at 10^12 docs the full filter battery
    costs exactly one pass over the bytes.  Per-stage verdicts are kept
    so retention-by-stage is one cheap aggregate downstream.

    Output: ``doc_id, c4_keep, gopher_keep, rep_keep, keep``.
    """
    s1 = c4_line_filter(docs).select(
        "doc_id",
        F.col("keep").alias("c4_keep"),
        F.col("text_clean").alias("text"),
    )
    s2 = gopher_rules(
        s1, min_words=min_words, keep_cols=("c4_keep", "text")
    ).select(
        "doc_id", "c4_keep", F.col("keep").alias("gopher_keep"), "text"
    )
    s3 = gopher_repetition(s2, keep_cols=("c4_keep", "gopher_keep"))
    return s3.select(
        "doc_id",
        "c4_keep",
        "gopher_keep",
        F.col("keep").alias("rep_keep"),
        (
            F.col("c4_keep") & F.col("gopher_keep") & F.col("keep")
        ).alias("keep"),
    )


# Paragraph boundary for language segmentation (twin-shared constant).
PARA_SPLIT_RE = r"\n\n"


def lang_segments(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-paragraph language segmentation: split each document at blank
    lines, language-ID every paragraph, and merge contiguous same-language
    runs into segments — the CCNet/OSCAR move for multilingual pages
    (Wenzek et al. 2020 §3 runs fastText per PARAGRAPH because web pages
    routinely interleave languages: boilerplate in one, content in
    another; a single doc-level label either drops the page or poisons a
    monolingual corpus with the minority-language payload).

    Output: ``doc_id, seg_id bigint, lang, n_paras bigint, first_para
    int, text`` — ``text`` is the segment's paragraphs rejoined with the
    blank-line separator, so a consumer can route each segment to its
    language bucket independently.  Whitespace-only paragraphs are
    dropped before indexing (both engines), and the paragraph language is
    :func:`ocr_spark.functions.text.lang_pred` over normalized tokens —
    zero-score paragraphs take the deterministic lexicographic tie-break.

    Scale shape: ONE shuffle.  The paragraph fan-out is a narrow
    ``posexplode``; the run detection is a lag + running-sum window on
    (doc_id, para_idx); and the final per-(doc_id, seg_id) aggregate is
    satisfied by the window's hash partitioning on doc_id (grouping keys
    are a superset of the partition key), so no second Exchange appears —
    plan-asserted in tests.  Per-doc work is bounded by paragraph count;
    mega-docs spread their cost across their own paragraphs inside one
    partition, the same bound the extraction kernel accepts.
    """
    from pyspark.sql.window import Window

    from ocr_spark.functions.text import (
        LANG_STOPWORDS,
        count_in,
        norm_tokens,
    )

    paras = F.filter(
        F.split(F.col(text_col), PARA_SPLIT_RE),
        lambda p: F.trim(p) != "",
    )
    pe = docs.select(
        "doc_id", F.posexplode(paras).alias("para_idx", "para")
    )
    # Stage tokens and the five scores as NAMED columns before building
    # the argmax CASE chain: lang_pred(norm_tokens(col)) as one expression
    # re-inlines the tokenization into every score reference of the chain
    # (the BENCH/BASELINE.md §3 trap; measured 4.1x at sf0.1, A/B in §3).
    langs = sorted(LANG_STOPWORDS)
    st = pe.withColumn("_toks", norm_tokens(F.col("para"))).select(
        "doc_id",
        "para_idx",
        "para",
        *[
            count_in(F.col("_toks"), LANG_STOPWORDS[lang]).alias(f"_s_{lang}")
            for lang in langs
        ],
    )
    best = F.col(f"_s_{langs[0]}")
    pred = F.lit(langs[0])
    for lang in langs[1:]:
        is_better = F.col(f"_s_{lang}") > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, F.col(f"_s_{lang}")).otherwise(best)
    pl = st.select("doc_id", "para_idx", "para", pred.alias("lang"))
    w = Window.partitionBy("doc_id").orderBy("para_idx")
    prev = F.lag("lang").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("lang")), 1).otherwise(0)
    seg = pl.withColumn("seg_id", F.sum(chg).over(w))
    return seg.groupBy("doc_id", "seg_id").agg(
        F.min("lang").alias("lang"),
        F.count(F.lit(1)).alias("n_paras"),
        F.min("para_idx").cast("int").alias("first_para"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("text"),
    )


# Rae et al. 2021 App. A1 rows 4-11 (the n-gram half of the repetition
# battery; the line/paragraph half is gopher_repetition above).  A page
# fails when the top n-gram's character share exceeds pct/100 (n=2,3,4) or
# when characters covered by ANY duplicated n-gram exceed pct/100
# (n=5..10).  Shared verbatim with the DuckDB twin.
GOPHER_TOP_NGRAM_PCT: dict[int, int] = {2: 20, 3: 18, 4: 16}
GOPHER_DUP_NGRAM_PCT: dict[int, int] = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def gopher_ngram_repetition(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The word-n-gram half of Gopher's repetition rules (Rae et al. 2021
    App. A1): kill a page when its most frequent {2,3,4}-gram accounts for
    more than {20,18,16}% of characters, or when characters covered by
    duplicated {5..10}-grams exceed {15..10}%.

    Frozen accounting (documented spec, identical in the DuckDB twin —
    implementations of the paper differ here, so the convention is pinned):
    tokens are raw whitespace tokens; all denominators are total token
    characters EXCLUDING separators (``sum(length(tok))``); the top-n-gram
    numerator is ``count × token-chars-of-the-gram`` (its n−1 internal
    spaces excluded; ties broken by max count then lexicographically
    smallest gram; a top gram occurring only ONCE contributes 0 — a
    singleton is not repetition, and without this guard any two-word
    document dies to its own bigram); the dup-n-gram numerator
    de-overlaps (each covered
    token position counts once per n, the DataTrove ``find_duplicates``
    convention).  Every rule is an integer cross-multiplication — no
    floats anywhere, so the battery is hash-exact cross-engine.

    Scale shape: ONE token explode feeds everything.  All nine gram sizes
    come from nine ``lead()`` columns over a single (doc_id, pos) window —
    not nine array builds — then stack into (n, pos, gram) rows whose
    count window keys on (doc_id, n, gram).  Coverage de-overlap is a
    bounded ``sequence`` fan-out (≤10 rows per duplicated gram) plus one
    distinct; per-doc work is O(tokens × 9) with uniform keys (the doc_id
    is in every shuffle key, so a mega-doc spreads over its own grams).

    Output: ``doc_id, tok_chars, top{2,3,4}_chars, dup{5..10}_chars,
    r_top{n}…, r_dup{n}…, keep``.
    """
    from pyspark.sql.window import Window

    from ocr_spark.functions.text import tokens

    toks = F.filter(
        tokens(F.coalesce(F.col(text_col), F.lit(""))), lambda t: t != ""
    )
    base = docs.select("doc_id", toks.alias("_t"))
    tok_chars = base.select(
        "doc_id",
        F.aggregate(
            F.transform(F.col("_t"), lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("tok_chars"),
    )
    tp = base.select(
        "doc_id", F.posexplode(F.col("_t")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [
        F.lead("tok", k).over(w).alias(f"_l{k}") for k in range(1, 10)
    ]
    ns = sorted(GOPHER_TOP_NGRAM_PCT) + sorted(GOPHER_DUP_NGRAM_PCT)
    led = tp.select("doc_id", "pos", *leads)
    gram_structs = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ", F.col("tok"), *[F.col(f"_l{k}") for k in range(1, n)]
                ).alias("gram"),
                # NULL gram marker: the window ran off the doc's end
                F.col(f"_l{n - 1}").isNotNull().alias("ok"),
            )
            for n in ns
        ]
    )
    ge = led.select(
        "doc_id",
        "pos",
        F.explode(F.filter(gram_structs, lambda s: s["ok"])).alias("g"),
    ).select("doc_id", "pos", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    cnt = ge.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "n", "gram"))
    )

    # top family: per (doc_id, n) the max-count gram, lex-min tie-break
    top = (
        cnt.where(F.col("n").isin(*GOPHER_TOP_NGRAM_PCT))
        .groupBy("doc_id", "n", "gram")
        .agg(F.max("cnt").alias("c"))
        .groupBy("doc_id", "n")
        .agg(F.min(F.struct((-F.col("c")).alias("nc"), "gram")).alias("b"))
        .select(
            "doc_id",
            "n",
            F.when(
                -F.col("b.nc") >= 2,
                (-F.col("b.nc"))
                * (F.length("b.gram") - (F.col("n") - 1)).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("chars"),
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("n") == n, F.col("chars")).otherwise(0))
                .cast("bigint")
                .alias(f"top{n}_chars")
                for n in sorted(GOPHER_TOP_NGRAM_PCT)
            ]
        )
    )

    # dup family: de-overlapped covered token positions per (doc_id, n)
    cover = (
        cnt.where(F.col("n").isin(*GOPHER_DUP_NGRAM_PCT) & (F.col("cnt") >= 2))
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("tokpos"),
        )
        .distinct()
    )
    dup = (
        cover.join(
            tp.select("doc_id", F.col("pos").alias("tokpos"), F.length("tok").alias("_len")),
            ["doc_id", "tokpos"],
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("n") == n, F.col("_len")).otherwise(0))
                .cast("bigint")
                .alias(f"dup{n}_chars")
                for n in sorted(GOPHER_DUP_NGRAM_PCT)
            ]
        )
    )

    out = tok_chars.join(top, "doc_id", "left").join(dup, "doc_id", "left")
    c = lambda name: F.coalesce(F.col(name), F.lit(0).cast("bigint"))
    rules = {}
    for n, pct in sorted(GOPHER_TOP_NGRAM_PCT.items()):
        rules[f"r_top{n}"] = (
            100 * c(f"top{n}_chars") <= pct * F.col("tok_chars")
        )
    for n, pct in sorted(GOPHER_DUP_NGRAM_PCT.items()):
        rules[f"r_dup{n}"] = (
            100 * c(f"dup{n}_chars") <= pct * F.col("tok_chars")
        )
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return out.select(
        "doc_id",
        "tok_chars",
        *[c(f"top{n}_chars").alias(f"top{n}_chars") for n in sorted(GOPHER_TOP_NGRAM_PCT)],
        *[c(f"dup{n}_chars").alias(f"dup{n}_chars") for n in sorted(GOPHER_DUP_NGRAM_PCT)],
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )


def corpus_datasheet(docs: DataFrame) -> DataFrame:
    """The dataset-card composition rollup (the "datasheet" every released
    corpus ships — C4/Pile/Dolma all publish exactly this table): per
    (source, lang) cell, plus source subtotals and the corpus total via
    ROLLUP, the document/token/character volumes and the exact-duplicate
    exposure.

    Output: ``source, lang, n_docs, n_tokens, n_chars, n_dup_docs,
    dup_rate`` — subtotal rows carry ``(all)`` in the rolled-up key;
    ``n_dup_docs`` counts documents whose exact content fingerprint
    (md5 of normalized tokens) occurs more than once CORPUS-wide, so a
    source whose content is copied from another source shows the
    exposure even though the copies live elsewhere; ``dup_rate`` is the
    6-place-rounded ratio (the cross-engine-stable rounding discipline).

    Scale shape: one fingerprint-count aggregation on near-unique md5
    keys (uniform), one broadcast-or-shuffle join back, then a single
    partial-aggregating ROLLUP whose output cardinality is
    |sources|×|langs| — trivially small however large the corpus.
    """
    from ocr_spark.functions.text import norm_tokens, tokens

    staged = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(
            F.filter(
                tokens(F.coalesce(F.col("text"), F.lit(""))),
                lambda t: t != "",
            )
        ).cast("bigint").alias("_ntok"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("bigint").alias(
            "_nchr"
        ),
        F.md5(F.array_join(norm_tokens(F.col("text")), " ").cast("binary")).alias(
            "_fp"
        ),
    )
    fpc = staged.groupBy("_fp").agg(F.count(F.lit(1)).alias("_fpn"))
    j = staged.join(fpc, "_fp")
    return (
        j.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.sum("_nchr").alias("n_chars"),
            F.sum(F.when(F.col("_fpn") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("(all)")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("(all)")).alias("lang"),
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_dup_docs",
            F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
    )


def quality_stack_full(docs: DataFrame, min_words: int = 50) -> DataFrame:
    """The COMPLETE Rae et al. App. A1 battery as one verdict table:
    :func:`quality_stack`'s zero-shuffle funnel (C4 clean → Gopher rules →
    line/paragraph repetition) extended with the n-gram repetition rules
    (:func:`gopher_ngram_repetition`) — which need per-doc gram counting
    and therefore real shuffles, so they compose by a doc_id join rather
    than riding the scan stage (keeping the funnel's one-pass property
    for the stages that can have it).

    Both batteries read the C4-CLEANED text — the production order: line
    filtering first, document-level statistics on what survives.

    Output: ``doc_id, c4_keep, gopher_keep, rep_keep, ngram_keep, keep``.

    Scale shape: stage 1-3 verdicts cost one narrow scan; the n-gram leg
    adds the bounded shuffles documented on its operator; the final join
    keys on doc_id (uniform, one row per side).
    """
    stack = quality_stack(docs, min_words=min_words)
    cleaned = c4_line_filter(docs).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    gn = gopher_ngram_repetition(cleaned).select(
        "doc_id", F.col("keep").alias("ngram_keep")
    )
    return stack.join(gn, "doc_id").select(
        "doc_id",
        "c4_keep",
        "gopher_keep",
        "rep_keep",
        "ngram_keep",
        (F.col("keep") & F.col("ngram_keep")).alias("keep"),
    )
