"""BM25 ranked retrieval — the scoring model behind the reference's search.

The reference's search endpoint delegates ranking to Elasticsearch
(`server/src/elastic_search.py:158-189` builds the multi_match query and
returns ES-ordered hits); Lucene's default similarity — what actually
orders those hits — is BM25.  `q_multi_match` already covers the
best-fields / fuzziness surface with a deterministic integer score; this
module supplies the missing ranking model itself: Okapi BM25 with the
Lucene idf form, over the same analyzer contract as the word index.

Cross-engine exactness (the lm_quality idiom, quality.py): the ONLY float
step is the per-term idf ``ln``, immediately quantized to integer
micro-nats; every per-(doc, term) contribution is then an exact bigint
floor-division (Spark ``div`` == DuckDB ``//`` for positive bigints), and
the per-doc score an exact bigint sum — partial-agg summation order can
never flip a hash.  To make the tf saturation term rational, the free
parameters are fixed at ``k1 = 5/4`` and ``b = 3/4`` (inside the standard
ranges; Lucene ships 1.2/0.75), giving

    tf_term = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
            = 36·tf·T / (16·T·tf + 5·T + 15·dl·D)        (avgdl = T/D)

with T = total corpus tokens and D = corpus docs — numerator and
denominator both exact bigints.  ``contribution = (idf_micro · 36·tf·T)
div (16·T·tf + 5·T + 15·dl·D)``.

Overflow headroom: the product is bounded by ``idf_micro·36·tf·T``;
idf_micro ≤ ln(D)·1e6 ≲ 3e7, so int64 holds through T·tf ≲ 8e9 — fine for
the gate scales and any single-tenant corpus; at web scale promote the
product to decimal(38,0) (the DuckDB twin already computes it in hugeint).

Scale shape: one narrow corpus scan computes (doc_id, dl) and explodes
only tokens matching the query terms (the isin filter sits right on the
exploded rows, so non-query tokens die before any shuffle); df/idf live
in a |terms|-row broadcast table; D and T are two driver scalars from one
agg action (the tfidf_top precedent).  Final ranking is a
TakeOrderedAndProject top-k, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.functions.text import norm_tokens

#: BM25 free parameters as exact rationals: k1 = 20/16 = 1.25, b = 12/16
#: = 0.75.  Changing them means re-deriving the integer form above.
K1_SIXTEENTHS = 20
B_SIXTEENTHS = 12


def bm25_rank(
    docs: DataFrame,
    terms: tuple[str, ...],
    top_n: int = 100,
) -> DataFrame:
    """Rank documents against a bag-of-terms query by BM25.

    Output: ``doc_id, n_hit_terms, score_micro, score`` — the ``top_n``
    highest-scoring documents, score descending with doc_id tie-break.
    ``score_micro`` is the exact bigint score in micro-units (the
    hash-gated column); ``score`` its human-readable double.

    idf is Lucene's non-negative form ``ln(1 + (D − df + ½)/(df + ½))``,
    quantized to micro-nats per distinct term (a |terms|-sized table, so
    the quantization cost is nil and the bigint sum downstream is exact).
    """
    corpus = (
        docs.select("doc_id", norm_tokens(F.col("text")).alias("_toks"))
        .where(F.size("_toks") > 0)
        .select(
            "doc_id", F.size("_toks").cast("bigint").alias("dl"), "_toks"
        )
    )

    stats = corpus.agg(
        F.count("*").alias("d"), F.sum("dl").alias("t")
    ).collect()[0]
    n_docs, n_toks = int(stats["d"]), int(stats["t"])

    tf = (
        corpus.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("idf_micro"),
        )
    )

    contrib = (
        tf.join(F.broadcast(idf), "term")
        .withColumn(
            "_num",
            (
                F.col("idf_micro")
                * (F.lit(36).cast("bigint") * F.col("tf") * F.lit(n_toks))
            ).cast("bigint"),
        )
        .withColumn(
            "_den",
            (
                F.lit(16).cast("bigint") * F.lit(n_toks) * F.col("tf")
                + F.lit(5).cast("bigint") * F.lit(n_toks)
                + F.lit(15).cast("bigint") * F.col("dl") * F.lit(n_docs)
            ).cast("bigint"),
        )
        .select("doc_id", F.expr("_num div _den").alias("c_micro"))
    )

    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
            F.sum("c_micro").cast("bigint").alias("score_micro"),
        )
        .withColumn("score", F.round(F.col("score_micro") / 1e6, 6))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(top_n)
    )


def phrase_search(docs: DataFrame, phrase: tuple[str, ...]) -> DataFrame:
    """Exact-phrase retrieval over positional postings — the ES
    ``match_phrase`` analog (the reference's search UI quotes phrases;
    elastic_search.py delegates them to ES positional queries).

    Semantics: the normalized token sequence of the document must contain
    ``phrase`` contiguously (after the same analyzer as the word index).
    Output: ``doc_id, n_matches, first_pos`` for documents with ≥ 1 match.

    Slot-cover formulation, no self-join chain: every occurrence of
    ``phrase[i]`` at position ``pos`` votes for candidate start
    ``pos − i``; a start owning votes from ALL ``len(phrase)`` distinct
    slots is a match.  Repeated phrase terms are handled naturally — one
    token occurrence votes once per slot that wants its term, each at a
    different start.

    Scale shape: the ``isin(phrase)`` filter sits directly on the
    exploded tokens, so non-phrase tokens die in the scan stage before
    any shuffle; the phrase slot table is |phrase| rows and broadcast;
    the only wide op is one (doc_id, start) hash agg whose input is
    already phrase-occurrences-sized.  No window, no self-join.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    n = len(phrase)
    spark = docs.sparkSession
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase)], "slot int, term string"
    )
    occ = (
        docs.select(
            "doc_id", F.posexplode(norm_tokens(F.col("text"))).alias("pos", "term")
        )
        .where(F.col("term").isin(*set(phrase)))
        .join(F.broadcast(slots), "term")
        .select("doc_id", (F.col("pos") - F.col("slot")).alias("start"), "slot")
    )
    # (doc_id, start, slot) rows are unique by construction — pos is
    # determined by start + slot — so the slot-cover count is a plain
    # count, never a count(distinct): no distinct-rewrite double shuffle.
    starts = (
        occ.where(F.col("start") >= 0)
        .groupBy("doc_id", "start")
        .agg(F.count(F.lit(1)).alias("n_slots"))
        .where(F.col("n_slots") == n)
    )
    return starts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("start").cast("int").alias("first_pos"),
    )


def phrase_tag(docs: DataFrame, phrases: DataFrame) -> DataFrame:
    """Multi-phrase lexicon tagging — the FlashText / Aho-Corasick role
    (tag every document with every dictionary phrase it contains) done
    relationally, with the **rarest-term anchor** optimization that
    makes it survive common-word lexicons: for each phrase ONE anchor
    slot is chosen — the slot whose term has the lowest corpus document
    frequency (ties: lowest slot) — token occurrences join only that
    anchor, and every candidate start is verified by an exact array
    slice against the phrase's token sequence.  This is the standard
    grep-literal trick (pick the rarest literal, verify around it): a
    first cut that joined tokens to EVERY slot fanned out by
    |occurrences| × |slots sharing the term| and ran ~100× slower on a
    1M-doc probe whose lexicon contained common words (BENCH notes).

    ``phrases``: ``(phrase_id int/bigint, phrase string)``; each phrase
    is normalized by the SAME analyzer as the documents.  Empty-after-
    normalization phrases are dropped.  Matching counts overlapping
    occurrences (same contract as :func:`phrase_search`).

    Output: one row per (document, phrase) with ≥ 1 match — ``doc_id,
    phrase_id, n_matches, first_pos``.

    Scale shape: one corpus term-frequency aggregate builds the anchor
    table (model-side, O(tokens) with map-side partial agg); the anchor
    table and the phrase token arrays are lexicon-sized broadcasts; the
    only data-scaled shuffle is the doc_id-keyed verify join, whose
    probe side is bounded by the anchors' corpus frequency — a phrase
    made ENTIRELY of stopwords still degrades to its least-common
    stopword's frequency, the documented worst case.
    """
    toks_df = docs.select(
        "doc_id", norm_tokens(F.col("text")).alias("_toks")
    )
    pt = phrases.select(
        F.col("phrase_id").cast("bigint").alias("phrase_id"),
        norm_tokens(F.col("phrase")).alias("_pt"),
    ).where(F.size("_pt") > 0)
    terms = pt.select(
        "phrase_id",
        F.size("_pt").alias("plen"),
        F.posexplode("_pt").alias("slot", "term"),
    )
    term_df = (
        toks_df.select(F.explode("_toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    w = Window.partitionBy("phrase_id").orderBy("_dfc", "slot")
    anchors = (
        terms.join(term_df, "term", "left")
        .withColumn("_dfc", F.coalesce(F.col("_df"), F.lit(0)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("phrase_id", "plen", "slot", "term")
    )
    occ = (
        toks_df.select(
            "doc_id", F.posexplode("_toks").alias("pos", "term")
        )
        .join(F.broadcast(anchors), "term")
        .select(
            "doc_id",
            "phrase_id",
            "plen",
            (F.col("pos") - F.col("slot")).alias("start"),
        )
        .where(F.col("start") >= 0)
    )
    # verify WITHOUT shuffling token arrays (a slice-verify join on
    # toks_df GCLocker-crashed a 1M-doc probe — arrays duplicated per
    # candidate): explode each candidate into its plen expected
    # (pos, term) cells and equijoin the narrow (doc_id, pos, term)
    # token table — (doc_id, pos) is unique there, so no fan-out, and
    # a candidate with all plen cells matched is a verified occurrence.
    cslots = occ.join(
        F.broadcast(terms.select("phrase_id", "slot", "term")), "phrase_id"
    ).select(
        "doc_id",
        "phrase_id",
        "plen",
        "start",
        (F.col("start") + F.col("slot")).alias("pos"),
        "term",
    )
    tokpos = toks_df.select(
        "doc_id", F.posexplode("_toks").alias("pos", "term")
    )
    return (
        cslots.join(tokpos, ["doc_id", "pos", "term"])
        .groupBy("doc_id", "phrase_id", "plen", "start")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == F.col("plen"))
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.min("start").cast("int").alias("first_pos"),
        )
    )


def more_like_this(
    docs: DataFrame,
    seed_doc_id: int,
    max_terms: int = 8,
    top_n: int = 50,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """ES ``more_like_this`` analog — "find documents like this one",
    the remaining piece of the reference's search surface next to
    multi_match / match_phrase / fuzzy (elastic_search.py delegates all
    of them to ES; MLT is the same API family).

    Two phases, exactly ES's published algorithm shape:

    1. **Term selection** — the seed document's terms ranked by
       ``tf_seed · idf`` (idf over the CORPUS document frequency of the
       term, Lucene non-negative form, micro-nat quantized — the same
       constant discipline as :func:`bm25_rank`).  ``max_doc_freq``
       optionally hard-drops terms above a df ceiling (the ES knob of
       the same name); per ES's default it is OFF — idf already demotes
       common terms, and a hard cut can select nothing on a
       small-vocabulary corpus.  Top ``max_terms`` by (score desc,
       term asc).  The winners — a ≤ ``max_terms`` driver list, the
       kmeans-centroid-sized collect, never corpus-sized — parameterize
       phase 2.
    2. **Retrieval** — :func:`bm25_rank` over the selected terms, the
       seed document itself excluded, re-sorted and cut to ``top_n``.

    Output: the ``bm25_rank`` schema (``doc_id, n_hit_terms,
    score_micro, score``).  Scale shape: phase 1 adds one distinct
    (doc, term) shuffle for df and a broadcast semi-join against the
    seed's term set; phase 2 is the existing oracle-gated BM25 plan.
    """
    toks = (
        docs.select("doc_id", norm_tokens(F.col("text")).alias("_toks"))
        .where(F.size("_toks") > 0)
    )
    n_docs = toks.count()
    seed_tf = (
        toks.where(F.col("doc_id") == seed_doc_id)
        .select(F.explode("_toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf_seed"))
    )
    df_t = (
        toks.select("doc_id", F.explode("_toks").alias("term"))
        .distinct()
        .join(F.broadcast(seed_tf.select("term")), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    sel = seed_tf.join(df_t, "term")
    if max_doc_freq is not None:
        sel = sel.where(F.col("df") <= F.lit(max_doc_freq))
    sel = (
        sel.withColumn(
            "idf_micro",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * 1e6,
                0,
            ).cast("bigint"),
        )
        .withColumn("sel_score", F.col("idf_micro") * F.col("tf_seed"))
        .orderBy(F.desc("sel_score"), F.asc("term"))
        .limit(max_terms)
    )
    terms = tuple(r["term"] for r in sel.collect())
    if not terms:
        return bm25_rank(docs, ("",), top_n=0)
    return (
        bm25_rank(docs, terms, top_n=top_n + 1)
        .where(F.col("doc_id") != seed_doc_id)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(top_n)
    )


def kwic_snippets(
    docs: DataFrame,
    terms: tuple[str, ...],
    context: int = 3,
) -> DataFrame:
    """Keyword-in-context concordance — the search-result SNIPPET
    surface: for every occurrence of a query term, the ±``context``
    normalized-token window around it.  This is the batch analog of the
    reference editor's match highlighting (its word→pages map,
    file.py:116-150 / the A3 ``word_pages_raw`` operator, exists to
    locate hits on a page; the snippet is the same locate-and-show move
    over token positions).

    Output: ``doc_id, pos int (0-based token position), term,
    snippet string`` — snippet is the window's tokens space-joined;
    windows clip at document edges.  Overlapping occurrences each emit
    their own row (a run of hits reads as staggered snippets, the
    standard concordance presentation).

    Scale shape: **zero shuffles** — tokens staged once, ``posexplode``
    + an ``isin`` filter that kills non-query tokens in the scan stage,
    and the snippet is pure ``slice`` arithmetic over the staged array.
    Engine note for the twin: Spark ``slice(arr, start, len)`` is
    1-based with a length; DuckDB slices ``arr[a:b]`` 1-based inclusive
    — same window, different spelling, pinned by the parity gate.
    """
    toks = docs.select(
        "doc_id", norm_tokens(F.col("text")).alias("_toks")
    ).where(F.size("_toks") > 0)
    ex = toks.select(
        "doc_id", "_toks", F.posexplode("_toks").alias("pos", "term")
    ).where(F.col("term").isin(*terms))
    start = F.greatest(F.col("pos") - F.lit(context), F.lit(0))
    length = (
        F.least(
            F.col("pos") + F.lit(context),
            F.size("_toks") - F.lit(1),
        )
        - start
        + F.lit(1)
    )
    return ex.select(
        "doc_id",
        "pos",
        "term",
        F.array_join(
            F.slice(F.col("_toks"), start + F.lit(1), length), " "
        ).alias("snippet"),
    )
