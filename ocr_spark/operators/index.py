"""Corpus-level inverted index — the salted two-stage aggregation
(SURVEY.md §7.2 M2, §4 item 1).

``inverted_index`` builds ``word → sorted posting list of doc_ids``.  A
plain ``groupBy(word).agg(collect_list(doc_id))`` is exactly the shape
where key skew hurts at 100 TB: common words ("the", "de") appear in
nearly every document, so one reducer would receive a posting list the
size of the corpus.  The salted build:

1. stage 1 — group by ``(word, salt)`` where ``salt = pmod(xxhash64(doc_id),
   n_salts)``: each hot word's postings split across ``n_salts`` reducers,
   partial lists stay bounded;
2. stage 2 — group by ``word``, ``flatten`` + ``array_sort`` the partial
   lists: the second shuffle moves only ``n_salts`` pre-aggregated rows per
   word, not raw postings.

(For pure counting, Spark's map-side partial aggregation already defuses
skew — salting is only needed for list/set accumulation like this.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import norm_tokens, tokens


def inverted_index(
    docs: DataFrame,
    n_salts: int = 16,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int | None = 100_000,
) -> DataFrame:
    """word → sorted distinct posting list + document frequency.

    ``max_postings`` bounds the materialized posting array of degenerate
    hot words (stopwords appear in ~every document — at corpus scale an
    uncapped final row would be corpus-sized even though the salted
    two-stage agg keeps every SHUFFLE bounded).  ``df`` stays exact; only
    the stored array truncates, flagged by ``truncated``.  Pass ``None``
    for the exact (oracle-parity) variant at small scale.
    """
    postings = (
        docs.select(
            doc_col, F.explode(norm_tokens(F.col(text_col))).alias("word")
        )
        .distinct()
        .withColumn("salt", F.pmod(F.xxhash64(doc_col), F.lit(n_salts)))
    )
    partial = postings.groupBy("word", "salt").agg(
        F.collect_list(doc_col).alias("part")
    )
    out = partial.groupBy("word").agg(
        F.flatten(F.collect_list("part")).alias("raw")
    )
    sorted_postings = F.array_sort("raw")
    if max_postings is None:
        return out.select(
            "word",
            sorted_postings.alias("postings"),
            F.size("raw").cast("bigint").alias("df"),
        )
    return out.select(
        "word",
        F.slice(sorted_postings, 1, max_postings).alias("postings"),
        F.size("raw").cast("bigint").alias("df"),
        (F.size("raw") > max_postings).alias("truncated"),
    )


def word_pages_raw(
    docs: DataFrame,
    page_size: int = 100,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """A3 — the editor's word→pages map, keyed by RAW (unnormalized) text.

    Reference ``get_file_parsed`` (server/src/utils/file.py:116-150): for
    every word occurrence, in reading order, the 0-based page id is
    APPENDED to the word's ``pages`` list — duplicates kept (a word seen
    three times on page 0 yields ``[0, 0, 0]``), no lowercasing, no
    punctuation strip (the normalizing variant is the A1 word index); the
    ``syntax`` flag is constant true at build time (dictionary lookup
    fills it later).

    The flat ``documents`` table has no physical pages, so pages are
    synthesized deterministically as fixed blocks of ``page_size`` raw
    tokens; a table that carries real page ids feeds the same groupBy.
    Occurrence order is reconstructed exactly via the token ordinal
    (``sort_array`` over (ordinal, page) structs — collect_list alone has
    no ordering guarantee after the shuffle).
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    w = docs.select(
        doc_col, F.posexplode(toks).alias("i", "word")
    ).withColumn("page", F.floor(F.col("i") / page_size).cast("bigint"))
    return (
        w.groupBy(doc_col, "word")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "page"))),
                    lambda s: s["page"].cast("string"),
                ),
                " ",
            ).alias("pages"),
            F.count("*").alias("n_occ"),
        )
        .withColumn("syntax", F.lit(True))
    )


# vbyte size thresholds: a gap v needs k bytes iff v < 128^k; 8 CASE arms
# cover 2^56, anything larger takes the 9-byte max (63 payload bits).
# Shared with the DuckDB twin via vbyte_case_sql.
VBYTE_THRESHOLDS: tuple[int, ...] = tuple(1 << (7 * k) for k in range(1, 9))


def vbyte_case_sql(v: str) -> str:
    """``CASE`` expression computing the vbyte byte count of a positive
    integer — identical text on both engines (generated once here)."""
    arms = " ".join(
        f"when {v} < {t} then {k}"
        for k, t in enumerate(VBYTE_THRESHOLDS, start=1)
    )
    return f"(case {arms} else 9 end)"


def postings_codec(
    docs: DataFrame,
    block: int = 128,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-word postings storage accounting under the Lucene-style
    block-delta + vbyte layout — what the inverted index actually COSTS
    on disk at corpus scale, and why: sorted doc ids are stored as
    128-entry blocks whose first posting is absolute (a block restart
    point, so skip lists can seek without decoding predecessors) and the
    rest are gaps, each vbyte-encoded (7 payload bits per byte).

    Output: ``word, df bigint, n_blocks bigint, raw_bytes bigint,
    vbyte_bytes bigint`` — ``raw_bytes = 8·df`` (the naive fixed-width
    bigint cost), ``vbyte_bytes`` the exact coded size.  Dense postings
    (stopwords) compress hardest — small gaps take 1 byte vs 8 — which
    is exactly the hot-word tail that dominates index size.

    Scale shape: the block key is ``doc_id div block`` — a VALUE-range
    restart grid, so blocks are ≤ ``block`` postings by construction and
    no (word, bucket) group is ever hot: the mega-partition problem the
    salted ``inverted_index`` build solves with salts is solved here by
    the format's own block structure.  Two bounded shuffles ((word,
    bucket) then word), gap/byte math as array HOFs staged per the
    BENCH/BASELINE.md §3 rule; no windows.  Spark ``transform`` indices
    are 0-based while DuckDB's ``list_transform`` are 1-based — each
    side uses its own first-element test, pinned by the parity gate.
    """
    posts = (
        docs.select(
            doc_col, F.explode(norm_tokens(F.col(text_col))).alias("word")
        )
        .distinct()
        .withColumn("bucket", F.expr(f"{doc_col} div {block}"))
    )
    blocks = posts.groupBy("word", "bucket").agg(
        F.sort_array(F.collect_list(doc_col)).alias("ds")
    )
    staged = blocks.withColumn(
        "gaps",
        F.expr(
            "transform(ds, (d, i) -> case when i = 0 then d + 1"
            " else d - element_at(ds, i) end)"
        ),
    ).withColumn(
        "blk_bytes",
        F.expr(
            "aggregate(gaps, cast(0 as bigint),"
            f" (acc, g) -> acc + {vbyte_case_sql('g')})"
        ),
    )
    return staged.groupBy("word").agg(
        F.sum(F.size("ds")).alias("df"),
        F.count(F.lit(1)).alias("n_blocks"),
        (F.sum(F.size("ds")) * F.lit(8)).alias("raw_bytes"),
        F.sum("blk_bytes").alias("vbyte_bytes"),
    )
