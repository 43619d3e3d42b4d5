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
