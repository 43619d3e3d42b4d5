"""Sequence packing — the last stage of a training-data pipeline: the
curated corpus's token stream is cut into fixed-length training windows
(``seq_len`` tokens each), documents packed back-to-back so no window is
padded (the GPT-2/3 "concatenate and chunk" recipe; PAPERS.md).

Deterministic, engine-exact formulation:

* documents order within each source by the same 12-hex md5 key as
  sampling.py (repartition/engine-invariant, no systematic position bias);
* one window cumulative token sum per source assigns every document its
  absolute token offset in the source stream — the SAME scale shape as
  corpus_mix (partitionBy(source) bounds the sort; a 10^12-row corpus
  packs per source shard, never through one global window);
* each document then SPLITS ITSELF into its overlapping windows with pure
  array math — ``sequence(first_win, last_win)`` explode + ``slice`` — a
  narrow projection, no token-level explode (a token-level explode would
  shuffle O(corpus tokens) rows; this shuffles O(docs + windows));
* windows reassemble with one groupBy((source, win)) whose per-window
  row count is bounded by the docs that overlap ``seq_len`` tokens —
  never a hot key.

The final (usually short) window of each source is kept, flagged by
``n_tokens < seq_len`` — dropping or padding is the trainer's choice.

The reference has no training-data surface; this is "beyond the
reference" scope (SURVEY.md), sharing the normalize/tokenize contract of
export.py:494,521-526 and the deterministic-order machinery of
operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.functions.text import norm_tokens
from ocr_spark.operators.sampling import sample_key


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Pack each source's token stream into ``seq_len``-token windows.

    Output: one row per window — ``source, win_id, n_tokens, text``
    (space-joined tokens; ``n_tokens = seq_len`` except each source's
    final window).  Empty-token documents contribute nothing (zero-length
    slice at their offset), identically in both engines.
    """
    w = (
        Window.partitionBy(source_col)
        .orderBy(sample_key(F.col(key_col), seed), key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        key_col,
        source_col,
        norm_tokens(F.col("text")).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    offs = (
        toks.withColumn("_cum", F.sum("_n").over(w))
        .withColumn("_start", (F.col("_cum") - F.col("_n")).cast("bigint"))
        .where(F.col("_n") > 0)
    )
    L = F.lit(int(seq_len))
    # windows this doc overlaps: floor(start/L) .. floor((start+n-1)/L)
    spans = offs.select(
        source_col,
        "_toks",
        "_n",
        "_start",
        F.explode(
            F.sequence(
                (F.col("_start") / L).cast("bigint"),
                ((F.col("_start") + F.col("_n") - 1) / L).cast("bigint"),
            )
        ).alias("win_id"),
    )
    # slice of this doc that lands in win_id (1-based slice positions)
    lo = F.greatest(F.col("win_id") * L - F.col("_start"), F.lit(0))
    hi = F.least((F.col("win_id") + 1) * L - F.col("_start"), F.col("_n"))
    pieces = spans.select(
        source_col,
        "win_id",
        "_start",
        F.slice(F.col("_toks"), (lo + 1).cast("int"), (hi - lo).cast("int"))
        .alias("piece"),
    )
    return (
        pieces.groupBy(source_col, "win_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("_start", "piece"))
                        ),
                        lambda s: s["piece"],
                    )
                ),
                " ",
            ).alias("text"),
            F.sum(F.size("piece")).cast("bigint").alias("n_tokens"),
        )
        .select(source_col, "win_id", "n_tokens", "text")
    )


def sliding_chunks(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Per-document overlapping sliding-window chunking — the RAG/embedding
    pipeline's document splitter (fixed ``size``-token windows advancing by
    ``stride`` tokens, ``size - stride`` tokens of overlap so no sentence
    straddles an unseen boundary).

    Chunk starts are ``0, stride, 2·stride, …`` while ``start < n_tokens``;
    the final chunk is the (possibly short) tail.  A document whose tokens
    fit one window yields exactly one chunk.  Empty-token documents yield
    nothing, identically in both engines.

    Scale shape: **zero shuffles** — the chunk grid is computed per row
    with ``sequence`` + ``slice`` array math and ``posexplode``, so a
    mega-document fans out into its own chunk rows inside the scan
    partition (same self-splitting recipe as ``pack_sequences``, minus the
    cross-document window since RAG chunks never span documents).

    Output: ``doc_id, chunk_id, n_tokens, text`` (space-joined normalized
    tokens).
    """
    if stride <= 0 or stride > size:
        raise ValueError("require 0 < stride <= size")
    toks = docs.select(
        "doc_id", norm_tokens(F.col("text")).alias("t")
    ).withColumn("n", F.size("t"))
    nonempty = toks.where(F.col("n") > 0)
    # last start = stride * floor((n-1)/stride) clamped so the tail chunk
    # begins before n; sequence is inclusive on both ends
    starts = F.sequence(
        F.lit(0),
        F.lit(stride) * F.floor((F.col("n") - 1) / stride).cast("int"),
        F.lit(stride),
    )
    # keep only starts that open a NEW region: start == 0 or start < n
    # (sequence already guarantees start <= n-1, so no filter needed)
    pieces = F.transform(
        starts,
        lambda s: F.slice(F.col("t"), s + 1, F.lit(size)),
    )
    out = nonempty.select(
        "doc_id", F.posexplode(pieces).alias("chunk_id", "piece")
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size("piece").cast("bigint").alias("n_tokens"),
        F.array_join("piece", " ").alias("text"),
    )


def pack_interleaved(
    extracted: DataFrame,
    seq_len: int = 64,
    n_groups: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Pack EXTRACTED interleaved documents (the BASELINE.json span
    sequence: per-word text spans + media_ref spans, already in reading
    order) into fixed-length multimodal training windows — the
    Flamingo/MM-interleaved assembly step: every span is one stream unit,
    text spans contribute their word, media spans contribute the
    ``<media>`` placeholder token while their reference rides along, so
    each window ships ``seq_len`` tokens plus the ordered refs of the
    media items embedded in it.

    Same deterministic machinery as ``pack_sequences`` with two twists:

    * the stream is sharded into ``n_groups`` md5 hash groups instead of
      source partitions — the contract table has one logical stream, and
      hash groups are the scale knob that bounds each packing window sort
      (10^12 docs pack per shard, never through one global window);
    * stream units are ``struct(tok, ref)`` instead of bare tokens, so
      the window reassembly carries media alignment for free.

    Output: one row per window — ``grp, win_id, n_tokens, n_media, text,
    media_refs`` (refs space-joined in stream order; ``n_tokens =
    seq_len`` except each group's final window).  Docs with zero spans
    contribute nothing, identically in both engines.
    """
    units = F.transform(
        "spans",
        lambda s: F.struct(
            F.when(s["kind"] == "text", s["text"])
            .otherwise(F.lit("<media>"))
            .alias("tok"),
            s["media_ref"].alias("ref"),
        ),
    )
    grp = (
        F.conv(sample_key(F.col("doc_id"), seed), 16, 10).cast("bigint")
        % n_groups
    )
    base = extracted.select(
        "doc_id",
        grp.alias("grp"),
        units.alias("_units"),
    ).withColumn("_n", F.size("_units"))
    w = (
        Window.partitionBy("grp")
        .orderBy(sample_key(F.col("doc_id"), seed), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = (
        base.withColumn("_cum", F.sum("_n").over(w))
        .withColumn("_start", (F.col("_cum") - F.col("_n")).cast("bigint"))
        .where(F.col("_n") > 0)
    )
    L = F.lit(int(seq_len))
    spans = offs.select(
        "grp",
        "_units",
        "_n",
        "_start",
        F.explode(
            F.sequence(
                (F.col("_start") / L).cast("bigint"),
                ((F.col("_start") + F.col("_n") - 1) / L).cast("bigint"),
            )
        ).alias("win_id"),
    )
    lo = F.greatest(F.col("win_id") * L - F.col("_start"), F.lit(0))
    hi = F.least((F.col("win_id") + 1) * L - F.col("_start"), F.col("_n"))
    pieces = spans.select(
        "grp",
        "win_id",
        "_start",
        F.slice(F.col("_units"), (lo + 1).cast("int"), (hi - lo).cast("int"))
        .alias("piece"),
    )
    assembled = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_start", "piece"))),
            lambda s: s["piece"],
        )
    )
    return (
        pieces.groupBy("grp", "win_id")
        .agg(assembled.alias("_u"))
        .select(
            "grp",
            "win_id",
            F.size("_u").cast("bigint").alias("n_tokens"),
            F.size(
                F.filter(F.col("_u"), lambda u: u["ref"].isNotNull())
            ).cast("bigint").alias("n_media"),
            F.array_join(
                F.transform(F.col("_u"), lambda u: u["tok"]), " "
            ).alias("text"),
            F.array_join(
                F.transform(
                    F.filter(F.col("_u"), lambda u: u["ref"].isNotNull()),
                    lambda u: u["ref"],
                ),
                " ",
            ).alias("media_refs"),
        )
    )
