"""S7 chunked-upload sink — the reference's chunk-assembly protocol
(server/app.py:676-760) as a relational operator over a chunk table:
the table-backed engine's ingest edge receives binary chunks as ROWS
(file_id, counter, total_count, data), not multipart POSTs, and the
assembly/progress/completion bookkeeping is exactly the reference's:

* chunks are numbered 1..total_count and concatenated IN COUNTER ORDER
  (``join_chunks``, app.py:676-683);
* progress = round(100·chunks_saved/total_count, 2) — Python banker's
  rounding, rebuilt as integer round-half-even in centi-percent
  (the functions/units.py idiom) so both engines agree on ties;
* the file completes exactly when every counter 1..total_count has
  arrived (app.py:751) — gated on the counter DOMAIN, not just the
  count: n_chunks = total_count AND min(counter) = 1 AND
  max(counter) = total_count, so a protocol-violating row (counter 0
  or > total_count) plus a missing in-range chunk can never fake
  completion (the reference's join_chunks fails loudly on a missing
  1..N chunk file); a re-sent counter overwrites (filesystem
  last-write-wins, rebuilt deterministically as bytewise-max since a
  table has no arrival order).

Output: one row per file — ``file_id, total_count, n_chunks,
progress_pct, complete, n_bytes, assembly_md5`` (md5 of the in-order
concatenation; NULL until complete, so a partial upload can never be
mistaken for content).  Scale shape: one shuffle on (file_id, counter)
for the overwrite-dedup partial agg, one on file_id for assembly; the
binary payload moves through the shuffle once — that IS the sink's
job.  Checksum-gated in tests against hashlib; SQL twin
``chunk_assembly``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_assembly(chunks: DataFrame) -> DataFrame:
    """(file_id, counter int, total_count int, data binary) → assembly
    bookkeeping, one row per file_id."""
    dedup = (
        chunks.groupBy("file_id", "counter")
        .agg(
            F.max("data").alias("data"),
            F.max("total_count").alias("total_count"),
        )
    )
    g = dedup.groupBy("file_id").agg(
        F.max("total_count").alias("total_count"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.min("counter").alias("_min_c"),
        F.max("counter").alias("_max_c"),
        F.sum(F.octet_length("data")).alias("n_bytes"),
        F.sort_array(F.collect_list(F.struct("counter", "data"))).alias(
            "_parts"
        ),
    )
    # banker's centi-percent: q0 = 10^4·n div t, tie → round-half-even
    q0 = "(10000 * n_chunks) div total_count"
    r2 = "((10000 * n_chunks) % total_count) * 2"
    q = (
        f"({q0} + case when {r2} > total_count then 1 "
        f"when {r2} < total_count then 0 else {q0} % 2 end)"
    )
    assembled = (
        "aggregate(_parts, cast('' as binary), (acc, p) -> "
        "concat(acc, p.data))"
    )
    done = "(n_chunks = total_count and _min_c = 1 and _max_c = total_count)"
    return g.select(
        "file_id",
        "total_count",
        "n_chunks",
        F.expr(f"cast({q} as double) / 100.0").alias("progress_pct"),
        F.expr(done).alias("complete"),
        "n_bytes",
        F.expr(
            f"case when {done} then md5({assembled}) "
            f"else cast(null as string) end"
        ).alias("assembly_md5"),
    )
