"""Z-order (Morton) clustering keys and the file-skipping layout they buy —
the storage-layout operator behind Iceberg/Delta ``OPTIMIZE ZORDER BY``.

At 100 TB the fastest scan is the one that never happens: engines prune
files whose per-file min/max column stats cannot intersect the predicate.
A layout sorted by ONE column prunes predicates on that column only; a
layout ordered by the bit-interleaved **Morton key** (Morton 1966) of two
columns keeps files tight in BOTH dimensions, so 2-D range predicates
(e.g. ``n_chars BETWEEN … AND doc_id BETWEEN …``) skip most of the table.

Everything here is exact integer arithmetic, so the driver query has an
exact DuckDB twin:

* ``minmax_scale`` — floor cross-multiplication ``(x−lo)·(2^bits−1) div
  span`` in bigint (Spark ``div`` ≡ DuckDB ``//`` on non-negative ints;
  the lo/hi scalars are exact integer min/max, identical across engines).
* ``morton_key`` — ``Σ ((x_j >> i) & 1) · 2^(k·i+j)``: plain
  shift/mask/multiply terms, no floats anywhere.
* file assignment — the TOP ``file_bits`` bits of the key, i.e. each
  file is one Z-curve quadrant.  This is deliberately *fixed-width*
  (range-of-key) rather than equal-count (``repartitionByRange``/ntile):
  quadrants are the natural Z-order tiling, the assignment is a pure row
  function (engine/partitioning/run-invariant — the ``epoch_shuffle``
  lesson: no SinglePartition global window anywhere), and equal-count
  balancing is an orthogonal write-time concern.

``zorder_file_stats`` emits the per-file stats table an Iceberg manifest
would carry (row count, min/max of both raw columns) for the Z-order
layout AND the single-column linear layout side by side, each with a
``would_scan`` verdict for a planted 2-D band predicate — the measured
file-skipping contrast, not a claim.  Scale shape: one narrow projection
(scale + key staged ONCE as named columns per the HOF rule,
BENCH/BASELINE.md §3), a 2-way explode, and ONE shuffle whose key space
is ≤ 2·2^file_bits groups with map-side partial aggregation.

Reference tie-in: the reference stores per-file byte sizes for display
(server/src/utils/file.py size rollups) but has no layout optimizer;
this is beyond-reference scope (SURVEY.md training-pipeline additions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Defaults shared with the DuckDB twin (__spark_entry__ imports these).
DEFAULT_BITS = 16
DEFAULT_FILE_BITS = 6
# Planted 2-D predicate: the middle [2/5, 3/5] band of each dimension,
# as integer cross-multiplications of the same lo/hi scalars both
# engines compute (numerator, denominator) pairs.
BAND_LO_NUM, BAND_HI_NUM, BAND_DEN = 2, 3, 5


def morton_key(col_a: Column, col_b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Bit-interleave two already-scaled non-negative ints in
    ``[0, 2^bits)`` into one bigint: output bit ``2i`` is bit ``i`` of
    ``col_a``, bit ``2i+1`` is bit ``i`` of ``col_b``."""
    if 2 * bits > 63:
        raise ValueError(f"2*bits must fit a bigint, got bits={bits}")
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out + F.shiftright(col_a, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i)
        )
        out = out + F.shiftright(col_b, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        )
    return out


def morton_key_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """The identical interleave as DuckDB SQL text (twin builder)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def minmax_scale_sql(x: str, lo: int, hi: int, bits: int, div_op: str) -> str:
    """``floor((x−lo)·(2^bits−1) / span)`` as SQL text.  ``div_op`` is the
    engine's integer-division spelling (Spark ``div``, DuckDB ``//``) —
    identical semantics on the non-negative operands produced here."""
    span = max(hi - lo, 1)
    return f"((({x}) - {lo}) * {(1 << bits) - 1} {div_op} {span})"


def band_bounds(lo: int, hi: int) -> tuple[int, int]:
    """The planted predicate band on RAW values: exact integer
    cross-multiplication of the shared fraction constants."""
    span = hi - lo
    return (
        lo + (span * BAND_LO_NUM) // BAND_DEN,
        lo + (span * BAND_HI_NUM) // BAND_DEN,
    )


def zorder_file_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = DEFAULT_BITS,
    file_bits: int = DEFAULT_FILE_BITS,
) -> DataFrame:
    """Per-file min/max stats + pruning verdicts for the Z-order layout
    vs the ``col_a``-linear layout, on the same rows and the same planted
    2-D band predicate.

    Output: ``layout string, file_id bigint, n_rows bigint, min_a,
    max_a, min_b, max_b bigint, would_scan boolean`` — ``would_scan``
    is the Iceberg manifest-pruning test: the file is read iff its
    [min,max] box intersects the predicate box.  ``sum(would_scan)``
    under ``zorder`` vs ``linear`` is the headline skipping contrast.
    """
    if file_bits > bits:
        raise ValueError("file_bits must be <= bits")
    row = df.agg(
        F.min(col_a).alias("la"),
        F.max(col_a).alias("ha"),
        F.min(col_b).alias("lb"),
        F.max(col_b).alias("hb"),
    ).first()
    if row.la is None or row.lb is None:
        raise ValueError(
            "zorder_file_stats: input DataFrame is empty — no min/max "
            "bounds exist to scale the Morton key against"
        )
    la, ha, lb, hb = int(row.la), int(row.ha), int(row.lb), int(row.hb)
    pa_lo, pa_hi = band_bounds(la, ha)
    pb_lo, pb_hi = band_bounds(lb, hb)

    staged = df.select(
        F.col(col_a).cast("bigint").alias("_ra"),
        F.col(col_b).cast("bigint").alias("_rb"),
    ).selectExpr(
        "_ra",
        "_rb",
        f"{minmax_scale_sql('_ra', la, ha, bits, 'div')} as _sa",
        f"{minmax_scale_sql('_rb', lb, hb, bits, 'div')} as _sb",
    )
    staged = staged.withColumn(
        "_zk", morton_key(F.col("_sa"), F.col("_sb"), bits)
    )
    files = staged.select(
        "_ra",
        "_rb",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.shiftright(F.col("_zk"), 2 * bits - file_bits)
                    .cast("bigint")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.shiftright(F.col("_sa"), bits - file_bits)
                    .cast("bigint")
                    .alias("file_id"),
                ),
            )
        ).alias("f"),
    )
    stats = files.groupBy(
        F.col("f.layout").alias("layout"), F.col("f.file_id").alias("file_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_ra").alias("min_a"),
        F.max("_ra").alias("max_a"),
        F.min("_rb").alias("min_b"),
        F.max("_rb").alias("max_b"),
    )
    scan = ~(
        (F.col("max_a") < F.lit(pa_lo))
        | (F.col("min_a") > F.lit(pa_hi))
        | (F.col("max_b") < F.lit(pb_lo))
        | (F.col("min_b") > F.lit(pb_hi))
    )
    return stats.withColumn("would_scan", scan)
