"""Z-order layout (operators/zorder.py): Morton-key correctness vs a
pure-Python reference, the no-false-pruning invariant (a pruned file must
contain NO predicate rows — the correctness side of data skipping), the
measured skipping contrast on a uniform grid, repartition invariance, and
the plan discipline (no window, one shuffle).

The cross-engine gate is the driver parity harness (``zorder_layout``
twin); these tests pin the semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.zorder import (
    band_bounds,
    morton_key,
    zorder_file_stats,
)


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (5, 9), (255, 1), (65535, 65535)]
    df = spark.createDataFrame(cases, "a bigint, b bigint")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_key(F.col("a"), F.col("b"), 16).alias("z")
        ).collect()
    }
    for a, b in cases:
        assert got[(a, b)] == _py_morton(a, b, 16)


def _grid(spark, n=32):
    # Uniform n×n grid: every (a, b) combination once — the layout
    # contrast is then pure geometry, no data skew in the way.
    rows = [(a, b) for a in range(n) for b in range(n)]
    return spark.createDataFrame(rows, "x bigint, y bigint")


def test_no_false_pruning_and_skipping_contrast(spark):
    df = _grid(spark)
    stats = zorder_file_stats(df, "x", "y", bits=10, file_bits=6).toPandas()
    lo, hi = 0, 31
    pa_lo, pa_hi = band_bounds(lo, hi)
    pb_lo, pb_hi = band_bounds(lo, hi)

    # Correctness: every file containing at least one predicate row must
    # have would_scan=True (min/max boxes can over-approximate, never
    # under-approximate).
    for _, r in stats.iterrows():
        box_hits = not (
            r.max_a < pa_lo or r.min_a > pa_hi
            or r.max_b < pb_lo or r.min_b > pb_hi
        )
        assert bool(r.would_scan) == box_hits

    # Contrast: the Z-order quadrant layout scans strictly fewer rows
    # than the x-linear layout for the same 2-D band predicate (linear
    # files span ALL y, so the y-band never prunes them).
    scanned = {
        lay: int(g[g.would_scan].n_rows.sum())
        for lay, g in stats.groupby("layout")
    }
    assert scanned["zorder"] < scanned["linear"]
    # Row conservation per layout.
    for _, g in stats.groupby("layout"):
        assert int(g.n_rows.sum()) == 32 * 32


def test_band_rows_always_inside_scanned_files(spark):
    # Drive the verdicts from the rows themselves: recompute each row's
    # file under both layouts and check every in-band row lands in a
    # would_scan file.
    df = _grid(spark, n=16)
    bits, fb = 8, 4
    stats = zorder_file_stats(df, "x", "y", bits=bits, file_bits=fb)
    s = {
        (r.layout, r.file_id): bool(r.would_scan) for r in stats.collect()
    }
    lo, hi = 0, 15
    plo, phi = band_bounds(lo, hi)
    m = (1 << bits) - 1
    span = hi - lo
    for a in range(16):
        for b in range(16):
            if not (plo <= a <= phi and plo <= b <= phi):
                continue
            sa, sb = a * m // span, b * m // span
            zf = _py_morton(sa, sb, bits) >> (2 * bits - fb)
            lf = sa >> (bits - fb)
            assert s[("zorder", zf)] and s[("linear", lf)]


def test_repartition_invariance(spark):
    df = _grid(spark)
    one = zorder_file_stats(df.coalesce(1), "x", "y").toPandas()
    many = zorder_file_stats(df.repartition(7), "x", "y").toPandas()
    cols = sorted(one.columns)
    a = one[cols].sort_values(cols).reset_index(drop=True)
    b = many[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_plan_one_shuffle_no_window(spark):
    out = zorder_file_stats(_grid(spark, n=8), "x", "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 2  # one shuffle (partial+final agg)


def test_empty_input_raises_clearly(spark):
    import pytest

    empty = spark.createDataFrame([], "x bigint, y bigint")
    with pytest.raises(ValueError, match="empty"):
        zorder_file_stats(empty, "x", "y")
