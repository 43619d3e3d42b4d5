"""F9 size humanize (functions/units.py): the emitted strings must equal
the reference's size_to_units (file.py:283-296) bit-for-bit — including
the .005 exact-tie sizes where Python's :.2f applies banker's rounding
to the binary-exact size/1024**k.  Checked via the duckdb dialect of the
shared builder (no Spark session needed — same expression text modulo
div/cast keywords)."""

from __future__ import annotations

import duckdb

from ocr_spark.functions.units import size_human_sql


def _reference(size: int) -> str:
    # verbatim semantics of /root/reference/server/src/utils/file.py:283
    if size < 1024:
        return f"{size} B"
    elif size < 1024**2:
        return f"{size / 1024:.2f} KB"
    elif size < 1024**3:
        return f"{size / 1024 ** 2:.2f} MB"
    else:
        return f"{size / 1024 ** 3:.2f} GB"


def test_size_human_matches_reference_exactly():
    cases = (
        list(range(0, 5000, 7))
        + [128 + 256 * k for k in range(300)]           # KB .005 ties
        + [1024**2 * k + 524288 for k in range(1, 9)]   # MB .50 ties
        + [1024**3 + 5368709, 10**12 + 536870912, 1023, 1024, 1025,
           1024**2 - 1, 1024**2, 1024**3 - 1, 1024**3]
    )
    con = duckdb.connect()
    sql = size_human_sql("s", "duckdb")
    got = con.sql(
        f"select s, {sql} as h from (select unnest({cases}) as s)"
    ).fetchall()
    assert len(got) == len(cases)
    for s, h in got:
        assert h == _reference(s), (s, h, _reference(s))


def test_dialects_share_arithmetic():
    """The two dialects differ ONLY in div/cast keywords — the arithmetic
    text is identical, so the Spark side cannot drift from the twin."""
    a = size_human_sql("b")
    b = size_human_sql("b", "duckdb")
    assert a.replace(" div ", "//").replace("as string", "as varchar") == b


def test_ocr_eta_matches_reference_exactly():
    """F12: verbatim semantics of estimate_ocr_time
    (ocr_tesserocr.py:287-291) across both branches."""
    import math

    from ocr_spark.functions.units import ocr_eta_sql

    def _ref(n: int) -> str:
        if n < 20:
            return "<1min"
        return f"{math.ceil(0.0176 * n + 0.2632)}min"

    con = duckdb.connect()
    cases = list(range(0, 2500)) + [10**5, 10**6]
    got = con.sql(
        f"select n, {ocr_eta_sql('n', 'duckdb')} as h "
        f"from (select unnest({cases}) as n)"
    ).fetchall()
    for n, h in got:
        assert h == _ref(n), (n, h, _ref(n))
