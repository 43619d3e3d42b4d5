"""F9 size humanize — the reference's ``size_to_units``
(/root/reference/server/src/utils/file.py:283-296): bytes → ``'N B'`` /
``'N.NN KB'`` / ``'N.NN MB'`` / ``'N.NN GB'``, the string stored in every
``_data.json`` size field and METS sidecar the reference writes.

Exactness: Python formats ``size / 1024**k`` with ``:.2f`` — banker's
rounding on a value that is BINARY-EXACT (division by a power of two),
so the reference semantics are an integer round-half-even in centi-units:
``q0 = size·100 div s; r = size·100 mod s; q = q0 + (1 if 2r > s else
q0 % 2 if 2r == s else 0)``.  Pure bigint on both engines — the DuckDB
twin (``size_humanize``) hash-matches including the exact-tie sizes
(size ≡ 128 mod 256 in the KB range land on .005 exactly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scaled_sql(b: str, s: int, label: str, div: str, st: str) -> str:
    """round-half-even centi-unit expression for one unit tier."""
    q0 = f"(({b}) * 100 {div} {s})"
    r2 = f"((({b}) * 100 % {s}) * 2)"
    q = (
        f"({q0} + case when {r2} > {s} then 1 "
        f"when {r2} < {s} then 0 else {q0} % 2 end)"
    )
    return (
        f"concat(cast({q} {div} 100 as {st}), '.', "
        f"lpad(cast({q} % 100 as {st}), 2, '0'), ' {label}')"
    )


def size_human_sql(b: str, dialect: str = "spark") -> str:
    """SQL expression over a non-negative bigint expression ``b``;
    dialect 'spark' (div/string) or 'duckdb' (///varchar) — same
    integer arithmetic, shared twin by construction."""
    div, st = (" div ", "string") if dialect == "spark" else ("//", "varchar")
    kb, mb, gb = (
        _scaled_sql(b, 1024, "KB", div, st),
        _scaled_sql(b, 1024**2, "MB", div, st),
        _scaled_sql(b, 1024**3, "GB", div, st),
    )
    return (
        f"case when ({b}) < 1024 then concat(cast({b} as {st}), ' B') "
        f"when ({b}) < {1024**2} then {kb} "
        f"when ({b}) < {1024**3} then {mb} "
        f"else {gb} end"
    )


def size_human(b: str) -> Column:
    """bytes column name (bigint, ≥ 0) → the reference's humanized size
    string (built via the shared SQL so the twin cannot drift)."""
    return F.expr(size_human_sql(b))


def ocr_eta_sql(n: str, dialect: str = "spark") -> str:
    """F12 OCR time estimate — the reference's ``estimate_ocr_time``
    (src/engines/ocr_tesserocr.py:287-291): ``'<1min'`` under 20 pages,
    else ``ceil(0.0176·n + 0.2632)`` minutes.  Cross-engine exact: the
    rational (176n+2632)/10000 is never an integer (176n+2632 ≡ 0
    mod 10000 has no solution — 22n ≡ −329 mod 1250 pairs even with
    odd), so the double sits ≥1e-4 from every ceil boundary and both
    engines agree."""
    st = "string" if dialect == "spark" else "varchar"
    return (
        f"case when ({n}) < 20 then '<1min' else "
        f"concat(cast(cast(ceil(0.0176 * ({n}) + 0.2632) as bigint) "
        f"as {st}), 'min') end"
    )
