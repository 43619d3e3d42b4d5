"""P8/P10 path-safety predicates (functions/paths.py) — semantics pinned
against the reference's literal rules via the duckdb dialect (no Spark
session needed; the driver contract gates the spark dialect)."""

from __future__ import annotations

import duckdb

from ocr_spark.functions import paths as P


def _eval(sql_builder, values):
    con = duckdb.connect()

    def lit(v: str) -> str:
        # duckdb string literals are escape-free; splice backslashes
        return "'" + v.replace("'", "''").replace(
            "\\", "' || chr(92) || '"
        ) + "'"

    arr = "[" + ", ".join(lit(v) for v in values) + "]"
    rows = con.sql(
        f"select v, {sql_builder('v', 'duckdb')} as r "
        f"from (select unnest({arr}) as v)"
    ).fetchall()
    return dict(rows)


def test_reserved_name_rule():
    # app.py:334-338
    got = _eval(P.reserved_name_sql, ["good", "_bad", "a/b", "a\\b", "x_y"])
    assert got == {
        "good": False, "_bad": True, "a/b": True, "a\\b": True,
        "x_y": False,
    }


def test_private_temp_and_component_rules():
    paths = [
        "docs/a/page.png",
        "_files/_private_spaces/u1/doc.pdf",
        "_files/_tmp/chunk1",
        "docs/_reserved/page.png",
        "x_1/page.png",
    ]
    priv = _eval(P.private_or_temp_sql, paths)
    assert [priv[p] for p in paths] == [False, True, True, False, False]
    comp = _eval(P.reserved_component_sql, paths)
    assert [comp[p] for p in paths] == [False, True, True, True, False]


def test_temp_page_filter_agrees_with_reference_quirk():
    """celery_app.py:113-118 tests x[-5] != '$' (char before a 4-char
    extension).  The stem-based rebuild agrees on every real page file
    (3-letter extensions) and stays correct for longer extensions."""
    cases = {
        "docs/f/page_1$.png": True,
        "docs/f/page_1.png": False,
        "docs/ok/file$name.png": False,   # $ not at stem end
        "docs/f/page$": True,             # no extension
        "docs/f/page_2$.jpeg": True,      # 5-char ext: x[-5] would miss
    }
    got = _eval(P.temp_page_sql, list(cases))
    assert got == cases
    # quirk agreement on 4-char extensions only
    for p, want in cases.items():
        if p.endswith(".png"):
            assert (p[-5] == "$") == want


def test_composed_keep_gate():
    keep = _eval(
        P.path_keep_sql,
        [
            "docs/folder1/page_1.png",
            "_files/_private_spaces/u/d.pdf",
            "docs/_x/p.png",
            "docs/f/page_1$.png",
            "docs/a.b.c/page.final.jpg",
        ],
    )
    assert list(keep.values()) == [True, False, False, False, True]
