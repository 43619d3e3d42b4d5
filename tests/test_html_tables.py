"""html_tables (operators/html.py): hand-built pages covering every
extractor branch, plus a zero-Exchange plan assertion (three posexplode
stages in one narrow scan partition — no window, no shuffle).

The cross-engine gate is the driver parity harness (test_driver_contract
picks up the ``html_tables`` oracle automatically); these tests pin the
SEMANTICS with explicit expected cell grids.
"""

from __future__ import annotations

from ocr_spark.operators.html import html_tables


def _cells(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    rows = (
        html_tables(df)
        .orderBy("table_idx", "row_idx", "col_idx")
        .collect()
    )
    return [
        (r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell)
        for r in rows
    ]


def test_basic_grid_with_header_row(spark):
    got = _cells(
        spark,
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>",
    )
    assert got == [
        (0, 0, 0, True, "A"),
        (0, 0, 1, True, "B"),
        (0, 1, 0, False, "1"),
        (0, 1, 1, False, "2"),
    ]


def test_section_wrappers_do_not_perturb_row_numbering(spark):
    got = _cells(
        spark,
        "<table><thead><tr><th>H</th></tr></thead>"
        "<tbody><tr><td>b1</td></tr><tr><td>b2</td></tr></tbody>"
        "<tfoot><tr><td>f</td></tr></tfoot></table>",
    )
    assert got == [
        (0, 0, 0, True, "H"),
        (0, 1, 0, False, "b1"),
        (0, 2, 0, False, "b2"),
        (0, 3, 0, False, "f"),
    ]


def test_cell_normalization_tags_entities_whitespace(spark):
    got = _cells(
        spark,
        "<table><tr><td>Fish &amp; <b>Chips</b>  &lt;net&gt;<br>x</td>"
        "</tr></table>",
    )
    assert got == [(0, 0, 0, False, "Fish & Chips <net> x")]


def test_case_insensitive_tags_and_empty_cell(spark):
    got = _cells(
        spark, "<TABLE><TR><TD></TD><TD>caps</TD></TR></TABLE>"
    )
    assert got == [(0, 0, 0, False, ""), (0, 0, 1, False, "caps")]


def test_attributes_colspan_and_spaced_close(spark):
    got = _cells(
        spark,
        '<table id="t"><tr class="r"><td colspan="2">wide</td >'
        "<th scope=\"row\">h</th></tr></table>",
    )
    # colspan ignored: col_idx counts cell ELEMENTS, not the visual grid.
    assert got == [(0, 0, 0, False, "wide"), (0, 0, 1, True, "h")]


def test_commented_out_table_never_extracted(spark):
    got = _cells(
        spark,
        "<!-- <table><tr><td>ghost</td></tr></table> -->"
        "<table><tr><td>real</td></tr></table>",
    )
    assert got == [(0, 0, 0, False, "real")]


def test_multiple_tables_indexed_in_document_order(spark):
    got = _cells(
        spark,
        "<table><tr><td>first</td></tr></table><p>between</p>"
        "<table><tr><td>second</td></tr></table>",
    )
    assert got == [(0, 0, 0, False, "first"), (1, 0, 0, False, "second")]


def test_missing_close_tags_emit_nothing(spark):
    # No </table> → no table; row without </tr> inside a closed table →
    # no row (documented limitation, shared by the DuckDB twin).
    assert _cells(spark, "<table><tr><td>open</td></tr>") == []
    assert _cells(spark, "<table><tr><td>open</table>") == []


def test_nested_table_closes_parent_at_inner_close(spark):
    # The outer table match ends at the INNER </table>; within it, the
    # first <tr>/<td> run non-greedily to the inner close tags, so the
    # outer and inner cell text merge into ONE normalized cell and the
    # trailing outer fragment (no <table> open tag left) emits nothing —
    # documented limitation, shared with the DuckDB twin (the parity
    # harness guarantees both engines agree).
    got = _cells(
        spark,
        "<table><tr><td>outer<table><tr><td>inner</td></tr></table>"
        "</td></tr></table>",
    )
    assert got == [(0, 0, 0, False, "outer inner")]


def test_th_not_confused_with_thead_close(spark):
    # `</thead>` must not terminate a <th …> cell; the cell's own </th>
    # does.  A <th> with no close before </thead> emits nothing.
    got = _cells(
        spark,
        "<table><thead><tr><th>ok</th></tr></thead>"
        "<tbody><tr><td>d</td></tr></tbody></table>",
    )
    assert got == [(0, 0, 0, True, "ok"), (0, 1, 0, False, "d")]


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame(
        [(1, "<table><tr><td>x</td></tr></table>")],
        "doc_id int, html string",
    )
    plan = html_tables(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
