"""html_outline (operators/html.py): section-path semantics — full
ancestor chains, stale-sibling exclusion when a shallower heading closes
deeper sections, skipped intermediate levels, chrome stripping, and the
one-shuffle plan (a single doc_id window Exchange, nothing else).

The cross-engine gate is the driver parity harness (``html_outline``
twin); these tests pin the semantics with explicit expected paths.
"""

from __future__ import annotations

from ocr_spark.operators.html import html_outline


def _rows(spark, html: str):
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    return [
        (r.pos, r.level, r.title, r.path)
        for r in html_outline(df).orderBy("pos").collect()
    ]


def test_full_chain_and_sibling_reset(spark):
    got = _rows(
        spark,
        "<h1>Guide</h1><h2>Setup</h2><h3>Linux</h3>"
        "<h2>Usage</h2><h3>Basics</h3>",
    )
    assert got == [
        (0, 1, "Guide", "Guide"),
        (1, 2, "Setup", "Guide > Setup"),
        (2, 3, "Linux", "Guide > Setup > Linux"),
        (3, 2, "Usage", "Guide > Usage"),
        (4, 3, "Basics", "Guide > Usage > Basics"),
    ]


def test_stale_h2_never_leaks_under_new_h1(spark):
    got = _rows(
        spark, "<h1>A</h1><h2>Old</h2><h1>B</h1><h3>Deep</h3>"
    )
    # Deep's path skips the stale Old (it belongs to A's section).
    assert got[-1] == (3, 3, "Deep", "B > Deep")


def test_skipped_intermediate_levels(spark):
    got = _rows(spark, "<h1>Top</h1><h4>Leaf</h4>")
    assert got == [
        (0, 1, "Top", "Top"),
        (1, 4, "Leaf", "Top > Leaf"),
    ]


def test_orphan_heading_is_its_own_path(spark):
    got = _rows(spark, "<p>x</p><h3>Alone</h3>")
    assert got == [(0, 3, "Alone", "Alone")]


def test_chrome_and_comment_headings_stripped(spark):
    got = _rows(
        spark,
        "<nav><h1>Nav</h1></nav><header><h2>Hdr</h2></header>"
        "<!-- <h1>ghost</h1> --><h1>Real</h1>",
    )
    assert got == [(0, 1, "Real", "Real")]


def test_title_normalization_and_caps_tags(spark):
    got = _rows(spark, "<H2 class='x'>Fish &amp; <b>Chips</b></H2>")
    assert got == [(0, 2, "Fish & Chips", "Fish & Chips")]


def test_one_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, "<h1>t</h1>")], "doc_id int, html string"
    )
    plan = html_outline(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 2  # the doc_id window shuffle only
    assert "Window" in plan
