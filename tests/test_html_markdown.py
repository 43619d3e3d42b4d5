"""html_markdown (operators/html.py): rendering semantics — headings,
emphasis, links/images, lists, tables, chrome/comment stripping, entity
decode incl. double-encoding, whitespace discipline, and the
zero-Exchange plan.
"""

from __future__ import annotations

from ocr_spark.operators.html import html_markdown


def _md(spark, html: str) -> str:
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    return html_markdown(df).collect()[0].markdown


def test_full_document_rendering(spark):
    got = _md(
        spark,
        "<html><head><title>T</title></head><body>"
        "<nav>chrome</nav>"
        "<h1>Guide &amp; Manual</h1>"
        "<p>Intro with <b>bold</b> and <i>italic</i>, a "
        '<a href="https://x.example/p">link label</a> and an '
        '<img src="pic.jpg"> image.</p>'
        "<h2>Setup</h2>"
        "<ul><li>one</li><li>two <strong>big</strong></li></ul>"
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
        "<!-- <h1>ghost</h1> -->"
        "<p>Tail<br>prose.</p></body></html>",
    )
    assert got == (
        "# Guide & Manual\n\n"
        "Intro with **bold** and *italic*, a "
        "[link label](https://x.example/p) and an "
        "![](pic.jpg) image.\n\n"
        "## Setup\n\n"
        "- one\n"
        "- two **big**\n\n"
        "| A | B |\n"
        "| 1 | 2 |\n\n"
        "Tail\nprose."
    )


def test_heading_levels_and_caps(spark):
    assert _md(spark, "<H3 id='x'>Deep</H3>") == "### Deep"
    assert _md(spark, "<h6>Leaf</h6>") == "###### Leaf"


def test_double_encoded_entities_survive_one_level(spark):
    assert _md(spark, "<p>&amp;lt;kept&amp;gt;</p>") == "&lt;kept&gt;"


def test_single_quoted_link_and_no_href_anchor(spark):
    assert _md(spark, "<a href='/rel'>lbl</a>") == "[lbl](/rel)"
    assert _md(spark, "<a name='top'>plain</a>") == "plain"


def test_whitespace_discipline(spark):
    got = _md(spark, "<p>a   b</p><p></p><p>c</p>")
    assert got == "a b\n\nc"


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id int, html string")
    plan = (
        html_markdown(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
