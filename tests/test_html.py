"""html_spans (operators/html.py): hand-built pages covering every
extractor branch, plus a zero-Exchange plan assertion (classification
happens in array land before posexplode, so no row_number shuffle).

The cross-engine gate is the driver parity harness (test_driver_contract
picks up the ``html_extract`` oracle automatically); these tests pin the
SEMANTICS with explicit expected span sequences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.html import html_spans

LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_B = "one two three four five six seven eight nine ten eleven"


def _spans(spark, html: str, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id int, html string")
    rows = html_spans(df, **kw).orderBy("offset").collect()
    return [(r.offset, r.kind, r.text, r.media_ref) for r in rows]


def test_paragraphs_kept_in_order_with_dense_offsets(spark):
    got = _spans(spark, f"<body><p>{LONG_A}</p><p>Short.</p><p>{LONG_B}</p></body>")
    assert got == [(0, "text", LONG_A, ""), (1, "text", LONG_B, "")]


def test_chrome_containers_dropped_including_script_trap(spark):
    html = (
        '<head><title>T</title><style>p{}</style>'
        '<script>var trap = "</p> not a block";</script></head>'
        f"<header>{LONG_A}</header><nav>{LONG_A}</nav>"
        f"<aside>{LONG_A}</aside><footer>{LONG_A}</footer>"
        f"<!-- {LONG_A} --><p>{LONG_B}</p>"
    )
    assert _spans(spark, html) == [(0, "text", LONG_B, "")]


def test_header_tag_does_not_match_head_pattern(spark):
    # <head\b must not swallow from <header; and dropping <header> content
    # must not eat following siblings
    html = f"<header><h1>chrome</h1></header><p>{LONG_A}</p>"
    assert _spans(spark, html) == [(0, "text", LONG_A, "")]


def test_img_both_quote_styles_and_uppercase_interleaved(spark):
    html = (
        f"<p>{LONG_A}</p><img src=\"a.png\" alt=\"x\">"
        f"<p>{LONG_B}</p><IMG SRC='b.jpg'><img alt=\"no src\">"
    )
    assert _spans(spark, html) == [
        (0, "text", LONG_A, ""),
        (1, "media_ref", "", "a.png"),
        (2, "text", LONG_B, ""),
        (3, "media_ref", "", "b.jpg"),
    ]


def test_img_with_empty_src_dropped(spark):
    assert _spans(spark, f'<img src="">\n<p>{LONG_A}</p>') == [
        (0, "text", LONG_A, "")
    ]


def test_link_density_drops_link_farm_keeps_mixed_block(spark):
    farm = '<p><a href="/x">Read more please here</a> <a href="/y">and next page link</a></p>'
    mixed = f'<div>{LONG_A} <a href="/ref">see also</a></div>'
    got = _spans(spark, farm + mixed)
    assert got == [(0, "text", f"{LONG_A} see also", "")]


def test_link_density_threshold_is_integer_exact(spark):
    # 20 anchor chars of 50 total = 40% — kept at max_link_pct=40,
    # dropped at 39 (cross-multiplied ints, no float rounding)
    pad = "x" * 29  # 29 + 1 space + 20 = 50
    html = f'<p>{pad} <a href="/r">{"y" * 20}</a></p>'
    assert len(_spans(spark, html, max_link_pct=40)) == 1
    assert _spans(spark, html, max_link_pct=39) == []


def test_min_text_len_boundary(spark):
    t24, t25 = "a" * 24, "b" * 25
    assert _spans(spark, f"<p>{t24}</p><p>{t25}</p>") == [(0, "text", t25, "")]


def test_entity_decode_order_and_whitespace_collapse(spark):
    html = "<p>Fish &amp; Chips &lt;real&gt; &amp;lt;literal  \n\t spaced&nbsp;end</p>"
    got = _spans(spark, html)
    # &amp;lt; decodes to the literal '&lt;', never double-decodes to '<'
    assert got == [(0, "text", "Fish & Chips <real> &lt;literal spaced end", "")]


def test_inline_tags_stripped_block_prefix_tags_not_confused(spark):
    # <picture>/<pre...> prefix traps: 'p' must not match inside <picture>
    html = f"<div><b>{LONG_A}</b> <span>tail words</span></div>"
    assert _spans(spark, html) == [(0, "text", f"{LONG_A} tail words", "")]


def test_br_selfclosing_splits_blocks(spark):
    html = f"<p>{LONG_A}<br/>{LONG_B}</p>"
    assert _spans(spark, html) == [
        (0, "text", LONG_A, ""),
        (1, "text", LONG_B, ""),
    ]


def test_empty_and_tag_only_html_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "<p></p><div>  </div>")], "doc_id int, html string"
    )
    assert html_spans(df).count() == 0


def test_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, f"<p>{LONG_A}</p>")], "doc_id int, html string")
    plan = html_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_multi_doc_offsets_independent(spark):
    df = spark.createDataFrame(
        [(1, f"<p>{LONG_A}</p><img src='m.png'>"), (2, f"<p>{LONG_B}</p>")],
        "doc_id int, html string",
    )
    got = {
        (r.doc_id, r.offset): (r.kind, r.media_ref)
        for r in html_spans(df).collect()
    }
    assert got == {
        (1, 0): ("text", ""),
        (1, 1): ("media_ref", "m.png"),
        (2, 0): ("text", ""),
    }
