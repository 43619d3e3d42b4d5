"""alto_words (sources/alto.py): the ALTO ingest leg — exact round-trip
through the ALTO exporter (hOCR IR → alto_pages XML → alto_words rows ==
the IR's own words), escape/unescape inversion, missing-geometry NULLs,
and the zero-Exchange parse plan.
"""

from __future__ import annotations

from ocr_spark.sources.alto import alto_words
from ocr_spark.sources.exporters import alto_pages
from ocr_spark.sources.hocr import parse_hocr_pages
from tests.test_sources import IR, render_hocr


def test_round_trip_through_exporter(spark):
    hocr = render_hocr(IR, page_no=3)
    df = spark.createDataFrame(
        [("doc-9", 3, hocr)], "doc_id string, page_no int, hocr string"
    )
    ir = parse_hocr_pages(df)
    back = alto_words(alto_pages(ir)).orderBy(
        "block_idx", "line_idx", "word_idx"
    )
    got = [
        (r.block_idx, r.line_idx, r.word_idx, r.text, r.x1, r.y1, r.x2, r.y2)
        for r in back.collect()
    ]
    # The exporter writes int HPOS/VPOS/WIDTH/HEIGHT from the float IR
    # boxes; the reader must return exactly those ints with x2/y2
    # reassembled from WIDTH/HEIGHT.
    exp = []
    rows = ir.collect()[0].asDict(recursive=True)
    for bi, block in enumerate(rows["paragraphs"]):
        for li, line in enumerate(block):
            for wi, w in enumerate(line):
                x1, y1, x2, y2 = (int(v) for v in w["box"])
                exp.append((bi, li, wi, w["text"], x1, y1, x2, y2))
    assert got == exp
    # escape → unescape inversion covered by the guillemet + any &<>"
    assert any("«nº»" == t[3] for t in got)


def test_missing_geometry_yields_nulls_not_drops(spark):
    xml = (
        "<alto><Layout><Page><PrintSpace><TextBlock><TextLine>"
        '<String CONTENT="noGeo"/>'
        '<String CONTENT="ok" HPOS="1" VPOS="2" WIDTH="3" HEIGHT="4"/>'
        "</TextLine></TextBlock></PrintSpace></Page></Layout></alto>"
    )
    df = spark.createDataFrame(
        [("d", 1, xml)], "doc_id string, page_no int, alto_xml string"
    )
    got = alto_words(df).orderBy("word_idx").collect()
    assert [r.text for r in got] == ["noGeo", "ok"]
    assert got[0].x1 is None and got[0].x2 is None
    assert (got[1].x1, got[1].y1, got[1].x2, got[1].y2) == (1, 2, 4, 6)


def test_double_escaped_entity_survives_one_level(spark):
    # &amp;lt; must decode to the literal '&lt;', not to '<' — amp LAST.
    xml = (
        "<alto><TextBlock><TextLine>"
        '<String CONTENT="&amp;lt;" HPOS="0" VPOS="0" WIDTH="1" HEIGHT="1"/>'
        "</TextLine></TextBlock></alto>"
    )
    df = spark.createDataFrame(
        [("d", 1, xml)], "doc_id string, page_no int, alto_xml string"
    )
    assert alto_words(df).collect()[0].text == "&lt;"


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame(
        [("d", 1, "<alto/>")], "doc_id string, page_no int, alto_xml string"
    )
    plan = alto_words(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
