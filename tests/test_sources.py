"""hOCR parser (P1–P5) + exporters (E1/E2/E4) tests.

Edge cases straight from the reference (parse_hocr.py): line-as-one-word
fallback, empty-word filter, empty line/paragraph drop, baseline
interpolation, segment-origin compensation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.exporters import alto_pages, word_index_csv_lines
from ocr_spark.sources.hocr import parse_hocr_pages, render_hocr

IR = [
    [  # paragraph 0
        [  # line 0
            {"text": "Acórdão", "box": [10.0, 20.0, 110.0, 52.0],
             "b": 0.0, "confidence": 96, "font": "Times"},
            {"text": "«nº»", "box": [120.0, 20.0, 160.0, 52.0],
             "b": 0.0, "confidence": 88, "font": None},
        ],
        [  # line 1
            {"text": "supremo", "box": [10.0, 60.0, 140.0, 92.0],
             "b": 0.0, "confidence": 75, "font": None},
        ],
    ],
    [  # paragraph 1
        [
            {"text": "tribunal", "box": [10.0, 200.0, 150.0, 232.0],
             "b": 0.0, "confidence": 91, "font": "Arial_Bold"},
        ],
    ],
]


def _words(parsed_row):
    return [
        (w["text"], w["confidence"], w["font"])
        for par in parsed_row["paragraphs"]
        for line in par
        for w in line
    ]


def test_hocr_round_trip(spark):
    hocr = render_hocr(IR, page_no=1)
    df = spark.createDataFrame(
        [("doc-1", 1, hocr)], "doc_id string, page_no int, hocr string"
    )
    got = parse_hocr_pages(df).collect()[0].asDict(recursive=True)
    assert got["doc_id"] == "doc-1" and got["page_no"] == 1
    assert _words(got) == [
        ("Acórdão", 96, "Times"),
        ("«nº»", 88, None),
        ("supremo", 75, None),
        ("tribunal", 91, "Arial_Bold"),
    ]
    # nesting preserved: 2 paragraphs, first has 2 lines
    assert len(got["paragraphs"]) == 2
    assert len(got["paragraphs"][0]) == 2
    # boxes round-trip as ints
    assert got["paragraphs"][0][0][0]["box"] == [10.0, 20.0, 110.0, 52.0]


HOCR_EDGE = """<?xml version="1.0"?><html><body>
<div class='ocr_page' id='page_1' title='image "p1.png"; bbox 0 0 1000 1000'>
<p class='ocr_par' id='par_1'>
<span class='ocr_line' id='l1' title='bbox 0 100 400 140; baseline 0.1 -5'>
<span class='ocrx_word' id='w1' title='bbox 0 100 100 140; x_wconf 90'>hello</span>
<span class='ocrx_word' id='w2' title='bbox 110 100 200 140; x_wconf 80'>   </span>
</span>
<span class='ocr_line' id='l2' title='bbox 0 200 300 240; baseline 0 0'>raw line text</span>
<span class='ocr_line' id='l3' title='bbox 0 300 300 340; baseline 0 0'>
<span class='ocrx_word' id='w3' title='bbox 0 300 50 340; x_wconf 10'>  </span>
</span>
</p>
<p class='ocr_par' id='par_2'>
<span class='ocr_line' id='l4' title='bbox 0 400 10 440; baseline 0 0'>
<span class='ocrx_word' id='w4' title='bbox 0 400 10 440; x_wconf 55'>  </span>
</span>
</p>
</div></body></html>"""


def test_hocr_edge_cases(spark):
    df = spark.createDataFrame(
        [("d", 1, HOCR_EDGE)], "doc_id string, page_no int, hocr string"
    )
    got = parse_hocr_pages(df).collect()[0].asDict(recursive=True)
    pars = got["paragraphs"]
    # paragraph 2 had only an empty word → dropped entirely (parse_hocr.py:99-102)
    assert len(pars) == 1
    lines = pars[0]
    # line 3 (only empty word) dropped; line 1 keeps 'hello'; line 2 is the
    # line-as-one-word fallback (parse_hocr.py:61-64)
    assert len(lines) == 2
    assert [w["text"] for w in lines[0]] == ["hello"]
    assert [w["text"] for w in lines[1]] == ["raw line text"]
    # baseline interpolation: b = (x_mid - line_x0)*0.1 + (-5) + line_y2
    # x_mid = 50, line_x0 = 0, line_y2 = 140 → 50*0.1 - 5 + 140 = 140.0
    assert lines[0][0]["b"] == pytest.approx(140.0)
    assert lines[0][0]["confidence"] == 90


def test_hocr_segment_origin(spark):
    hocr = render_hocr([[[{"text": "x", "box": [10.0, 10.0, 20.0, 20.0],
                           "b": 0.0, "confidence": 50, "font": None}]]])
    df = spark.createDataFrame(
        [("d", 1, hocr, 100.0, 200.0)],
        "doc_id string, page_no int, hocr string, seg_left double, seg_top double",
    )
    got = parse_hocr_pages(df, segment_origin=True).collect()[0].asDict(recursive=True)
    # parse_hocr.py:78-85 — word box shifted by segment origin
    assert got["paragraphs"][0][0][0]["box"] == [110.0, 210.0, 120.0, 220.0]


def test_alto_export(spark):
    hocr = render_hocr(IR, page_no=3)
    df = spark.createDataFrame(
        [("doc-9", 3, hocr)], "doc_id string, page_no int, hocr string"
    )
    ir = parse_hocr_pages(df)
    xml = alto_pages(ir).collect()[0]["alto_xml"]
    assert xml.startswith('<?xml version="1.0"')
    assert '<Page ID="page_3"' in xml
    assert xml.count("<TextBlock>") == 2
    assert xml.count("<TextLine>") == 3
    # export.py:974-977: int HPOS/VPOS/WIDTH/HEIGHT per word
    assert '<String CONTENT="Acórdão" HPOS="10" VPOS="20" WIDTH="100" HEIGHT="32"/>' in xml
    # XML escaping of the guillemet word is not needed (no &<>"), but the
    # escape path must keep it intact
    assert 'CONTENT="«nº»"' in xml


def test_word_index_csv(spark, tmp_path):
    import os

    from ocr_spark import datagen
    from ocr_spark.operators.extract import extract_documents

    p = os.path.join(tmp_path, "docs.parquet")
    datagen.generate_to_path(p, n_docs=5, seed=42)
    ext = extract_documents(spark.read.parquet(p), order_by="meta")
    csv = word_index_csv_lines(ext)
    rows = csv.where(F.col("doc_id") == "doc-00000000").orderBy("line_no").collect()
    # export.py:207-208: header + blank row, then index rows
    assert rows[0]["value"] == "Palavra, Ocorrências, Páginas"
    assert rows[1]["value"] == ""
    assert len(rows) > 2
    # pages field double-quoted (export.py:216-221)
    assert rows[2]["value"].count('"') == 2
