"""Binary ingest round-trip: binaryFile scan → container split → page
ordering (O1 numeric vs O2 casefold) → hOCR parse → span offsets.

The OCR seam is the documented identity fake (page payload = hOCR), so
the expected span text is fully determined by the fixtures."""

from __future__ import annotations

import os

import pytest

from ocr_spark.sources.hocr import render_hocr
from ocr_spark.sources.ingest import ingest_spans, write_pdfx, write_zip


def _page(words: list[str]) -> bytes:
    ir = [[
        [
            {"text": w, "box": [10.0 + 50 * i, 10.0, 40.0 + 50 * i, 30.0],
             "b": 0.0, "confidence": 90, "font": None}
            for i, w in enumerate(words)
        ]
    ]]
    return render_hocr(ir, page_no=1).encode()


@pytest.fixture(scope="module")
def container_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    # pdfx: 12 pages -> page_10/page_11 must sort numerically AFTER page_2
    write_pdfx(
        os.path.join(d, "acordao.pdfx"),
        [_page([f"p{i}", "x"]) for i in range(12)],
    )
    # zip: casefold-alphabetical order => a10 < a2 < B
    write_zip(
        os.path.join(d, "bundle.zip"),
        {"B.png": _page(["bee"]), "a10.png": _page(["a-ten"]),
         "a2.png": _page(["a-two"])},
    )
    return str(d)


def test_ingest_pdfx_numeric_order(spark, container_dir):
    spans = ingest_spans(spark, container_dir)
    rows = (
        spans.where(spans.doc_id == "acordao.pdfx")
        .orderBy("offset")
        .collect()
    )
    texts = [r["text"] for r in rows]
    # page i contributes (f"p{i}", "x"); numeric page order 0..11
    expect = [t for i in range(12) for t in (f"p{i}", "x")]
    assert texts == expect
    assert [r["offset"] for r in rows] == list(range(24))
    assert all(r["kind"] == "text" for r in rows)


def test_ingest_zip_casefold_order(spark, container_dir):
    spans = ingest_spans(spark, container_dir)
    rows = (
        spans.where(spans.doc_id == "bundle.zip").orderBy("offset").collect()
    )
    # O2: (lower(name), name) => a10.png, a2.png, B.png
    assert [r["text"] for r in rows] == ["a-ten", "a-two", "bee"]


def test_ingest_single_image(spark, tmp_path):
    p = os.path.join(tmp_path, "solo.png")
    with open(p, "wb") as f:
        f.write(_page(["only"]))
    rows = ingest_spans(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["offset"], r["text"]) for r in rows] == [
        ("solo.png", 0, "only")
    ]
