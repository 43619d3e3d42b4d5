"""E3 export_pdf (sources/pdf.py pdf_documents): searchable text-layer
PDF authoring as a pure Catalyst build — structural byte-validation
(xref offsets, stream lengths, trailer), text-layer round-trip in
reading order, reference geometry semantics (export.py:534-568: origin
at (box_x, H−b), Tz = 100·box_width/stringWidth, empty-text skip), and
determinism."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ocr_spark.sources.hocr import PAGE_IR_DDL
from ocr_spark.sources.pdf import pdf_documents


def _w(text, box, b, conf=90, font=None):
    return {
        "text": text,
        "box": [float(v) for v in box],
        "b": float(b),
        "confidence": conf,
        "font": font,
    }


_PAGE_A = [
    [
        [
            _w("Hello (world)", [10, 20, 110, 52], 50.0),
            _w("café", [120, 20, 180, 52], 50.0),
        ],
        [_w("back\\slash", [10, 60, 60, 90], 88.0)],
    ],
    [[_w("", [0, 0, 10, 10], 10.0), _w("p1end", [200, 200, 260, 230], 228.0)]],
]
_PAGE_B = [[[_w("p2", [0, 400, 40, 430], 425.0)]]]


def _validate(data: bytes):
    """Mini PDF reader: every xref offset must point at its object, every
    /Length must be byte-exact, startxref must hit the xref table.
    Returns the Tj strings in file order, unescaped."""
    assert data.startswith(b"%PDF-1.4\n")
    assert data.endswith(b"%%EOF\n")
    xref_at = data.rfind(b"xref\n0 ")
    entries = re.findall(rb"(\d{10}) 00000 n \n", data[xref_at:])
    assert entries, "no xref entries"
    for i, e in enumerate(entries, start=1):
        off = int(e)
        assert data[off:].startswith(f"{i} 0 obj".encode()), (i, off)
    sx = int(re.search(rb"startxref\n(\d+)\n%%EOF", data).group(1))
    assert data[sx:sx + 4] == b"xref"
    for m in re.finditer(rb"<< /Length (\d+) >>\nstream\n", data):
        ln = int(m.group(1))
        assert data[m.end() + ln:].startswith(b"\nendstream\n")

    def unesc(s: bytes) -> str:
        out, i = [], 0
        while i < len(s):
            if s[i:i + 1] == b"\\":
                nxt = s[i + 1:i + 2]
                if nxt.isdigit():
                    out.append(chr(int(s[i + 1:i + 4], 8)))
                    i += 4
                else:
                    out.append(nxt.decode("latin-1"))
                    i += 2
            else:
                out.append(chr(s[i]))
                i += 1
        return "".join(out)

    return [unesc(m) for m in re.findall(rb"\((.*?)\) Tj", data, re.S)]


def _pdfs(spark, rows):
    df = spark.createDataFrame(rows, PAGE_IR_DDL)
    return {
        r["doc_id"]: (r["n_pages"], r["pdf"])
        for r in pdf_documents(df).collect()
    }


def test_pdf_structure_and_text_round_trip(spark):
    got = _pdfs(
        spark,
        [("d1", 1, _PAGE_A), ("d1", 2, _PAGE_B), ("d2", 1, _PAGE_B)],
    )
    n, pdf = got["d1"]
    assert n == 2
    texts = _validate(pdf.encode("latin-1"))
    # reading order across pages; the empty-text word skipped
    # (export.py:552 stringWidth<=0 skip)
    assert texts == ["Hello (world)", "café", "back\\slash", "p1end", "p2"]
    n2, pdf2 = got["d2"]
    assert n2 == 1
    assert _validate(pdf2.encode("latin-1")) == ["p2"]


def test_pdf_reference_geometry(spark):
    """export.py:555-565: x = box[0]·72/300, y = H − b·72/300 (baseline,
    not box bottom), Tz = 100·box_width/stringWidth with the closed-form
    Courier metric len·size·0.6."""
    _, pdf = _pdfs(spark, [("d", 1, _PAGE_A)])["d"]
    # word 'café': x = 120·0.24 = 28.80; y = (3508−50)·0.24 = 829.92;
    # Tz = 100·(60·0.24)/(4·8·0.6) = 75
    assert "75.000000 Tz 1 0 0 1 28.80 829.92 Tm (caf\\351) Tj" in pdf
    # 'Hello (world)': width 100px=24pt, 13 chars·4.8pt ⇒ Tz=500/13
    assert "38.461538 Tz 1 0 0 1 2.40 829.92 Tm (Hello \\(world\\)) Tj" in pdf
    # invisible layer: mode 3, Courier 8 (glyphless by invisibility)
    assert "/F1 8 Tf 3 Tr" in pdf
    assert "/BaseFont /Courier" in pdf


def test_pdf_deterministic_and_partition_invariant(spark):
    rows = [("d1", i, _PAGE_A if i % 2 else _PAGE_B) for i in range(5)]
    df1 = spark.createDataFrame(rows, PAGE_IR_DDL)
    df2 = spark.createDataFrame(rows, PAGE_IR_DDL).repartition(7)
    a = pdf_documents(df1).collect()[0]
    b = pdf_documents(df2).collect()[0]
    assert a["pdf"] == b["pdf"] and a["n_pages"] == 5


def test_pdf_plan_is_catalyst_with_one_exchange(spark):
    df = spark.createDataFrame([("d", 1, _PAGE_B)], PAGE_IR_DDL)
    plan = (
        pdf_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    # exactly the per-document grouping shuffle, nothing else
    assert plan.count("Exchange") <= 1
