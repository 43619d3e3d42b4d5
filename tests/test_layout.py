"""W3 line grouping + O3 segment ordering tests (easy_ocr.py:15-51,
celery_app.py:156-161)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.layout import group_lines, order_segments

WORDS = [
    # two visual lines; input deliberately out of x-order
    {"text": "world", "box": [200.0, 10.0, 300.0, 40.0]},
    {"text": "hello", "box": [10.0, 12.0, 120.0, 42.0]},
    {"text": "second", "box": [10.0, 100.0, 150.0, 130.0]},
    {"text": "line", "box": [160.0, 101.0, 250.0, 131.0]},
    # zero-height box opens an unmatchable bucket (reference quirk:
    # range(y, y) is empty)
    {"text": "dot", "box": [5.0, 200.0, 9.0, 200.0]},
    {"text": "dot2", "box": [50.0, 200.0, 99.0, 200.0]},
]


def test_group_lines(spark):
    df = spark.createDataFrame(
        [("d", 1, WORDS)],
        "doc_id string, page_no int, "
        "words array<struct<text string, box array<double>>>",
    )
    got = group_lines(df).collect()[0].asDict(recursive=True)
    lines = got["lines"]
    texts = [[w["text"] for w in line] for line in lines]
    # line 1: 'world' inserted first (its bucket), 'hello' joins (y_max 42
    # in range(25, 55)); x-sort puts hello first
    assert texts[0] == ["hello", "world"]
    # baseline = FIRST INSERTED word's y_max ('world' → 40), not hello's 42
    assert lines[0][0]["b"] == 40.0
    assert texts[1] == ["second", "line"]
    # reference quirk preserved (easy_ocr.py:36): a zero-height box opens an
    # empty range(y, y) bucket, and a second zero-height box at the same y
    # produces the SAME dict key — the assignment overwrites the bucket and
    # the first word is lost ('dot' disappears, only 'dot2' survives)
    assert len(texts) == 3 and texts[2] == ["dot2"]


def test_group_lines_every_word_once(spark):
    import random

    rng = random.Random(7)
    words = [
        {
            "text": f"w{i}",
            "box": [float(rng.randint(0, 900)), float(y), float(rng.randint(900, 1000)), float(y + 30)],
        }
        for i, y in enumerate(rng.choices(range(0, 500), k=60))
    ]
    df = spark.createDataFrame(
        [("d", 1, words)],
        "doc_id string, page_no int, "
        "words array<struct<text string, box array<double>>>",
    )
    lines = group_lines(df).collect()[0]["lines"]
    flat = [w["text"] for line in lines for w in line]
    assert sorted(flat) == sorted(w["text"] for w in words)
    for line in lines:
        xs = [w["box"][0] for w in line]
        assert xs == sorted(xs)


def test_order_segments(spark):
    segs = [
        {"type": "text", "squares": [{"top": 50.0, "left": 10.0}]},
        {"type": "image", "squares": [{"top": 10.0, "left": 100.0}]},
        {"type": "text", "squares": [{"top": 10.0, "left": 5.0}]},
    ]
    df = spark.createDataFrame(
        [(segs,)],
        "segments array<struct<type string, "
        "squares array<struct<top double, left double>>>>",
    )
    out = df.select(order_segments(F.col("segments")).alias("s")).collect()[0]["s"]
    got = [(s["squares"][0]["top"], s["squares"][0]["left"]) for s in out]
    assert got == [(10.0, 5.0), (10.0, 100.0), (50.0, 10.0)]


def test_page_order_o1_vs_o2(spark):
    """O1 (numeric) and O2 (casefold) diverge on the same names
    (SURVEY.md §2.4: 'different key than O1, must be preserved per source
    type')."""
    from ocr_spark.operators.layout import order_pages

    names = ["page_2.png", "page_10.png", "Page_1.png"]
    rows = [("pdfdoc", "pdf", n) for n in names] + [
        ("zipdoc", "zip", n) for n in names
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, source_type string, page_name string"
    )
    got = {
        (r["doc_id"], r["page_name"]): r["page_rank"]
        for r in order_pages(df).collect()
    }
    # pdf: numeric 1 < 2 < 10
    assert [got[("pdfdoc", n)] for n in ["Page_1.png", "page_2.png", "page_10.png"]] == [0, 1, 2]
    # zip: casefold-alphabetical — page_1... then page_10 < page_2
    assert [got[("zipdoc", n)] for n in ["Page_1.png", "page_10.png", "page_2.png"]] == [0, 1, 2]
