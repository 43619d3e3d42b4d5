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


# ---------------------------------------------------------------------------
# recursive XY-cut reading order
# ---------------------------------------------------------------------------

def _box(l, t, r, b):
    return [float(l), float(t), float(r), float(b)]


def test_xy_cut_two_columns_beats_flat_sort():
    """The motivating case: a 2-column page.  Flat (top,left) interleaves
    the columns row by row; XY-cut reads left column then right column."""
    from ocr_spark.operators.layout import xy_cut_page

    # columns overlap on y (right offset +15 of the 30-stride) so the body
    # has no full-width valley; the gutter x in [45, 55] is the first cut
    left = [_box(0, 20 + 30 * i, 45, 40 + 30 * i) for i in range(3)]
    right = [_box(55, 35 + 30 * i, 100, 55 + 30 * i) for i in range(3)]
    boxes = right + left  # input deliberately right-first
    assert xy_cut_page(boxes) == [3, 4, 5, 0, 1, 2]
    flat = sorted(range(6), key=lambda i: (boxes[i][1], boxes[i][0]))
    assert flat != [3, 4, 5, 0, 1, 2]  # the flat sort interleaves


def test_xy_cut_header_then_columns():
    from ocr_spark.operators.layout import xy_cut_page

    boxes = (
        [_box(0, 0, 100, 15)]  # full-width header: y-cut first
        + [_box(0, 20 + 30 * i, 45, 40 + 30 * i) for i in range(2)]
        + [_box(55, 35 + 30 * i, 100, 55 + 30 * i) for i in range(2)]
    )
    assert xy_cut_page(boxes) == [0, 1, 2, 3, 4]


def test_xy_cut_single_column_equals_top_left_sort():
    from ocr_spark.operators.layout import xy_cut_page

    boxes = [_box(0, 30 * i, 100, 20 + 30 * i) for i in (3, 0, 2, 1)]
    flat = sorted(range(4), key=lambda i: (boxes[i][1], boxes[i][0]))
    assert xy_cut_page(boxes) == flat


def test_xy_cut_no_valley_leaf_sorts_top_left():
    from ocr_spark.operators.layout import xy_cut_page

    # all boxes mutually overlapping on both axes — no cut anywhere
    boxes = [_box(0, 5, 50, 50), _box(10, 0, 60, 45), _box(5, 2, 55, 48)]
    assert xy_cut_page(boxes) == [1, 2, 0]  # (top, left, idx)


def test_xy_cut_nested_three_levels():
    """y-cut → x-cut → y-cut: title, then two columns each with two
    paragraphs separated by a column-internal valley."""
    from ocr_spark.operators.layout import xy_cut_page

    boxes = [
        _box(0, 0, 100, 10),     # 0 title
        _box(0, 20, 45, 35),     # 1 left para 1
        _box(0, 45, 45, 95),     # 2 left para 2 (tall: overlaps right paras)
        _box(55, 25, 100, 60),   # 3 right para 1
        _box(55, 70, 100, 95),   # 4 right para 2
    ]
    assert xy_cut_page(boxes) == [0, 1, 2, 3, 4]


def test_xy_cut_permutation_property():
    import random

    from ocr_spark.operators.layout import xy_cut_page

    rng = random.Random(11)
    for _ in range(25):
        n = rng.randint(0, 40)
        boxes = []
        for _ in range(n):
            left = rng.uniform(0, 900)
            top = rng.uniform(0, 900)
            boxes.append(
                _box(left, top, left + rng.uniform(5, 100), top + rng.uniform(5, 40))
            )
        order = xy_cut_page(boxes)
        assert sorted(order) == list(range(n))


def test_xy_cut_order_operator(spark):
    from ocr_spark.operators.layout import xy_cut_order

    blocks = [
        {"block_id": 7, "box": _box(55, 35, 100, 55)},   # right col
        {"block_id": 3, "box": _box(0, 20, 45, 40)},     # left col
        {"block_id": 9, "box": _box(0, 50, 45, 70)},     # left col, lower
    ]
    df = spark.createDataFrame(
        [("d", 0, blocks)],
        "doc_id string, page_no int, "
        "blocks array<struct<block_id int, box array<double>>>",
    )
    got = {
        r["block_id"]: r["ord_rank"] for r in xy_cut_order(df).collect()
    }
    assert got == {3: 0, 9: 1, 7: 2}
