"""G1-G5 raster segmentation (operators/raster.py): exact Otsu, ruling
removal, run-union component labeling, ε box-merge, density typing —
kernel-level batteries plus the Spark operator end-to-end."""

from __future__ import annotations

import numpy as np

from ocr_spark.operators.raster import (
    _components,
    _merge_boxes,
    _otsu,
    segment_bitmaps,
    segment_page,
)


def _otsu_reference(gray: np.ndarray) -> int:
    """Independent textbook Otsu (exhaustive loop) for cross-checking."""
    hist = np.bincount(gray.ravel(), minlength=256)
    total = hist.sum()
    best_t, best_v = 0, -1.0
    for t in range(256):
        w0 = hist[: t + 1].sum()
        w1 = total - w0
        if w0 == 0 or w1 == 0:
            continue
        mu0 = (hist[: t + 1] * np.arange(t + 1)).sum() / w0
        mu1 = (hist[t + 1:] * np.arange(t + 1, 256)).sum() / w1
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best_v:
            best_v, best_t = v, t
    return best_t


def test_otsu_matches_textbook():
    rng = np.random.default_rng(7)
    for _ in range(10):
        a = np.concatenate(
            [
                rng.normal(60, 12, 500).clip(0, 255),
                rng.normal(190, 20, 700).clip(0, 255),
            ]
        ).astype(np.uint8).reshape(40, 30)
        assert _otsu(a) == _otsu_reference(a)


def test_components_boxes_and_areas():
    ink = np.zeros((10, 12), dtype=bool)
    ink[1:3, 1:4] = True          # box (1,1,4,3) area 6
    ink[5, 6:9] = True            # touching diagonal-only pieces stay
    ink[6, 9:11] = True           # separate (4-connectivity)
    comps = sorted(_components(ink))
    assert comps == [(1, 1, 4, 3, 6), (6, 5, 9, 6, 3), (9, 6, 11, 7, 2)]


def test_merge_boxes_transitive():
    boxes = [(0, 0, 4, 4, 8), (6, 0, 10, 4, 8), (30, 30, 34, 34, 4)]
    # eps 2: gap 2 between first two → dilated overlap → merge
    merged = _merge_boxes(boxes, 2.0, 2.0)
    assert merged == [(0, 0, 10, 4, 2, 16), (30, 30, 34, 34, 1, 4)]


def _page():
    g = np.full((200, 300), 255, dtype=np.uint8)
    # text: two close rows of small glyph blobs (gap < 2·eps_y)
    for y0 in (20, 28):
        for x0 in range(20, 280, 10):
            g[y0:y0 + 3, x0:x0 + 4] = 0
    # ruling line across the page (width 280 >= 300/15)
    g[80, 10:290] = 0
    # image block: dense filled rectangle
    g[100:160, 40:120] = 30
    return g


def test_segment_page_pipeline():
    regions = segment_page(_page())
    kinds = [r[0] for r in regions]
    assert kinds == ["text", "image"]
    text, image = regions
    # text region hull covers the blob grid (both rows merged)
    assert text[1:5] == (20, 20, 274, 31)
    assert text[5] == 52
    # image region is the exact filled rect, density 1
    assert image[1:5] == (40, 100, 120, 160)
    assert image[5] == 1 and image[6] == 1.0
    # the ruling was removed: no region spans y=80
    assert all(not (r[2] <= 80 < r[4]) for r in regions)


def test_segment_bitmaps_operator(spark):
    g = _page()
    rows = [
        ("d1", 1, g.shape[1], g.shape[0], g.tobytes()),
        ("d1", 2, 4, 4, np.full((4, 4), 255, np.uint8).tobytes()),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, page_no int, width int, height int, bitmap binary",
    )
    got = segment_bitmaps(df).collect()
    assert [
        (r["page_no"], r["region_idx"], r["kind"]) for r in got
    ] == [(1, 0, "text"), (1, 1, "image")]
    plan = segment_bitmaps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # determinism under repartition
    again = segment_bitmaps(df.repartition(3)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_segment_bitmaps_corrupt_buffer_marker(spark):
    """A truncated/undersized bitmap buffer yields a marker region row
    (kind='corrupt') instead of a stage-killing reshape error — the
    ingest parse_ok=false convention."""
    g = _page()
    rows = [
        ("ok", 1, g.shape[1], g.shape[0], g.tobytes()),
        ("bad", 1, 100, 100, b"\x00" * 10),   # 10 bytes for 10k pixels
        ("bad", 2, 4, 4, None),               # null bitmap
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, page_no int, width int, height int, bitmap binary",
    )
    got = segment_bitmaps(df).collect()
    bad = [r for r in got if r["doc_id"] == "bad"]
    assert {(r["page_no"], r["kind"]) for r in bad} == {
        (1, "corrupt"), (2, "corrupt")
    }
    # the healthy page still segments
    assert any(r["doc_id"] == "ok" and r["kind"] == "text" for r in got)
