"""caption_pairs (operators/multimodal.py): image–text pair mining over
interleaved span sequences.  Hand-checkable fixture covering: media
neighbors excluded from caption windows, longer-side-wins with
before-on-tie, doc-initial media, caption-less lone media, and window
truncation.  The real-kernel composition is hash-gated by the
``media_captions`` DuckDB twin at the driver gate."""

from __future__ import annotations

import pytest

from ocr_spark.operators.multimodal import caption_pairs

ROWS = [
    # doc d1: text text [m1] text [m2] text
    ("d1", "text", "alpha", None, 0),
    ("d1", "text", "beta", None, 1),
    ("d1", "media_ref", None, "m1", 2),
    ("d1", "text", "gamma", None, 3),
    ("d1", "media_ref", None, "m2", 4),
    ("d1", "text", "delta", None, 5),
    # doc d2: media first, then one word
    ("d2", "media_ref", None, "m3", 0),
    ("d2", "text", "solo", None, 1),
    # doc d3: a lone media span, no text at all
    ("d3", "media_ref", None, "m4", 0),
]


@pytest.fixture(scope="module")
def pairs(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id string, kind string, text string, media_ref string, "
        "offset int"
    )
    return {r["media_ref"]: r for r in caption_pairs(df, window=8).collect()}


def test_media_neighbors_excluded_and_sides_correct(pairs):
    # m2's before-window spans m1's slot — m1 contributes no word
    assert pairs["m2"]["cap_before"] == "alpha beta gamma"
    assert pairs["m2"]["cap_after"] == "delta"
    assert pairs["m2"]["caption"] == "alpha beta gamma"  # longer side


def test_longer_side_wins(pairs):
    assert pairs["m1"]["cap_before"] == "alpha beta"
    assert pairs["m1"]["cap_after"] == "gamma delta"
    assert pairs["m1"]["caption"] == "gamma delta"


def test_doc_initial_media_takes_following_text(pairs):
    assert pairs["m3"]["cap_before"] == ""
    assert pairs["m3"]["caption"] == "solo"


def test_lone_media_gets_empty_caption(pairs):
    assert pairs["m4"]["caption"] == ""


def test_window_truncates(spark):
    rows = [("d", "text", f"w{i}", None, i) for i in range(12)]
    rows.append(("d", "media_ref", None, "m", 12))
    df = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, "
        "offset int"
    )
    got = caption_pairs(df, window=3).collect()[0]
    assert got["cap_before"] == "w9 w10 w11"


def test_tie_prefers_before(spark):
    rows = [
        ("d", "text", "aa", None, 0),
        ("d", "media_ref", None, "m", 1),
        ("d", "text", "bb", None, 2),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, "
        "offset int"
    )
    assert caption_pairs(df).collect()[0]["caption"] == "aa"
