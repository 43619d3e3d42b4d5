"""Property-based round-trip for the vectorized hOCR parser: arbitrary
page IR → render_hocr → _parse_batch_arrow == the reference filtering
rules applied to the input IR (empty-word drop BEFORE empty-line/
paragraph drops; b = line_y2 under the rendered 'baseline 0 0').

Runs on the kernel directly (no Spark session) so hypothesis can afford
many examples — same pattern as test_property_kernel.py."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.sources.hocr import _parse_batch_arrow, render_hocr

word_st = st.fixed_dictionaries(
    {
        "text": st.sampled_from(["", "  ", "ok", "çã", "a b", "Zu-", "x!"]),
        "x": st.integers(0, 500),
        "y": st.integers(0, 500),
        "w": st.integers(1, 100),
        "h": st.integers(1, 50),
        "confidence": st.integers(0, 100),
        "font": st.sampled_from([None, "Times_New-Roman", "f"]),
    }
)
line_st = st.lists(word_st, min_size=0, max_size=5)
par_st = st.lists(line_st, min_size=0, max_size=4)
page_st = st.lists(par_st, min_size=0, max_size=3)
doc_st = st.lists(page_st, min_size=1, max_size=4)


def _ir(page):
    """strategy dicts → render_hocr IR (integral boxes so :.0f is exact)."""
    return [
        [
            [
                {
                    "text": w["text"],
                    "box": [float(w["x"]), float(w["y"]),
                            float(w["x"] + w["w"]), float(w["y"] + w["h"])],
                    "b": 0.0,
                    "confidence": w["confidence"],
                    "font": w["font"],
                }
                for w in line
            ]
            for line in par
        ]
        for par in page
    ]


def _expected(paragraphs):
    """Reference rules (parse_hocr.py): word text strips; empty-text words
    drop (67-69); then empty lines/paragraphs drop (99-102); with the
    rendered 'baseline 0 0' every word's b is the line box's y2 = max y2
    over ALL words of the line (including ones later dropped, because the
    renderer computes the line box before filtering)."""
    out_p = []
    for par in paragraphs:
        out_l = []
        for line in par:
            if not line:
                continue  # render skips empty line lists entirely
            ly2 = max(w["box"][3] for w in line)
            kept = [
                {
                    "text": w["text"].strip(),
                    "box": [float(v) for v in w["box"]],
                    "b": float(ly2),
                    "confidence": w["confidence"],
                    "font": w["font"],
                }
                for w in line
                if w["text"].strip()
            ]
            if kept:
                out_l.append(kept)
        if out_l:
            out_p.append(out_l)
    return out_p


@given(doc_st)
@settings(max_examples=60, deadline=None)
def test_hocr_parse_roundtrip_property(pages):
    irs = [_ir(p) for p in pages]
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(len(pages))],
            "page_no": list(range(len(pages))),
            "hocr": [render_hocr(ir, page_no=i) for i, ir in enumerate(irs)],
        }
    )
    got = _parse_batch_arrow(pdf, segment_origin=False).to_pylist()
    assert len(got) == len(pages)
    for row, ir in zip(got, irs):
        assert row["paragraphs"] == _expected(ir), (
            f"mismatch for doc {row['doc_id']}"
        )
