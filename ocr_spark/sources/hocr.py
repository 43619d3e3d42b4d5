"""hOCR page parser — the reference's core IR producer (P1–P5), rebuilt as a
vectorized Arrow kernel.

Reference semantics (citations into /root/reference/):

* structure walk ocr_par → ocr_line → ocrx_word
                                    — server/src/utils/parse_hocr.py:38-104
* attribute regexes ``bbox(( \\d+){4})``, ``baseline(( [\\d.\\-]+){2})``,
  ``x_wconf (\\d+)``, ``x_font ([a-zA-Z_-]+)``
                                    — server/src/utils/parse_hocr.py:3-6
* line-as-one-word fallback when a line has no ocrx_word children
                                    — parse_hocr.py:61-64
* empty-word filter                 — parse_hocr.py:67-69
* empty line / empty paragraph drop — parse_hocr.py:99-102
* segment-origin compensation (add segment box origin to word boxes,
  pytesseract path)                 — parse_hocr.py:78-85
* baseline interpolation ``b = polyval(baseline, x_mid - line_x0) +
  line_y2``                         — parse_hocr.py:86, 107-115

No XML library (lxml absent in the sandbox; the reference itself walks the
tree, we lex it): paragraphs / lines / words are located with three
vectorized ``pandas.str.extractall`` passes over the whole Arrow batch —
the amortize-per-batch moral (SURVEY.md §2.10 G7).  hOCR emitted by
Tesseract is machine-generated and regular, which is what makes lexing
sound here.

Output one row per input page:
  ``paragraphs: array<array<array<struct<text string, box array<double>,
  b double, confidence int, font string>>>>`` — exactly the reference's
  page-JSON IR shape (FIXTURES.md §2).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame

# reference regexes, parse_hocr.py:3-6
BBOX_RE = re.compile(r"bbox((?: \d+){4})")
BASELINE_RE = re.compile(r"baseline((?: [\d.\-]+){2})")
CONF_RE = re.compile(r"x_wconf (\d+)")
FONT_RE = re.compile(r"x_font ([a-zA-Z_-]+)")

_PAR_RE = r"<p[^>]*class=.ocr_par.[^>]*>(?P<body>.*?)</p>"
_LINE_RE = (
    r"<span[^>]*class=.ocr_line.[^>]*title=.(?P<title>[^\"']*).[^>]*>"
    r"(?P<body>.*?)</span>\s*(?:<br/>)?\s*(?=<span[^>]*class=.ocr_line.|$)"
)
_WORD_RE = (
    r"<span[^>]*class=.ocrx_word.[^>]*title=.(?P<title>[^\"']*).[^>]*>"
    r"(?P<body>.*?)</span>"
)
_TAG_RE = re.compile(r"<[^>]+>")

_WORD_T = pa.struct(
    [
        ("text", pa.string()),
        ("box", pa.list_(pa.float64())),
        ("b", pa.float64()),
        ("confidence", pa.int32()),
        ("font", pa.string()),
    ]
)
PAGE_IR_DDL = (
    "doc_id string, page_no int, paragraphs array<array<array<struct<"
    "text:string, box:array<double>, b:double, confidence:int, font:string>>>>"
)
_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_no", pa.int32()),
        ("paragraphs", pa.list_(pa.list_(pa.list_(_WORD_T)))),
    ]
)


def _polyval(coeffs: tuple[float, float], x: float) -> float:
    """parse_hocr.py:107-115 — linear only: x*a + b."""
    return x * coeffs[0] + coeffs[1]


def _extract_box(title: str) -> list[float] | None:
    m = BBOX_RE.search(title)
    if not m:
        return None
    return [float(v) for v in m.group(1).split()]


def _parse_batch(
    pdf: pd.DataFrame, segment_origin: bool
) -> list[tuple[str, int, list]]:
    """Three extractall passes: pages → paragraphs → lines → words.
    Carries (row, par, line) multi-index bookkeeping so nesting rebuilds
    without per-string Python re-parsing."""
    hocr = pdf["hocr"].fillna("")
    # pass 1: paragraphs per page  (MultiIndex: (row, par_ix))
    pars = hocr.str.extractall(_PAR_RE, flags=re.S)["body"]
    # pass 2: lines per paragraph  (MultiIndex: (row, par_ix, line_ix))
    lines = pars.str.extractall(_LINE_RE, flags=re.S)
    # pass 3: words per line
    words = lines["body"].str.extractall(_WORD_RE, flags=re.S)

    seg_dx = pdf["seg_left"].to_numpy() if "seg_left" in pdf else np.zeros(len(pdf))
    seg_dy = pdf["seg_top"].to_numpy() if "seg_top" in pdf else np.zeros(len(pdf))

    # group words under (row, par, line)
    word_map: dict[tuple, list[tuple[str, str]]] = {}
    for idx, row in words.iterrows():
        key = idx[:-1]  # drop match level
        word_map.setdefault(key, []).append((row["title"], row["body"]))

    out: list[tuple[str, int, list]] = []
    for i, (doc_id, page_no) in enumerate(
        zip(pdf["doc_id"], pdf["page_no"])
    ):
        page_pars: list = []
        if i in pars.index.get_level_values(0):
            par_ct = len(pars.loc[i])
        else:
            par_ct = 0
        for pj in range(par_ct):
            par_lines: list = []
            try:
                line_rows = lines.loc[(i, pj)]
            except KeyError:
                line_rows = None
            n_lines = 0 if line_rows is None else len(line_rows)
            for lj in range(n_lines):
                title = line_rows.iloc[lj]["title"]
                line_box = _extract_box(title) or [0.0, 0.0, 0.0, 0.0]
                bl = BASELINE_RE.search(title)
                baseline = (
                    tuple(float(v) for v in bl.group(1).split())
                    if bl
                    else (0.0, 0.0)
                )
                raw_words = word_map.get((i, pj, lj), [])
                line_words = []
                if raw_words:
                    for wtitle, wbody in raw_words:
                        text = _TAG_RE.sub("", wbody).strip()
                        if text == "":  # parse_hocr.py:67-69
                            continue
                        box = _extract_box(wtitle) or line_box
                        conf_m = CONF_RE.search(wtitle)
                        font_m = FONT_RE.search(wtitle)
                        if segment_origin:  # parse_hocr.py:78-85
                            box = [
                                box[0] + seg_dx[i], box[1] + seg_dy[i],
                                box[2] + seg_dx[i], box[3] + seg_dy[i],
                            ]
                        x_mid = (box[0] + box[2]) / 2.0
                        b = (
                            _polyval(baseline, x_mid - line_box[0])
                            + line_box[3]
                        )  # parse_hocr.py:86
                        line_words.append(
                            {
                                "text": text,
                                "box": [float(v) for v in box],
                                "b": float(b),
                                "confidence": int(conf_m.group(1)) if conf_m else 0,
                                "font": font_m.group(1) if font_m else None,
                            }
                        )
                else:
                    # line-as-one-word fallback, parse_hocr.py:61-64
                    text = _TAG_RE.sub("", line_rows.iloc[lj]["body"]).strip()
                    if text:
                        x_mid = (line_box[0] + line_box[2]) / 2.0
                        b = _polyval(baseline, x_mid - line_box[0]) + line_box[3]
                        line_words.append(
                            {
                                "text": text,
                                "box": [float(v) for v in line_box],
                                "b": float(b),
                                "confidence": 0,
                                "font": None,
                            }
                        )
                if line_words:  # parse_hocr.py:99-102
                    par_lines.append(line_words)
            if par_lines:
                page_pars.append(par_lines)
        out.append((doc_id, int(page_no), page_pars))
    return out


def parse_hocr_pages(
    df: DataFrame, segment_origin: bool = False
) -> DataFrame:
    """(doc_id, page_no, hocr [, seg_left, seg_top]) → the page IR.

    Narrow mapInArrow transformation: no shuffle, scales linearly; regex
    passes are pandas-vectorized across each Arrow batch.
    """

    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            pdf = batch.to_pandas()
            rows = _parse_batch(pdf, segment_origin)
            tbl = pa.Table.from_pylist(
                [
                    {"doc_id": d, "page_no": p, "paragraphs": pars}
                    for d, p, pars in rows
                ],
                schema=_OUT_SCHEMA,
            )
            for b in tbl.to_batches():
                yield b

    return df.mapInArrow(fn, PAGE_IR_DDL)


def render_hocr(paragraphs: list, page_no: int = 1) -> str:
    """Deterministic hOCR renderer (test fixture generator): page IR →
    Tesseract-shaped hOCR.  Inverse of the parser on its output domain."""
    parts = [
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<html>\n<body>\n"
        f"<div class='ocr_page' id='page_{page_no}' "
        f"title='image \"p{page_no}.png\"; bbox 0 0 2480 3508'>"
    ]
    wid = 0
    for pj, par in enumerate(paragraphs, 1):
        parts.append(f"<p class='ocr_par' id='par_{page_no}_{pj}' lang='por'>")
        for lj, line in enumerate(par, 1):
            if not line:
                continue
            x1 = min(w["box"][0] for w in line)
            y1 = min(w["box"][1] for w in line)
            x2 = max(w["box"][2] for w in line)
            y2 = max(w["box"][3] for w in line)
            parts.append(
                f"<span class='ocr_line' id='line_{page_no}_{lj}' "
                f"title='bbox {x1:.0f} {y1:.0f} {x2:.0f} {y2:.0f}; "
                f"baseline 0 0'>"
            )
            for w in line:
                wid += 1
                b = w["box"]
                font = f"; x_font {w['font']}" if w.get("font") else ""
                parts.append(
                    f"<span class='ocrx_word' id='word_{page_no}_{wid}' "
                    f"title='bbox {b[0]:.0f} {b[1]:.0f} {b[2]:.0f} {b[3]:.0f}; "
                    f"x_wconf {w['confidence']}{font}'>{w['text']}</span>"
                )
            parts.append("</span>")
        parts.append("</p>")
    parts.append("</div>\n</body>\n</html>")
    return "".join(parts)
