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


_BBOX_COLS_RE = r"bbox (\d+) (\d+) (\d+) (\d+)"
_BASELINE_COLS_RE = r"baseline ([\d.\-]+) ([\d.\-]+)"

# XML entity decode, vectorized — the reference reads word text with lxml
# ``text_content()`` (parse_hocr.py:65), which unescapes entities; the
# named five cover everything Tesseract (and our hocr_pages writer) emit.
# &amp; decodes LAST so '&amp;lt;' → '&lt;' (lxml-identical).
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _unescape(s: pd.Series) -> pd.Series:
    for pat, rep in _ENTITIES:
        s = s.str.replace(pat, rep, regex=False)
    return s


def _parse_batch_arrow(pdf: pd.DataFrame, segment_origin: bool) -> pa.Table:
    """Fully vectorized parse: three ``extractall`` passes locate the
    nesting (pages → paragraphs → lines → words), per-word/per-line
    attributes come from vectorized ``str.extract`` columns, and the
    nested ListArrays are rebuilt from group-boundary offsets (the
    ``_word_index`` technique, operators/extract.py) — no per-word Python
    loop anywhere.

    Preserved reference quirks (parse_hocr.py):
    * empty-word filter (67-69) runs BEFORE the empty-line/paragraph drops
      (99-102);
    * the line-as-one-word fallback (61-64) fires only when a line has no
      ocrx_word ELEMENTS at all — a line whose words are all empty text is
      dropped, not falled-back;
    * segment-origin compensation (78-85) shifts word boxes only; the
      baseline interpolation (86) uses the SHIFTED x_mid against the
      UNSHIFTED line origin, and the fallback word is never shifted.
    """
    R = len(pdf)
    hocr = pdf["hocr"].fillna("")
    # pass 1: paragraphs per page  (MultiIndex: (row, par))
    pars = hocr.str.extractall(_PAR_RE, flags=re.S)["body"].fillna("")
    # pass 2: lines per paragraph  (MultiIndex: (row, par, line))
    lines = pars.str.extractall(_LINE_RE, flags=re.S).fillna("")
    # pass 3: words per line       (MultiIndex: (row, par, line, word))
    # (.fillna: pandas extractall yields NaN for EMPTY group matches —
    # e.g. a word span with empty body — which must read as "", not
    # float NaN; hypothesis found this, and the round-1 per-row parser
    # had the same latent crash on empty-body words)
    words = lines["body"].str.extractall(_WORD_RE, flags=re.S).fillna("")

    seg_dx = (
        pdf["seg_left"].to_numpy(dtype=np.float64)
        if "seg_left" in pdf else np.zeros(R)
    )
    seg_dy = (
        pdf["seg_top"].to_numpy(dtype=np.float64)
        if "seg_top" in pdf else np.zeros(R)
    )

    # --- vectorized per-line attributes -------------------------------
    ltitle = lines["title"]
    lbox = ltitle.str.extract(_BBOX_COLS_RE).astype(np.float64).fillna(0.0)
    lx1 = lbox[0].to_numpy()
    ly2 = lbox[3].to_numpy()
    lbox_np = lbox.to_numpy()  # (L, 4)
    lbl = (
        ltitle.str.extract(_BASELINE_COLS_RE).astype(np.float64).fillna(0.0)
    )
    bl_a, bl_b = lbl[0].to_numpy(), lbl[1].to_numpy()
    lbody_text = _unescape(
        lines["body"].str.replace(_TAG_RE, "", regex=True)
    ).str.strip()

    # --- vectorized per-word attributes -------------------------------
    wtext = _unescape(
        words["body"].str.replace(_TAG_RE, "", regex=True)
    ).str.strip()
    wbox = words["title"].str.extract(_BBOX_COLS_RE).astype(np.float64)
    wconf = (
        words["title"].str.extract(CONF_RE.pattern)[0]
        .astype(np.float64).fillna(0.0).to_numpy().astype(np.int32)
    )
    wfont = words["title"].str.extract(FONT_RE.pattern)[0].to_numpy(dtype=object)
    wfont[pd.isna(wfont)] = None  # Arrow string arrays reject float NaN

    # real words: empty-text filter (parse_hocr.py:67-69)
    keep = (wtext != "").to_numpy()
    widx = words.index
    # line position of each word (lines index is unique; get_indexer is
    # the vectorized join)
    wpos_all = lines.index.get_indexer(widx.droplevel(-1))
    w_row = widx.get_level_values(0).to_numpy()[keep]
    w_par = np.asarray(widx.get_level_values(1), dtype=np.int64)[keep]
    w_line = np.asarray(widx.get_level_values(2), dtype=np.int64)[keep]
    w_ord = np.asarray(widx.get_level_values(3), dtype=np.int64)[keep]
    wpos = wpos_all[keep]

    box4 = wbox.to_numpy()[keep]  # (W, 4), NaN where word has no bbox
    # missing word bbox → line box (parse_hocr.py's `or line_box`)
    miss = np.isnan(box4[:, 0]) if len(box4) else np.zeros(0, bool)
    if miss.any():
        box4[miss] = lbox_np[wpos[miss]]
    if segment_origin and len(box4):  # parse_hocr.py:78-85
        box4 = box4 + np.stack(
            [seg_dx[w_row], seg_dy[w_row], seg_dx[w_row], seg_dy[w_row]],
            axis=1,
        )
    x_mid = (box4[:, 0] + box4[:, 2]) / 2.0 if len(box4) else np.zeros(0)
    # b = polyval(baseline, x_mid - line_x0) + line_y2   (parse_hocr.py:86)
    w_b = (x_mid - lx1[wpos]) * bl_a[wpos] + bl_b[wpos] + ly2[wpos]
    w_text = wtext.to_numpy(dtype=object)[keep]
    w_conf = wconf[keep]
    w_font = wfont[keep]

    # --- line-as-one-word fallback (parse_hocr.py:61-64) --------------
    lidx = lines.index
    has_word_elems = lidx.isin(widx.droplevel(-1).unique())
    fb = (~has_word_elems) & (lbody_text != "").to_numpy()
    fb_pos = np.flatnonzero(fb)
    fb_row = lidx.get_level_values(0).to_numpy()[fb_pos]
    fb_par = np.asarray(lidx.get_level_values(1), dtype=np.int64)[fb_pos]
    fb_line = np.asarray(lidx.get_level_values(2), dtype=np.int64)[fb_pos]
    fb_xmid = (lbox_np[fb_pos, 0] + lbox_np[fb_pos, 2]) / 2.0
    fb_b = (
        (fb_xmid - lx1[fb_pos]) * bl_a[fb_pos] + bl_b[fb_pos] + ly2[fb_pos]
    )

    # --- merge + global reading-order sort ----------------------------
    g_row = np.concatenate([w_row, fb_row]).astype(np.int64)
    g_par = np.concatenate([w_par, fb_par])
    g_line = np.concatenate([w_line, fb_line])
    g_ord = np.concatenate([w_ord, np.zeros(len(fb_pos), dtype=np.int64)])
    g_text = np.concatenate(
        [w_text, lbody_text.to_numpy(dtype=object)[fb_pos]]
    )
    g_box = (
        np.concatenate([box4, lbox_np[fb_pos]])
        if len(box4) or len(fb_pos)
        else np.zeros((0, 4))
    )
    g_b = np.concatenate([w_b, fb_b])
    g_conf = np.concatenate(
        [w_conf, np.zeros(len(fb_pos), dtype=np.int32)]
    )
    g_font = np.concatenate(
        [w_font, np.full(len(fb_pos), None, dtype=object)]
    )
    perm = np.lexsort((g_ord, g_line, g_par, g_row))
    g_row, g_par, g_line = g_row[perm], g_par[perm], g_line[perm]
    g_text, g_b = g_text[perm], g_b[perm]
    g_box, g_conf, g_font = g_box[perm], g_conf[perm], g_font[perm]
    W = len(g_row)

    # --- group-boundary offsets: words→lines→paragraphs→pages ---------
    if W:
        new_line = np.ones(W, dtype=bool)
        new_line[1:] = (
            (g_row[1:] != g_row[:-1])
            | (g_par[1:] != g_par[:-1])
            | (g_line[1:] != g_line[:-1])
        )
        line_starts = np.flatnonzero(new_line)
        word_offs = np.concatenate((line_starts, [W]))
        l_row, l_par = g_row[line_starts], g_par[line_starts]
        L = len(line_starts)
        new_par = np.ones(L, dtype=bool)
        new_par[1:] = (l_row[1:] != l_row[:-1]) | (l_par[1:] != l_par[:-1])
        par_starts = np.flatnonzero(new_par)
        line_offs = np.concatenate((par_starts, [L]))
        p_row = l_row[par_starts]
        pars_per_row = np.bincount(p_row, minlength=R)
    else:
        word_offs = np.zeros(1, dtype=np.int64)
        line_offs = np.zeros(1, dtype=np.int64)
        pars_per_row = np.zeros(R, dtype=np.int64)
    par_offs = np.concatenate(([0], np.cumsum(pars_per_row)))

    word_struct = pa.StructArray.from_arrays(
        [
            pa.array(g_text, type=pa.string()),
            pa.ListArray.from_arrays(
                pa.array(np.arange(W + 1) * 4, type=pa.int32()),
                pa.array(g_box.ravel(), type=pa.float64()),
            ),
            pa.array(g_b, type=pa.float64()),
            pa.array(g_conf, type=pa.int32()),
            pa.array(g_font, type=pa.string()),
        ],
        names=["text", "box", "b", "confidence", "font"],
    )
    paragraphs = pa.ListArray.from_arrays(
        pa.array(par_offs, type=pa.int32()),
        pa.ListArray.from_arrays(
            pa.array(line_offs, type=pa.int32()),
            pa.ListArray.from_arrays(
                pa.array(word_offs, type=pa.int32()), word_struct
            ),
        ),
    )
    return pa.Table.from_arrays(
        [
            pa.array(pdf["doc_id"].to_numpy(dtype=object), type=pa.string()),
            pa.array(
                pdf["page_no"].to_numpy(dtype=np.int64), type=pa.int32()
            ),
            paragraphs.cast(_OUT_SCHEMA.field("paragraphs").type),
        ],
        schema=_OUT_SCHEMA,
    )


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
            tbl = _parse_batch_arrow(pdf, segment_origin)
            for b in tbl.to_batches():
                yield b

    return df.mapInArrow(fn, PAGE_IR_DDL)


_PHOTO_RE = re.compile(
    # Quote-aware title capture: the delimiter is whichever quote opens
    # the attribute, so an apostrophe inside a double-quoted title (the
    # writer always double-quotes) no longer truncates the media_ref.
    r"<div[^>]*class=([\"'])ocr_photo\1[^>]*"
    r"title=([\"'])(?P<title>.*?)\2[^>]*>"
)
_PAR_OPEN_RE = re.compile(r"<p[^>]*class=.ocr_par.")
_XSRC_RE = re.compile(r"x_source (.*)$")

MEDIA_DDL = (
    "doc_id string, page_no int, par_idx int, seq int, "
    "media_ref string, box array<double>"
)


def parse_hocr_media(df: DataFrame) -> DataFrame:
    """(doc_id, page_no, hocr) → one row per ``ocr_photo`` div — the
    media-region side channel of interleaved hOCR documents
    (``hocr_pages(..., media=...)`` writes them; the hOCR spec's photo
    class family).  Recovered per div: ``par_idx`` (number of
    ``ocr_par`` openings before it — the writer's before-paragraph
    placement), ``seq`` (order within the page), ``media_ref`` (the
    ``x_source`` title field, entity-unescaped) and the integer
    ``bbox`` as doubles, so ``parse(write(ir, media)) == (ir, media)``
    round-trips both channels — gated in tests/test_hocr_writer.py.

    Narrow mapInPandas, no shuffle; photo divs are sparse, so the
    per-match loop rides on the page-level regex scan."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc, pno, hocr in zip(
                pdf["doc_id"], pdf["page_no"], pdf["hocr"]
            ):
                s = hocr or ""
                for seq, m in enumerate(_PHOTO_RE.finditer(s)):
                    title = m.group("title")
                    bm = BBOX_RE.search(title)
                    box = (
                        [float(v) for v in bm.group(1).split()]
                        if bm
                        else [0.0, 0.0, 0.0, 0.0]
                    )
                    sm = _XSRC_RE.search(title)
                    ref = sm.group(1) if sm else None
                    if ref is not None:
                        ref = (
                            ref.replace("&lt;", "<")
                            .replace("&gt;", ">")
                            .replace("&quot;", '"')
                            .replace("&amp;", "&")
                        )
                    par_idx = len(_PAR_OPEN_RE.findall(s, 0, m.start()))
                    rows.append((doc, int(pno), par_idx, seq, ref, box))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "page_no", "par_idx", "seq",
                    "media_ref", "box",
                ],
            )

    return df.mapInPandas(fn, MEDIA_DDL)


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
                txt = (
                    w["text"]
                    .replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                    .replace('"', "&quot;")
                )
                parts.append(
                    f"<span class='ocrx_word' id='word_{page_no}_{wid}' "
                    f"title='bbox {b[0]:.0f} {b[1]:.0f} {b[2]:.0f} {b[3]:.0f}; "
                    f"x_wconf {w['confidence']}{font}'>{txt}</span>"
                )
            parts.append("</span>")
        parts.append("</p>")
    parts.append("</div>\n</body>\n</html>")
    return "".join(parts)
