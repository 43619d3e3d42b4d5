"""The flagship extraction operator: documents(spans, meta) → extracted
spans + assembled text + word index, one row per document, ZERO shuffle.

Spark-first design (SURVEY.md §7):

* one row = one document, so every per-document kernel (classification,
  reading-order reconstruction, empty-word filtering, text assembly,
  dehyphenation, word index) runs inside a single ``mapInArrow`` pass —
  a narrow transformation: no shuffle at any data size, perfect linear
  scaling with executors.  The only shuffles in the whole engine are the
  cross-document aggregations (see operators/vocab.py), which are salted.
* the kernel is Arrow-vectorized: list offsets + flattened child arrays are
  processed with numpy/pandas column ops (lexsort, masks, shift-based
  dehyphenation) — never per-row Python.  This is the batching moral of the
  reference's tesserocr path (one engine init per image, many rectangles —
  server/src/engines/ocr_tesserocr.py:102-124) applied to Arrow batches.

Reference semantics implemented (citations into /root/reference/):

* classify text/image/remove boxes     — server/celery_app.py:1048-1055
* boilerplate (remove) drop            — server/celery_app.py:1086-1092
* media_ref emission                   — server/celery_app.py:1062-1081
* ocr_image → text path                — server/celery_app.py:1137-1159
* empty-word filter                    — server/src/utils/parse_hocr.py:67-69
* reading order page→segment→para→line→word
                                       — server/celery_app.py:156-161,
                                         server/src/utils/parse_hocr.py:47-102
* confidence filtering surface (off by default, thresholds 75/85 are
  display constants)                   — website .../EditingMenu.js:76-88
* text assembly + page delimiters      — server/src/utils/file.py:586-596,
                                         server/src/utils/export.py:182-185
* dehyphenation + word index           — server/src/utils/export.py:492-530
* word count                           — server/src/utils/file.py:536-549
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PUNCT_CHARS = "«»“”.,;:!?()[]{}\"'"
_PUNCT_TABLE = str.maketrans("", "", PUNCT_CHARS)
# RE2 character class equivalent of _PUNCT_TABLE deletion, for the Arrow
# C++ fast path (pc.replace_substring_regex) — semantics-identical to
# str.translate: every listed code point is removed
import re as _re

_PUNCT_RE = "[" + "".join(_re.escape(c) for c in PUNCT_CHARS) + "]"

_SPAN_T = pa.struct(
    [("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("offset", pa.int32())]
)
_WIX_T = pa.struct(
    [("word", pa.string()), ("cnt", pa.int64()), ("pages", pa.list_(pa.int32()))]
)
_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(_SPAN_T)),
        ("doc_text", pa.string()),
        ("doc_text_delim", pa.string()),
        ("n_words", pa.int64()),
        ("word_index", pa.list_(_WIX_T)),
    ]
)

OUT_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "doc_text string, doc_text_delim string, n_words bigint, "
    "word_index array<struct<word:string,cnt:bigint,pages:array<int>>>"
)


def _list_bounds(col: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(per-doc start offsets incl. end, flattened values) for a ListArray."""
    import pyarrow.compute as pc

    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens, nan=0).astype(np.int64)
    bounds = np.concatenate(([0], np.cumsum(lens)))
    return bounds, col.flatten()


def _segmented_rank(docix_sorted: np.ndarray) -> np.ndarray:
    """Dense 0-based rank within each doc for rows already doc-major sorted."""
    n = len(docix_sorted)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    first = np.zeros(n, dtype=bool)
    first[0] = True
    first[1:] = docix_sorted[1:] != docix_sorted[:-1]
    starts = np.maximum.accumulate(np.where(first, np.arange(n), -1))
    return (np.arange(n) - starts).astype(np.int32)


def _extract_batch(
    batch: pa.RecordBatch,
    order_by: str,
    conf_min: int | None,
    with_word_index: bool,
) -> pa.RecordBatch:
    n_docs = batch.num_rows
    doc_ids = batch.column("doc_id")
    spans_col = pa.array(batch.column("spans"))
    meta_col = pa.array(batch.column("meta"))

    bounds, flat_spans = _list_bounds(spans_col)
    _, flat_meta = _list_bounds(meta_col)
    total = len(flat_spans)
    docix = np.repeat(np.arange(n_docs), np.diff(bounds))

    kind = flat_spans.field("kind").to_numpy(zero_copy_only=False)
    text = pd.Series(flat_spans.field("text").to_numpy(zero_copy_only=False))
    media = flat_spans.field("media_ref").to_numpy(zero_copy_only=False)
    offset = flat_spans.field("offset").to_numpy(zero_copy_only=False)
    page = flat_meta.field("page_no").to_numpy(zero_copy_only=False)
    seg = flat_meta.field("segment_pos").to_numpy(zero_copy_only=False)
    para = flat_meta.field("para_pos").to_numpy(zero_copy_only=False)
    line = flat_meta.field("line_pos").to_numpy(zero_copy_only=False)
    wpos = flat_meta.field("word_pos").to_numpy(zero_copy_only=False)
    conf = flat_meta.field("confidence").to_numpy(zero_copy_only=False)

    # ---- reading order (O1-O5 composite; SURVEY.md §2.4) -------------------
    if order_by == "meta":
        order = np.lexsort((offset, wpos, line, para, seg, page, docix))
    else:
        order = np.lexsort((offset, docix))

    # ---- classification + filters (P2, P6, P9, G9, G10) --------------------
    import pyarrow.compute as pc

    textish = (kind == "text") | (kind == "ocr_image")
    # Arrow C++ path for the empty-word test (str.strip().len() > 0 on
    # object dtype is a per-element Python loop; trim+length is the same
    # predicate — both strip the Unicode whitespace set)
    trimmed_len = pc.utf8_length(
        pc.utf8_trim_whitespace(flat_spans.field("text"))
    )
    nonempty = (
        pc.fill_null(pc.greater(trimmed_len, 0), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    keep = np.where(
        textish,
        nonempty if conf_min is None else nonempty & (conf >= conf_min),
        kind == "media_ref",
    )

    o = order[keep[order]]  # kept spans in reading order
    d_o = docix[o]
    rank = _segmented_rank(d_o)

    # rebuilt contract spans
    out_kind = np.where(textish[o], "text", "media_ref").astype(object)
    out_text = np.where(textish[o], text.to_numpy()[o], None)
    out_media = np.where(textish[o], None, media[o])
    kept_per_doc = np.bincount(d_o, minlength=n_docs)
    span_offsets = pa.array(
        np.concatenate(([0], np.cumsum(kept_per_doc))), type=pa.int32()
    )
    spans_out = pa.ListArray.from_arrays(
        span_offsets,
        pa.StructArray.from_arrays(
            [
                pa.array(out_kind, type=pa.string()),
                pa.array(out_text, type=pa.string()),
                pa.array(out_media, type=pa.string()),
                pa.array(rank, type=pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        ),
    )

    # ---- per-doc page universe (page files exist for every page) -----------
    n_pages = np.zeros(n_docs, dtype=np.int64)
    if total:
        np.maximum.at(n_pages, docix, page)

    # ---- text rows (kept text-path spans, reading order) -------------------
    t_sel = o[textish[o]]
    tdf = pd.DataFrame(
        {
            "d": docix[t_sel],
            "p": page[t_sel],
            "s": seg[t_sel],
            "pa": para[t_sel],
            "l": line[t_sel],
            "txt": text.to_numpy()[t_sel],
        }
    )
    n_words = np.bincount(docix[t_sel], minlength=n_docs).astype(np.int64)

    # ---- assembly (F1/F2): line ' ' → para '\n' → page '\n\n' + strip ------
    # Vectorized separator construction: each token's joining separator is
    # determined by which boundary precedes it (word ' ', line '\n',
    # paragraph '\n\n', page none) — no per-group Python joins (measured
    # 4× kernel speedup vs groupby.agg(str.join)).
    doc_text = np.empty(n_docs, dtype=object)
    doc_text_delim = np.empty(n_docs, dtype=object)
    if len(tdf):
        dv = tdf["d"].to_numpy()
        pv = tdf["p"].to_numpy()
        sv = tdf["s"].to_numpy()
        pav = tdf["pa"].to_numpy()
        lv = tdf["l"].to_numpy()
        tv = tdf["txt"].to_numpy()
        m = len(tv)
        new_page = np.ones(m, dtype=bool)
        new_page[1:] = (dv[1:] != dv[:-1]) | (pv[1:] != pv[:-1])
        new_para = new_page.copy()
        new_para[1:] |= (sv[1:] != sv[:-1]) | (pav[1:] != pav[:-1])
        new_line = new_para.copy()
        new_line[1:] |= lv[1:] != lv[:-1]
        sep = np.where(
            new_page, "", np.where(new_para, "\n\n", np.where(new_line, "\n", " "))
        ).astype(object)
        combined = sep + tv
        page_starts = np.flatnonzero(new_page)
        page_ends = np.append(page_starts[1:], m)
        page_text = {
            (int(dv[s]), int(pv[s])): "".join(combined[s:e]).strip()
            for s, e in zip(page_starts, page_ends)
        }
    else:
        page_text = {}
    for i in range(n_docs):
        plain, delim = [], []
        for p in range(1, int(n_pages[i]) + 1):
            pt = page_text.get((i, p), "")
            delim.append(f"----- PAGE {p:04d} -----\n\n")
            plain.append(pt + "\n\n")
            delim.append(pt + "\n\n")
        doc_text[i] = "".join(plain)
        doc_text_delim[i] = "".join(delim)

    # ---- word index (A1): dehyphenate → normalize → count ------------------
    if with_word_index:
        wix = _word_index(tdf, n_docs)
    else:
        wix = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1), type=pa.int32()),
            pa.array([], type=_WIX_T),
        )

    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids.to_numpy(zero_copy_only=False), type=pa.string()),
            spans_out,
            pa.array(doc_text, type=pa.string()),
            pa.array(doc_text_delim, type=pa.string()),
            pa.array(n_words, type=pa.int64()),
            wix,
        ],
        schema=_OUT_SCHEMA,
    )


def _word_index(tdf: pd.DataFrame, n_docs: int) -> pa.ListArray:
    """Vectorized find_index_words (export.py:492-530) over all docs at once.

    Dehyphenation, faithful to the reference's exact mechanics:

    * a line-final word ending '-' merges into the first word of the next
      line on the same (doc, page) — export.py:498-507;
    * the hyphen PREFIX is still counted (it was tallied when its line was
      scanned), then decremented by its **raw** text key — export.py:510-513.
      Since index keys are normalized (stripped+lowered single tokens), the
      decrement lands only when ``raw == normalize(raw)`` and raw is a
      single token; otherwise the prefix survives in the index ('Zu-' does,
      'zu-' does not — reference quirk preserved);
    * chains apply TOP-DOWN ('a-','b-','c' → count a-, ab-, abc; decrement
      a- and ab- → only 'abc' survives), matching the reference's
      sequential line walk.
    """
    if not len(tdf):
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1), type=pa.int32()),
            pa.array([], type=_WIX_T),
        )
    d = tdf["d"].to_numpy()
    p = tdf["p"].to_numpy()
    txt = tdf["txt"].astype(object).copy()
    n = len(tdf)

    # line-final = last row of its (d,p,s,pa,l) group
    keys = tdf[["d", "p", "s", "pa", "l"]].to_numpy()
    line_final = np.ones(n, dtype=bool)
    line_final[:-1] = (keys[1:] != keys[:-1]).any(axis=1)
    same_page_next = np.zeros(n, dtype=bool)
    same_page_next[:-1] = (d[1:] == d[:-1]) & (p[1:] == p[:-1])

    import pyarrow.compute as pc

    consumed = np.zeros(n, dtype=bool)
    dec_d: list = []
    dec_p: list = []
    dec_w: list = []
    # hyphen-final flags once via Arrow (C++); updated incrementally for
    # merged rows only — the old per-iteration full-array
    # txt.str.endswith rescan was the kernel's single hottest line
    ends = (
        pc.fill_null(
            pc.ends_with(pa.array(txt.to_numpy(), type=pa.string()), pattern="-"),
            False,
        )
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    while True:
        m = ends & line_final & same_page_next & ~consumed
        # top-down chains: defer a merge whose immediate predecessor is
        # itself a pending source ('a-' into 'b-' happens before the
        # result merges onward), matching the reference's forward walk
        prev_pending = np.zeros(n, dtype=bool)
        prev_pending[1:] = m[:-1]
        m_now = m & ~prev_pending
        if not m_now.any():
            break
        src = np.flatnonzero(m_now)
        tv = txt.to_numpy()
        for i in src:
            raw = tv[i]
            # raw-key decrement guard (export.py:510-513): the raw prefix
            # must itself be a normalized single-token key
            tok = raw.strip()
            if " " not in tok and tok.translate(_PUNCT_TABLE).lower() == raw:
                dec_d.append(d[i]); dec_p.append(p[i]); dec_w.append(raw)
        merged = [tv[i].rstrip("-") + tv[i + 1] for i in src]
        txt.iloc[src + 1] = merged
        consumed[src] = True
        for i, s in zip(src + 1, merged):
            ends[i] = s.endswith("-")

    # every row's (post-merge) text is counted — prefixes included.
    # Tokenize + normalize on the Arrow C++ path: utf8_split_whitespace +
    # RE2 punctuation strip + utf8_lower replace the pandas object-dtype
    # split/strip/translate/lower chain (each a per-element Python loop;
    # together they were ~half the kernel).  Python str.split() never
    # emits empty tokens, so split artifacts ('' from leading/trailing
    # whitespace) are masked out of the RAW tokens; a token that
    # NORMALIZES to '' is kept, exactly as before.
    arr = pa.array(txt.to_numpy(), type=pa.string())
    tok_list = pc.utf8_split_whitespace(arr)
    tok_counts = (
        pc.list_value_length(tok_list).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    flat_raw = tok_list.flatten()
    raw_np = flat_raw.to_numpy(zero_copy_only=False)
    keep_tok = raw_np != ""
    norm_np = (
        pc.utf8_lower(pc.replace_substring_regex(flat_raw, _PUNCT_RE, ""))
        .to_numpy(zero_copy_only=False)
    )
    wd = np.repeat(d, tok_counts)[keep_tok]
    wp = np.repeat(p, tok_counts)[keep_tok]
    counts = pd.DataFrame(
        {"d": wd, "p": wp,
         "w": norm_np[keep_tok],
         "c": np.ones(int(keep_tok.sum()), dtype=np.int64)}
    )
    if dec_w:
        counts = pd.concat(
            [counts, pd.DataFrame({"d": dec_d, "p": dec_p, "w": dec_w,
                                   "c": -np.ones(len(dec_w), dtype=np.int64)})],
            ignore_index=True,
        )
    cnt = (
        counts.groupby(["d", "w", "p"], sort=True)["c"]
        .sum()
        .reset_index(name="c")
    )
    cnt = cnt[cnt["c"] > 0].reset_index(drop=True)
    cd = cnt["d"].to_numpy()
    cw = cnt["w"].to_numpy()
    cp = cnt["p"].to_numpy()
    cc = cnt["c"].to_numpy()
    m = len(cnt)
    # (d, w) group boundaries over the sorted page-level rows — the pages
    # ListArray falls straight out of the boundary offsets (no .agg(list))
    new_grp = np.ones(m, dtype=bool)
    if m:
        new_grp[1:] = (cd[1:] != cd[:-1]) | (cw[1:] != cw[:-1])
    grp_id = np.cumsum(new_grp) - 1 if m else np.zeros(0, dtype=np.int64)
    n_grp = int(grp_id[-1] + 1) if m else 0
    grp_starts = np.flatnonzero(new_grp)
    grp_ends = np.append(grp_starts[1:], m)
    word_per_grp = cw[grp_starts] if m else np.zeros(0, dtype=object)
    doc_per_grp = cd[grp_starts] if m else np.zeros(0, dtype=np.int64)
    cnt_per_grp = np.bincount(grp_id, weights=cc, minlength=n_grp).astype(np.int64)

    # reference sort key lower(w)+w (export.py:217-220).  Words are already
    # lowercase, but the doubling still matters: 'staro'+'staro' sorts
    # AFTER 'staroqui'+'staroqui', while plain w order would not.
    key = pd.Series(word_per_grp, dtype=object) * 2
    perm = np.lexsort((key.to_numpy(), doc_per_grp))
    word_per_grp = word_per_grp[perm]
    doc_sorted = doc_per_grp[perm]
    cnt_per_grp = cnt_per_grp[perm]
    # gather each group's page slice in permuted order (vectorized repeat
    # trick — no per-group Python loop)
    lens = (grp_ends - grp_starts)[perm]
    out_offs = np.concatenate(([0], np.cumsum(lens)))
    idx = (
        np.repeat(grp_starts[perm], lens)
        + np.arange(int(lens.sum())) - np.repeat(out_offs[:-1], lens)
    ) if m else np.zeros(0, dtype=np.int64)

    rows_per_doc = np.bincount(doc_sorted, minlength=n_docs)
    offsets = pa.array(np.concatenate(([0], np.cumsum(rows_per_doc))),
                       type=pa.int32())
    struct = pa.StructArray.from_arrays(
        [
            pa.array(word_per_grp, type=pa.string()),
            pa.array(cnt_per_grp, type=pa.int64()),
            pa.ListArray.from_arrays(
                pa.array(out_offs, type=pa.int32()),
                pa.array(cp[idx], type=pa.int32()),
            ),
        ],
        names=["word", "cnt", "pages"],
    )
    return pa.ListArray.from_arrays(offsets, struct)


def extract_documents(
    df: DataFrame,
    order_by: str = "offset",
    conf_min: int | None = None,
    with_word_index: bool = True,
) -> DataFrame:
    """Run the full extraction kernel.  Input: doc_id, spans, meta.

    ``order_by='offset'`` trusts the input offsets; ``'meta'`` reconstructs
    reading order from the sidecar layout keys (O1-O5).  ``conf_min`` enables
    the word-confidence filter (P6; reference display thresholds are 75/85,
    the server default is no filtering).
    """

    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in it:
            yield _extract_batch(b, order_by, conf_min, with_word_index)

    # Manual column pruning through the Python boundary: the kernel never
    # reads meta.box, and Catalyst cannot prune struct fields through
    # mapInArrow — dropping box here removes 4 doubles/span (~40% of the
    # JVM→Arrow conversion volume, the job's hottest path).
    meta_fields = [f.name for f in df.schema["meta"].dataType.elementType.fields]
    if "box" in meta_fields:
        keep = [f for f in meta_fields if f != "box"]
        slim = F.expr(
            "transform(meta, m -> struct("
            + ", ".join(f"m.{f} as {f}" for f in keep)
            + "))"
        ).alias("meta")
        df = df.select(
            *[c for c in df.columns if c != "meta"], slim
        )
    return df.mapInArrow(fn, OUT_DDL)


def extract_spans_expr(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Contract-only extraction (no meta sidecar) as pure Catalyst
    expressions — whole-stage-codegen'd, zero Python.  Semantics: order by
    input offset, drop boilerplate and empty text spans, ocr_image → text,
    dense re-rank.  Used when the input carries trusted offsets."""
    ordered = F.array_sort(
        F.expr(
            f"filter({spans_col}, s -> s.kind != 'boilerplate' AND "
            "(s.kind = 'media_ref' OR (s.text IS NOT NULL AND "
            "length(trim(s.text)) > 0)))"
        ),
        lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    rebuilt = F.transform(
        ordered,
        lambda s, i: F.struct(
            F.when(s["kind"] == "media_ref", s["kind"])
            .otherwise(F.lit("text"))
            .alias("kind"),
            F.when(s["kind"] == "media_ref", F.lit(None).cast("string"))
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return df.withColumn("spans", rebuilt)
