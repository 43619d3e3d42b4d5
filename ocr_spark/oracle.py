"""Pure-Python/pandas reference oracle for the extraction pipeline.

Driver-side, per-document reimplementation of the reference semantics
(SURVEY.md §5 item 1).  Spark output must match this span-for-span — the
span-sequence-equality invariant ``(kind, text, media_ref, order)`` from
BASELINE.json.  Each function cites the reference behavior it mirrors
(paths relative to /root/reference/):

* span classification + boilerplate drop — server/celery_app.py:1048-1092
* empty-word filter                      — server/src/utils/parse_hocr.py:67-69
* reading order                          — server/celery_app.py:156-161 (auto
  segment sort), parse_hocr.py:47-102 (para/line/word document order)
* text assembly                          — server/src/utils/file.py:586-596
  (words ' ', lines '\\n', paragraphs '\\n\\n', strip) and
  server/src/utils/export.py:182-185 (page delimiter + trailing '\\n\\n')
* word index + dehyphenation             — server/src/utils/export.py:492-530
  (find_index_words), cross-page merge export.py:204-221
* word count                             — server/src/utils/file.py:536-549

Honesty notes on reference corners (documented deviations):
* find_index_words decrements the *raw* previous word's key
  (export.py:510-513) while counting under normalized keys; fixtures only
  place hyphens on plain lowercase words, where raw == normalized, so the
  decrement is exactly "remove the orphaned prefix" — which is what we
  implement.
* the hyphen flag surviving into a new paragraph hits
  ``section[line_index - 1]`` with ``line_index == 0`` (export.py:505), an
  undefined-behavior corner; fixtures never produce it (datagen constraint)
  and this oracle defines merges only on the well-defined path.
* export_csv enumerates pages in os.listdir order (export.py:199-204, the
  sort is commented out at export.py:205); we define page order = numeric
  page order (the obvious intent, and what export_txt does at
  export.py:174-175).
"""

from __future__ import annotations

from collections import OrderedDict

PUNCT_CHARS = "«»“”.,;:!?()[]{}\"'"
_PUNCT_TABLE = str.maketrans("", "", PUNCT_CHARS)

TEXTISH = ("text", "ocr_image")


def _sort_key_meta(span_meta):
    m = span_meta[1]
    return (
        m["page_no"],
        m["segment_pos"],
        m["para_pos"],
        m["line_pos"],
        m["word_pos"],
        span_meta[0]["offset"],
    )


def ordered_spans(doc: dict, order_by: str = "offset") -> list[tuple[dict, dict]]:
    """Return (span, meta) pairs in reading order."""
    pairs = list(zip(doc["spans"], doc["meta"]))
    if order_by == "offset":
        pairs.sort(key=lambda p: p[0]["offset"])
    else:
        pairs.sort(key=_sort_key_meta)
    return pairs


def extract_expected(
    doc: dict, order_by: str = "offset", conf_min: int | None = None
) -> list[dict]:
    """Expected output span sequence: boilerplate dropped
    (celery_app.py:1086-1092), empty text spans dropped (parse_hocr.py:67-69),
    ocr_image handled via the text path (celery_app.py:1137-1159), offset
    re-ranked densely."""
    out = []
    for span, meta in ordered_spans(doc, order_by):
        kind = span["kind"]
        if kind == "boilerplate":
            continue
        if kind in TEXTISH:
            if span["text"] is None or span["text"].strip() == "":
                continue
            if conf_min is not None and meta["confidence"] < conf_min:
                continue
            out.append(
                {"kind": "text", "text": span["text"], "media_ref": None,
                 "offset": len(out)}
            )
        else:  # media_ref
            out.append(
                {"kind": "media_ref", "text": None,
                 "media_ref": span["media_ref"], "offset": len(out)}
            )
    return out


def _pages_structure(doc: dict, order_by: str = "offset",
                     conf_min: int | None = None):
    """page_no -> list of paragraphs; paragraph = list of lines; line = list
    of word texts.  Paragraph identity = (segment_pos, para_pos) within page
    (segments OCR'd in order append their paragraphs to the page json,
    celery_app.py:1094-1136)."""
    n_pages = 0
    pages: dict[int, OrderedDict] = {}
    for span, meta in ordered_spans(doc, order_by):
        n_pages = max(n_pages, meta["page_no"])
        if span["kind"] not in TEXTISH:
            continue
        if span["text"] is None or span["text"].strip() == "":
            continue
        if conf_min is not None and meta["confidence"] < conf_min:
            continue
        paras = pages.setdefault(meta["page_no"], OrderedDict())
        lines = paras.setdefault((meta["segment_pos"], meta["para_pos"]),
                                 OrderedDict())
        lines.setdefault(meta["line_pos"], []).append(span["text"])
    return n_pages, pages


def doc_text_expected(doc: dict, delimiter: bool = False,
                      order_by: str = "offset") -> str:
    """Mirror export_txt (export.py:149-187): every page contributes
    json_to_text(page) + '\\n\\n' (file.py:586-596), optional
    '----- PAGE %04d -----\\n\\n' headers; trailing '\\n\\n' kept."""
    n_pages, pages = _pages_structure(doc, order_by)
    parts = []
    for p in range(1, n_pages + 1):
        if delimiter:
            parts.append(f"----- PAGE {p:04d} -----\n\n")
        paras = pages.get(p, OrderedDict())
        page_text = "\n\n".join(
            "\n".join(" ".join(words) for words in para_lines.values())
            for para_lines in paras.values()
        ).strip()
        parts.append(page_text + "\n\n")
    return "".join(parts)


def word_count_expected(doc: dict) -> int:
    """get_word_count (file.py:536-549): number of word dicts — i.e. kept
    text-path spans (a multi-word span is one word dict)."""
    return sum(
        1
        for span in doc["spans"]
        if span["kind"] in TEXTISH
        and span["text"] is not None
        and span["text"].strip() != ""
    )


def _find_index_words_page(paragraphs: list[list[list[str]]]) -> dict[str, int]:
    """find_index_words (export.py:492-530) over one page's
    paragraphs/lines/word-texts, on the fixtures' well-defined domain."""
    index: dict[str, int] = {}
    hyph = False
    prev_word = None
    for section in paragraphs:
        for line in section:
            line = list(line)
            if hyph:
                joined = prev_word.rstrip("-") + line[0]
                line[0] = joined
                hyph = False
                # export.py:510-513 — remove the orphaned prefix count
                if index.get(prev_word, 0) != 0:
                    index[prev_word] -= 1
                    if index[prev_word] == 0:
                        del index[prev_word]
            for i, rawtext in enumerate(line):
                if i == len(line) - 1 and rawtext.endswith("-"):
                    hyph = True
                    prev_word = rawtext
                for w in rawtext.split():
                    w = w.strip().translate(_PUNCT_TABLE).lower()
                    index[w] = index.get(w, 0) + 1
    return index


def word_index_expected(doc: dict, order_by: str = "offset") -> list[dict]:
    """Per-document word index: per-page find_index_words merged across pages
    (export.py:204-221), pages listed in page order, rows sorted by the
    reference's exact key ``lower(word) + word`` (export.py:217-220)."""
    n_pages, pages = _pages_structure(doc, order_by)
    merged: dict[str, dict] = {}
    for p in range(1, n_pages + 1):
        paras = pages.get(p, OrderedDict())
        page_struct = [list(lines.values()) for lines in paras.values()]
        idx = _find_index_words_page(page_struct)
        for w, c in idx.items():
            if w not in merged:
                merged[w] = {"cnt": c, "pages": [p]}
            else:
                merged[w]["cnt"] += c
                if merged[w]["pages"][-1] != p:
                    merged[w]["pages"].append(p)
    return [
        {"word": w, "cnt": v["cnt"], "pages": v["pages"]}
        for w, v in sorted(merged.items(), key=lambda kv: kv[0].lower() + kv[0])
    ]
