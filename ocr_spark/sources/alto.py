"""ALTO XML reader — the ingest twin of the ALTO exporter (S6's second
input dialect): national-library OCR corpora ship ALTO v2/v3 alongside or
instead of hOCR, so an engine that can *write* ALTO (sources/exporters.py
``alto_pages``, reference export.py:957-981) must also *read* it, or
round-tripped corpora dead-end at their own export format.

This is a regex-ladder parser in the html_tables mold, NOT an XML DOM —
deliberately: the ladder stays a single narrow Catalyst projection
(three ``posexplode`` stages: TextBlock → TextLine → String), attributes
are read from the String OPEN tag only, and every pattern is in the
Java↔RE2-agreeing subset so the driver query has an exact DuckDB twin
built from THESE constants.  Word geometry comes back as the
``(x1, y1, x2, y2)`` box (``x2 = HPOS+WIDTH``, ``y2 = VPOS+HEIGHT``),
inverting the exporter's WIDTH/HEIGHT encoding exactly; CONTENT is
XML-unescaped in the reverse order of the exporter's escape chain
(``&amp;`` LAST, so double-escaped entities survive one level).

Documented limitations (shared by both engines): nested TextBlock (not
legal ALTO) closes at the inner end tag; a String element missing any of
the four geometry attributes yields NULL coordinates for that word
(kept, not dropped — the confidence/empty filters downstream own word
hygiene, mirroring the hOCR parser's P2/P6 separation).

Scale shape: **zero shuffles** — the whole parse is scan-side; per-word
unescape and attribute casts are staged ONCE into struct fields inside
the strings array before the final explode (BENCH/BASELINE.md §3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared Spark/DuckDB constants (the oracle twin imports these) -------

TEXTBLOCK_RE = r"(?is)<textblock\b[^>]*>.*?</textblock\s*>"
TEXTLINE_RE = r"(?is)<textline\b[^>]*>.*?</textline\s*>"
# The String OPEN tag only — covers both the self-closing exporter form
# and open/close pairs (attributes never live in the body).
STRING_RE = r"(?is)<string\b[^>]*>"
CONTENT_RE = r'(?is)\bcontent\s*=\s*"([^"]*)"'
HPOS_RE = r'(?is)\bhpos\s*=\s*"([^"]*)"'
VPOS_RE = r'(?is)\bvpos\s*=\s*"([^"]*)"'
WIDTH_RE = r'(?is)\bwidth\s*=\s*"([^"]*)"'
HEIGHT_RE = r'(?is)\bheight\s*=\s*"([^"]*)"'

# Unescape order: the exact reverse of the exporter's escape chain
# (exporters.py alto_pages escapes & FIRST, so &amp; decodes LAST here).
UNESCAPE_RULES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&amp;", "&"),
)


def _unescape(c: Column) -> Column:
    for ent, rep in UNESCAPE_RULES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _attr_int(tag: Column, pattern: str) -> Column:
    """Attribute value as int; missing attribute → NULL (regexp_extract
    returns '' on no match, and ''::int is NULL via try_cast)."""
    return F.regexp_extract(tag, pattern, 1).try_cast("int")


def alto_words(df: DataFrame, xml_col: str = "alto_xml") -> DataFrame:
    """``(doc_id, page_no, alto_xml)`` → one row per word:
    ``doc_id, page_no, block_idx int, line_idx int, word_idx int,
    text string, x1, y1, x2, y2 int`` — the flat word table the word
    index / extraction kernel consume, positions inverted from the
    exporter's HPOS/VPOS/WIDTH/HEIGHT encoding.
    """
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(TEXTBLOCK_RE), F.lit(0)
    )
    b = df.select(
        "doc_id",
        "page_no",
        F.posexplode(blocks).alias("block_idx", "_blk"),
    )
    l = b.select(
        "doc_id",
        "page_no",
        "block_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_blk"), F.lit(TEXTLINE_RE), F.lit(0))
        ).alias("line_idx", "_ln"),
    )
    words = F.transform(
        F.regexp_extract_all(F.col("_ln"), F.lit(STRING_RE), F.lit(0)),
        lambda t: F.struct(
            _unescape(F.regexp_extract(t, CONTENT_RE, 1)).alias("text"),
            _attr_int(t, HPOS_RE).alias("x1"),
            _attr_int(t, VPOS_RE).alias("y1"),
            _attr_int(t, WIDTH_RE).alias("w"),
            _attr_int(t, HEIGHT_RE).alias("h"),
        ),
    )
    out = l.select(
        "doc_id",
        "page_no",
        "block_idx",
        "line_idx",
        F.posexplode(words).alias("word_idx", "_w"),
    )
    return out.select(
        "doc_id",
        "page_no",
        "block_idx",
        "line_idx",
        "word_idx",
        F.col("_w.text").alias("text"),
        F.col("_w.x1").alias("x1"),
        F.col("_w.y1").alias("y1"),
        (F.col("_w.x1") + F.col("_w.w")).alias("x2"),
        (F.col("_w.y1") + F.col("_w.h")).alias("y2"),
    )
