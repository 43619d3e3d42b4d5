"""Export sinks: txt, delimited txt, word-index CSV, ALTO XML — the §2.9
export operators (E1, E2, E4) as DataFrame writers / column builders.

Reference semantics (citations into /root/reference/):

* E1 export_txt: page texts concatenated, each + '\\n\\n'; delimited variant
  with ``----- PAGE %04d -----`` headers     — server/src/utils/export.py:149-187
  (assembly itself lives in operators/extract.py, F1 file.py:586-596)
* E2 export_csv: header ``Palavra, Ocorrências, Páginas``, one BLANK second
  row, pages rendered ``"1, 3"``             — server/src/utils/export.py:193-232
  (csv.writer quotes the pages field because it contains ', ')
* E4 export_alto: ALTO v3 XML, one per page: Page/PrintSpace/TextBlock/
  TextLine/String with integer HPOS/VPOS/WIDTH/HEIGHT and CONTENT
                                             — server/src/utils/export.py:943-984

All builders are pure Catalyst expressions or vectorized string assembly —
narrow, shuffle-free, safe at any scale; the actual ``df.write`` fan-out is
the caller's choice of layout (one file per doc via partitionBy, or rolled
parquet/text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def txt_lines(extracted: DataFrame, delimited: bool = False) -> DataFrame:
    """(doc_id, value) rows ready for ``write.partitionBy('doc_id').text``
    — E1.  ``doc_text`` / ``doc_text_delim`` come from the extraction
    kernel."""
    col = "doc_text_delim" if delimited else "doc_text"
    return extracted.select("doc_id", F.col(col).alias("value"))


def word_index_csv_lines(extracted: DataFrame) -> DataFrame:
    """E2: one CSV line per index row, plus the reference's exact header and
    blank second row (export.py:207-208 writes header then an empty row).
    Pages string: ``"p1, p2"`` double-quoted (export.py:216-221)."""
    rows = extracted.select(
        "doc_id", F.posexplode("word_index").alias("ix", "w")
    ).select(
        "doc_id",
        (F.col("ix") + 2).alias("line_no"),
        F.concat(
            F.col("w.word"), F.lit(", "), F.col("w.cnt").cast("string"),
            F.lit(', "'),
            F.array_join(F.transform("w.pages", lambda p: p.cast("string")), ", "),
            F.lit('"'),
        ).alias("value"),
    )
    header = extracted.select(
        "doc_id", F.lit(0).alias("line_no"),
        F.lit("Palavra, Ocorrências, Páginas").alias("value"),
    )
    blank = extracted.select(
        "doc_id", F.lit(1).alias("line_no"), F.lit("").alias("value")
    )
    return header.unionByName(blank).unionByName(rows)


def _xml_escape(c: Column) -> Column:
    """Minimal XML text escaping (&, <, >, \")."""
    out = F.regexp_replace(c, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


def alto_pages(page_ir: DataFrame, page_w: int = 2480, page_h: int = 3508) -> DataFrame:
    """E4: page IR (doc_id, page_no, paragraphs nested array — sources/hocr
    shape) → one ALTO v3 XML string per page, built entirely with
    higher-order array expressions (no Python).

    Mirrors export.py:957-981: TextBlock per paragraph, TextLine per line,
    String per word with integer HPOS(x1) VPOS(y1) WIDTH(x2-x1)
    HEIGHT(y2-y1).
    """
    word_xml = (
        "transform(line, w -> concat("
        "'<String CONTENT=\"', "
        "replace(replace(replace(replace(w.text, '&', '&amp;'), '<', '&lt;'),"
        " '>', '&gt;'), '\"', '&quot;'), "
        "'\" HPOS=\"', cast(cast(w.box[0] as int) as string), "
        "'\" VPOS=\"', cast(cast(w.box[1] as int) as string), "
        "'\" WIDTH=\"', cast(cast(w.box[2] - w.box[0] as int) as string), "
        "'\" HEIGHT=\"', cast(cast(w.box[3] - w.box[1] as int) as string), "
        "'\"/>'))"
    )
    line_xml = (
        f"transform(block, line -> concat('<TextLine>', "
        f"array_join({word_xml}, ''), '</TextLine>'))"
    )
    block_xml = (
        f"transform(paragraphs, block -> concat('<TextBlock>', "
        f"array_join({line_xml}, ''), '</TextBlock>'))"
    )
    alto = F.expr(
        "concat('<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<alto xmlns=\"http://www.loc.gov/standards/alto/ns-v3#\">"
        "<Layout><Page ID=\"page_', cast(page_no as string), "
        f"'\" PHYSICAL_IMG_NR=\"', cast(page_no as string), "
        f"'\" WIDTH=\"{page_w}\" HEIGHT=\"{page_h}\">"
        f"<PrintSpace WIDTH=\"{page_w}\" HEIGHT=\"{page_h}\">', "
        f"array_join({block_xml}, ''), "
        "'</PrintSpace></Page></Layout></alto>')"
    )
    return page_ir.select("doc_id", "page_no", alto.alias("alto_xml"))
