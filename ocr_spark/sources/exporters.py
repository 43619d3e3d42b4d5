"""Export sinks: txt, delimited txt, word-index CSV, ALTO XML, METS — the
§2.9 export operators (E1, E2, E4, E5) as DataFrame writers / column
builders.

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
* E5 create_document_mets: per-document METS with MD5-checksummed file
  entries (``IMG``/``ALTO`` page groups + one fileGrp per single export
  file), a physical structMap pairing each page's image + ALTO, and a
  single-file structMap                      — server/src/utils/export.py:731-936
  (file-entry shape ``generate_file`` export.py:623-630)

All builders are pure Catalyst expressions or vectorized string assembly —
narrow, shuffle-free, safe at any scale (METS aggregates per document:
one hash-agg shuffle of slim fragment strings); the actual ``df.write``
fan-out is the caller's choice of layout (one file per doc via
partitionBy, or rolled parquet/text).
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


_METS_AMDSEC = "".join(
    # constant techMD block, export.py:838-912 (six format designations)
    '<techMD ID="techMD%d"><mdWrap><xmlData><mix>'
    "<BasicDigitalObjectInformation><FormatDesignation>"
    "<formatName>%s</formatName>"
    "</FormatDesignation></BasicDigitalObjectInformation>"
    "</mix></xmlData></mdWrap></techMD>" % (i + 1, fmt)
    for i, fmt in enumerate(
        ["image/png", "application/pdf", "text/plain",
         "text/csv", "text/xml", "application/json"]
    )
)


def mets_file_entry(
    grp: Column, seq: Column, md5: Column, size: Column,
    mimetype: Column, href: Column,
) -> Column:
    """One METS <file> element (generate_file, export.py:623-630):
    MD5 checksum, GROUPID = page seq, ID = {GRP}{seq:05d}, FLocat href."""
    sq = seq.cast("string")
    return F.concat(
        F.lit('<file CHECKSUMTYPE="MD5" CHECKSUM="'), md5,
        F.lit('" GROUPID="'), sq,
        F.lit('" ID="'), grp, F.lpad(sq, 5, "0"),
        F.lit('" MIMETYPE="'), mimetype,
        F.lit('" SEQ="'), sq,
        F.lit('" SIZE="'), size.cast("string"),
        F.lit('"><FLocat LOCTYPE="OTHER" OTHERLOCTYPE="FILE" xlink:href="'),
        href, F.lit('"/></file>'),
    )


def mets_documents(artifacts: DataFrame) -> DataFrame:
    """E5 — per-document METS manifest (create_document_mets,
    export.py:731-936) from an artifact-manifest DataFrame:

      ``doc_id, creation timestamp, grp string ('IMG' page image | 'ALTO'
      page ALTO | single-file extension tag e.g. 'TXT'), seq int (1-based
      page number; occurrence index for singles), href string, size
      bigint, md5 string (use F.md5 over the artifact content column),
      mimetype string``

    Emitted per doc_id: ``mets_xml`` with the reference's structure —
    metsHdr CREATEDATE (ISO), MODS title (doc_id minus extension), the
    constant six-entry techMD block, fileSec with PNGGRP + ALTOGRP + one
    fileGrp per single file, physical structMap pairing IMG+ALTO fptrs
    per page, and the single-file structMap.  Whitespace/indentation is
    normalized (the reference hand-indents with tabs); element and
    attribute vocabulary, ID scheme and checksum semantics are kept.

    Preserved reference quirk: page-image file entries carry ID prefix
    ``IMG`` (generate_file call export.py:779-786) while the physical
    structMap's fptrs reference ``PNG{seq:05d}`` (export.py:770-773) —
    the reference's own fptrs dangle, and this writer reproduces that
    exactly.  Documented deviations: whitespace normalized; single-file
    entries carry their occurrence index as SEQ/GROUPID (the reference
    pins SEQ=1/GROUPID=0 for singles).

    Plan shape: per-artifact fragments are built row-wise (codegen), then
    ONE hash aggregation on doc_id collects slim fragment strings —
    content bytes never shuffle (md5/size are computed upstream where the
    content lives).
    """
    frag = mets_file_entry(
        F.col("grp"), F.col("seq"), F.col("md5"), F.col("size"),
        F.col("mimetype"), F.col("href"),
    )
    rows = artifacts.select(
        "doc_id", "creation", "grp", "seq",
        frag.alias("frag"),
    )
    agg = rows.groupBy("doc_id").agg(
        F.max("creation").alias("creation"),
        F.array_sort(
            F.collect_list(F.struct("grp", "seq", "frag"))
        ).alias("entries"),
    )
    img = "filter(entries, e -> e.grp = 'IMG')"
    alto = "filter(entries, e -> e.grp = 'ALTO')"
    singles = "filter(entries, e -> e.grp != 'IMG' and e.grp != 'ALTO')"
    page_divs = (
        f"array_join(transform({img}, e -> concat("
        "'<div TYPE=\"Page\" ORDER=\"', cast(e.seq as string), '\">"
        "<fptr FILEID=\"PNG', lpad(cast(e.seq as string), 5, '0'), '\"/>"
        "<fptr FILEID=\"ALTO', lpad(cast(e.seq as string), 5, '0'), '\"/>"
        "</div>')), '')"
    )
    single_grps = (
        f"array_join(transform({singles}, e -> concat("
        "'<fileGrp ID=\"', e.grp, 'GRP', cast(e.seq as string), "
        "'\" USE=\"Text\">', e.frag, '</fileGrp>')), '')"
    )
    single_divs = (
        f"array_join(transform({singles}, (e, i) -> concat("
        "'<div ID=\"DIV', cast(i + 1 as string), '\" TYPE=\"CompleteObject\">"
        "<fptr FILEID=\"', e.grp, lpad(cast(e.seq as string), 5, '0'), "
        "'\"/></div>')), '')"
    )
    xml = F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<mets xsi:schemaLocation='
            '"http://www.loc.gov/standards/mets/version18/mets.xsd">'
            '<metsHdr CREATEDATE="'
        ),
        F.date_format("creation", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(
            '"><agent ROLE="CREATOR" TYPE="ORGANIZATION">'
            "<name>INESC-ID LISBOA</name></agent></metsHdr>"
            '<dmdSec ID="DM1"><mdWrap MDTYPE="MODS"><xmlData><mods>'
            "<titleInfo><title>"
        ),
        _xml_escape(F.regexp_replace("doc_id", r"\.[^.]*$", "")),
        F.lit(
            "</title></titleInfo></mods></xmlData></mdWrap></dmdSec>"
            f"<amdSec>{_METS_AMDSEC}</amdSec>"
            '<fileSec><fileGrp ID="PNGGRP" USE="Images">'
        ),
        F.expr(f"array_join(transform({img}, e -> e.frag), '')"),
        F.lit('</fileGrp><fileGrp ID="ALTOGRP" USE="Text">'),
        F.expr(f"array_join(transform({alto}, e -> e.frag), '')"),
        F.lit("</fileGrp>"),
        F.expr(single_grps),
        F.lit(
            "</fileSec>"
            '<structMap ID="SM1" LABEL="Physical Structure" TYPE="PHYSICAL">'
            '<div TYPE="Document">'
        ),
        F.expr(page_divs),
        F.lit(
            "</div></structMap>"
            '<structMap ID="SM2" LABEL="Logical Structure" TYPE="LOGICAL">'
            "</structMap>"
            '<structMap ID="SM3" LABEL="Single File Structure"'
            ' TYPE="SINGLE_FILE">'
        ),
        F.expr(single_divs),
        F.lit("</structMap></mets>"),
    )
    return agg.select("doc_id", xml.alias("mets_xml"))


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


def hocr_pages(
    page_ir: DataFrame,
    page_w: int = 2480,
    page_h: int = 3508,
    media: DataFrame | None = None,
) -> DataFrame:
    """hOCR page writer — the export round-trip's last leg: page IR
    (doc_id, page_no, paragraphs — sources/hocr shape) → one
    Tesseract-shaped hOCR document per page, built entirely with
    higher-order array expressions (no Python), the exact inverse of
    ``sources/hocr.parse_hocr_pages`` the way ``alto_pages`` inverts
    ``sources/alto.alto_words``.

    Reference parity: the reference stores Tesseract's raw hOCR and
    serves it per document (/root/reference/server/app.py:488-494
    ``/get_hocr`` → ``_export/_hocr.hocr``; engines request it via
    ``tessedit_create_hocr=1``, src/engines/ocr_pytesseract.py:26).  The
    structure written here is exactly what parse_hocr.py:38-104 walks:
    ocr_par → ocr_line (title ``bbox …; baseline a b``) → ocrx_word
    (title ``bbox …; x_wconf …[; x_font …]``).

    Round-trip contract (``parse(write(ir)) == ir`` on the parser's
    output domain, golden-gated in tests/test_hocr_writer.py):

    * text: XML-escaped here, entity-unescaped by the parser (lxml
      ``text_content()`` parity) — exact;
    * box: hOCR bboxes are integers (parse_hocr.py regex ``\\d+``), and
      parser-produced IR boxes are therefore integral doubles — exact;
    * confidence / font: carried verbatim in the word title — exact;
    * b: the IR drops the line box + baseline that produced it, so the
      writer re-fits a per-line baseline — slope from the (first, last)
      word pair, intercept anchored at the first word against the
      word-box hull — emitted as fixed decimal(20,6) (identical
      rendering in Spark and DuckDB; never float-formatted, which the
      two engines disagree on).  Exact whenever the line's b values are
      collinear dyadic rationals (always true for integer-box flat or
      half-integer-slope baselines, the golden domain); within
      ~1e-6·width otherwise.

    Empty lines / empty paragraphs are dropped before writing — the
    parser drops them on read (parse_hocr.py:99-102), so the writer is
    idempotent with the parse domain.

    ``media`` (optional): interleaved documents' image regions as
    ``doc_id, page_no, par_idx int, seq int, media_ref string, box
    array<double>`` rows — emitted as the hOCR spec's ``ocr_photo``
    divs (``<div class="ocr_photo" id="photo_{page}_{k}" title="bbox …;
    x_source {ref}"></div>``), placed BEFORE paragraph ``par_idx``
    (0-based; ≥ n_pars ⇒ after the last).  ``x_source`` carries the
    media_ref so ``parse_hocr_media`` (sources/hocr.py) round-trips
    interleaved documents: write → parse recovers (par_idx, seq order,
    ref, box) exactly.  The reference's Tesseract hOCR uses the same
    class family for photo regions; its media crops
    (celery_app.py:1062-1081) are what these divs reference.

    Narrow zero-shuffle projection without media; with media, one
    (doc_id, page_no) aggregation joins the slim photo rows on — the
    binary media itself never enters this writer.  Per-line
    hull/baseline subexpressions re-evaluate per reference but only
    over one line's words (bounded), never over data-scale arrays.
    """
    esc = (
        "replace(replace(replace(replace({x}, '&', '&amp;'), '<', '&lt;'),"
        " '>', '&gt;'), '\"', '&quot;')"
    )

    def i4(v: str) -> str:
        return f"cast(cast({v} as bigint) as string)"

    page_s = "cast(page_no as string)"
    hx1 = "array_min(transform(line, w2 -> w2.box[0]))"
    hy1 = "array_min(transform(line, w2 -> w2.box[1]))"
    hx2 = "array_max(transform(line, w2 -> w2.box[2]))"
    hy2 = "array_max(transform(line, w2 -> w2.box[3]))"
    xmf = "((line[0].box[0] + line[0].box[2]) / 2)"
    xml_ = "((element_at(line, -1).box[0] + element_at(line, -1).box[2]) / 2)"
    araw = (
        f"case when {xml_} <> {xmf} then "
        f"(element_at(line, -1).b - line[0].b) / ({xml_} - {xmf}) "
        f"else cast(0.0 as double) end"
    )
    a_dec = f"cast({araw} as decimal(20,6))"
    c_dec = (
        f"cast(line[0].b - ({xmf} - {hx1}) * cast({a_dec} as double) "
        f"- {hy2} as decimal(20,6))"
    )
    word_xml = (
        "concat('<span class=\"ocrx_word\" id=\"word_', "
        f"{page_s}, '_', cast(bi + 1 as string), '_', "
        "cast(li + 1 as string), '_', cast(wi + 1 as string), "
        f"'\" title=\"bbox ', {i4('w.box[0]')}, ' ', {i4('w.box[1]')}, "
        f"' ', {i4('w.box[2]')}, ' ', {i4('w.box[3]')}, "
        "'; x_wconf ', cast(w.confidence as string), "
        "coalesce(concat('; x_font ', w.font), ''), "
        f"'\">', {esc.format(x='w.text')}, '</span>')"
    )
    line_xml = (
        "concat('<span class=\"ocr_line\" id=\"line_', "
        f"{page_s}, '_', cast(bi + 1 as string), '_', "
        "cast(li + 1 as string), "
        f"'\" title=\"bbox ', {i4(hx1)}, ' ', {i4(hy1)}, ' ', {i4(hx2)}, "
        f"' ', {i4(hy2)}, '; baseline ', cast({a_dec} as string), ' ', "
        f"cast({c_dec} as string), '\">', "
        f"array_join(transform(line, (w, wi) -> {word_xml}), ''), "
        "'</span>')"
    )
    filtered = (
        "filter(transform(paragraphs, "
        "block0 -> filter(block0, line0 -> size(line0) > 0)), "
        "block1 -> size(block1) > 0)"
    )
    par_arr = (
        f"transform({filtered}, (block, bi) -> concat("
        f"'<p class=\"ocr_par\" id=\"par_', {page_s}, '_', "
        "cast(bi + 1 as string), '\" lang=\"por\">', "
        f"array_join(transform(block, (line, li) -> {line_xml}), ''), "
        "'</p>'))"
    )
    header = (
        "'<?xml version=\"1.0\" encoding=\"UTF-8\"?>"
        "<html><body><div class=\"ocr_page\" id=\"page_', "
        f"{page_s}, '\" title=\"bbox 0 0 {int(page_w)} {int(page_h)}\">'"
    )
    if media is None:
        hocr = F.expr(
            f"concat({header}, array_join({par_arr}, ''), "
            "'</div></body></html>')"
        )
        return page_ir.select("doc_id", "page_no", hocr.alias("hocr_xml"))

    photo_xml = (
        "concat('<div class=\"ocr_photo\" id=\"photo_', "
        f"{page_s}, '_', cast(mi + 1 as string), "
        f"'\" title=\"bbox ', {i4('m.box[0]')}, ' ', {i4('m.box[1]')}, "
        f"' ', {i4('m.box[2]')}, ' ', {i4('m.box[3]')}, "
        f"'; x_source ', {esc.format(x='m.media_ref')}, '\"></div>')"
    )
    magg = media.groupBy("doc_id", "page_no").agg(
        F.sort_array(
            F.collect_list(F.struct("par_idx", "seq", "media_ref", "box"))
        ).alias("_media")
    )
    empty_media = (
        "cast(array() as array<struct<par_idx:int,seq:int,"
        "media_ref:string,box:array<double>>>)"
    )
    df = (
        page_ir.join(magg, ["doc_id", "page_no"], "left")
        # stage both arrays as named columns: the interleave below
        # references them repeatedly inside HOF lambdas, and Catalyst
        # re-inlines unnamed subexpressions once per reference
        .withColumn("_media", F.coalesce(F.col("_media"), F.expr(empty_media)))
        .withColumn("_pars", F.expr(par_arr))
        .withColumn(
            "_mx",
            F.expr(
                "transform(_media, (m, mi) -> named_struct("
                f"'par_idx', m.par_idx, 'xml', {photo_xml}))"
            ),
        )
    )
    body = (
        "concat(array_join(transform(_pars, (p, pi) -> concat("
        "array_join(transform(filter(_mx, mm -> mm.par_idx = pi), "
        "mm -> mm.xml), ''), p)), ''), "
        "array_join(transform(filter(_mx, mm -> mm.par_idx >= "
        "size(_pars)), mm -> mm.xml), ''))"
    )
    hocr = F.expr(f"concat({header}, {body}, '</div></body></html>')")
    return df.select("doc_id", "page_no", hocr.alias("hocr_xml"))


def _json_escape(c: Column) -> Column:
    """The five JSON string escapes the training-JSONL surface needs,
    applied in the only safe order (backslash first).  Exactly mirrored
    by the DuckDB twin (built from chr() codes on both sides, so neither
    engine's string-literal backslash rules can skew the constants).
    Control characters outside ``\\n \\r \\t`` are assumed already
    stripped by the fix_text/extraction path (documented contract)."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def _json_str(c: Column) -> Column:
    return F.when(c.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('"'), _json_escape(c), F.lit('"'))
    )


def jsonl_records(docs: DataFrame) -> DataFrame:
    """JSONL training export — the format every LLM data loader consumes:
    one compact JSON object per document,
    ``{"doc_id":N,"text":"…","lang":"…","source":"…"}`` (the
    ``json.dumps(separators=(',',':'), ensure_ascii=False)`` shape; null
    fields render as JSON ``null``).  Assembled with deterministic
    string concatenation — NOT the engine's ``to_json`` — so the bytes
    are bit-identical across engines/versions and the export is
    hash-gated like export_csv; non-ASCII passes through as raw UTF-8.

    Pure Catalyst, zero shuffle, narrow scan→project — the file fan-out
    (``.write.text`` with whatever partitioning) is the caller's choice.
    Beyond-reference scope (the reference exports txt/csv/ALTO/METS for
    humans; this is the machine-consumer sink of the training pipeline).

    Output: ``doc_id, value`` (the JSON line), matching txt_lines' shape.
    """
    value = F.concat(
        F.lit('{"doc_id":'),
        F.when(
            F.col("doc_id").isNull(), F.lit("null")
        ).otherwise(F.col("doc_id").cast("string")),
        F.lit(',"text":'),
        _json_str(F.col("text")),
        F.lit(',"lang":'),
        _json_str(F.col("lang")),
        F.lit(',"source":'),
        _json_str(F.col("source")),
        F.lit("}"),
    )
    return docs.select("doc_id", value.alias("value"))


def zip_bundles(artifacts: DataFrame) -> DataFrame:
    """E6 export_zip (reference export.py:132-146, 987-998: zip the
    document's images / whole result tree incl. METS) as a per-document
    bundle sink: ``(doc_id, entry_name, payload binary)`` rows → ONE
    real ZIP archive per document (``doc_id, n_entries, n_bytes, zip``).

    Determinism contract (what makes the sink testable and re-runnable):
    entries are sorted by name, stored uncompressed (ZIP_STORED — the
    payloads are parquet/XML/PDF text that downstream tools re-compress
    anyway), and stamped with the fixed DOS epoch (1980-01-01), so the
    archive BYTES are a pure function of the content — byte-identical
    across partitionings and re-runs (md5-gated in tests).  CRC32s are
    real, so any unzip tool validates the bundle.

    Kernel shape: stdlib ``zipfile`` over an in-memory buffer inside one
    applyInPandas group per document — binary rides the doc_id shuffle
    once (the sink's job, same as chunk_assembly); nothing is collected
    to the driver."""
    import io as _io
    import zipfile as _zf

    import pandas as pd

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        doc = pdf["doc_id"].iloc[0]
        buf = _io.BytesIO()
        rows = sorted(
            zip(pdf["entry_name"], pdf["payload"]), key=lambda r: r[0]
        )
        with _zf.ZipFile(buf, "w", _zf.ZIP_STORED) as z:
            for name, payload in rows:
                info = _zf.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                z.writestr(info, bytes(payload))
        blob = buf.getvalue()
        return pd.DataFrame(
            {
                "doc_id": [doc],
                "n_entries": [len(rows)],
                "n_bytes": [len(blob)],
                "zip": [blob],
            }
        )

    return artifacts.groupBy("doc_id").applyInPandas(
        build, "doc_id string, n_entries int, n_bytes long, zip binary"
    )
