"""HTML main-content extraction — the "HTML boilerplate strip / DOM
heuristics" leg of the north rule's main-content pipeline, producing the
same interleaved span sequence ``(kind, text, media_ref, offset)`` as the
OCR extraction kernel, so web documents and scanned documents land in one
table shape.

This is a jusText/readability-style *heuristic* extractor (the classic
main-content recipe: drop chrome containers, segment into blocks at
block-level tags, score each block by text length and link density), NOT a
real DOM parser — deliberately, because the whole pipeline then stays a
single narrow Catalyst projection:

    strip comments/chrome → sentinel-ify <img> → split into blocks
    → transform(blocks, classify)   [staged struct, heavy exprs ONCE]
    → filter(keep) → posexplode     [dense per-doc offsets for free]

Scale shape: **zero shuffles**.  Classification happens inside the blocks
array *before* exploding, so ``posexplode`` hands back dense in-document
offsets without the ``row_number`` window (and its doc_id shuffle) that a
rows-first formulation would need.  Per the HOF staging rule
(BENCH/BASELINE.md §3): the expensive per-block expressions (tag strip,
entity decode, anchor-text length) are computed exactly once in a first
``transform`` into named struct fields; the second ``transform`` and the
``filter`` only touch cheap field references.

Every regex is restricted to the Java↔RE2-agreeing subset (see
functions/pii.py): inline ``(?is)`` flags, non-greedy ``.*?``, character
classes, ``\\b`` — no lookaround, no in-pattern backreferences — so the
driver query built on this operator has an exact DuckDB oracle twin
(``__spark_entry__._html_spans_sql`` builds it from THESE constants).

Documented limitations (shared by both engines, so parity always holds):
nested same-name chrome containers only drop to the first close tag;
``\\s`` differs on vertical-tab between Java and RE2 (absent from the
fixture); a literal ``@@MEDIA@@`` at the start of a block would be read as
a media sentinel.

Reference tie-in: the reference has no HTML surface (it OCRs scanned
PDFs); this is the north-rule/web-corpus analog of its remove-box
boilerplate drop (celery_app.py:1083-1092 → kind filtering) applied to
markup chrome instead of layout boxes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared Spark/DuckDB constants (the oracle twin imports these) -------

COMMENT_RE = r"(?s)<!--.*?-->"

# Containers dropped WITH their content (chrome / non-content).  `<head\b`
# cannot match `<header` (word boundary before the 'e').
DROP_CONTAINER_TAGS: tuple[str, ...] = (
    "script",
    "style",
    "head",
    "title",
    "nav",
    "header",
    "footer",
    "aside",
)

# <img src="..."> / <img src='...'> → sentinel block; bare <img> dropped.
IMG_DQ_RE = r'(?is)<img\b[^>]*\bsrc\s*=\s*"([^"]*)"[^>]*>'
IMG_SQ_RE = r"(?is)<img\b[^>]*\bsrc\s*=\s*'([^']*)'[^>]*>"
IMG_BARE_RE = r"(?is)<img\b[^>]*>"
MEDIA_SENTINEL = "@@MEDIA@@"

# Block-level boundaries: tag name must be followed by whitespace+attrs,
# `/`, or `>` so e.g. `p` never prefix-matches `<picture>`.  Longer names
# are listed before their prefixes (pre before p, thead before th...).
_BLOCK_TAGS = (
    "figcaption|figure|fieldset|blockquote|caption|section|article|thead|"
    "tbody|tfoot|table|main|form|pre|p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|"
    "th|hr|br|body|html"
)
BLOCK_SPLIT_RE = rf"(?is)</?(?:{_BLOCK_TAGS})(?:\s[^>]*)?\s*/?>"

TAG_RE = r"(?s)<[^>]*>"
ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>(.*?)</a\s*>"
WS_RE = r"\s+"

# Entity decode order is load-bearing: lt/gt/quot/#39 BEFORE amp, so
# double-encoded '&amp;lt;' decodes to the literal '&lt;', not to '<'.
ENTITY_RULES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


# --- outlink extraction constants (html_links; twin in __spark_entry__) --

# One full anchor ELEMENT per match (open tag through first close tag) —
# `\b` keeps <abbr>/<article>/<aside>/<address> from matching.  Anchors
# with no close tag don't match and emit no link (documented limitation,
# shared by both engines).
A_TAG_RE = r"(?is)<a\b[^>]*>.*?</a\s*>"
# The OPEN tag alone — href/rel are attribute facts and must never be read
# from the anchor BODY (which may quote literal 'href=' text).
A_OPEN_RE = r"(?is)^<a\b[^>]*>"
HREF_DQ_RE = r'(?is)\bhref\s*=\s*"([^"]*)"'
HREF_SQ_RE = r"(?is)\bhref\s*=\s*'([^']*)'"
# Quoted rel value containing the nofollow token; unquoted rel=nofollow is
# not recognized (documented limitation, shared by both engines).
NOFOLLOW_RE = "(?is)\\brel\\s*=\\s*[\"'][^\"']*nofollow"
ABS_URL_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


# --- metadata extraction constants (html_meta; twin in __spark_entry__) --

# <title> content (tags inside are stripped by normalization).
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title"
# <meta name="description" content="..."> — both content quote styles and
# the reversed (content-before-name) attribute order.  `[^>]*` keeps every
# match inside ONE tag.
META_DESC_DQ_RE = (
    r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']description[\"']"
    r"[^>]*\bcontent\s*=\s*\"([^\"]*)\""
)
META_DESC_SQ_RE = (
    r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']description[\"']"
    r"[^>]*\bcontent\s*=\s*'([^']*)'"
)
META_DESC_REV_RE = (
    r"(?is)<meta\b[^>]*\bcontent\s*=\s*\"([^\"]*)\""
    r"[^>]*\bname\s*=\s*[\"']description[\"']"
)
# <link rel="canonical" href="..."> — plus the reversed attribute order.
CANON_DQ_RE = (
    r"(?is)<link\b[^>]*\brel\s*=\s*[\"']canonical[\"']"
    r"[^>]*\bhref\s*=\s*[\"']([^\"']*)[\"']"
)
CANON_REV_RE = (
    r"(?is)<link\b[^>]*\bhref\s*=\s*[\"']([^\"']*)[\"']"
    r"[^>]*\brel\s*=\s*[\"']canonical[\"']"
)
# <html lang="..">
HTML_LANG_RE = r"(?is)<html\b[^>]*\blang\s*=\s*[\"']([A-Za-z-]*)[\"']"
# <meta property="og:image" content="...">
OG_IMAGE_RE = (
    r"(?is)<meta\b[^>]*\bproperty\s*=\s*[\"']og:image[\"']"
    r"[^>]*\bcontent\s*=\s*[\"']([^\"']*)[\"']"
)


# --- table extraction constants (html_tables; twin in __spark_entry__) ----

# One table ELEMENT per match.  `\b` keeps `<table` from matching nothing
# longer (no standard tag extends it) but guards attribute forms; the
# non-greedy body means a NESTED table closes the outer match at the inner
# `</table>` (documented limitation, shared by both engines — HTML tables
# used for layout nesting predate CSS and are boilerplate anyway).
TABLE_RE = r"(?is)<table\b[^>]*>.*?</table\s*>"
# `<tr\b` cannot match `<track`; rows without an explicit `</tr>` close
# tag emit nothing (shared limitation).
TR_RE = r"(?is)<tr\b[^>]*>.*?</tr\s*>"
# One cell per match, td and th alike; `\b` keeps `<th` from matching
# `<thead` (no boundary between 'h' and 'e') and `</th\s*>` from matching
# `</thead>`.
CELL_RE = r"(?is)<t[dh]\b[^>]*>.*?</t[dh]\s*>"
# Header flag = the cell element opens with <th.
TH_OPEN_RE = r"(?is)^<th\b"

# --- outline extraction constants (html_outline; twin in __spark_entry__)

# One heading element per match: group 1 the level digit, group 2 the
# body.  The close tag is any `</hN>` — a mismatched close level ends the
# heading early (documented limitation, shared by both engines).  No
# backreference, so the pattern stays in the Java↔RE2-agreeing subset.
HEADING_RE = r"(?is)<h([1-6])(?:\s[^>]*)?>(.*?)</h[1-6]\s*>"


def container_re(tag: str) -> str:
    """Content-dropping pattern for one chrome container tag."""
    return rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>"


def _strip_chrome(c: Column) -> Column:
    c = F.regexp_replace(c, COMMENT_RE, " ")
    for tag in DROP_CONTAINER_TAGS:
        c = F.regexp_replace(c, container_re(tag), " ")
    c = F.regexp_replace(c, IMG_DQ_RE, f"<br>{MEDIA_SENTINEL}$1<br>")
    c = F.regexp_replace(c, IMG_SQ_RE, f"<br>{MEDIA_SENTINEL}$1<br>")
    return F.regexp_replace(c, IMG_BARE_RE, " ")


def _normalize(c: Column) -> Column:
    """Tag strip → entity decode → whitespace collapse → trim."""
    c = F.regexp_replace(c, TAG_RE, " ")
    for ent, rep in ENTITY_RULES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, WS_RE, " "))


def html_spans(
    df: DataFrame,
    html_col: str = "html",
    min_text_len: int = 25,
    max_link_pct: int = 40,
) -> DataFrame:
    """``(doc_id, html)`` → interleaved main-content spans
    ``(doc_id, offset int, kind, text, media_ref)``.

    Text blocks are kept iff their normalized text is at least
    ``min_text_len`` chars AND anchor-text chars make up at most
    ``max_link_pct`` percent of it (integer cross-multiplication — no
    float division, so the threshold is bit-identical across engines).
    ``<img src=…>`` becomes an unconditionally-kept ``media_ref`` span at
    its document position.  Offsets are dense per doc over kept spans.
    """
    blocks = F.split(_strip_chrome(F.col(html_col)), BLOCK_SPLIT_RE)

    # Stage 1: heavy per-block expressions, each computed exactly once.
    def _pre(b: Column) -> Column:
        return F.struct(
            F.trim(b).alias("bt"),
            _normalize(b).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(ANCHOR_RE), F.lit(1)),
                F.lit(0),
                lambda acc, x: acc + F.length(_normalize(x)),
            ).alias("link_len"),
        )

    # Stage 2: cheap field-reference classification.
    def _span(s: Column) -> Column:
        is_media = s["bt"].startswith(MEDIA_SENTINEL)
        media_ref = F.trim(F.substring(s["bt"], len(MEDIA_SENTINEL) + 1, 1 << 20))
        text_len = F.length(s["txt"])
        keep_text = (text_len >= F.lit(min_text_len)) & (
            s["link_len"] * 100 <= text_len * F.lit(max_link_pct)
        )
        return F.struct(
            F.when(is_media, F.lit("media_ref")).otherwise("text").alias("kind"),
            F.when(is_media, F.lit("")).otherwise(s["txt"]).alias("text"),
            F.when(is_media, media_ref).otherwise(F.lit("")).alias("media_ref"),
            F.when(is_media, media_ref != F.lit("")).otherwise(keep_text).alias(
                "keep"
            ),
        )

    spans = F.filter(
        F.transform(F.transform(blocks, _pre), _span), lambda s: s["keep"]
    )
    out = df.select(F.col("doc_id"), F.posexplode(spans).alias("offset", "s"))
    return out.select(
        "doc_id",
        "offset",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def html_meta(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """``(doc_id, url, html)`` → page metadata: the head-of-document
    fields every web pipeline extracts alongside main content — the page
    ``<title>``, the ``<meta name=description>`` summary, the declared
    document language, the ``rel=canonical`` URL (the publisher's own
    dedup key — consumed by :func:`ocr_spark.operators.web
    .canonical_dedup`), and the ``og:image`` social-card reference (a
    media-pipeline seed).

    Output: ``doc_id, url, lang, title, description, og_image,
    canonical`` — all strings, ``''`` where absent.  ``canonical`` is the
    href resolved to an absolute URL with the same three-branch rule as
    ``html_links`` (absolute / protocol-relative / root-relative;
    anything else → ``''``); production would pass it through
    ``url_normalize`` before keying on it — one more narrow projection.

    Title and description are normalized like block text (tag strip →
    entity decode → whitespace collapse), so ``<title>A &amp; <b>B</b>``
    reads back as ``A & B``.  Comments are stripped FIRST: commented-out
    metadata must not be read.

    Scale shape: a single narrow projection, zero shuffle; each regex is
    anchored inside one tag (``[^>]*`` never crosses ``>``), and all stay
    in the Java↔RE2-agreeing subset so the driver query has an exact
    DuckDB twin built from THESE constants.
    """
    from ocr_spark.functions.url import url_host, url_scheme

    h = F.regexp_replace(F.col(html_col), COMMENT_RE, " ")
    desc = F.coalesce(
        F.nullif(F.regexp_extract(h, META_DESC_DQ_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(h, META_DESC_SQ_RE, 1), F.lit("")),
        F.regexp_extract(h, META_DESC_REV_RE, 1),
    )
    canon = F.coalesce(
        F.nullif(F.regexp_extract(h, CANON_DQ_RE, 1), F.lit("")),
        F.regexp_extract(h, CANON_REV_RE, 1),
    )
    scheme = F.lower(url_scheme(F.col(url_col)))
    host = F.lower(url_host(F.col(url_col)))
    resolved = (
        F.when(canon.rlike(ABS_URL_RE), canon)
        .when(canon.startswith("//"), F.concat(scheme, F.lit(":"), canon))
        .when(canon.startswith("/"), F.concat(scheme, F.lit("://"), host, canon))
        .otherwise(F.lit(""))
    )
    return df.select(
        "doc_id",
        F.col(url_col).alias("url"),
        F.regexp_extract(h, HTML_LANG_RE, 1).alias("lang"),
        _normalize(F.regexp_extract(h, TITLE_RE, 1)).alias("title"),
        _normalize(desc).alias("description"),
        F.regexp_extract(h, OG_IMAGE_RE, 1).alias("og_image"),
        resolved.alias("canonical"),
    )


def html_links(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """``(doc_id, url, html)`` → one row per anchor element: the outlink
    table a crawl frontier / link graph is built from (the edge source for
    :func:`ocr_spark.operators.graph.pagerank` and anchor-text signals).

    Output: ``doc_id, url, link_pos int, href, anchor, nofollow boolean,
    dst_url`` — ``link_pos`` is the anchor's document position, ``anchor``
    the normalized (tag-stripped, entity-decoded, whitespace-collapsed)
    anchor text, ``dst_url`` the resolved absolute target:

    * absolute ``scheme://…`` hrefs pass through;
    * protocol-relative ``//host/…`` inherit the page scheme;
    * root-relative ``/path`` resolve against the page scheme+host;
    * everything else (relative paths, ``mailto:``, fragments, empty)
      → NULL — those never produce cross-site edges, which is what the
      link graph consumes.  Directory-relative resolution needs the full
      RFC-3986 merge algorithm; deliberately out of scope in BOTH engines
      so parity always holds.

    href reads the double-quoted form first, then single-quoted, from the
    OPEN tag only (the body may quote literal ``href=`` text).  Comments
    are stripped first so commented-out markup emits no links.  Chrome is
    deliberately NOT stripped: nav/footer links are real edges — the link
    graph wants the whole page, unlike main-content extraction.

    Scale shape: one narrow ``posexplode`` stage, zero shuffle; fan-out is
    bounded by anchors-per-page.  All regexes are in the Java↔RE2-agreeing
    subset, so the driver query has an exact DuckDB twin
    (``__spark_entry__`` builds it from THESE constants).

    Plan discipline (BENCH/BASELINE.md §3 re-inlining trap, third
    instance): every heavy per-tag regex is staged ONCE into named struct
    fields inside the tags array (the html_spans pattern), so downstream
    consumers — the href CASE, the dst resolution, link_edges'
    registered-domain trees, pushed-down filters — duplicate only cheap
    field references.  The first (flat) formulation inlined the open-tag
    extract ~100× through href→dst→registered_domain and pushed the fused
    Generate-consume method past the JVM 64 KB limit: silent whole-stage
    interpreted fallback (caught by the strict-codegen gate in
    tests/test_plan_shapes.py).
    """
    from ocr_spark.functions.url import url_host, url_scheme

    tags = F.regexp_extract_all(
        F.regexp_replace(F.col(html_col), COMMENT_RE, " "),
        F.lit(A_TAG_RE),
        F.lit(0),
    )

    def _lex(t: Column) -> Column:
        return F.struct(
            F.regexp_extract(t, A_OPEN_RE, 0).alias("ot"),
            F.regexp_extract(t, ANCHOR_RE, 1).alias("body"),
        )

    def _attrs(s: Column) -> Column:
        return F.struct(
            F.regexp_extract(s["ot"], HREF_DQ_RE, 1).alias("dq"),
            F.regexp_extract(s["ot"], HREF_SQ_RE, 1).alias("sq"),
            s["ot"].rlike(NOFOLLOW_RE).alias("nofollow"),
            _normalize(s["body"]).alias("anchor"),
        )

    def _link(s: Column) -> Column:
        return F.struct(
            F.when(s["dq"] != "", s["dq"]).otherwise(s["sq"]).alias("href"),
            s["anchor"].alias("anchor"),
            s["nofollow"].alias("nofollow"),
        )

    staged = F.transform(F.transform(F.transform(tags, _lex), _attrs), _link)
    out = df.select(
        "doc_id",
        F.col(url_col).alias("_u"),
        F.posexplode(staged).alias("link_pos", "s"),
    )
    href = F.col("s.href")
    scheme = F.lower(url_scheme(F.col("_u")))
    host = F.lower(url_host(F.col("_u")))
    dst = (
        F.when(href.rlike(ABS_URL_RE), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host, href),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return out.select(
        "doc_id",
        F.col("_u").alias("url"),
        "link_pos",
        href.alias("href"),
        F.col("s.anchor").alias("anchor"),
        F.col("s.nofollow").alias("nofollow"),
        dst.alias("dst_url"),
    )


def html_tables(df: DataFrame, html_col: str = "html") -> DataFrame:
    """``(doc_id, html)`` → one row per table CELL: the structured-data
    leg of main-content extraction.  jusText-style block scoring (and so
    :func:`html_spans`) treats table markup as boundary noise — correct
    for layout tables, lossy for data tables, whose row/column structure
    is exactly what a training pipeline wants to keep (table-to-text,
    fact extraction, markdown rendering).  This operator recovers it.

    Output: ``doc_id, table_idx int, row_idx int, col_idx int,
    is_header boolean, cell string`` — ``table_idx`` the table's document
    position, ``row_idx`` the ``<tr>`` position within the table (rows
    inside ``<thead>``/``<tbody>``/``<tfoot>`` are found by the same
    scan, so section wrappers don't perturb numbering), ``col_idx`` the
    cell position within the row, ``is_header`` whether the cell element
    is ``<th>``, ``cell`` the normalized (tag-stripped, entity-decoded,
    whitespace-collapsed) text.

    Documented limitations (shared by both engines, so parity always
    holds): ``colspan``/``rowspan`` are ignored — ``col_idx`` counts cell
    ELEMENTS, not the visual grid; a nested table closes its parent at
    the inner ``</table>``; cells/rows missing explicit close tags emit
    nothing.  Comments are stripped first so commented-out tables are
    never extracted.

    Scale shape: **zero shuffles** — three ``posexplode`` stages
    (tables → rows → cells) in one narrow scan partition; fan-out is
    bounded by cells-per-page.  Per the HOF staging rule
    (BENCH/BASELINE.md §3), the per-cell normalize + header test are
    staged ONCE into struct fields inside the cells array before the
    final explode.  All regexes are in the Java↔RE2-agreeing subset, so
    the driver query has an exact DuckDB twin (``__spark_entry__`` builds
    it from THESE constants).

    Reference tie-in: the reference exports per-page word grids to CSV
    (server/src/utils/export.py) but has no HTML surface; this is the
    web-corpus analog of keeping layout structure that plain text
    assembly flattens.
    """
    tables = F.regexp_extract_all(
        F.regexp_replace(F.col(html_col), COMMENT_RE, " "),
        F.lit(TABLE_RE),
        F.lit(0),
    )
    t = df.select(
        "doc_id", F.posexplode(tables).alias("table_idx", "_tbl")
    )
    r = t.select(
        "doc_id",
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tbl"), F.lit(TR_RE), F.lit(0))
        ).alias("row_idx", "_row"),
    )
    cells = F.transform(
        F.regexp_extract_all(F.col("_row"), F.lit(CELL_RE), F.lit(0)),
        lambda c: F.struct(
            c.rlike(TH_OPEN_RE).alias("is_header"),
            _normalize(c).alias("cell"),
        ),
    )
    out = r.select(
        "doc_id",
        "table_idx",
        "row_idx",
        F.posexplode(cells).alias("col_idx", "_c"),
    )
    return out.select(
        "doc_id",
        "table_idx",
        "row_idx",
        "col_idx",
        F.col("_c.is_header").alias("is_header"),
        F.col("_c.cell").alias("cell"),
    )


def html_outline(df: DataFrame, html_col: str = "html") -> DataFrame:
    """``(doc_id, html)`` → one row per heading with its SECTION PATH —
    the heading-hierarchy operator behind header-aware RAG chunking
    (LangChain's HTMLHeaderTextSplitter role): a chunk tagged
    ``"Guide > Setup > On Linux"`` retrieves better than naked text, and
    the outline is the document-structure signal table-of-contents
    features feed on.

    Output: ``doc_id, pos int, level int, title string, path string`` —
    ``pos`` the heading's document position, ``level`` 1-6, ``title``
    the normalized heading text, ``path`` the ``" > "``-joined chain of
    CURRENT ancestors plus the heading itself.

    Ancestor semantics (the part naive last-per-level gets wrong): a
    shallower heading CLOSES every deeper section, so a remembered
    level-k heading is a valid ancestor only if it appeared AFTER every
    shallower heading — i.e. its position exceeds the running maximum of
    all shallower last-positions.  A stale ``<h2>`` from the previous
    ``<h1>`` section never leaks into paths under the new ``<h1>``;
    missing intermediate levels are skipped (an ``<h3>`` directly under
    an ``<h1>`` gets the two-element path).

    Chrome is stripped first (same ``_strip_chrome`` chain as
    :func:`html_spans`): nav/header/footer headings are site furniture,
    not document structure; comments never contribute.

    Scale shape: one narrow heading-harvest projection (two
    ``regexp_extract_all`` passes over the SAME pattern — Spark extracts
    one group per call — zipped positionally), then ONE shuffle: the
    per-doc window that materializes the last-title/last-pos columns per
    level; the include chain and running maxima are staged named columns
    over those window attributes (BENCH/BASELINE.md §3 staging rule).
    All regexes Java↔RE2-agreeing, so the driver query has an exact
    DuckDB twin built from THESE constants.
    """
    from pyspark.sql import Window

    cleaned = _strip_chrome(F.col(html_col))
    st = df.select(
        "doc_id",
        F.regexp_extract_all(cleaned, F.lit(HEADING_RE), F.lit(1)).alias(
            "_lv"
        ),
        F.regexp_extract_all(cleaned, F.lit(HEADING_RE), F.lit(2)).alias(
            "_bd"
        ),
    )
    ex = st.select(
        "doc_id", "_bd", F.posexplode("_lv").alias("pos", "_l")
    )
    cur = ex.select(
        "doc_id",
        "pos",
        F.col("_l").cast("int").alias("level"),
        _normalize(F.get("_bd", "pos")).alias("title"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for k in range(1, 6):
        cur = cur.withColumn(
            f"_t{k}",
            F.last(
                F.when(F.col("level") == k, F.col("title")), True
            ).over(w),
        ).withColumn(
            f"_p{k}",
            F.last(F.when(F.col("level") == k, F.col("pos")), True).over(w),
        )
    # Running max of shallower last-positions (staged, never re-nested).
    cur = cur.withColumn("_m1", F.coalesce(F.col("_p1"), F.lit(-1)))
    for k in range(2, 5):
        cur = cur.withColumn(
            f"_m{k}",
            F.greatest(
                F.col(f"_m{k-1}"), F.coalesce(F.col(f"_p{k}"), F.lit(-1))
            ),
        )
    parts = [
        F.when(
            (F.col("level") > 1)
            & F.col("_p1").isNotNull()
            & (F.col("_p1") > F.lit(-1)),
            F.col("_t1"),
        )
    ]
    for k in range(2, 6):
        parts.append(
            F.when(
                (F.col("level") > k)
                & F.col(f"_p{k}").isNotNull()
                & (F.col(f"_p{k}") > F.col(f"_m{k-1}")),
                F.col(f"_t{k}"),
            )
        )
    return cur.select(
        "doc_id",
        "pos",
        "level",
        "title",
        F.concat_ws(" > ", *parts, F.col("title")).alias("path"),
    )


# --- markdown conversion rules (html_markdown; twin in __spark_entry__) --

# Ordered (pattern, replacement) pairs applied BEFORE the generic tag
# strip.  Replacements use Java's `$N` group refs; the DuckDB twin
# rewrites them to RE2's `\N`.  Order is load-bearing: links/images
# first (their bodies keep inline markup for later rules), then headings
# (before the block rule eats <h*> as a plain tag), then inline
# emphasis, then list/table markers, then block separators.
MD_RULES: tuple[tuple[str, str], ...] = (
    # links (double- then single-quoted href); no-href anchors fall
    # through to the tag strip as plain text
    (r'(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>', "[$2]($1)"),
    (r"(?is)<a\b[^>]*\bhref\s*=\s*'([^']*)'[^>]*>(.*?)</a\s*>", "[$2]($1)"),
    # images → markdown image refs (reuses the img src patterns)
    (IMG_DQ_RE, "![]($1)"),
    (IMG_SQ_RE, "![]($1)"),
    # headings: one rule per level (a regex replacement cannot compute
    # '#'*level); mismatched close levels end the heading early, the
    # html_outline limitation shared verbatim
    *(
        (
            rf"(?is)<h{k}(?:\s[^>]*)?>(.*?)</h[1-6]\s*>",
            "\n\n" + "#" * k + " $1\n\n",
        )
        for k in range(1, 7)
    ),
    # inline emphasis (open and close both map to the marker)
    (r"(?is)</?(?:b|strong)\b[^>]*>", "**"),
    (r"(?is)</?(?:i|em)\b[^>]*>", "*"),
    # list items and table rows/cells
    (r"(?is)<li\b[^>]*>", "\n- "),
    (r"(?is)<tr\b[^>]*>", "\n| "),
    (r"(?is)</t[dh]\s*>", " | "),
    # block-level separators, then line breaks
    (r"(?is)</?(?:p|div|ul|ol|table|thead|tbody|tfoot|blockquote|pre|"
     r"section|article|main|figure)\b[^>]*>", "\n\n"),
    (r"(?is)<br\b[^>]*/?>", "\n"),
)

# Whitespace discipline AFTER tag strip + entity decode: spaces/tabs
# collapse within lines, line edges trim, blank-line runs collapse to
# one blank line.
MD_WS_RULES: tuple[tuple[str, str], ...] = (
    (r"[ \t]+", " "),
    (r"[ \t]*\n[ \t]*", "\n"),
    (r"\n{3,}", "\n\n"),
    # edge trim incl. newlines (SQL trim() strips spaces only)
    (r"(?s)^\s+", ""),
    (r"(?s)\s+$", ""),
)


def html_markdown(df: DataFrame, html_col: str = "html") -> DataFrame:
    """``(doc_id, html)`` → ``doc_id, markdown`` — HTML rendered to the
    markdown-ish plain text modern LLM corpora actually train on (the
    FineWeb/Jina-reader presentation: headings as ``#`` runs, lists as
    ``- `` items, tables as ``|`` rows, links as ``[text](url)``,
    emphasis as ``*``/``**``), preserving document STRUCTURE that the
    span extractor's flat text assembly deliberately drops.

    Pipeline (one linear regexp_replace chain — zero shuffles, every
    constant shared with the DuckDB twin): comment + chrome strip (the
    same ``DROP_CONTAINER_TAGS`` chain as :func:`html_spans`) →
    ``MD_RULES`` in order → generic tag strip → entity decode (ordered
    ``ENTITY_RULES``) → ``MD_WS_RULES`` whitespace discipline → trim.

    Documented limitations (shared by both engines): no nested-list
    indentation (every ``<li>`` renders at one level); table rows get no
    header-separator line; unclosed ``<b>``/``<i>`` leave a dangling
    marker; a literal ``[``/``]`` in anchor text is not escaped.
    """
    c = F.regexp_replace(F.col(html_col), COMMENT_RE, " ")
    for tag in DROP_CONTAINER_TAGS:
        c = F.regexp_replace(c, container_re(tag), " ")
    for pat, repl in MD_RULES:
        c = F.regexp_replace(c, pat, repl)
    c = F.regexp_replace(c, TAG_RE, " ")
    for ent, repl in ENTITY_RULES:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    for pat, repl in MD_WS_RULES:
        c = F.regexp_replace(c, pat, repl)
    return df.select("doc_id", c.alias("markdown"))
