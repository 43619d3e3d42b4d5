"""Web-corpus curation over the URL key — URL-level dedup and per-domain
rollups, the two curation moves every crawl pipeline runs before touching
document *content* (RefinedWeb §3.1's url dedup + per-domain filters, C4's
domain blocklisting; PAPERS.md).

Both operators are pure Catalyst compositions over
:mod:`ocr_spark.functions.url` — no Python in the hot path, and the only
shuffles are the final aggregations:

* ``url_dedup`` — groupBy on the *normalized* URL.  Keys are near-unique
  (that is the point of a URL), so the shuffle is uniform; the aggregate
  is min/count with map-side partial aggregation, never a list-agg, so a
  pathological hot URL costs one combiner cell per map task, not a fat
  row.
* ``domain_stats`` — groupBy on the registered domain.  Domain count is
  bounded (millions, not billions) and the aggregates are all
  partial-aggregating counts/sums; the two distinct-counts rewrite into
  a two-level aggregate whose first level keys on (domain, host/url) —
  exactly the uniform expansion that defuses a mega-domain's skew (same
  argument as the salted index agg, SURVEY §4.1, but here the secondary
  key is natural instead of synthetic).

At 100 TB the input projection is three thin columns (url, lang,
n_chars) — parquet column pruning keeps document text/media bytes out of
both shuffles entirely.

Reference tie-in: the reference has no web surface; this is
beyond-reference training-pipeline scope (SURVEY.md §2 LLM-data table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.url import (
    registered_domain,
    url_host,
    url_normalize,
    url_path,
)

# --- robots.txt constants (the __spark_entry__ twin interpolates THESE, so
# the grammar can never drift between engines) ----------------------------

# Everything from '#' to end of line is a comment (REP spec).  Applied
# per-line after the newline split, so no multiline flag is needed.
ROBOTS_COMMENT_RE = "#.*"
# One directive line: name, optional space/tab padding, ':', value.  Both
# Java and RE2 read `[ \t]` and the capture groups identically.
ROBOTS_DIRECTIVE_RE = r"^([A-Za-z-]+)[ \t]*:[ \t]*(.*)$"

# --- sitemaps.org constants (sitemap_urls; twin in __spark_entry__) ------

SITEMAP_URL_BLOCK_RE = r"(?is)<url>.*?</url>"
SITEMAP_LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
SITEMAP_LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
SITEMAP_CHANGEFREQ_RE = r"(?is)<changefreq>\s*(.*?)\s*</changefreq>"
SITEMAP_PRIORITY_RE = r"(?is)<priority>\s*(.*?)\s*</priority>"
# sitemaps.org default priority when the tag is absent
SITEMAP_DEFAULT_PRIORITY_PCT = 50


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Exact URL-level dedup groups: one row per normalized URL with the
    kept representative (min doc_id — deterministic, engine-order-free)
    and the number of discarded fetches.

    Output: ``norm_url, keep_doc_id, n_dupes``.
    """
    return (
        docs.select(
            url_normalize(F.col(url_col)).alias("norm_url"), "doc_id"
        )
        .groupBy("norm_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            (F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("n_dupes"),
        )
    )


def domain_blocklist_filter(
    docs: DataFrame,
    url_col: str = "url",
    min_lang_frac: float = 0.3,
) -> DataFrame:
    """Apply the per-domain prior: drop every document whose registered
    domain falls below the language-share threshold (the C4/RefinedWeb
    move — curation decisions at DOMAIN granularity, then applied to
    documents).  Derives the blocklist from ``domain_stats`` on the same
    input; production would read a persisted stats snapshot instead —
    same plan shape either way.

    The blocklist is the small side by construction (a subset of
    domains, itself bounded), so it broadcasts for a shuffle-free
    left-anti join; at extreme domain cardinality drop the explicit
    broadcast hint and let AQE choose.

    Output: ``domain, doc_id, lang`` for every KEPT document.
    """
    blocked = (
        domain_stats(docs, url_col)
        .where(F.col("en_frac") < min_lang_frac)
        .select("domain")
    )
    staged = docs.select(
        registered_domain(url_host(F.col(url_col))).alias("domain"),
        "doc_id",
        "lang",
    )
    return staged.join(F.broadcast(blocked), "domain", "left_anti")


def link_edges(
    docs: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """``(doc_id, url, html)`` → the registered-domain link graph:
    ``src_domain, dst_domain, n_links`` — the edge table
    :func:`ocr_spark.operators.graph.pagerank` consumes, built from REAL
    extracted anchors (operators/html.py ``html_links``) instead of a
    synthesized graph.

    Semantics: nofollow links are excluded (the hyperlink-graph
    convention they exist for), unresolvable hrefs (relative paths,
    mailto, fragments) produce no edge, and same-domain edges are dropped
    (intra-site navigation is noise for a cross-site quality prior).
    ``n_links`` counts anchor OCCURRENCES, so a domain citing another
    many times weighs more — the weight a degree-normalizing consumer
    like PageRank expects to see before its own normalization.

    Scale shape: the link fan-out stays a narrow posexplode stage; the
    only shuffle is the final (src, dst) count agg — map-side partial
    aggregation collapses repeated site-to-site pairs before the
    exchange, so the shuffled volume is O(distinct domain pairs), not
    O(anchors).
    """
    from ocr_spark.operators.html import html_links

    links = html_links(docs, html_col=html_col, url_col=url_col)
    staged = links.where(
        (~F.col("nofollow")) & F.col("dst_url").isNotNull()
    ).select(
        registered_domain(url_host(F.col("url"))).alias("src_domain"),
        registered_domain(url_host(F.col("dst_url"))).alias("dst_domain"),
    )
    return (
        staged.where(F.col("src_domain") != F.col("dst_domain"))
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def anchor_terms(
    docs: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """``(doc_id, url, html)`` → the incoming anchor-text index: per
    destination registered domain, the normalized terms other sites use
    when linking to it — the classic off-page description signal (search
    ranking, site classification, spam priors all consume it: a domain is
    what OTHERS call it, not what it calls itself).

    Semantics match ``link_edges``: nofollow links, unresolvable hrefs,
    and same-domain anchors (navigation "home"/"read more" noise) are
    excluded.  Terms come from the same ``norm_tokens`` normalization as
    the word index, so anchor vocabulary joins against corpus vocabulary.

    Output: ``dst_domain, term, n_mentions bigint, n_src_domains bigint``
    — mentions counted with multiplicity, ``n_src_domains`` the exact
    distinct citing-domain count (citation DIVERSITY — one domain saying
    "best widgets" 10 000 times is a spam signal, 10 000 domains saying
    it once is reputation).

    Scale shape: anchors are short (a few tokens), so the explode fan-out
    is bounded; the one shuffle keys on (dst_domain, term) with map-side
    partial aggregation, and the distinct count rewrites into a two-level
    aggregate on the natural (dst_domain, term, src_domain) key — the
    same uniform skew-defusing expansion as ``domain_stats``.
    """
    from ocr_spark.functions.text import norm_tokens
    from ocr_spark.operators.html import html_links

    links = html_links(docs, html_col=html_col, url_col=url_col)
    staged = links.where(
        (~F.col("nofollow")) & F.col("dst_url").isNotNull()
    ).select(
        registered_domain(url_host(F.col("url"))).alias("src_domain"),
        registered_domain(url_host(F.col("dst_url"))).alias("dst_domain"),
        "anchor",
    )
    ex = staged.where(F.col("src_domain") != F.col("dst_domain")).select(
        "src_domain",
        "dst_domain",
        F.explode(norm_tokens(F.col("anchor"))).alias("term"),
    )
    return ex.groupBy("dst_domain", "term").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("src_domain").alias("n_src_domains"),
    )


def frontier_plan(
    docs: DataFrame,
    url_col: str = "url",
    per_host: int = 2,
    buckets: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate URLs → a deterministic polite fetch schedule: the step
    between URL dedup and actual fetching in every crawler (Heritrix/
    Nutch frontier semantics — never hammer one host, keep global order
    reproducible).

    Each normalized-URL representative is assigned a ``slot`` (the fetch
    round it belongs to) such that **no (host, slot) cell ever holds more
    than ``per_host`` URLs** — the politeness budget.  Order within a
    host is the md5 of the normalized URL, so the schedule is a pure
    function of the URL set: engine-, partitioning- and run-invariant
    (the deterministic_sample philosophy applied to scheduling).

    Scale shape — the reason this isn't one ``row_number`` per host: a
    mega-host (tens of millions of URLs) would make a host-partitioned
    window one giant task.  Instead each URL hashes into one of
    ``buckets`` sub-buckets and the window partitions on **(host,
    bucket)** — the same bounded-window move as ``epoch_shuffle`` — with
    ``slot = (rank-1) // per_host * buckets + bucket``.  A slot maps back
    to exactly one bucket (``slot % buckets``), so the per-(host, slot)
    cap holds by construction while the mega-host's sort spreads over
    ``buckets`` tasks.  Raising ``buckets`` trades schedule compactness
    for parallelism; both are deterministic.

    Output: ``norm_url, host, doc_id, bucket int, slot bigint``.
    """
    from pyspark.sql.window import Window

    rep = (
        docs.select(
            url_normalize(F.col(url_col)).alias("norm_url"),
            F.lower(url_host(F.col(url_col))).alias("host"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("norm_url", "host")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("norm_url").cast("binary")), 1, 12), 16, 10)
        .cast("bigint")
        % buckets
    ).cast("int")
    staged = rep.select(
        "norm_url", "host", "doc_id", bucket.alias("bucket"),
        F.md5(F.col("norm_url").cast("binary")).alias("_ord"),
    )
    rank = F.row_number().over(
        Window.partitionBy("host", "bucket").orderBy("_ord", "norm_url")
    )
    return staged.select(
        "norm_url",
        "host",
        "doc_id",
        "bucket",
        (
            F.floor((rank - 1) / F.lit(per_host)).cast("bigint") * buckets
            + F.col("bucket")
        ).alias("slot"),
    )


def canonical_dedup(
    docs: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Canonical-URL consolidation: URL-level dedup that honors the
    publisher's own ``rel=canonical`` declaration — the crawl-pipeline
    refinement over :func:`url_dedup` (print pages, mobile mirrors, and
    tracking-URL variants all declare one canonical, so fetch-level URL
    noise collapses even when the fetched URLs differ structurally).

    Key = the page's resolved canonical URL when declared, else its own
    normalized URL (:func:`ocr_spark.functions.url.url_normalize`).
    Output: ``dedup_key, keep_doc_id, n_dupes bigint, n_canonical bigint``
    — ``n_canonical`` counts how many group members actively declared the
    canonical (0 = the group exists only through URL normalization).

    Scale shape: same as ``url_dedup`` — one near-unique-key groupBy with
    map-side partial aggregation; the metadata extraction feeding it is a
    narrow zero-shuffle projection (operators/html.py ``html_meta``).
    """
    from ocr_spark.operators.html import html_meta

    meta = html_meta(docs, html_col=html_col, url_col=url_col)
    staged = meta.select(
        "doc_id",
        F.when(
            F.col("canonical") != "", F.col("canonical")
        ).otherwise(url_normalize(F.col("url"))).alias("dedup_key"),
        (F.col("canonical") != "").cast("int").alias("is_canon"),
    )
    return staged.groupBy("dedup_key").agg(
        F.min("doc_id").alias("keep_doc_id"),
        (F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("n_dupes"),
        F.sum("is_canon").cast("bigint").alias("n_canonical"),
    )


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """``(host, robots_txt)`` → the generic-crawler rule table: one row per
    ``Allow``/``Disallow`` line governed by a ``User-agent: *`` group — the
    Robots Exclusion Protocol (RFC 9309) subset a corpus crawler evaluates
    before fetching anything (the step the frontier MUST respect; Common
    Crawl, Heritrix and Nutch all gate on exactly this table).

    Grammar (shared verbatim with the DuckDB twin via the module
    constants): lines split on ``\\n``; ``#`` starts a comment; directive
    names are case-insensitive; a *group* is one-or-more consecutive
    ``User-agent`` lines followed by its rules, and a ``User-agent`` line
    appearing after rule lines starts a NEW group (RFC 9309 §2.1).  Rules
    whose group does not name ``*`` are dropped (we crawl as the generic
    agent); empty-value rules (``Disallow:`` = allow everything) emit
    nothing.  Documented limitations, identical in both engines: no ``*``
    / ``$`` wildcard matching inside rule paths (prefix-only, the original
    1994 semantics) and no per-named-agent specificity override.

    Output: ``host, rule_ln bigint, allow boolean, prefix, prefix_len int``.

    Scale shape: robots files are small (the spec caps parsing at 500 KiB)
    and per-host, so the two windows partition on (host) / (host, group) —
    millions of tiny uniform partitions, the opposite of skew.  One
    shuffle total; everything else is narrow line projection.
    """
    from pyspark.sql.window import Window

    raw = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\n")).alias("ln", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), ROBOTS_COMMENT_RE, ""))
    lines = raw.select(
        "host",
        "ln",
        F.lower(F.regexp_extract(clean, ROBOTS_DIRECTIVE_RE, 1)).alias(
            "directive"
        ),
        F.trim(F.regexp_extract(clean, ROBOTS_DIRECTIVE_RE, 2)).alias("value"),
    ).where(F.col("directive").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("ln")
    is_ua = F.col("directive") == "user-agent"
    new_group = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = lines.select(
        "host",
        "ln",
        "directive",
        "value",
        F.sum(F.when(new_group, 1).otherwise(0)).over(w).alias("group_id"),
    )
    star = F.max(
        F.when(is_ua & (F.col("value") == "*"), 1).otherwise(0)
    ).over(Window.partitionBy("host", "group_id"))
    return (
        grouped.withColumn("star", star)
        .where(~is_ua & (F.col("star") == 1) & (F.col("value") != ""))
        .select(
            "host",
            F.col("ln").alias("rule_ln"),
            (F.col("directive") == "allow").alias("allow"),
            F.col("value").alias("prefix"),
            F.length("value").cast("int").alias("prefix_len"),
        )
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the robots rule table to candidate URLs: per URL, the RFC 9309
    decision — among rules whose prefix matches the URL path, the LONGEST
    prefix wins; at equal length ``Allow`` wins; no match (or no robots
    for the host) → allowed.

    Output: ``doc_id, host, path, allowed boolean, win_prefix, win_len
    int`` — the winning rule is kept so downstream can audit WHY a URL was
    excluded (win_prefix ``''`` / win_len 0 = no rule matched).

    Scale shape — why this is not a join-then-regroup: rules collapse to
    ONE array row per host first (bounded by file size, per spec), so the
    URL side joins a host-keyed dim and never re-shuffles — the verdict is
    a narrow array fold over ≤file-size rules.  The fold is provably
    order-independent: two same-length prefixes matching one path are the
    same string, so only ``allow`` can differ and the tie-break is fixed —
    hence ``collect_list``'s nondeterministic order cannot leak into the
    result.  At fixture scale AQE broadcasts the per-host dim; at real
    domain cardinality it falls back to a host-keyed shuffle join whose
    keys are near-uniform (hosts), never per-URL.
    """
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("prefix_len", "allow", "prefix")).alias("rls")
    )
    path0 = url_path(F.col(url_col))
    staged = urls.select(
        F.col(id_col).alias("doc_id"),
        F.lower(url_host(F.col(url_col))).alias("host"),
        F.when(path0 == "", "/").otherwise(path0).alias("path"),
    )
    j = staged.join(per_host, "host", "left")
    empty = F.array().cast(
        "array<struct<prefix_len:int,allow:boolean,prefix:string>>"
    )
    matches = F.filter(
        F.coalesce(F.col("rls"), empty),
        lambda r: F.col("path").startswith(r["prefix"]),
    )
    init = F.struct(
        F.lit(0).cast("int").alias("prefix_len"),
        F.lit(True).alias("allow"),
        F.lit("").alias("prefix"),
    )
    best = F.aggregate(
        matches,
        init,
        lambda acc, r: F.when(
            (r["prefix_len"] > acc["prefix_len"])
            | (
                (r["prefix_len"] == acc["prefix_len"])
                & r["allow"]
                & ~acc["allow"]
            ),
            r,
        ).otherwise(acc),
    )
    return j.select(
        "doc_id",
        "host",
        "path",
        best["allow"].alias("allowed"),
        best["prefix"].alias("win_prefix"),
        best["prefix_len"].alias("win_len"),
    )


def sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """``(host, sitemap_xml)`` → one row per ``<url>`` entry: the
    publisher-declared URL inventory (sitemaps.org protocol) — the OTHER
    half of the crawl-seeding contract next to robots.txt (robots says
    what not to fetch, the sitemap says what exists; both are per-host
    fetches a crawler makes before touching content).

    Output: ``host, entry_pos int, loc, lastmod, changefreq,
    priority_pct int`` — ``loc`` is entity-decoded and trimmed (the spec
    requires XML-escaped URLs); entries with no ``<loc>`` are dropped
    (invalid per spec); ``priority_pct`` is the 0-100 integer form of the
    optional ``<priority>`` (default 0.5 → 50), kept integer so the
    driver gate hashes exactly; ``lastmod`` stays the raw W3C-datetime
    string (its many legal forms are consumer-specific).  Documented
    limitation (shared by both engines): no ``<sitemapindex>`` recursion —
    index files list MORE sitemaps to fetch, which is an ingest-loop
    concern, not a parse concern.

    Scale shape: one ``regexp_extract_all`` + ``posexplode`` — a narrow
    zero-shuffle stage; sitemap files are bounded by spec (50k URLs /
    50 MB), so per-row fan-out is bounded.
    """
    from ocr_spark.operators.html import ENTITY_RULES

    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(SITEMAP_URL_BLOCK_RE), F.lit(0)
    )
    out = sitemaps.select(
        F.col(host_col).alias("host"),
        F.posexplode(blocks).alias("entry_pos", "b"),
    )
    loc = F.regexp_extract(F.col("b"), SITEMAP_LOC_RE, 1)
    for ent, rep in ENTITY_RULES:
        loc = F.replace(loc, F.lit(ent), F.lit(rep))
    pr = F.regexp_extract(F.col("b"), SITEMAP_PRIORITY_RE, 1)
    pr_pct = F.coalesce(
        F.round(pr.try_cast("double") * 100, 0).cast("int"),
        F.lit(SITEMAP_DEFAULT_PRIORITY_PCT),
    )
    return out.select(
        "host",
        "entry_pos",
        loc.alias("loc"),
        F.regexp_extract(F.col("b"), SITEMAP_LASTMOD_RE, 1).alias("lastmod"),
        F.regexp_extract(F.col("b"), SITEMAP_CHANGEFREQ_RE, 1).alias(
            "changefreq"
        ),
        pr_pct.alias("priority_pct"),
    ).where(F.col("loc") != "")


def sitemap_seeds(
    sitemaps: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Sitemap entries the corpus does NOT already have: the new-URL seed
    table a recrawl feeds into :func:`robots_filter` →
    :func:`frontier_plan`.  Both sides key on the normalized URL, so
    fetch-noise variants of known pages are correctly recognized as known.

    Output: ``norm_url, host, priority_pct`` (max priority when several
    entries normalize together).

    Scale shape: parse is narrow; the anti-join keys on near-unique
    normalized URLs (uniform), and the seed side aggregates first so the
    join carries one row per candidate URL.
    """
    parsed = sitemap_urls(sitemaps)
    cand = (
        parsed.select(
            url_normalize(F.col("loc")).alias("norm_url"),
            "host",
            "priority_pct",
        )
        .groupBy("norm_url", "host")
        .agg(F.max("priority_pct").alias("priority_pct"))
    )
    known = corpus.select(url_normalize(F.col(url_col)).alias("norm_url"))
    return cand.join(known, "norm_url", "left_anti")


def domain_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain curation rollup: the table a domain
    blocklist / per-domain quality prior is derived from.

    Expects ``doc_id``, ``url_col``, ``lang``, ``n_chars`` columns.
    Output: ``domain, n_docs, n_hosts, n_urls, sum_chars, en_frac`` —
    ``n_hosts``/``n_urls`` are exact distinct counts of lowercased host /
    normalized URL, ``en_frac`` the exact-ratio English share rounded to
    6 places (the cross-engine-stable rounding discipline of
    operators/quality.py).
    """
    staged = docs.select(
        registered_domain(url_host(F.col(url_col))).alias("domain"),
        F.lower(url_host(F.col(url_col))).alias("host"),
        url_normalize(F.col(url_col)).alias("norm_url"),
        "lang",
        "n_chars",
    )
    return staged.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("norm_url").alias("n_urls"),
        F.sum("n_chars").alias("sum_chars"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("en_frac"),
    )


def recrawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Change detection between two crawl snapshots of the same URL space
    — the decision table an incremental recrawl pipeline derives work
    from (unchanged pages skip re-extraction entirely; that is where the
    10^12-scale savings live, since most of the web does not change
    between crawls).

    Inputs are per-snapshot tables carrying a URL and a content
    fingerprint; each side is first collapsed to one representative per
    NORMALIZED URL (min fingerprint, then min doc_id — deterministic and
    engine-order-free), then full-outer-joined:

    * ``unchanged`` — both sides, same fingerprint;
    * ``changed``   — both sides, different fingerprint (re-extract);
    * ``new``       — only in the new snapshot (extract);
    * ``gone``      — only in the old snapshot (tombstone / retention).

    Output: ``norm_url, status, old_fp, new_fp`` (absent side ``''``).

    Scale shape: two near-unique-key aggregations + one full-outer
    sort-merge join, all keyed on the normalized URL — uniform keys, one
    row per URL per side, no fan-out anywhere.
    """

    def _side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(
                url_normalize(F.col(url_col)).alias("norm_url"),
                F.col(fp_col).alias(name),
            )
            .groupBy("norm_url")
            .agg(F.min(name).alias(name))
        )

    j = _side(old, "old_fp").join(_side(new, "new_fp"), "norm_url", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), "new")
        .when(F.col("new_fp").isNull(), "gone")
        .when(F.col("old_fp") == F.col("new_fp"), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        "norm_url",
        status.alias("status"),
        F.coalesce(F.col("old_fp"), F.lit("")).alias("old_fp"),
        F.coalesce(F.col("new_fp"), F.lit("")).alias("new_fp"),
    )


def crawl_plan(
    sitemaps: DataFrame,
    robots: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
    per_host: int = 2,
    buckets: int = 8,
) -> DataFrame:
    """The full crawl-planning chain as ONE DataFrame program — what a
    recrawl cycle actually runs, composed from the three operators it is
    made of:

    1. :func:`sitemap_seeds` — publisher-declared URLs the corpus does
       not already have (normalized-URL anti-join);
    2. :func:`robots_rules` + :func:`robots_filter` — drop seeds the
       host's ``User-agent: *`` rules forbid (longest-prefix decision);
    3. :func:`frontier_plan` — deterministic polite (host, slot) fetch
       rounds over the survivors, ≤ ``per_host`` per cell.

    Output: ``norm_url, host, priority_pct, bucket int, slot bigint``.

    Scale shape: inherits each stage's shape — the chain introduces no
    new shuffle class (seed agg, rules-per-host dim join, frontier
    window), and every key is either a near-unique normalized URL or a
    bounded host.  The whole chain is hash-gated end-to-end by one
    recursive DuckDB twin composed from the three stage twins.
    """
    seeds = sitemap_seeds(sitemaps, corpus, url_col=url_col)
    rules = robots_rules(robots)
    verdict = robots_filter(
        seeds, rules, url_col="norm_url", id_col="norm_url"
    ).where(F.col("allowed"))
    allowed = seeds.join(
        verdict.select(F.col("doc_id").alias("norm_url")), "norm_url"
    )
    plan = frontier_plan(
        allowed,
        url_col="norm_url",
        per_host=per_host,
        buckets=buckets,
        id_col="priority_pct",
    ).select(
        "norm_url",
        "host",
        F.col("doc_id").cast("int").alias("priority_pct"),
        "bucket",
        "slot",
    )
    return plan


def domain_cap(
    docs: DataFrame,
    cap: int = 3,
    url_col: str = "url",
    quality_col: str = "n_chars",
    buckets: int = 8,
) -> DataFrame:
    """Per-domain contribution cap — the anti-spam curation rule C4 and
    RefinedWeb apply after domain filtering: no single registered domain
    may contribute more than ``cap`` documents, and when it over-delivers
    the HIGHEST-quality ``cap`` survive (quality desc, doc_id tie-break —
    deterministic and engine-order-free).

    Output: ``domain, doc_id, rank int`` for every KEPT document
    (``rank`` 1..cap within its domain).

    Scale shape — exact distributed top-K without a mega-domain window:
    a plain ``row_number`` over (domain) makes one task hold an entire
    domain (tens of millions of rows for a link farm — the exact skew
    this rule exists to punish).  Instead the classic two-stage prune:

    1. each doc hashes into one of ``buckets`` sub-buckets; a window over
       (domain, bucket) keeps each bucket's local top-``cap`` — any
       global top-``cap`` row is necessarily in its own bucket's local
       top-``cap``, so the prune is LOSSLESS;
    2. the final window over (domain) ranks only the ≤ buckets×cap
       survivors per domain — bounded by constants, however large the
       domain.

    Both windows shuffle slim (domain, bucket, quality, doc_id) rows;
    raising ``buckets`` spreads a mega-domain's stage-1 sort over more
    tasks at the price of a slightly larger stage-2 input.
    """
    from pyspark.sql.window import Window

    staged = docs.select(
        registered_domain(url_host(F.col(url_col))).alias("domain"),
        "doc_id",
        F.col(quality_col).alias("_q"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 12),
                16,
                10,
            ).cast("bigint")
            % buckets
        ).cast("int").alias("_b"),
    )
    w1 = Window.partitionBy("domain", "_b").orderBy(
        F.desc("_q"), F.asc("doc_id")
    )
    pruned = staged.withColumn("_lr", F.row_number().over(w1)).where(
        F.col("_lr") <= cap
    )
    w2 = Window.partitionBy("domain").orderBy(F.desc("_q"), F.asc("doc_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= cap)
        .select("domain", "doc_id", F.col("rank").cast("int").alias("rank"))
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """RFC 9309 §2.3 ``Sitemap:`` discovery — the directive that closes
    the crawl-seeding loop: robots.txt is where publishers DECLARE their
    sitemap locations, so the chain is robots fetch → ``robots_sitemaps``
    → sitemap fetch → :func:`sitemap_urls` → :func:`sitemap_seeds` →
    :func:`robots_filter` → :func:`frontier_plan`.

    Semantics: ``Sitemap`` records are GLOBAL — they live outside
    user-agent groups (unlike allow/disallow they apply regardless of
    agent), so no group bookkeeping applies; the directive name is
    case-insensitive, comments strip first, and per the spec the value
    must be an absolute URL — relative values are dropped (shared rule,
    both engines).

    Output: ``host, line_no int, sitemap_url`` — one row per declared
    sitemap, document order preserved via ``line_no``.

    Scale shape: zero shuffle — a narrow line projection over the same
    split/strip/extract constants as :func:`robots_rules`.
    """
    from ocr_spark.operators.html import ABS_URL_RE

    raw = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\n")).alias("ln", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), ROBOTS_COMMENT_RE, ""))
    lines = raw.select(
        "host",
        F.col("ln").cast("int").alias("line_no"),
        F.lower(F.regexp_extract(clean, ROBOTS_DIRECTIVE_RE, 1)).alias(
            "_d"
        ),
        F.trim(F.regexp_extract(clean, ROBOTS_DIRECTIVE_RE, 2)).alias(
            "_v"
        ),
    )
    return (
        lines.where(
            (F.col("_d") == "sitemap") & F.col("_v").rlike(ABS_URL_RE)
        )
        .select("host", "line_no", F.col("_v").alias("sitemap_url"))
    )
