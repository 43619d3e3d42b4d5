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
)


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
            "doc_id",
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
