"""URL curation: parse/registered-domain/normalize expressions
(functions/url.py) and the dedup/rollup operators (operators/web.py).

Normalization cases cover exactly the noise axes the spec promises to
cancel (case, default ports, trailing slashes, utm params, param order,
fragments) plus the ones it must NOT cancel (non-default port, non-utm
params, path case).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.url import (
    registered_domain,
    url_host,
    url_normalize,
)
from ocr_spark.operators.web import domain_stats, url_dedup


def _norm(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(url_normalize(F.lit(url)).alias("n"))
        .collect()[0]["n"]
    )


NORM_CASES = [
    # case folding: scheme + host only, never the path
    ("HTTPS://WWW.Example.COM/A/B", "https://www.example.com/A/B"),
    # default ports dropped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),
    ("https://a.com:8080/x", "https://a.com:8080/x"),
    # trailing-slash runs stripped; bare root stays '/'
    ("https://a.com/x///", "https://a.com/x"),
    ("https://a.com", "https://a.com/"),
    ("https://a.com/", "https://a.com/"),
    # utm params dropped, survivors sorted, empties dropped
    ("https://a.com/x?utm_source=f&id=1", "https://a.com/x?id=1"),
    ("https://a.com/x?ref=h&id=1", "https://a.com/x?id=1&ref=h"),
    ("https://a.com/x?id=1&ref=h", "https://a.com/x?id=1&ref=h"),
    ("https://a.com/x?utm_a=1&utm_b=2", "https://a.com/x"),
    ("https://a.com/x?&&id=1&", "https://a.com/x?id=1"),
    # fragment dropped
    ("https://a.com/x#sec-2", "https://a.com/x"),
    ("https://a.com/x?id=1#f", "https://a.com/x?id=1"),
]


@pytest.mark.parametrize("raw,expected", NORM_CASES)
def test_url_normalize(spark, raw, expected):
    assert _norm(spark, raw) == expected


DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("blog.news.example.org", "example.org"),
    ("BBC.CO.UK", "bbc.co.uk"),
    ("www.bbc.co.uk", "bbc.co.uk"),
    ("deep.sub.example.com.au", "example.com.au"),
    ("example.io", "example.io"),
    ("localhost", "localhost"),
    # co.uk with nothing in front: the 2-label fallback applies
    ("co.uk", "co.uk"),
]


@pytest.mark.parametrize("host,expected", DOMAIN_CASES)
def test_registered_domain(spark, host, expected):
    got = (
        spark.range(1)
        .select(registered_domain(F.lit(host)).alias("d"))
        .collect()[0]["d"]
    )
    assert got == expected


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, url string, lang string, n_chars bigint"
    )


def test_url_dedup_groups_fetch_noise(spark):
    # four fetches of one page (case, port, utm, fragment noise) + one
    # genuinely different page
    rows = [
        (1, "https://WWW.A.com/x?id=1&utm_s=f", "en", 10),
        (2, "https://www.a.com:443/x/?id=1", "en", 10),
        (3, "https://www.a.com/x?id=1#frag", "pt", 10),
        (4, "https://www.a.com/x?utm_b=2&id=1", "en", 10),
        (5, "https://www.a.com/y?id=1", "en", 10),
    ]
    got = {
        r["norm_url"]: (r["keep_doc_id"], r["n_dupes"])
        for r in url_dedup(_docs(spark, rows)).collect()
    }
    assert got == {
        "https://www.a.com/x?id=1": (1, 3),
        "https://www.a.com/y?id=1": (5, 0),
    }


def test_domain_stats_rollup(spark):
    rows = [
        (1, "https://www.shop.co.uk/a", "en", 100),
        (2, "https://blog.shop.co.uk/b", "en", 50),
        (3, "https://BLOG.shop.co.uk/b#x", "pt", 50),  # dup of 2's norm
        (4, "https://other.com/c", "pt", 7),
    ]
    got = {r["domain"]: r for r in domain_stats(_docs(spark, rows)).collect()}
    uk = got["shop.co.uk"]
    assert (uk["n_docs"], uk["n_hosts"], uk["n_urls"]) == (3, 2, 2)
    assert uk["sum_chars"] == 200
    assert uk["en_frac"] == pytest.approx(0.666667)
    assert got["other.com"]["n_docs"] == 1
    assert got["other.com"]["en_frac"] == 0.0


def test_domain_blocklist_filter_drops_low_lang_domains(spark):
    from ocr_spark.operators.web import domain_blocklist_filter

    rows = [
        (1, "https://good.com/a", "en", 10),
        (2, "https://good.com/b", "en", 10),
        (3, "https://good.com/c", "pt", 10),   # 2/3 en → kept
        (4, "https://bad.com/a", "pt", 10),
        (5, "https://bad.com/b", "zh", 10),    # 0/2 en → blocked
    ]
    kept = domain_blocklist_filter(_docs(spark, rows)).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 3]
    assert {r["domain"] for r in kept} == {"good.com"}


def test_url_normalize_idempotent_exhaustive(spark):
    """norm(norm(u)) == norm(u) over the full component grid (1,920
    combos): normalization output must be a fixed point, or dedup keys
    would depend on how many times a pipeline stage normalized."""
    import itertools

    schemes = ["http", "HTTPS", "https", "HtTp"]
    hosts = ["a.com", "WWW.Shop.CO.UK", "x-1.example.io"]
    ports = ["", ":80", ":443", ":8080", ":8443"]
    paths = ["", "/", "/p/q", "/p/q///"]
    queries = ["", "?id=9", "?utm_s=1", "?z=2&id=9", "?id=9&utm_c=x&a=b",
               "?&&"]
    frags = ["", "#sec"]
    rows = [
        ("".join([s, "://", h, po, pa, q, f]),)
        for s, h, po, pa, q, f in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    df = spark.createDataFrame(rows, "url string").select(
        url_normalize(F.col("url")).alias("n1")
    )
    bad = (
        df.select("n1", url_normalize(F.col("n1")).alias("n2"))
        .where(F.col("n1") != F.col("n2"))
        .collect()
    )
    assert bad == [], bad[:5]


def test_parse_hostless_and_portful(spark):
    host = (
        spark.range(1)
        .select(url_host(F.lit("https://h.io:9/p")).alias("h"))
        .collect()[0]["h"]
    )
    assert host == "h.io"


def test_frontier_plan_politeness_and_determinism(spark):
    from ocr_spark.operators.web import frontier_plan

    rows = [
        # one mega-host (20 URLs), one small host, plus a duplicate fetch
        # of the same normalized URL (must collapse to one schedule row)
        *[
            (i, f"https://big.example.com/page-{i}")
            for i in range(20)
        ],
        (100, "https://small.org/a"),
        (101, "https://small.org/b"),
        (102, "https://small.org/c"),
        (103, "https://big.example.com/page-0#frag"),  # dup of page-0
    ]
    docs = spark.createDataFrame(rows, "doc_id int, url string")
    out = frontier_plan(docs, per_host=2, buckets=4).collect()

    # duplicate normalized URL collapsed; min doc_id kept
    assert len(out) == 23
    page0 = [r for r in out if r["norm_url"].endswith("/page-0")]
    assert len(page0) == 1 and page0[0]["doc_id"] == 0

    # politeness: never more than per_host URLs of one host in one slot
    from collections import Counter

    cell = Counter((r["host"], r["slot"]) for r in out)
    assert max(cell.values()) <= 2

    # slot encodes its bucket
    assert all(r["slot"] % 4 == r["bucket"] for r in out)

    # deterministic under repartitioning
    again = frontier_plan(
        docs.repartition(7, "doc_id"), per_host=2, buckets=4
    ).collect()
    key = lambda rs: sorted((r["norm_url"], r["slot"]) for r in rs)
    assert key(out) == key(again)


def test_frontier_plan_window_is_bucket_bounded(spark):
    """The window must partition on (host, bucket) — a host-only window
    would put a mega-host in one task."""
    from ocr_spark.operators.web import frontier_plan

    docs = spark.createDataFrame(
        [(1, "https://h.com/x")], "doc_id int, url string"
    )
    import re

    plan = (
        frontier_plan(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # the shuffle and the window both key on (host, bucket), never host alone
    assert re.search(r"hashpartitioning\(host#\d+, bucket#\d+", plan), plan
    assert re.search(
        r"windowspecdefinition\(host#\d+, bucket#\d+", plan
    ), plan
