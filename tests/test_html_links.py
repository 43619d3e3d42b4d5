"""Outlink extraction (operators/html.py html_links) and the registered-
domain link graph (operators/web.py link_edges): one test per href /
resolution / exclusion branch, plus the narrow-plan assertion and the
pagerank composition (links → edges → ranks) the operators exist to feed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.html import html_links
from ocr_spark.operators.web import link_edges

PAGE_URL = "https://www.example.com/dir/page"

HTML = (
    '<html><body><p>Intro.</p>'
    '<a href="https://peer.example.org/p/1">Peer <b>one</b> page</a>'
    "<a href='//cdn.assets.net/lib.js'>CDN asset</a>"
    '<a href="/self/page-1">Local nav</a>'
    '<a rel="nofollow" href="https://ads.sponsor.com/buy">Sponsored</a>'
    '<a href="mailto:ed@example.com">Mail</a>'
    '<a href="other/page.html">Relative link</a>'
    '<A NAME="top">No href anchor</A>'
    '<a href="/trap">quoted href="https://fake.example.com/" in body</a>'
    '<!-- <a href="https://ghost.example.com/">ghost</a> -->'
    '<a href="https://peer.example.org/p/2">Fish &amp; Chips &lt;best&gt;</a>'
    '<a href="https://dangling.example.net/">unclosed anchor'
    "</body></html>"
)


@pytest.fixture(scope="module")
def links(spark):
    df = spark.createDataFrame(
        [(1, PAGE_URL, HTML)], "doc_id int, url string, html string"
    )
    rows = html_links(df).orderBy("link_pos").collect()
    return {r["href"]: r for r in rows}, rows


def test_row_inventory(links):
    by_href, rows = links
    # ghost (comment) and the unclosed trailing anchor emit no row
    assert len(rows) == 9
    assert [r["link_pos"] for r in rows] == list(range(9))
    assert all(r["url"] == PAGE_URL for r in rows)


def test_absolute_href_passes_through(links):
    by_href, _ = links
    r = by_href["https://peer.example.org/p/1"]
    assert r["dst_url"] == "https://peer.example.org/p/1"
    assert not r["nofollow"]


def test_anchor_text_normalized(links):
    by_href, _ = links
    assert by_href["https://peer.example.org/p/1"]["anchor"] == "Peer one page"
    assert (
        by_href["https://peer.example.org/p/2"]["anchor"]
        == "Fish & Chips <best>"
    )


def test_protocol_relative_inherits_page_scheme(links):
    by_href, _ = links
    r = by_href["//cdn.assets.net/lib.js"]
    assert r["dst_url"] == "https://cdn.assets.net/lib.js"


def test_root_relative_resolves_against_page_host(links):
    by_href, _ = links
    assert (
        by_href["/self/page-1"]["dst_url"]
        == "https://www.example.com/self/page-1"
    )


def test_nofollow_flagged(links):
    by_href, _ = links
    assert by_href["https://ads.sponsor.com/buy"]["nofollow"]


def test_unresolvable_hrefs_have_null_dst(links):
    by_href, _ = links
    assert by_href["mailto:ed@example.com"]["dst_url"] is None
    assert by_href["other/page.html"]["dst_url"] is None
    assert by_href[""]["dst_url"] is None  # the no-href anchor


def test_href_read_from_open_tag_not_body(links):
    by_href, _ = links
    r = by_href["/trap"]
    assert r["dst_url"] == "https://www.example.com/trap"
    assert 'href="https://fake.example.com/"' in r["anchor"]
    assert "https://fake.example.com/" not in by_href


def test_commented_anchor_not_extracted(links):
    by_href, _ = links
    assert "https://ghost.example.com/" not in by_href


def test_narrow_plan_no_exchange(spark):
    df = spark.createDataFrame(
        [(1, PAGE_URL, HTML)], "doc_id int, url string, html string"
    )
    plan = html_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _edge_docs(spark):
    # a.com cites b.org twice and c.net once (one of c nofollow'd);
    # b.org cites a.com once plus itself (self-loop dropped).
    rows = [
        (
            1,
            "https://www.a.com/x",
            '<a href="https://b.org/1">one</a>'
            '<a href="https://sub.b.org/2">two</a>'
            '<a rel="nofollow" href="https://c.net/paid">paid</a>'
            '<a href="https://c.net/free">free</a>'
            '<a href="/local">self</a>',
        ),
        (
            2,
            "http://blog.b.org/y",
            '<a href="https://a.com/back">back</a>'
            '<a href="https://b.org/self">self</a>'
            '<a href="relative.html">skip</a>',
        ),
    ]
    return spark.createDataFrame(rows, "doc_id int, url string, html string")


def test_link_edges_semantics(spark):
    edges = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in link_edges(_edge_docs(spark)).collect()
    }
    # subdomain collapses to the registered domain; nofollow + self-loops
    # (incl. the root-relative self link) are gone; occurrences counted.
    assert edges == {("a.com", "b.org"): 2, ("a.com", "c.net"): 1,
                     ("b.org", "a.com"): 1}


def test_anchor_terms_index(spark):
    from ocr_spark.operators.web import anchor_terms

    rows = [
        (
            1,
            "https://www.a.com/x",
            '<a href="https://b.org/1">Best <b>Widgets</b></a>'
            '<a href="https://b.org/2">best widgets!</a>'
            '<a rel="nofollow" href="https://b.org/3">best spammy</a>'
            '<a href="/nav">home</a>',
        ),
        (
            2,
            "http://c.net/y",
            '<a href="https://sub.b.org/1">widgets shop</a>',
        ),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, url string, html string")
    out = {
        (r["dst_domain"], r["term"]): (r["n_mentions"], r["n_src_domains"])
        for r in anchor_terms(docs).collect()
    }
    # normalization strips '!' and lowercases; nofollow and the
    # same-domain nav anchor contribute nothing; subdomain collapses.
    assert out == {
        ("b.org", "best"): (2, 1),
        ("b.org", "widgets"): (3, 2),
        ("b.org", "shop"): (1, 1),
    }


def test_pagerank_over_extracted_edges(spark):
    from ocr_spark.operators.graph import pagerank

    edges = link_edges(_edge_docs(spark)).select(
        F.col("src_domain").alias("src"), F.col("dst_domain").alias("dst")
    )
    ranks = pagerank(edges).collect()
    assert {r["node"] for r in ranks} == {"a.com", "b.org", "c.net"}
    total = sum(r["rank"] for r in ranks)
    # integer fixed-point mass conservation (scale 1e9, floor-division dust)
    assert abs(total - 10**9) < 100
