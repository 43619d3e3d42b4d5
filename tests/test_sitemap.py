"""Sitemap operators (operators/web.py sitemap_urls / sitemap_seeds):
parse branches, defaulting, the loc-less drop, normalized-URL seed
semantics, and the zero-shuffle parse plan.
"""

from __future__ import annotations

from ocr_spark.operators.web import sitemap_seeds, sitemap_urls

XML = """<urlset>
<url><loc>  https://h.com/a &amp; b </loc><lastmod>2026-01-02</lastmod>
<changefreq>weekly</changefreq><priority>0.8</priority></url>
<url><loc>https://h.com/plain</loc></url>
<url><priority>0.9</priority></url>
<url><loc>HTTPS://H.com/dup?utm_source=x</loc><priority>0.4</priority></url>
</urlset>"""


def _parse(spark, xml=XML, host="h.com"):
    df = spark.createDataFrame(
        [(host, xml)], "host string, sitemap_xml string"
    )
    return sitemap_urls(df)


def test_parse_branches(spark):
    rows = {r.entry_pos: r for r in _parse(spark).collect()}
    # entry 2 has no <loc>: dropped
    assert sorted(rows) == [0, 1, 3]
    full = rows[0]
    assert full.loc == "https://h.com/a & b"  # trimmed + entity-decoded
    assert full.lastmod == "2026-01-02"
    assert full.changefreq == "weekly"
    assert full.priority_pct == 80
    assert rows[1].priority_pct == 50  # sitemaps.org default
    assert rows[1].lastmod == "" and rows[1].changefreq == ""
    assert rows[3].priority_pct == 40


def test_parse_plan_is_shuffle_free(spark):
    plan = _parse(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_seeds_exclude_known_urls(spark):
    sitemaps = spark.createDataFrame(
        [("h.com", XML)], "host string, sitemap_xml string"
    )
    # corpus already fetched /dup — under fetch noise (case, utm, trailing
    # slash) that must still be recognized via normalization
    corpus = spark.createDataFrame(
        [(1, "https://h.com/dup/?utm_medium=z")], "doc_id long, url string"
    )
    got = {r.norm_url: r for r in sitemap_seeds(sitemaps, corpus).collect()}
    assert "https://h.com/dup" not in got
    assert "https://h.com/plain" in got
    # the entity-decoded loc parses: host ends at the space-free prefix
    assert any(u.startswith("https://h.com/a") for u in got)
    assert got["https://h.com/plain"].priority_pct == 50


def test_seeds_merge_takes_max_priority(spark):
    xml = (
        "<urlset><url><loc>https://h.com/x</loc><priority>0.2</priority>"
        "</url><url><loc>https://h.com/x/</loc><priority>0.7</priority>"
        "</url></urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("h.com", xml)], "host string, sitemap_xml string"
    )
    corpus = spark.createDataFrame([], "doc_id long, url string")
    got = sitemap_seeds(sitemaps, corpus).collect()
    assert len(got) == 1  # the two locs normalize together
    assert got[0].norm_url == "https://h.com/x"
    assert got[0].priority_pct == 70


def test_fixture_known_entries_all_excluded(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    seeds = E.q_sitemap_seeds(spark, sf).toPandas()
    # every surviving seed is a /fresh/ URL; every corpus-echo entry died
    assert len(seeds) > 0
    assert seeds.norm_url.str.contains("/fresh/").all()


def test_crawl_plan_end_to_end(spark):
    from ocr_spark.operators.web import crawl_plan

    xml = (
        "<urlset>"
        "<url><loc>https://h.com/known</loc></url>"
        "<url><loc>https://h.com/private/x</loc></url>"
        "<url><loc>https://h.com/new-page</loc><priority>0.9</priority></url>"
        "</urlset>"
    )
    sitemaps = spark.createDataFrame(
        [("h.com", xml)], "host string, sitemap_xml string"
    )
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    corpus = spark.createDataFrame(
        [(1, "https://h.com/known")], "doc_id long, url string"
    )
    got = crawl_plan(sitemaps, robots, corpus).collect()
    # known excluded by the seed anti-join, /private by robots
    assert [r.norm_url for r in got] == ["https://h.com/new-page"]
    assert got[0].priority_pct == 90 and got[0].host == "h.com"


def test_crawl_plan_fixture_invariants(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    plan = E.q_crawl_plan(spark, sf).toPandas()
    assert len(plan) > 0
    # politeness: never more than per_host=2 URLs in one (host, slot) cell
    assert plan.groupby(["host", "slot"]).size().max() <= 2
    # the slot arithmetic maps each slot back to exactly one bucket
    assert (plan.slot % 8 == plan.bucket).all()
    # robots: /fresh/p-1* seeds are disallowed on every robots-bearing
    # host (length(host) % 5 != 0), so any planned p-1x page must live on
    # a robots-less host
    p1 = plan[plan.norm_url.str.contains("/fresh/p-1")]
    assert (p1.host.str.len() % 5 == 0).all()
    # and robots-less hosts do keep their p-1x seeds
    assert len(p1) > 0
