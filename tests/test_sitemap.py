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
