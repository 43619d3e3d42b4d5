"""Page-metadata extraction (operators/html.py html_meta) and
canonical-URL consolidation (operators/web.py canonical_dedup): per-field
branch tests, the comment-ghost trap, resolution forms, and the
consolidation semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.html import html_meta
from ocr_spark.operators.web import canonical_dedup

PAGE = """<html lang="en-GB"><head>
<title> Greet &amp; Meet <b>2026</b> </title>
<meta charset="utf-8">
<meta name="description" content="A &lt;fine&gt;   page">
<link rel="canonical" href="https://canon.example.com/page">
<meta property='og:image' content='https://img.example.com/og.png'>
</head><body><p>hello</p></body></html>"""


def _meta(spark, html, url="https://www.site.com/a/b"):
    df = spark.createDataFrame(
        [(1, url, html)], "doc_id long, url string, html string"
    )
    return html_meta(df).collect()[0]


def test_all_fields_present(spark):
    r = _meta(spark, PAGE)
    assert r.lang == "en-GB"
    # tag stripped, entity decoded, whitespace collapsed
    assert r.title == "Greet & Meet 2026"
    assert r.description == "A <fine> page"
    assert r.og_image == "https://img.example.com/og.png"
    assert r.canonical == "https://canon.example.com/page"


def test_absent_fields_empty(spark):
    r = _meta(spark, "<html><head></head><body>x</body></html>")
    assert (r.lang, r.title, r.description, r.og_image, r.canonical) == (
        "",
        "",
        "",
        "",
        "",
    )


def test_description_quote_and_order_variants(spark):
    sq = "<meta name='description' content='single quoted'>"
    rev = '<meta content="reversed order" name="description">'
    assert _meta(spark, f"<head>{sq}</head>").description == "single quoted"
    assert _meta(spark, f"<head>{rev}</head>").description == "reversed order"


def test_canonical_resolution_forms(spark):
    root = '<link rel="canonical" href="/canon/x">'
    proto = '<link href="//cdn.example.net/x" rel="canonical">'
    rel = '<link rel="canonical" href="other/x.html">'
    assert (
        _meta(spark, root).canonical == "https://www.site.com/canon/x"
    )
    assert _meta(spark, proto).canonical == "https://cdn.example.net/x"
    # directory-relative is out of scope in both engines → ''
    assert _meta(spark, rel).canonical == ""


def test_commented_metadata_is_ignored(spark):
    ghost = (
        "<head><!-- <link rel=\"canonical\" href=\"https://g.com/\">"
        " <meta name=\"description\" content=\"ghost\"> --></head>"
    )
    r = _meta(spark, ghost)
    assert r.canonical == "" and r.description == ""


def test_caps_lang_attribute(spark):
    assert _meta(spark, "<html LANG='pt'><head></head></html>").lang == "pt"


def test_meta_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, "https://h/x", PAGE)], "doc_id long, url string, html string"
    )
    plan = html_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonical_dedup_consolidates(spark):
    canon = '<link rel="canonical" href="https://c.com/one">'
    rows = [
        # two structurally different URLs declaring the same canonical
        (1, "https://a.com/print?utm_source=x", f"<head>{canon}</head>"),
        (2, "https://m.a.com/amp", f"<head>{canon}</head>"),
        # no canonical: falls back to its own normalized URL; the two
        # variants below normalize identically (utm + trailing slash)
        (3, "https://b.com/p?utm_medium=y", "<head></head>"),
        (4, "https://b.com/p/", "<head></head>"),
        # singleton
        (5, "https://d.com/q", "<head></head>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {r.dedup_key: r for r in canonical_dedup(df).collect()}
    assert got["https://c.com/one"].keep_doc_id == 1
    assert got["https://c.com/one"].n_dupes == 1
    assert got["https://c.com/one"].n_canonical == 2
    assert got["https://b.com/p"].n_dupes == 1
    assert got["https://b.com/p"].n_canonical == 0
    assert got["https://d.com/q"].n_dupes == 0
    assert len(got) == 3


def test_fixture_group_collapse(spark):
    # the driver fixture's %50 canonical keys must actually collapse docs
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.q_canonical_dedup(spark, sf).toPandas()
    assert out.n_dupes.sum() > 0
    assert (out.n_canonical > 0).any() and (out.n_canonical == 0).any()
    assert out.keep_doc_id.is_unique
