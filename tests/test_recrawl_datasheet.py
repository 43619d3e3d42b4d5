"""Snapshot change detection (operators/web.py recrawl_diff) and the
dataset-card rollup (operators/quality.py corpus_datasheet).
"""

from __future__ import annotations

from ocr_spark.operators.quality import corpus_datasheet
from ocr_spark.operators.web import recrawl_diff


def _diff(spark, old, new):
    o = spark.createDataFrame(old, "url string, fp string")
    n = spark.createDataFrame(new, "url string, fp string")
    return {r.norm_url: r for r in recrawl_diff(o, n).collect()}


def test_all_four_statuses(spark):
    got = _diff(
        spark,
        [
            ("https://h/same", "A"),
            ("https://h/edit", "B"),
            ("https://h/dead", "C"),
        ],
        [
            ("https://h/same", "A"),
            ("https://h/edit", "B2"),
            ("https://h/born", "D"),
        ],
    )
    assert got["https://h/same"].status == "unchanged"
    assert got["https://h/edit"].status == "changed"
    assert got["https://h/edit"].old_fp == "B"
    assert got["https://h/edit"].new_fp == "B2"
    assert got["https://h/dead"].status == "gone"
    assert got["https://h/dead"].new_fp == ""
    assert got["https://h/born"].status == "new"
    assert got["https://h/born"].old_fp == ""


def test_fetch_noise_variants_collapse(spark):
    # the same page fetched twice with URL noise must compare as ONE url;
    # identical fingerprints -> unchanged, never new+gone
    got = _diff(
        spark,
        [("https://h/p?utm_source=a", "X"), ("https://h/p/", "X")],
        [("HTTPS://h/p", "X")],
    )
    assert list(got) == ["https://h/p"]
    assert got["https://h/p"].status == "unchanged"


def test_min_fp_representative_is_deterministic(spark):
    # conflicting fingerprints for one URL within a snapshot: min wins on
    # both sides, so the comparison is order-free
    got = _diff(
        spark,
        [("https://h/p", "B"), ("https://h/p", "A")],
        [("https://h/p", "A")],
    )
    assert got["https://h/p"].status == "unchanged"
    assert got["https://h/p"].old_fp == "A"


def test_datasheet_rollup_and_dup_exposure(spark):
    rows = [
        (1, "s1", "en", "alpha beta gamma"),
        (2, "s1", "en", "alpha beta gamma"),   # exact dup of doc 1
        (3, "s1", "pt", "delta epsilon"),
        (4, "s2", "en", "alpha beta gamma"),   # cross-source copy
        (5, "s2", "en", "unique words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {
        (r.source, r.lang): r for r in corpus_datasheet(df).collect()
    }
    # cell rows, source subtotals, corpus total
    assert got[("s1", "en")].n_docs == 2
    assert got[("s1", "en")].n_tokens == 6
    # duplicate exposure is CORPUS-wide: doc 4's copy lives in s2
    assert got[("s2", "en")].n_dup_docs == 1
    assert got[("s1", "(all)")].n_docs == 3
    assert got[("(all)", "(all)")].n_docs == 5
    assert got[("(all)", "(all)")].n_dup_docs == 3
    assert abs(got[("(all)", "(all)")].dup_rate - 0.6) < 1e-9
    # rollup cardinality: 3 cells + 2 source subtotals + 1 total
    assert len(got) == 6
