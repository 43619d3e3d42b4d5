"""Per-paragraph language segmentation (operators/quality.py
lang_segments): run-merge semantics, paragraph dropping, tie-break, text
round-trip, repartition invariance, and the one-Exchange plan contract.
"""

from __future__ import annotations

from ocr_spark.operators.quality import lang_segments

EN = "the of and to in that it is for sure"
EN2 = "a document that is of interest to it"
ES = "el la de que y en un los se por favor"
PT = "o a de que e do da em um para sempre"
TIE = "zzz 123 qqq"


def _segs(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = lang_segments(df).collect()
    out = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.seg_id)):
        out.setdefault(r.doc_id, []).append(r)
    return out


def test_contiguous_runs_merge(spark):
    text = "\n\n".join([EN, EN2, ES, PT])
    segs = _segs(spark, [(1, text)])[1]
    assert [(s.lang, s.n_paras) for s in segs] == [
        ("en", 2),
        ("es", 1),
        ("pt", 1),
    ]
    # the merged segment rejoins its paragraphs with the blank line
    assert segs[0].text == f"{EN}\n\n{EN2}"
    assert segs[0].first_para == 0 and segs[1].first_para == 2


def test_whitespace_paragraphs_dropped(spark):
    text = f"{EN}\n\n   \n\n{ES}"
    segs = _segs(spark, [(1, text)])[1]
    assert [(s.lang, s.n_paras) for s in segs] == [("en", 1), ("es", 1)]
    # para indices are dense over KEPT paragraphs
    assert [s.first_para for s in segs] == [0, 1]


def test_zero_score_tiebreak_is_lexicographic(spark):
    segs = _segs(spark, [(1, TIE)])[1]
    assert [(s.lang, s.n_paras) for s in segs] == [("de", 1)]


def test_alternation_never_merges(spark):
    text = "\n\n".join([EN, ES, EN, ES])
    segs = _segs(spark, [(1, text)])[1]
    assert [s.lang for s in segs] == ["en", "es", "en", "es"]
    assert all(s.n_paras == 1 for s in segs)


def test_repartition_invariance(spark):
    docs = [(i, "\n\n".join([EN, ES if i % 2 else EN2, PT])) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {
        (r.doc_id, r.seg_id): (r.lang, r.n_paras, r.text)
        for r in lang_segments(df).collect()
    }
    b = {
        (r.doc_id, r.seg_id): (r.lang, r.n_paras, r.text)
        for r in lang_segments(df.repartition(13)).collect()
    }
    assert a == b


def test_single_exchange_plan(spark):
    df = spark.createDataFrame([(1, EN)], "doc_id long, text string")
    plan = lang_segments(df)._jdf.queryExecution().executedPlan().toString()
    # the final (doc_id, seg_id) aggregate must reuse the window's doc_id
    # hash partitioning: one Exchange in the whole plan
    assert plan.count("Exchange") == 1
