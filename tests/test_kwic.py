"""kwic_snippets (operators/search.py): window semantics — edge
clipping, overlapping occurrences, exact expected snippets, and the
zero-Exchange plan.
"""

from __future__ import annotations

from ocr_spark.operators.search import kwic_snippets


def _rows(spark, text: str, terms, context=3):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return sorted(
        (r.pos, r.term, r.snippet)
        for r in kwic_snippets(df, terms, context=context).collect()
    )


def test_mid_document_window(spark):
    got = _rows(spark, "a b c hit d e f", ("hit",))
    assert got == [(3, "hit", "a b c hit d e f")]


def test_edge_clipping_both_sides(spark):
    assert _rows(spark, "hit a b c d", ("hit",)) == [
        (0, "hit", "hit a b c")
    ]
    assert _rows(spark, "a b c d hit", ("hit",)) == [
        (4, "hit", "b c d hit")
    ]


def test_overlapping_occurrences_each_emit(spark):
    got = _rows(spark, "x hit hit y", ("hit",), context=1)
    assert got == [
        (1, "hit", "x hit hit"),
        (2, "hit", "hit hit y"),
    ]


def test_multiple_terms_and_normalization(spark):
    # norm_tokens lowercases and strips punctuation: 'Hit,' matches.
    got = _rows(spark, "a Hit, b miss c", ("hit", "miss"))
    assert [t for _, t, _ in got] == ["hit", "miss"]


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame([(1, "a hit b")], "doc_id int, text string")
    plan = (
        kwic_snippets(df, ("hit",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
