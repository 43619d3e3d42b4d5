"""Gopher n-gram repetition battery (operators/quality.py
gopher_ngram_repetition — Rae et al. 2021 App. A1 rows 4-11): planted
violations per rule family, the de-overlap convention, and a brute-force
Python model over the real documents table.
"""

from __future__ import annotations

import re
from collections import Counter

from ocr_spark.operators.quality import (
    GOPHER_DUP_NGRAM_PCT,
    GOPHER_TOP_NGRAM_PCT,
    gopher_ngram_repetition,
)


def _model(text: str) -> dict:
    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    tok_chars = sum(len(t) for t in toks)
    out = {"tok_chars": tok_chars}
    for n in sorted(GOPHER_TOP_NGRAM_PCT):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if grams:
            c = Counter(grams)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            # a top gram occurring once is not repetition
            out[f"top{n}_chars"] = (
                best[1] * (len(best[0]) - (n - 1)) if best[1] >= 2 else 0
            )
        else:
            out[f"top{n}_chars"] = 0
    for n in sorted(GOPHER_DUP_NGRAM_PCT):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        covered = set()
        for i, g in enumerate(grams):
            if c[g] >= 2:
                covered.update(range(i, i + n))
        out[f"dup{n}_chars"] = sum(len(toks[p]) for p in covered)
    for n, pct in sorted(GOPHER_TOP_NGRAM_PCT.items()):
        out[f"r_top{n}"] = 100 * out[f"top{n}_chars"] <= pct * tok_chars
    for n, pct in sorted(GOPHER_DUP_NGRAM_PCT.items()):
        out[f"r_dup{n}"] = 100 * out[f"dup{n}_chars"] <= pct * tok_chars
    out["keep"] = all(
        out[k] for k in out if k.startswith("r_")
    )
    return out


def _run(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {r.doc_id: r.asDict() for r in gopher_ngram_repetition(df).collect()}


def _check(spark, texts):
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        exp = _model(t)
        row = {k: v for k, v in got[i].items() if k != "doc_id"}
        assert row == exp, (i, t[:60], row, exp)
    return got


def test_planted_violations_and_clean(spark):
    clean = (
        "the quick brown fox jumps over one lazy dog while seven other "
        "animals watch from a distant hill under bright evening stars "
        "and nobody repeats anything important twice in this sentence"
    )
    top2_flood = "foo bar " * 20
    dup5_flood = "a b c d e x " * 4 + "end"
    got = _check(spark, [clean, top2_flood, dup5_flood])
    assert got[0]["keep"] is True
    assert got[1]["r_top2"] is False and got[1]["keep"] is False
    assert got[2]["r_dup5"] is False and got[2]["keep"] is False


def test_coverage_deoverlaps(spark):
    # six identical tokens: the two duplicated 5-grams overlap on four
    # positions; covered = 6 positions, never 10.
    got = _run(spark, ["aa aa aa aa aa aa"])
    assert got[0]["dup5_chars"] == 12  # 6 tokens x 2 chars, counted once
    assert got[0]["tok_chars"] == 12


def test_top_tiebreak_is_lexicographic(spark):
    # 'x y' and 'y x' both occur twice; the lex-smaller gram must win and
    # the numerator uses ITS character count.
    got = _run(spark, ["x y x y x"])
    # grams: 'x y'(2), 'y x'(2) -> tie -> 'x y', chars = 2 * 2 = 4
    assert got[0]["top2_chars"] == 4
    _check(spark, ["x y x y x"])


def test_short_and_empty_docs(spark):
    got = _check(spark, ["", "single", "two words"])
    for i in range(3):
        assert got[i]["keep"] is True
        assert got[i]["dup10_chars"] == 0


def test_model_agreement_on_real_documents(spark):
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "select text from '/root/testdata/sf0.001/documents.parquet' "
            "where doc_id < 40 order by doc_id"
        ).fetchall()
    ]
    _check(spark, texts)
