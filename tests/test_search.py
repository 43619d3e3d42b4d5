"""BM25 ranked retrieval (operators/search.py) against a brute-force
pure-Python BM25 — same quantization, so equality is exact."""

import math

import pytest

from ocr_spark.operators.search import bm25_rank

DOCS = [
    (1, "fast merge fast fast scan"),
    (2, "merge merge merge merge merge merge merge merge"),
    (3, "dup dup scan"),
    (4, "scan column window order"),
    (5, "fast dup merge"),
    (6, ""),
    (7, "   "),
    (8, "FAST, Merge."),  # normalization folds into the same terms
]
TERMS = ("dup", "merge", "fast")


def _norm(text):
    out = []
    for w in text.strip().split():
        w = w.lower().translate(
            str.maketrans("", "", ".,;:!?\"()[]{}")
        )
        if w:
            out.append(w)
    return out


def _brute_bm25(rows, terms):
    toks = {d: _norm(t) for d, t in rows}
    toks = {d: t for d, t in toks.items() if t}
    n_docs = len(toks)
    n_toks = sum(len(t) for t in toks.values())
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    idf = {
        q: int(round(math.log(1.0 + (n_docs - df[q] + 0.5) / (df[q] + 0.5)) * 1e6))
        for q in terms
        if df[q] > 0
    }
    scores = {}
    for d, t in toks.items():
        s, hits = 0, 0
        for q, im in idf.items():
            tf = t.count(q)
            if not tf:
                continue
            num = im * 36 * tf * n_toks
            den = 16 * n_toks * tf + 5 * n_toks + 15 * len(t) * n_docs
            s += num // den
            hits += 1
        if hits:
            scores[d] = (hits, s)
    return scores


@pytest.mark.usefixtures("spark")
def test_bm25_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["score_micro"])
        for r in bm25_rank(docs, TERMS, top_n=10).collect()
    }
    assert got == _brute_bm25(DOCS, TERMS)


def test_bm25_ranking_properties(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = bm25_rank(docs, TERMS, top_n=3).collect()
    # top_n limits, order is score desc
    assert len(rows) == 3
    assert [r["score_micro"] for r in rows] == sorted(
        (r["score_micro"] for r in rows), reverse=True
    )
    # the rare term ('dup', df=2 of 6 non-empty docs) outscores any
    # common-term pile-up: doc 3 (dup dup) must beat doc 2 (merge x8)
    all_rows = {r["doc_id"]: r["score_micro"] for r in bm25_rank(docs, TERMS, top_n=10).collect()}
    assert all_rows[3] > all_rows[2]
    # normalization: doc 8 hits both 'fast' and 'merge'
    assert 8 in all_rows


# ---------------------------------------------------------------------------
# exact-phrase retrieval
# ---------------------------------------------------------------------------

def _phrase_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_phrase_search_basic(spark):
    from ocr_spark.operators.search import phrase_search

    df = _phrase_docs(
        spark,
        [
            (1, "the Table scan, runs a table scan today"),
            (2, "table without the second word"),
            (3, "scan table reversed order"),
        ],
    )
    got = {r["doc_id"]: r for r in phrase_search(df, ("table", "scan")).collect()}
    # analyzer-normalized: 'Table scan,' matches too
    assert got[1]["n_matches"] == 2 and got[1]["first_pos"] == 1
    assert 2 not in got and 3 not in got


def test_phrase_search_overlapping_and_repeated_terms(spark):
    from ocr_spark.operators.search import phrase_search

    df = _phrase_docs(spark, [(1, "a a a a"), (2, "b a b a b")])
    got = {r["doc_id"]: r for r in phrase_search(df, ("a", "a")).collect()}
    assert got[1]["n_matches"] == 3 and got[1]["first_pos"] == 0
    assert 2 not in got
    got2 = {r["doc_id"]: r for r in phrase_search(df, ("b", "a", "b")).collect()}
    assert got2[2]["n_matches"] == 2 and got2[2]["first_pos"] == 0


def test_phrase_search_longer_than_doc_and_empty_phrase(spark):
    import pytest

    from ocr_spark.operators.search import phrase_search

    df = _phrase_docs(spark, [(1, "x y")])
    assert phrase_search(df, ("x", "y", "z")).count() == 0
    with pytest.raises(ValueError):
        phrase_search(df, ())


def test_phrase_search_brute_force_model(spark):
    import random
    import re

    from ocr_spark.functions.text import PUNCT_CHARS
    from ocr_spark.operators.search import phrase_search

    def py_norm_tokens(text):
        raw = re.split(r"\s+", text.strip()) if text.strip() else []
        table = str.maketrans("", "", PUNCT_CHARS)
        return [w for w in (t.translate(table).lower() for t in raw) if w]

    rng = random.Random(3)
    vocab = ["aa", "bb", "cc", "dd"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    phrase = ("aa", "bb", "aa")
    exp = {}
    for i, text in rows:
        toks = py_norm_tokens(text)
        starts = [
            s
            for s in range(len(toks) - len(phrase) + 1)
            if tuple(toks[s : s + len(phrase)]) == phrase
        ]
        if starts:
            exp[i] = (len(starts), starts[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(_phrase_docs(spark, rows), phrase).collect()
    }
    assert got == exp
