"""lm_quality (operators/quality.py) vs a brute-force Python model:
unigram counts over the reference slice, additive smoothing, per-token
micro-nat quantization, exact integer doc sums.
"""

from __future__ import annotations

import math
import re

from ocr_spark.operators.quality import lm_quality

PUNCT = "«»“”.,;:!?()[]{}\"'"


def _norm_tokens(text: str) -> list[str]:
    toks = [
        w.lower().translate(str.maketrans("", "", PUNCT))
        for w in re.split(r"\s+", text.strip())
    ]
    return [t for t in toks if t]


def _brute(ref_texts, score_rows):
    counts: dict[str, int] = {}
    n_total = 0
    for t in ref_texts:
        for tok in _norm_tokens(t):
            counts[tok] = counts.get(tok, 0) + 1
            n_total += 1
    denom = n_total + len(counts) + 1

    def micro(c: int) -> int:
        return round(-math.log((c + 1) / denom) * 1e6)

    out = {}
    for doc_id, text in score_rows:
        toks = _norm_tokens(text)
        if not toks:
            continue
        lp = [micro(counts.get(t, 0)) for t in toks]
        oov = sum(1 for t in toks if t not in counts)
        out[doc_id] = (len(toks), oov, sum(lp))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_matches_brute_force_model(spark):
    ref = ["the cat sat on the mat", "the dog ate the cat food"]
    score = [
        (1, "the cat ate"),
        (2, "quantum flux capacitor"),  # all OOV
        (3, "the the the the"),  # high-frequency tokens, low NLL
    ]
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.nll_micro)
        for r in lm_quality(
            _df(spark, score), _df(spark, [(10 + i, t) for i, t in enumerate(ref)])
        ).collect()
    }
    assert got == _brute(ref, score)


def test_oov_scores_worse_than_in_vocab(spark):
    ref = [(0, "alpha beta gamma alpha")]
    score = [(1, "alpha beta"), (2, "zeta omega")]
    rows = {
        r.doc_id: r.avg_nll
        for r in lm_quality(_df(spark, score), _df(spark, ref)).collect()
    }
    assert rows[2] > rows[1]


def test_flag_threshold(spark):
    ref = [(0, "a b c")]
    score = [(1, "a"), (2, "zzz yyy xxx www")]
    out = {
        r.doc_id: r.flagged
        for r in lm_quality(_df(spark, score), _df(spark, ref), nll_max=1.8).collect()
    }
    # denom = N + V + 1 = 7.  doc 1: in-vocab token, -ln(2/7) ≈ 1.253
    # < 1.8; doc 2: all OOV, -ln(1/7) ≈ 1.946 > 1.8
    assert out == {1: False, 2: True}


def test_empty_token_docs_dropped(spark):
    ref = [(0, "a b")]
    score = [(1, "   "), (2, "a")]
    ids = [
        r.doc_id for r in lm_quality(_df(spark, score), _df(spark, ref)).collect()
    ]
    assert ids == [2]
