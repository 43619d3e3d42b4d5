"""Stupid Backoff bigram LM (operators/quality.py bigram_lm_quality)
against a pure-Python model with identical quantization."""

import math

from ocr_spark.operators.quality import BACKOFF_MICRO, bigram_lm_quality

REF = [
    (100, "the quick fox jumps over the lazy dog"),
    (101, "the quick dog sleeps"),
]
DOCS = [
    (1, "the quick fox"),        # both bigrams in-model
    (2, "fox the sleeps dog"),   # unseen transitions of seen words
    (3, "zz9 qq7 xx1"),          # OOV everywhere
    (4, "single"),               # < 2 tokens → excluded
]


def _norm(text):
    out = []
    for w in text.strip().split():
        w = w.lower().translate(str.maketrans("", "", ".,;:!?\"()[]{}"))
        if w:
            out.append(w)
    return out


def _q(x):
    return int(round(x * 1e6))


def _brute():
    uni, bi = {}, {}
    n = 0
    for _, t in REF:
        toks = _norm(t)
        n += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    denom = n + len(uni)
    out = {}
    for d, t in DOCS:
        toks = _norm(t)
        if len(toks) < 2:
            continue
        s, nb = 0, 0
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi:
                s += _q(math.log(bi[(a, b)] / uni[a]))
            else:
                nb += 1
                lp1 = _q(math.log((uni.get(b, 0) + 1) / denom))
                s += BACKOFF_MICRO + lp1
        out[d] = (len(toks) - 1, nb, -s)
    return out


def test_bigram_lm_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    ref = spark.createDataFrame(REF, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_backoff"], r["nll_micro"])
        for r in bigram_lm_quality(docs, ref).collect()
    }
    assert got == _brute()
    # the in-model doc scores better (lower NLL/bigram) than shuffled
    # transitions, which score better than pure OOV
    avg = {d: v[2] / v[0] for d, v in got.items()}
    assert avg[1] < avg[2] < avg[3]
    assert 4 not in got


def test_backoff_constant_is_ln_04():
    assert BACKOFF_MICRO == round(math.log(0.4) * 1e6)
