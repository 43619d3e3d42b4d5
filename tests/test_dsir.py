"""DSIR importance resampling (operators/sampling.py dsir_weights /
dsir_select) against a pure-Python model with the same quantization."""

import hashlib
import math

from ocr_spark.operators.sampling import dsir_select, dsir_weights

TARGET = [
    (100, "clean prose flows like clean prose"),
    (101, "prose about prose and clean text"),
]
RAW = [
    (1, "clean prose text"),          # target-like → high weight
    (2, "zz9 qqx7 vv3 kk1 jj8"),      # nothing shared → low weight
    (3, "prose clean prose"),          # target-like
    (4, ""),                           # no tokens → excluded
]
B = 64


def _norm(text):
    out = []
    for w in text.strip().split():
        w = w.lower().translate(str.maketrans("", "", ".,;:!?\"()[]{}"))
        if w:
            out.append(w)
    return out


def _grams(toks):
    return list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16) % B


def _counts(rows):
    out = {}
    for _, text in rows:
        toks = _norm(text)
        if not toks:
            continue
        for g in _grams(toks):
            b = _bucket(g)
            out[b] = out.get(b, 0) + 1
    return out


def _q(x):
    return int(round(x * 1e6))


def _brute_weights():
    ct, cq = _counts(TARGET), _counts(RAW)
    nt, nq = sum(ct.values()), sum(cq.values())
    lw = {
        b: _q(math.log((ct.get(b, 0) + 1) / (nt + B)))
        - _q(math.log((cq.get(b, 0) + 1) / (nq + B)))
        for b in range(B)
    }
    out = {}
    for d, text in RAW:
        toks = _norm(text)
        if not toks:
            continue
        gs = _grams(toks)
        out[d] = (len(gs), sum(lw[_bucket(g)] for g in gs))
    return out


def test_dsir_weights_match_bruteforce(spark):
    raw = spark.createDataFrame(RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["logw_micro"])
        for r in dsir_weights(raw, tgt, n_buckets=B).collect()
    }
    exp = _brute_weights()
    assert got == exp
    # target-like docs outweigh the gibberish doc; empty doc excluded
    assert got[1][1] > got[2][1] and got[3][1] > got[2][1]
    assert 4 not in got


def test_dsir_select_is_deterministic_topk(spark):
    raw = spark.createDataFrame(RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id bigint, text string")
    a = dsir_select(raw, tgt, k=2, n_buckets=B).collect()
    b = dsir_select(
        raw.repartition(7), tgt, k=2, n_buckets=B
    ).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 2
    for r in a:
        assert r["key_micro"] == r["logw_micro"] + r["gumbel_micro"]
    # keys descend
    assert a[0]["key_micro"] >= a[1]["key_micro"]
