"""Unit tests for Bloom-filter benchmark decontamination
(operators/contamination.py bloom_decontaminate — the Dolma "bff" shape):
a Python-hashlib brute-force twin of the md5 position basis verifies the
Spark hash math bit-for-bit, and the verdicts are checked against the
exact n-gram operator (Bloom can only over-flag, never under-flag).
"""

from __future__ import annotations

import hashlib
import re

from ocr_spark.operators.contamination import (
    bloom_decontaminate,
    ngram_decontaminate,
)

from tests.test_contamination_pii import EVAL, TRAIN, _docs

M = 1 << 20
K = 3


def _grams(text, n=4):
    punct = "«»“”.,;:!?()[]{}\"'"
    toks = [
        w.lower().translate(str.maketrans("", "", punct))
        for w in re.split(r"\s+", text.strip())
    ]
    toks = [t for t in toks if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _positions(gram):
    # k disjoint 40-bit slices of ONE md5 digest, matching _slice_positions
    h = hashlib.md5(gram.encode()).hexdigest()
    return [int(h[10 * j : 10 * j + 10], 16) % M for j in range(K)]


def _brute_bloom(train_rows, eval_rows, n=4):
    filt = set()
    for _, text in eval_rows:
        for g in _grams(text, n):
            filt.update(_positions(g))
    out = {}
    for doc_id, text in train_rows:
        g = _grams(text, n)
        hits = sum(1 for gram in g if all(p in filt for p in _positions(gram)))
        out[doc_id] = (len(g), hits, hits > 0)
    return out


def test_bloom_matches_python_hashlib_twin(spark):
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit_grams"], r["contaminated"])
        for r in bloom_decontaminate(
            _docs(spark, TRAIN), _docs(spark, EVAL), n=4, k=K, m=M
        ).collect()
    }
    assert got == _brute_bloom(TRAIN, EVAL, n=4)
    # every train doc gets a verdict row, including the too-short doc 4
    assert set(got) == {1, 2, 3, 4}
    assert got[4] == (0, 0, False)


def test_bloom_flags_superset_of_exact(spark):
    """No false negatives by construction: every exact n-gram hit's k
    positions are all set, so exact-flagged ⊆ bloom-flagged."""
    t, e = _docs(spark, TRAIN), _docs(spark, EVAL)
    exact = {r["doc_id"] for r in ngram_decontaminate(t, e, n=4).collect()}
    bloom = {
        r["doc_id"]
        for r in bloom_decontaminate(t, e, n=4).collect()
        if r["contaminated"]
    }
    assert exact <= bloom
    # at m=2^20 with a handful of grams, no false positives either
    assert bloom == exact == {1, 2}


def test_bloom_tiny_filter_false_positives_are_deterministic(spark):
    """Shrinking m to 2 bits forces every position set — all gram-bearing
    docs flag (the documented FP contract), deterministically."""
    t, e = _docs(spark, TRAIN), _docs(spark, EVAL)
    got = {
        r["doc_id"]: r["contaminated"]
        for r in bloom_decontaminate(t, e, n=4, m=2).collect()
    }
    assert got == {1: True, 2: True, 3: True, 4: False}
