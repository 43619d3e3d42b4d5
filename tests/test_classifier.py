"""nb_quality (operators/classifier.py) against a pure-Python brute-force
multinomial NB that mirrors the quantization spec exactly: per-distinct-
token micro-nat costs rounded HALF_UP, quantize-then-subtract deltas,
bigint evidence sums, one quantized prior."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from ocr_spark.operators.classifier import nb_quality

POS = ["good clean text here", "clean good prose", "text of good quality"]
NEG = ["spam spam buy now", "buy spam now", "junk spam buy"]
ALL = POS + NEG + ["good spam", "zzz unseen words only"]


def _q(x: float) -> int:
    """round-half-up to integer, matching Spark/DuckDB round(x, 0)."""
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _model():
    ptoks = [t for d in POS for t in d.split()]
    ntoks = [t for d in NEG for t in d.split()]
    vocab = set(ptoks) | set(ntoks)
    denom_p = len(ptoks) + len(vocab) + 1
    denom_n = len(ntoks) + len(vocab) + 1

    def cost(c: int, denom: int) -> int:
        return _q(-math.log((c + 1) / denom) * 1e6)

    delta = {
        t: cost(ntoks.count(t), denom_n) - cost(ptoks.count(t), denom_p)
        for t in vocab
    }
    oov = cost(0, denom_n) - cost(0, denom_p)
    prior = _q(math.log(len(POS) / len(NEG)) * 1e6)
    return delta, oov, prior


def _expected():
    delta, oov, prior = _model()
    out = {}
    for i, doc in enumerate(ALL):
        toks = doc.split()
        n_oov = sum(1 for t in toks if t not in delta)
        ev = sum(delta.get(t, oov) for t in toks)
        out[i] = (len(toks), n_oov, ev + prior, ev + prior > 0)
    return out


def test_nb_quality_matches_bruteforce(spark):
    def df(texts, base):
        return spark.createDataFrame(
            [(base + i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )

    docs = df(ALL, 0)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_oov"],
            r["logodds_micro"],
            r["pred"],
        )
        for r in nb_quality(docs, df(POS, 100), df(NEG, 200)).collect()
    }
    assert got == _expected()


def test_nb_quality_separates_training_classes(spark):
    def df(texts, base):
        return spark.createDataFrame(
            [(base + i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )

    scored = {
        r["doc_id"]: r["pred"]
        for r in nb_quality(df(ALL, 0), df(POS, 100), df(NEG, 200)).collect()
    }
    for i in range(len(POS)):
        assert scored[i] is True
    for i in range(len(POS), len(POS) + len(NEG)):
        assert scored[i] is False
