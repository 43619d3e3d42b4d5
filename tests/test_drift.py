"""Corpus drift monitoring (operators/quality.py vocab_drift /
corpus_jsd): integer micro-nat JSD against a driver-side model, plus the
two analytic anchors — identical snapshots diverge by exactly 0, fully
disjoint snapshots by exactly ln2 (in micro-nats, up to quantization).
The real-table composition is hash-gated by the DuckDB twins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocr_spark.operators.quality import corpus_jsd, vocab_drift


def _model(a_tokens, b_tokens):
    """Integer micro-nat JSD model mirroring _drift_counts exactly."""
    ca, cb = {}, {}
    for w in a_tokens:
        ca[w] = ca.get(w, 0) + 1
    for w in b_tokens:
        cb[w] = cb.get(w, 0) + 1
    na, nb = len(a_tokens), len(b_tokens)
    out = {}
    for w in sorted(set(ca) | set(cb)):
        xa, xb = ca.get(w, 0), cb.get(w, 0)
        ca_nb, cb_na = xa * nb, xb * na
        la = (
            xa * round(math.log(2.0 * ca_nb / (ca_nb + cb_na)) * 1e6)
            if xa
            else 0
        )
        lb = (
            xb * round(math.log(2.0 * cb_na / (ca_nb + cb_na)) * 1e6)
            if xb
            else 0
        )
        out[w] = (xa, xb, la * nb + lb * na)
    jsd = sum(d for _, _, d in out.values()) // (2 * na * nb)
    return out, jsd


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_drift_matches_integer_model(spark):
    a = _docs(spark, ["x x x y", "x z"])
    b = _docs(spark, ["x y y", "y z z z"], start_id=10)
    got = {
        r["word"]: (r["cnt_a"], r["cnt_b"], r["drift"])
        for r in vocab_drift(a, b).collect()
    }
    exp, exp_jsd = _model("x x x y x z".split(), "x y y y z z z".split())
    assert got == exp
    assert corpus_jsd(a, b).collect()[0]["jsd_micro"] == exp_jsd


def test_identical_snapshots_have_zero_jsd(spark):
    a = _docs(spark, ["alpha beta gamma", "beta beta delta"])
    b = _docs(spark, ["alpha beta gamma", "beta beta delta"], start_id=10)
    row = corpus_jsd(a, b).collect()[0]
    assert row["jsd_micro"] == 0
    # ln(1) = 0 exactly — every per-word drift is 0, no quantization noise
    assert all(r["drift"] == 0 for r in vocab_drift(a, b).collect())


def test_disjoint_snapshots_hit_ln2(spark):
    a = _docs(spark, ["aa bb cc dd"])
    b = _docs(spark, ["ee ff gg hh"], start_id=10)
    row = corpus_jsd(a, b).collect()[0]
    assert row["jsd_micro"] == round(math.log(2.0) * 1e6)  # 693147
    assert row["vocab_union"] == 8
    assert row["vocab_a"] == 4 and row["vocab_b"] == 4


def test_drift_ranks_the_moved_word_first(spark):
    # 'spam' appears only in snapshot B and dominates it
    a = _docs(spark, ["the cat sat on the mat"])
    b = _docs(spark, ["spam spam spam spam the cat"], start_id=10)
    top = vocab_drift(a, b).collect()[0]
    assert top["word"] == "spam"


# --- compression-ratio signal (same quality module) ---------------------


def test_compression_ratio_flags(spark):
    import random
    import string
    import zlib

    rng = random.Random(7)
    prose = (
        "In the spring of that year the valley flooded twice, once after "
        "the thaw and again when a storm stalled over the ridge for three "
        "days. Farmers moved their herds to higher pasture while engineers "
        "argued about whether the old levee could be raised before autumn. "
        "A survey crew mapped the channel, noting gravel bars that had "
        "shifted half a mile downstream since the chart of 1987."
    )
    repetitive = "buy now click here " * 60
    noise = "".join(rng.choice(string.ascii_letters + string.digits)
                    for _ in range(800))
    docs = spark.createDataFrame(
        [(1, prose), (2, repetitive), (3, noise), (4, ""), (5, None)],
        "doc_id bigint, text string",
    )
    from ocr_spark.operators.quality import compression_ratio

    rows = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert rows[1]["flag"] == "ok"
    assert rows[2]["flag"] == "repetitive"
    assert rows[3]["flag"] == "noise"
    assert rows[4]["flag"] == "noise" and rows[4]["raw_bytes"] == 0
    assert rows[5]["flag"] == "noise"
    # ratio is the exact zlib micro-ratio, same library the kernel uses
    b = prose.encode()
    assert rows[1]["ratio_micro"] == round(
        len(zlib.compress(b, 6)) / len(b) * 1e6
    )
