"""Unit tests for benchmark decontamination (operators/contamination.py)
and PII redaction (functions/pii.py) — exact expected outputs on small
deterministic corpora, plus a brute-force cross-check of the overlap set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.pii import pii_counts, scrub_pii
from ocr_spark.operators.contamination import ngram_decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

EVAL = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs"),
]
TRAIN = [
    # shares the 4-gram "quick brown fox jumps" (and more) with eval 100
    (1, "he saw the quick brown fox jumps again and again"),
    # shares "pack my box with" with eval 101 — WITH punctuation noise the
    # normalizer must strip before the grams line up
    (2, "Pack, my BOX with... nothing else in common here at all"),
    # no overlap
    (3, "completely different words that never appear in the eval set"),
    # too short for any 4-gram
    (4, "tiny doc"),
]


def _brute_contam(train_rows, eval_rows, n=4):
    import re

    punct = "«»“”.,;:!?()[]{}\"'"

    def grams(text):
        toks = [
            w.lower().translate(str.maketrans("", "", punct))
            for w in re.split(r"\s+", text.strip())
        ]
        toks = [t for t in toks if t]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    eg = set()
    for _, text in eval_rows:
        eg |= grams(text)
    out = {}
    for doc_id, text in train_rows:
        g = grams(text)
        hits = len(g & eg)
        if hits:
            out[doc_id] = (len(g), hits)
    return out


def test_decontaminate_exact_hits(spark):
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit_grams"], r["contam_frac"])
        for r in ngram_decontaminate(
            _docs(spark, TRAIN), _docs(spark, EVAL), n=4
        ).collect()
    }
    exp = _brute_contam(TRAIN, EVAL, n=4)
    assert set(got) == set(exp)
    for doc_id, (n_grams, hits) in exp.items():
        g_n, g_hits, g_frac = got[doc_id]
        assert (g_n, g_hits) == (n_grams, hits)
        assert g_frac == pytest.approx(round(hits / n_grams, 6))
    # the known cases: doc 1 and doc 2 contaminated, 3 clean, 4 too short
    assert set(got) == {1, 2}


def test_decontaminate_no_eval_overlap_is_empty(spark):
    clean = _docs(spark, [(9, "nothing here matches anything over there")])
    out = ngram_decontaminate(clean, _docs(spark, EVAL), n=4)
    assert out.count() == 0


def test_decontaminate_threshold_n_controls_sensitivity(spark):
    # doc 2 shares only a 4-token run with the eval set: at n=5 it drops out
    out5 = ngram_decontaminate(_docs(spark, TRAIN), _docs(spark, EVAL), n=5)
    assert {r["doc_id"] for r in out5.collect()} == {1}


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

def test_pii_counts_and_scrub_exact(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.org or bob@x.co today"),
        (2, "host 192.168.0.1 and 10.0.255.3 up"),
        (3, "account 12345678 ref 9876543210 but 123456 is too short"),
        (4, "no pii at all"),
        (5, "mixed: a@b.io from 8.8.8.8 id 77777777"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    c = pii_counts(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            c["n_emails"].alias("n_emails"),
            c["n_ips"].alias("n_ips"),
            c["n_longnums"].alias("n_longnums"),
            scrub_pii(F.col("text")).alias("clean"),
        ).collect()
    }
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_longnums"]) == (2, 0, 0)
    assert got[1]["clean"] == "mail me at <EMAIL> or <EMAIL> today"
    assert (got[2]["n_emails"], got[2]["n_ips"]) == (0, 2)
    assert got[2]["clean"] == "host <IP> and <IP> up"
    assert got[3]["n_longnums"] == 2
    assert got[3]["clean"] == "account <NUM> ref <NUM> but 123456 is too short"
    assert got[4]["clean"] == "no pii at all"
    assert (got[5]["n_emails"], got[5]["n_ips"], got[5]["n_longnums"]) == (1, 1, 1)
    assert got[5]["clean"] == "mixed: <EMAIL> from <IP> id <NUM>"


def test_pii_scrub_order_email_wins_over_number(spark):
    # the email contains a 7+ digit run; email rule must consume it first
    df = spark.createDataFrame(
        [(1, "write 12345678@example.com now")], "doc_id bigint, text string"
    )
    row = df.select(scrub_pii(F.col("text")).alias("c")).first()
    assert row["c"] == "write <EMAIL> now"
