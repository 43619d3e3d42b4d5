"""Unit tests for UniMax per-language budget allocation
(operators/sampling.py unimax_budget / unimax_plan): the closed-form
water-fill is cross-checked against a brute-force Python reimplementation
of the paper's sequential loop, and the epoch plan against a hashlib
replay of the deterministic-order prefix fill.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ocr_spark.operators.sampling import unimax_budget, unimax_plan


def _mkdocs(spark, rows):
    # rows: (doc_id, lang, n_tokens) → text with that many tokens
    data = [(d, " ".join(f"w{d}x{i}" for i in range(n)), lang) for d, lang, n in rows]
    return spark.createDataFrame(data, "doc_id bigint, text string, lang string")


ROWS = [
    (1, "en", 40), (2, "en", 35), (3, "en", 25),   # en: 100 tokens
    (4, "fr", 20), (5, "fr", 10),                   # fr: 30
    (6, "zh", 4), (7, "zh", 3),                     # zh: 7
    (8, "de", 1),                                   # de: 1
    (9, None, 50),                                  # null lang: excluded
]
COUNTS = {"en": 100, "fr": 30, "zh": 7, "de": 1}


def _brute_unimax(counts, budget, max_epochs):
    """The paper's sequential allocation: smallest-cap language first,
    each gets min(cap, equal share of what's left)."""
    langs = sorted(counts, key=lambda g: (counts[g] * max_epochs, g))
    left, out = budget, {}
    for i, g in enumerate(langs):
        cap = counts[g] * max_epochs
        share = left // (len(langs) - i)
        if cap <= share:
            out[g] = cap
            left -= cap
        else:
            # uncapped: every remaining language gets the SAME floor share
            for h in langs[i:]:
                out[h] = min(counts[h] * max_epochs, share)
            break
    return out


def _key(doc_id):
    return hashlib.md5(f"42|{doc_id}".encode()).hexdigest()[:12]


def test_unimax_budget_matches_sequential_loop(spark):
    docs = _mkdocs(spark, ROWS)
    for budget in (5, 20, 60, 120, 200, 276, 1000):
        got = {
            r["lang"]: (r["n_tokens"], r["cap"], r["alloc"])
            for r in unimax_budget(docs, budget, max_epochs=2).collect()
        }
        exp = _brute_unimax(COUNTS, budget, 2)
        assert set(got) == set(COUNTS), budget
        for g, (c, cap, alloc) in got.items():
            assert (c, cap) == (COUNTS[g], COUNTS[g] * 2), (budget, g)
            assert alloc == exp[g], (budget, g, alloc, exp[g])
        # never overspends; underfill < one share per uncapped language
        assert sum(exp.values()) <= budget or budget >= sum(COUNTS.values()) * 2


def test_unimax_budget_saturates_at_full_caps(spark):
    docs = _mkdocs(spark, ROWS)
    got = {r["lang"]: r for r in unimax_budget(docs, 10_000, max_epochs=3).collect()}
    for g, c in COUNTS.items():
        assert got[g]["alloc"] == c * 3
        assert got[g]["epochs"] == 3.0


def test_unimax_plan_prefix_fill_is_hash_ordered(spark):
    docs = _mkdocs(spark, ROWS)
    budget, me = 120, 2
    alloc = _brute_unimax(COUNTS, budget, me)
    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["n_copies"])
        for r in unimax_plan(docs, budget, max_epochs=me).collect()
    }
    assert 9 not in got  # null lang excluded
    by_lang = {}
    for d, lang, n in ROWS:
        if lang:
            by_lang.setdefault(lang, []).append((d, n))
    for g, members in by_lang.items():
        e, rem = alloc[g] // COUNTS[g], alloc[g] % COUNTS[g]
        cum = 0
        for d, n in sorted(members, key=lambda m: (_key(m[0]), m[0])):
            cum += n
            exp_copies = e + (1 if cum <= rem else 0)
            assert got[d] == (g, n, exp_copies), (g, d)


def test_unimax_plan_token_totals_respect_alloc(spark):
    docs = _mkdocs(spark, ROWS)
    for budget in (15, 100, 276):
        alloc = _brute_unimax(COUNTS, budget, 2)
        rows = unimax_plan(docs, budget, max_epochs=2).collect()
        spent = {}
        for r in rows:
            spent[r["lang"]] = spent.get(r["lang"], 0) + r["n_tokens"] * r["n_copies"]
        for g in COUNTS:
            assert spent.get(g, 0) <= alloc[g], (budget, g)
            # prefix fill underfills by less than one document
            assert alloc[g] - spent.get(g, 0) <= max(n for d, l, n in ROWS if l == g), (
                budget,
                g,
            )
