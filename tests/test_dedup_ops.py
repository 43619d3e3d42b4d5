"""Behavioral tests for the corpus-level dedup additions: repeated-chunk
boilerplate removal and incremental (new-batch vs corpus) near-dup checks.
The sf-testdata oracle parity lives in test_driver_contract.py; these prove
the drop/cross-side semantics on crafted corpora where the expected output
is hand-computable."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_lsh_dedup,
    repeated_chunk_filter,
)

BOILER = " ".join(f"b{i}" for i in range(16))  # one exact 16-token window
UNIQ = [" ".join(f"u{d}x{i}" for i in range(16)) for d in range(4)]


def test_repeated_chunk_filter_drops_shared_windows(spark):
    # 3 docs share the BOILER window (> max_docs=2); each keeps its unique one
    rows = [(d, f"{BOILER} {UNIQ[d]}") for d in range(3)]
    rows.append((3, UNIQ[3]))  # no boilerplate at all
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in repeated_chunk_filter(docs, chunk=16, max_docs=2).collect()
    }
    assert len(out) == 4
    for d in range(3):
        assert out[d]["clean_text"] == UNIQ[d]
        assert out[d]["n_chunks"] == 2 and out[d]["n_kept"] == 1
    assert out[3]["clean_text"] == UNIQ[3]
    assert out[3]["n_chunks"] == 1 and out[3]["n_kept"] == 1


def test_repeated_chunk_filter_keeps_within_threshold_and_order(spark):
    # shared by exactly max_docs docs → kept; reassembly preserves order
    rows = [(0, f"{UNIQ[0]} {BOILER}"), (1, f"{BOILER} {UNIQ[1]}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in repeated_chunk_filter(docs, chunk=16, max_docs=2).collect()
    }
    assert out[0]["clean_text"] == f"{UNIQ[0]} {BOILER}"
    assert out[1]["clean_text"] == f"{BOILER} {UNIQ[1]}"
    assert all(r["n_kept"] == 2 for r in out.values())


def test_incremental_dedup_is_cross_side_only(spark):
    # corpus holds a near-dup PAIR (20, 21); the new batch near-dups doc 20.
    base = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(20, base), (21, base + " tail21"), (22, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " tail1"), (2, " ".join(f"q{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    got = incremental_minhash_dedup(new, corpus, threshold=0.0).collect()
    assert got, "expected at least the (1, 20/21) near-dup hits"
    # every pair is (new, corpus) — never corpus×corpus (20,21 must not appear)
    new_ids, corp_ids = {1, 2}, {20, 21, 22}
    for r in got:
        assert r["a"] in new_ids and r["b"] in corp_ids
    assert {r["a"] for r in got} == {1}
    # jaccard values are the exact set ratio, rounded to 6 decimals
    for r in got:
        assert abs(r["jaccard"] - r["inter"] / (r["na"] + r["nb"] - r["inter"])) < 5e-7


def test_incremental_agrees_with_batch_lsh_on_cross_pairs(spark):
    # On a combined corpus, the incremental cross-side pairs must be exactly
    # the batch pipeline's pairs that straddle the split (same tuning).
    base = " ".join(f"m{i}" for i in range(40))
    rows = [(i, base + f" extra{i // 2}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    new = docs.where(F.col("doc_id") < 2)
    corpus = docs.where(F.col("doc_id") >= 2)
    inc = {
        (r["a"], r["b"]): r["jaccard"]
        for r in incremental_minhash_dedup(new, corpus, threshold=0.0).collect()
    }
    batch = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_lsh_dedup(docs, threshold=0.0).collect()
        if (r["a"] < 2) != (r["b"] < 2)
    }
    # batch pairs are (min, max); incremental are (new, corpus) — normalize
    inc_norm = {(min(a, b), max(a, b)): j for (a, b), j in inc.items()}
    assert inc_norm == batch


def test_doc_repetition_flags_repeats(spark):
    from ocr_spark.operators.quality import doc_repetition

    rows = [
        (0, "spam spam spam spam spam spam spam spam"),   # one bigram repeated
        (1, " ".join(f"v{i}" for i in range(30))),        # all distinct
        (2, "too short"),                                 # < 3 tokens: excluded
        (3, " ".join(["a b c d e f"] * 5)),               # repeated phrase
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in doc_repetition(docs).collect()}
    assert set(out) == {0, 1, 3}
    assert out[0]["flagged"] and out[0]["top_bigram_frac"] == 1.0
    assert out[0]["dup_trigram_frac"] == round(5 / 6, 6)
    assert not out[1]["flagged"]
    assert out[1]["dup_trigram_frac"] == 0.0 and out[1]["top_bigram_frac"] < 0.05
    # "a b c d e f" x5: 28 trigrams, 6 distinct (the cycle) → 22 repeats
    assert out[3]["flagged"] and out[3]["dup_trigram_frac"] == round(22 / 28, 6)


# --- duplicated_substring_scrub (Lee et al. ExactSubstr, stride-1 windows) --


def _scrub_model(corpus, window, min_dup_docs):
    """Brute-force model: per-doc normalized tokens (whitespace split here;
    inputs avoid punctuation), window texts, distinct-doc counts, covered
    positions, in-order reassembly."""
    toks = {d: t.split() for d, t in corpus}
    toks = {d: t for d, t in toks.items() if t}
    wins = {
        d: [" ".join(t[i : i + window]) for i in range(len(t) - window + 1)]
        for d, t in toks.items()
    }
    docs_of = {}
    for d, ws in wins.items():
        for w in ws:
            docs_of.setdefault(w, set()).add(d)
    out = {}
    for d, t in toks.items():
        covered = set()
        for i, w in enumerate(wins[d]):
            if len(docs_of[w]) >= min_dup_docs:
                covered.update(range(i, i + window))
        kept = [tok for i, tok in enumerate(t) if i not in covered]
        out[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def test_substring_scrub_matches_bruteforce(spark):
    from ocr_spark.operators.dedup import duplicated_substring_scrub

    lic = " ".join(f"lic{i}" for i in range(12))       # 12-token license block
    body = lambda d: " ".join(f"d{d}w{i}" for i in range(10))
    corpus = [
        (0, f"{lic} {body(0)}"),           # license prefix
        (1, f"{body(1)} {lic}"),           # license suffix
        (2, f"{body(2)[:0]}{lic}"),        # doc IS the license → fully scrubbed
        (3, body(3)),                      # unique doc, untouched
        (4, "short doc"),                  # < window tokens, no windows
        (5, " ".join(["rep tok"] * 10)),   # within-doc repeat, 1 doc → kept
    ]
    window, mdd = 8, 2
    model = _scrub_model(corpus, window, mdd)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_dup_tokens"])
        for r in duplicated_substring_scrub(docs, window, mdd).collect()
    }
    assert got == model
    assert got[2][0] == "" and got[2][2] == got[2][1]   # fully scrubbed
    assert got[3][0] == body(3) and got[3][2] == 0
    assert got[4] == ("short doc", 2, 0)
    assert got[5][2] == 0                               # distinct-doc policy


def test_substring_scrub_removes_long_shared_run_entirely(spark):
    from ocr_spark.operators.dedup import duplicated_substring_scrub

    # a 30-token run shared by 2 docs inside different contexts: every
    # position of the run is covered by some 8-window → removed in full,
    # context survives (the ExactSubstr >= window guarantee)
    run = " ".join(f"r{i}" for i in range(30))
    a_ctx = " ".join(f"a{i}" for i in range(9))
    b_ctx = " ".join(f"b{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(0, f"{a_ctx} {run}"), (1, f"{run} {b_ctx}")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_substring_scrub(docs, 8, 2).collect()
    }
    # boundary windows straddling context+run differ between docs, so the
    # context tokens stay; the run itself is gone
    assert out[0]["clean_text"] == a_ctx
    assert out[1]["clean_text"] == b_ctx
    assert out[0]["n_dup_tokens"] == 30 and out[1]["n_dup_tokens"] == 30


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_model(texts, divisor=8):
    """Brute-force CDC model: same md5-prefix boundary rule, python-side."""
    import hashlib
    import re

    from ocr_spark.functions.text import PUNCT_CHARS

    table = str.maketrans("", "", PUNCT_CHARS)
    stats = {}
    for doc_id, text in texts:
        raw = re.split(r"\s+", text.strip()) if text.strip() else []
        toks = [w for w in (t.translate(table).lower() for t in raw) if w]
        chunk, chunks = [], []
        for t in toks:
            chunk.append(t)
            h = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
            if h % divisor == 0:  # boundary token ENDS its chunk
                chunks.append(chunk)
                chunk = []
        if chunk:
            chunks.append(chunk)
        for c in chunks:
            fp = hashlib.md5(" ".join(c).encode()).hexdigest()
            n_copies, docs, n_toks = stats.get(fp, (0, set(), len(c)))
            docs.add(doc_id)
            stats[fp] = (n_copies + 1, docs, len(c))
    return {
        fp: (n, len(d), k) for fp, (n, d, k) in stats.items()
    }


def test_cdc_chunks_match_brute_force(spark):
    import random

    from ocr_spark.operators.dedup import cdc_chunk_stats

    rng = random.Random(5)
    vocab = [f"tok{i}" for i in range(60)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 80))))
        for i in range(20)
    ] + [(99, "")]
    exp = _cdc_model(rows)
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["fp"]: (r["n_copies"], r["n_docs"], r["n_toks"])
        for r in cdc_chunk_stats(df).collect()
    }
    assert got == exp


def test_cdc_shift_robustness_vs_fixed_windows(spark):
    """THE point of CDC: prepending one token re-fingerprints only the
    first chunk; every later chunk survives.  Fixed-phase windows lose
    essentially all of them."""
    from ocr_spark.operators.dedup import cdc_chunk_stats

    base = " ".join(f"tok{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, base), (2, "inserted " + base)], "doc_id bigint, text string"
    )
    rows = cdc_chunk_stats(df).collect()
    shared = [r for r in rows if r["n_docs"] == 2]
    unique = [r for r in rows if r["n_docs"] == 1]
    # all chunks shared except (at most) the leading chunk of each doc
    assert len(unique) <= 2
    assert len(shared) >= 10  # divisor 8 over 200 distinct tokens


def test_cdc_identical_docs_share_everything(spark):
    from ocr_spark.operators.dedup import cdc_chunk_stats

    text = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id bigint, text string"
    )
    rows = cdc_chunk_stats(df).collect()
    assert rows and all(r["n_docs"] == 2 and r["n_copies"] == 2 for r in rows)


# ---------------------------------------------------------------------------
# line_boilerplate_filter — domain-scoped repeated-line removal
# ---------------------------------------------------------------------------

def _line_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, domain string, text string"
    )


def test_line_dedup_drops_domain_chrome_keeps_content(spark):
    from ocr_spark.operators.dedup import line_boilerplate_filter

    rows = [
        (1, "a.com", "FOOTER\nalpha body one\nFOOTER2"),
        (2, "a.com", "FOOTER\nbeta body two\nFOOTER2"),
        (3, "a.com", "FOOTER\ngamma body three\nFOOTER2"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_boilerplate_filter(
            _line_docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1]["clean_text"] == "alpha body one"
    assert out[2]["n_removed"] == 2 and out[2]["n_lines"] == 3


def test_line_dedup_scope_isolation_and_threshold(spark):
    from ocr_spark.operators.dedup import line_boilerplate_filter

    rows = [
        # SHARED appears in 3 docs on a.com (dropped) but also on b.com
        # (2 docs — below threshold, kept: scopes never pool counts)
        (1, "a.com", "SHARED\none"),
        (2, "a.com", "SHARED\ntwo"),
        (3, "a.com", "SHARED\nthree"),
        (4, "b.com", "SHARED\nfour"),
        (5, "b.com", "SHARED\nfive"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_boilerplate_filter(
            _line_docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1]["clean_text"] == "one"
    assert out[4]["clean_text"] == "SHARED\nfour"
    assert out[4]["n_removed"] == 0


def test_line_dedup_within_doc_repeat_counts_once(spark):
    from ocr_spark.operators.dedup import line_boilerplate_filter

    # the same line 3x inside ONE doc is 1 distinct doc, not 3 — kept
    rows = [
        (1, "a.com", "LOOP\nLOOP\nLOOP\nbody"),
        (2, "a.com", "other"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_boilerplate_filter(
            _line_docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == "LOOP\nLOOP\nLOOP\nbody"


def test_line_dedup_trim_keyed_and_empties_kept(spark):
    from ocr_spark.operators.dedup import line_boilerplate_filter

    # '  NAV ' and 'NAV' share a trim key; empty/whitespace-only lines
    # are never counted and never dropped (paragraph structure survives)
    rows = [
        (1, "a.com", "  NAV \n\nbody one"),
        (2, "a.com", "NAV\n\nbody two"),
        (3, "a.com", "NAV\n \nbody three"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_boilerplate_filter(
            _line_docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1]["clean_text"] == "\nbody one"
    assert out[3]["clean_text"] == " \nbody three"
    assert out[1]["n_removed"] == 1
