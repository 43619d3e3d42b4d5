"""Unit tests for multi-phrase lexicon tagging (operators/search.py
phrase_tag): brute-force sliding-window cross-check with the same
normalizer, overlap counting, repeated-term phrases, case/punct noise,
and empty-phrase handling.
"""

from __future__ import annotations

import re

from ocr_spark.operators.search import phrase_tag

PHRASES = [
    (1, "quick brown fox"),
    (2, "lazy dog"),
    (3, "Pack, my BOX"),          # normalizes to "pack my box"
    (4, "again and again"),       # repeated term inside one phrase
    (5, "unicorn glitter"),       # never matches
    (6, "...!!!"),                # empty after normalization: dropped
]
DOCS = [
    (10, "the quick brown fox jumps over the lazy dog"),
    (11, "Quick! Brown... FOX; then quick brown fox again and again and again"),
    (12, "pack my box pack my box pack my box"),
    (13, "nothing relevant here"),
    (14, "again again again and and and"),
]


def _norm(text):
    punct = "«»“”.,;:!?()[]{}\"'"
    toks = [
        w.lower().translate(str.maketrans("", "", punct))
        for w in re.split(r"\s+", text.strip())
    ]
    return [t for t in toks if t]


def _brute(docs, phrases):
    out = {}
    for pid, ph in phrases:
        pt = _norm(ph)
        if not pt:
            continue
        for did, text in docs:
            toks = _norm(text)
            starts = [
                i
                for i in range(len(toks) - len(pt) + 1)
                if toks[i : i + len(pt)] == pt
            ]
            if starts:
                out[(did, pid)] = (len(starts), starts[0])
    return out


def _dfs(spark):
    d = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    p = spark.createDataFrame(PHRASES, "phrase_id bigint, phrase string")
    return d, p


def test_phrase_tag_matches_bruteforce(spark):
    d, p = _dfs(spark)
    got = {
        (r["doc_id"], r["phrase_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_tag(d, p).collect()
    }
    assert got == _brute(DOCS, PHRASES)


def test_phrase_tag_known_cases(spark):
    d, p = _dfs(spark)
    got = {
        (r["doc_id"], r["phrase_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_tag(d, p).collect()
    }
    assert got[(10, 1)] == (1, 1)       # "quick brown fox" at pos 1
    assert got[(10, 2)] == (1, 7)       # "lazy dog"
    # doc 11: normalized = quick brown fox then quick brown fox again and again and again
    assert got[(11, 1)] == (2, 0)
    # overlapping "again and again": starts 7 and 9
    assert got[(11, 4)] == (2, 7)
    # doc 12: three non-overlapping "pack my box"
    assert got[(12, 3)] == (3, 0)
    # never-matching phrase and empty phrase produce no rows
    assert not any(pid in (5, 6) for _, pid in got)
    assert not any(did == 13 for did, _ in got)
    # doc 14 has "again ... and" tokens but never the contiguous sequence
    assert (14, 4) not in got
