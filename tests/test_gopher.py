"""Gopher quality rules (operators/quality.py gopher_rules): one planted
violation per rule over a passing base page, plus count anchors."""

import pytest

from ocr_spark.operators.quality import gopher_rules

# 60 words, mean len in [3,10], >=2 stopword hits, all alphabetic
BASE = (
    "the survey crew walked north along the levee and mapped every "
    "gravel bar that the spring flood have moved since the chart was "
    "drawn years ago noting where willows took root and where the bank "
    "had slumped into the channel while herons watched from the far "
    "side of the water standing still between passing clouds overhead "
    "quietly"
)

CASES = {
    1: BASE,                                        # keeps
    2: "too few words of that",                     # r_word_count
    3: BASE + " " + "# " * 10,                      # r_symbol (hash)
    4: BASE + "\n" + "\n".join(["• item"] * 60),    # r_bullet
    5: BASE + "\n" + "\n".join(["trailing off..."] * 2),  # r_ellipsis
    6: BASE + " " + "7 " * 20,                      # r_alpha
    7: BASE.replace("the ", "xx ").replace("of ", "yy ").replace(
        "and ", "zz "
    ).replace(" have ", " qq "),                    # r_stop
    8: BASE + " " + "a " * 200,                     # r_mean_len (short)
    9: None,                                        # null text
}


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        list(CASES.items()), "doc_id bigint, text string"
    )
    return {r["doc_id"]: r for r in gopher_rules(docs).collect()}


def test_base_page_keeps(rows):
    r = rows[1]
    assert r["keep"], {k: r[k] for k in r.asDict() if k.startswith("r_")}
    assert r["n_words"] == 57 and r["n_stop_hits"] >= 2


def test_each_planted_violation_trips_exactly_its_rule(rows):
    expect = {
        2: "r_word_count",
        3: "r_symbol",
        4: "r_bullet",
        5: "r_ellipsis",
        6: "r_alpha",
        7: "r_stop",
        8: "r_mean_len",
    }
    for doc_id, rule in expect.items():
        r = rows[doc_id]
        assert not r[rule], (doc_id, rule)
        assert not r["keep"]


def test_symbol_counts_anchor(rows):
    assert rows[3]["n_hash"] == 10
    r5 = rows[5]
    assert r5["n_ellipsis"] == 2 and r5["n_ellipsis_lines"] == 2


def test_null_text_fails_word_count_only_dims(rows):
    r = rows[9]
    assert r["n_words"] == 0 and not r["keep"]
    assert not r["r_word_count"] and not r["r_stop"]


# --- duplicate-line / paragraph rules (gopher_repetition) ---------------

from ocr_spark.operators.quality import gopher_repetition  # noqa: E402

UNIQ = "\n".join(f"unique line number {i} with words" for i in range(10))


@pytest.fixture(scope="module")
def rep_rows(spark):
    cases = {
        1: UNIQ,                                    # keeps
        2: UNIQ + "\n" + "\n".join(["same line"] * 8),   # line count+chars
        3: UNIQ + "\n\n" + "\n\n".join(["same para"] * 8),  # para rules
        4: UNIQ + "\n" + ("x" * 400) + "\n" + ("x" * 400),  # chars only
        5: "",                                      # empty
    }
    docs = spark.createDataFrame(
        list(cases.items()), "doc_id bigint, text string"
    )
    return {r["doc_id"]: r for r in gopher_repetition(docs).collect()}


def test_unique_page_keeps(rep_rows):
    r = rep_rows[1]
    assert r["keep"] and r["dup_lines"] == 0 and r["dup_paras"] == 0
    assert r["n_lines"] == 10


def test_duplicate_lines_trip_count_and_chars(rep_rows):
    r = rep_rows[2]
    assert r["dup_lines"] == 7  # 8 occurrences -> 7 beyond the first
    assert not r["r_dup_lines"] and not r["keep"]


def test_duplicate_paragraphs_trip_para_rules(rep_rows):
    r = rep_rows[3]
    assert r["dup_paras"] == 7
    assert not r["r_dup_paras"] and not r["keep"]
    # line-level: the 8 'same para' lines are duplicates too
    assert not r["r_dup_lines"]


def test_char_fraction_trips_without_count_fraction(rep_rows):
    r = rep_rows[4]
    # 1 duplicate line of 12 -> count rule fine; 400 of ~1100 chars dup
    assert r["dup_lines"] == 1 and r["r_dup_lines"]
    assert r["dup_line_chars"] == 400
    assert not r["r_dup_line_chars"] and not r["keep"]


def test_empty_page_trivially_keeps(rep_rows):
    r = rep_rows[5]
    assert r["n_lines"] == 1 and r["dup_lines"] == 0 and r["keep"]


# --- property: gopher_repetition vs a brute-force Counter model ---------

from collections import Counter  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

_line = st.text(alphabet="ab x", min_size=0, max_size=6)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(_line, min_size=0, max_size=8), min_size=1,
                max_size=6))
def test_repetition_counts_match_brute_force(spark, pages):
    docs = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(pages)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    for i, lines in enumerate(pages):
        split = ("\n".join(lines)).split("\n")  # empty text -> ['']
        cnt = Counter(split)
        dup = sum(c - 1 for c in cnt.values())
        dup_chars = sum((c - 1) * len(v) for v, c in cnt.items())
        r = rows[i]
        assert r["n_lines"] == len(split)
        assert r["dup_lines"] == dup
        assert r["dup_line_chars"] == dup_chars
        assert r["line_chars"] == sum(len(v) for v in split)
