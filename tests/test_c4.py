"""C4 heuristic cleaning (operators/quality.py c4_line_filter) — planted
pages exercising every rule branch: terminal-punctuation drop, short-line
drop, javascript drop, sentence-count page kill, lorem-ipsum page kill,
brace page kill, null/empty text."""

import pytest

from ocr_spark.operators.quality import c4_line_filter

GOOD = (
    "The river rose early in March and kept rising for a week.\n"
    "Engineers walked the levee every morning before the fog lifted.\n"
    "By April the water had fallen back into its usual channel."
)
MIXED = (
    "This opening line is long enough and ends with a period.\n"
    "Too short.\n"
    "no terminal punctuation on this line despite plenty of words here\n"
    "Please enable javascript to view the comments on this page.\n"
    "A second proper sentence closes out the page rather nicely.\n"
    "And a third sentence arrives just in time to save it."
)
LOREM = (
    "The classic lorem ipsum filler text shows up on this line sadly.\n"
    "A second proper sentence closes out the page rather nicely.\n"
    "And a third sentence arrives just in time to save it."
)
BRACE = (
    "var config = { mode: full } runs on page load every single time.\n"
    "A second proper sentence closes out the page rather nicely.\n"
    "And a third sentence arrives just in time to save it."
)
TWO_SENT = (
    "This opening line is long enough and ends with a period.\n"
    "A second proper sentence closes out the page rather nicely but no third."
)


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, MIXED),
            (3, LOREM),
            (4, BRACE),
            (5, TWO_SENT),
            (6, ""),
            (7, None),
        ],
        "doc_id bigint, text string",
    )
    return {r["doc_id"]: r for r in c4_line_filter(docs).collect()}


def test_good_page_keeps_everything(rows):
    r = rows[1]
    assert r["n_lines"] == 3 and r["n_kept_lines"] == 3
    assert r["n_sentences"] == 3 and r["keep"]
    assert r["text_clean"] == GOOD


def test_line_rules_drop_short_nonterminal_and_javascript(rows):
    r = rows[2]
    assert r["n_lines"] == 6
    # dropped: "Too short." (words), no-terminal line, javascript line
    assert r["n_kept_lines"] == 3
    assert "javascript" not in r["text_clean"]
    assert "Too short." not in r["text_clean"]
    assert r["n_sentences"] == 3 and r["keep"]


def test_lorem_and_brace_kill_the_page(rows):
    assert rows[3]["has_lorem"] and not rows[3]["keep"]
    assert rows[3]["n_sentences"] == 3  # killed despite enough sentences
    assert rows[4]["has_brace"] and not rows[4]["keep"]


def test_sentence_floor_kills_two_sentence_page(rows):
    r = rows[5]
    assert r["n_kept_lines"] == 2 and r["n_sentences"] == 2
    assert not r["keep"]


def test_empty_and_null_pages_drop(rows):
    for d in (6, 7):
        r = rows[d]
        assert r["n_lines"] == 1 and r["n_kept_lines"] == 0
        assert r["text_clean"] == "" and not r["keep"]


def test_badword_filter_kills_hit_pages(spark):
    from ocr_spark.operators.quality import c4_badword_filter

    docs = spark.createDataFrame(
        [
            (0, "clean text about tables and joins"),
            (1, "this page mentions bad stuff twice: bad stuff"),
            (2, "Punctuated BAD, normalizes to a hit"),
            (3, None),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["n_bad_hits"], r["keep"])
        for r in c4_badword_filter(docs, badwords=("bad",)).collect()
    }
    # multiplicity counted; punctuation-strip + lowercase normalize before
    # the membership test; null page has no tokens and survives this rule
    assert out == {0: (0, True), 1: (2, False), 2: (1, False), 3: (0, True)}
