"""Composed filter funnel (operators/quality.py quality_stack): stage
order (Gopher reads the C4-CLEANED text), per-stage verdicts, and the
one-narrow-stage plan shape."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.quality import quality_stack

GOOD = (
    "The river rose early in March and kept rising for a week.\n"
    "Engineers walked the levee every morning before the fog lifted.\n"
    "By April the water had fallen back into its usual channel."
)
# hash spam on a line WITHOUT terminal punctuation: C4 drops it, so the
# Gopher symbol rule must see clean text and pass — stage order matters
HASH_NO_PUNCT = GOOD + "\n#### #### #### #### #### ####"
# hash spam that SURVIVES C4 (terminal period, >=5 words) -> gopher fails
HASH_KEPT = GOOD + "\nBig sale #### today #### only #### here #### now."
DUP_KEPT = GOOD + ("\nThis duplicated line is long and ends here." * 4)


@pytest.fixture(scope="module")
def rows(spark):
    docs = spark.createDataFrame(
        [(1, GOOD), (2, HASH_NO_PUNCT), (3, HASH_KEPT), (4, DUP_KEPT)],
        "doc_id bigint, text string",
    )
    return {r["doc_id"]: r for r in quality_stack(docs).collect()}


def test_clean_page_passes_all_stages(rows):
    r = rows[1]
    assert r["c4_keep"] and r["gopher_keep"] and r["rep_keep"] and r["keep"]


def test_gopher_runs_on_cleaned_text(rows):
    # the hash flood was on a C4-dropped line -> gopher must NOT see it
    r = rows[2]
    assert r["gopher_keep"], "symbol rule leaked pre-clean text"
    assert r["keep"]


def test_surviving_hash_line_fails_gopher_stage(rows):
    r = rows[3]
    assert r["c4_keep"] and not r["gopher_keep"] and not r["keep"]


def test_duplicated_kept_lines_fail_repetition_stage(rows):
    r = rows[4]
    assert r["c4_keep"] and not r["rep_keep"] and not r["keep"]


def test_whole_stack_is_one_narrow_stage(spark):
    docs = spark.createDataFrame(
        [(1, GOOD)], "doc_id bigint, text string"
    )
    plan = quality_stack(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- full battery (quality_stack_full: funnel + n-gram rules) -------------

# a bigram flood that sails through C4 (terminal periods, >= 5 words per
# line) and through the line/para repetition rules (every line distinct),
# but dies to the top-2-gram character-share rule
BIGRAM_FLOOD = (
    "buy now buy now buy now buy now buy now offer one.\n"
    "buy now buy now buy now buy now buy now offer two.\n"
    "buy now buy now buy now buy now buy now offer three.\n"
    "buy now buy now buy now buy now buy now offer four.\n"
    # stopwords so the Gopher RULES pass and only the n-gram stage trips
    "that is the end of the story for everyone visiting here today."
)
# a C4-dropped n-gram flood (no terminal punctuation): the n-gram battery
# must read the CLEANED text and pass
FLOOD_NO_PUNCT = GOOD + "\nbuy now buy now buy now buy now buy now buy now"


def test_full_battery_adds_ngram_stage(spark):
    from ocr_spark.operators.quality import quality_stack_full

    docs = spark.createDataFrame(
        [(1, GOOD), (2, BIGRAM_FLOOD), (3, FLOOD_NO_PUNCT)],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in quality_stack_full(docs, min_words=10).collect()}
    assert got[1].keep and got[1].ngram_keep
    r = got[2]
    assert r.c4_keep and r.gopher_keep and r.rep_keep, r
    assert not r.ngram_keep and not r.keep
    # stage order: the flood line was C4-dropped, so n-grams never see it
    assert got[3].ngram_keep and got[3].keep
