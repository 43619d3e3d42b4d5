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
