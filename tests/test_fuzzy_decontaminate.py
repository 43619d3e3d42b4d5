"""Fuzzy benchmark decontamination (operators/contamination.py
fuzzy_decontaminate): planted near-dup flags, sub-threshold near-misses
stay visible but unflagged, train x train similarity never flags.
"""

from __future__ import annotations

from ocr_spark.operators.contamination import fuzzy_decontaminate

EVAL_ITEM = (
    "what is the capital of france paris is the capital and largest "
    "city of france located on the seine river"
)
# light edit of the eval item (number swap + suffix) — high jaccard
NEAR_DUP = (
    "what is the capital of france paris is the capital and largest "
    "city of france located on the seine river indeed"
)
CLEAN = (
    "completely unrelated training text about distributed query engines "
    "and columnar storage formats with vectorized execution kernels"
)
# shares the eval item's opening clause — a near-miss, not contamination.
# LSH banding is deterministic but only probabilistically sensitive below
# the threshold: this text is chosen to COLLIDE on a band (verified
# jaccard 0.207 under the frozen k=16/bands=8 scheme) while staying well
# under the 0.5 contamination bar.
NEAR_MISS = (
    "what is the capital of france paris is but this document mostly "
    "discusses railway timetables ticket prices and station maps"
)


def _run(spark, train_rows, eval_rows, **kw):
    t = spark.createDataFrame(train_rows, "doc_id long, text string")
    e = spark.createDataFrame(eval_rows, "doc_id long, text string")
    return {r.doc_id: r for r in fuzzy_decontaminate(t, e, **kw).collect()}


def test_near_dup_flags_and_near_miss_does_not(spark):
    got = _run(
        spark,
        [(1, NEAR_DUP), (2, CLEAN), (3, NEAR_MISS)],
        [(100, EVAL_ITEM)],
    )
    assert got[1].contaminated and got[1].max_jaccard >= 0.5
    assert got[1].n_eval_matches == 1
    assert not got[2].contaminated and got[2].n_eval_matches == 0
    # the near-miss is visible (a verified pair exists) but unflagged
    assert not got[3].contaminated
    assert got[3].n_eval_matches == 1
    assert 0.0 < got[3].max_jaccard < 0.5


def test_train_train_pairs_never_generated(spark):
    # two identical TRAIN docs with no eval counterpart: cross-side-only
    # candidate generation must not flag them against each other
    got = _run(
        spark,
        [(1, NEAR_DUP), (2, NEAR_DUP)],
        [(100, CLEAN)],
    )
    assert not got[1].contaminated and got[1].n_eval_matches == 0
    assert not got[2].contaminated


def test_every_train_doc_gets_a_verdict_row(spark):
    # docs too short to shingle (< 3 tokens) still get a clean verdict
    got = _run(spark, [(1, "tiny doc"), (2, CLEAN)], [(100, EVAL_ITEM)])
    assert set(got) == {1, 2}
    assert not got[1].contaminated and got[1].max_jaccard == 0.0


def test_threshold_knob(spark):
    strict = _run(
        spark, [(1, NEAR_MISS)], [(100, EVAL_ITEM)], contaminate_at=0.05
    )
    assert strict[1].contaminated
