"""S10 NER-sink analog (operators/ner.py): typed pattern entities must
match a pure-Python re reference over the same patterns, and the
operator must be one scan + one aggregation."""

from __future__ import annotations

import re
from collections import Counter

from ocr_spark.operators.ner import ENTITY_PATTERNS, ner_entities

DOCS = [
    (1, "Mail Ana Silva at ana.silva@example.org or 10.0.0.7 by "
        "2024-03-15; case 12345678 pending. Maria Jose Costa agrees."),
    (2, "no entities here, just plain lowercase text"),
    (3, "Borderline: A b Ab 999.999.999.999 1.2.3.4 x@y.zz 123456 "
        "2024-13-99 John Smith met. John Smith left."),
]


def _reference(docs):
    out = Counter()
    for doc_id, text in docs:
        for etype, pat in ENTITY_PATTERNS:
            for m in re.finditer(pat, text):
                out[(doc_id, etype, m.group(0))] += 1
    return dict(out)


def test_ner_matches_python_re(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["etype"], r["entity"]): r["cnt"]
        for r in ner_entities(df).collect()
    }
    assert got == _reference(DOCS)
    # sanity on the battery itself: every type fired somewhere
    assert {k[1] for k in got} == {"EMAIL", "IP", "NUM", "DATE", "PER"}
    # duplicate mention counted, not dedup'd (entities.json semantics)
    assert got[(3, "PER", "John Smith")] == 2


def test_ner_plan_single_scan_single_agg(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    plan = (
        ner_entities(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert plan.count("Exchange") <= 1
