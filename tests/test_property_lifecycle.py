"""Property-based test of the document-lifecycle seam: arbitrary
interleavings of edits, inserts (edits of unseen doc_ids), deletes and a
compaction point must leave ``read_documents`` equal to a trivial
Python-dict model of latest-wins semantics — and compaction must be
transparent (the view is identical before and after folding, and the
folded base carries it verbatim).

This drives the REAL writers (append_edits / delete_documents /
compact_overlay), not copies; only the derived-table re-extraction is
skipped (covered by tests/test_edits.py), so each example stays cheap
enough for hypothesis to explore interleavings.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_spark import datagen

N_BASE = 4
DOC_IDS = [f"doc-{i:08d}" for i in range(N_BASE)] + ["new-a", "new-b"]

# (doc index, is_delete) per step; compact_at = step before which to compact
ops_st = st.lists(
    st.tuples(st.integers(0, len(DOC_IDS) - 1), st.booleans()),
    min_size=0,
    max_size=6,
)


@pytest.fixture(scope="module")
def template(spark, tmp_path_factory):
    """Original base table + one collected row per base doc (recursive
    dicts) to stamp edits/inserts from."""
    d = tmp_path_factory.mktemp("lifecycle")
    src0 = os.path.join(d, "base.parquet")
    datagen.generate_to_path(src0, n_docs=N_BASE, seed=48, scramble=True)
    base = spark.read.parquet(src0)
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in base.collect()}
    texts = {
        did: next(s["text"] for s in r["spans"] if s["text"] is not None)
        for did, r in rows.items()
    }
    return src0, base.schema, rows, texts


def _edit_row(rows: dict, doc_id: str, tag: str) -> dict:
    """A full-schema replacement row for doc_id whose every text span
    reads `tag` (template = the doc's base row, or any row for inserts)."""
    tpl = rows.get(doc_id, next(iter(rows.values())))
    row = {
        "doc_id": doc_id,
        "meta": tpl["meta"],
        "spans": [
            {**s, "text": (tag if s["text"] is not None else None)}
            for s in tpl["spans"]
        ],
    }
    return row


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_st, compact_at=st.integers(0, 6))
def test_lifecycle_view_matches_model(spark, template, ops, compact_at):
    from ocr_spark.jobs.edits import (
        append_edits, compact_overlay, delete_documents,
    )
    from ocr_spark.jobs.extract_job import read_documents

    src0, schema, rows, base_texts = template
    work = tempfile.mkdtemp(prefix="lifecycle_")
    src = os.path.join(work, "docs.parquet")
    if os.path.isdir(src0):
        shutil.copytree(src0, src)
    else:
        shutil.copy2(src0, src)
    try:
        model = dict(base_texts)  # doc_id -> expected first text
        for k, (idx, is_delete) in enumerate(ops):
            if k == compact_at:
                st_c = compact_overlay(spark, src)
                assert st_c["status"] in ("ok", "noop")
            did = DOC_IDS[idx]
            if is_delete:
                ids_df = spark.createDataFrame([(did,)], "doc_id string")
                delete_documents(spark, ids_df, src)
                model.pop(did, None)
            else:
                tag = f"e{k}"
                upd = spark.createDataFrame(
                    [_edit_row(rows, did, tag)], schema
                )
                append_edits(upd, src)
                model[did] = tag

        def view_texts():
            return {
                r["doc_id"]: next(
                    (s["text"] for s in r["spans"] if s["text"] is not None),
                    None,
                )
                for r in read_documents(spark, src).collect()
            }

        assert view_texts() == model

        # compaction is transparent: view unchanged, base carries it
        st_c = compact_overlay(spark, src)
        assert st_c["status"] in ("ok", "noop")
        assert view_texts() == model
        base_now = {
            r["doc_id"]: next(
                (s["text"] for s in r["spans"] if s["text"] is not None), None
            )
            for r in spark.read.parquet(src).collect()
        }
        assert base_now == model
    finally:
        shutil.rmtree(work, ignore_errors=True)
