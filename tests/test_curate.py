"""Curation pipeline: per-stage retention monotonicity, dedup correctness
(exact twins and planted near-dups removed, min-id survives), quality
predicates honored."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from ocr_spark import datagen
from ocr_spark.jobs.curate import run_curation


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Generator corpus + a planted exact-duplicate pair (doc B = doc A
    verbatim under a new doc_id) + a planted NEAR-duplicate (one word of
    a large donor doc changed, Jaccard ≈ 1) so the near-dup stage
    provably removes something."""
    d = tmp_path_factory.mktemp("curate")
    t = datagen.generate(n_docs=150, seed=42, scramble=True, mega_frac=0.0)
    # plant: duplicate row 0 with a new doc_id
    dup = t.slice(0, 1)
    dup = pa.table(
        {
            "doc_id": pa.array(["doc-zz-dup"], pa.string()),
            "spans": dup.column("spans"),
            "meta": dup.column("meta"),
        }
    )
    # plant: near-dup of a donor with >=30 non-empty text spans — append
    # a char to its last real word so the fingerprint differs but all
    # but ~3 shingles survive
    rows = t.to_pylist()
    donor = next(
        r for r in rows
        if sum(
            1 for s in r["spans"]
            if s["kind"] == "text" and s["text"] and s["text"].strip()
        ) >= 30
    )
    near = {
        "doc_id": "doc-zz-near",
        "spans": [dict(s) for s in donor["spans"]],
        "meta": donor["meta"],
    }
    for s in reversed(near["spans"]):
        if s["kind"] == "text" and s["text"] and s["text"].strip():
            s["text"] = s["text"] + "x"
            break
    near_t = pa.Table.from_pylist([near], schema=t.schema)
    t2 = pa.concat_tables([t, dup, near_t])
    src = os.path.join(d, "docs.parquet")
    datagen.write_parquet(t2, src)
    return d, src


def test_curation_pipeline(spark, corpus):
    d, src = corpus
    out_path = os.path.join(d, "curated")
    stats = run_curation(spark, src, out_path)
    # retention is monotone non-increasing through the stages
    order = ["input", "extracted_nonempty", "after_exact_dedup",
             "after_near_dedup", "after_quality", "written"]
    vals = [stats[k] for k in order]
    assert vals == sorted(vals, reverse=True), stats
    assert stats["input"] == 152
    # the planted exact duplicate died; the min-id original survived
    out = spark.read.parquet(out_path)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert "doc-zz-dup" not in ids
    assert stats["after_exact_dedup"] <= stats["extracted_nonempty"] - 1
    # the planted NEAR-duplicate died in the near-dup stage (its donor,
    # with the smaller doc_id, survived) — the stage provably removes
    assert "doc-zz-near" not in ids
    assert stats["after_near_dedup"] <= stats["after_exact_dedup"] - 1
    # curated rows satisfy the quality predicates
    bad = out.where(F.col("n_tokens") < 5).count()
    assert bad == 0
    # tokens column is real and non-degenerate
    row = out.orderBy("doc_id").first()
    assert len(row["tokens"]) == row["n_tokens"] > 0


def test_curate_kernel_runs_once(spark, corpus, monkeypatch):
    """The extraction kernel must execute exactly once for the whole
    five-action pipeline (curate() persists its output).  Counted with an
    executor-side accumulator ticked per row flowing OUT of the kernel: if
    any downstream action recomputed the kernel, the tick total would be a
    multiple of the row count."""
    import ocr_spark.jobs.curate as curate_mod
    from ocr_spark.jobs.curate import curate

    d, src = corpus
    acc = spark.sparkContext.accumulator(0)
    orig = curate_mod.extract_documents

    def counted(docs, **kw):
        out = orig(docs, **kw)

        def tick(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return out.mapInPandas(tick, out.schema)

    monkeypatch.setattr(curate_mod, "extract_documents", counted)
    out, stats = curate(spark.read.parquet(src))
    out.count()  # one extra downstream action on top of the five in curate()
    assert acc.value == stats["input"], (
        f"kernel rows ticked {acc.value}x vs {stats['input']} docs — "
        "extraction recomputed"
    )
    spark.catalog.clearCache()


def test_curation_deterministic(spark, corpus):
    d, src = corpus
    s1 = run_curation(spark, src, os.path.join(d, "c1"))
    s2 = run_curation(spark, src, os.path.join(d, "c2"))
    assert s1 == s2
    a = sorted(
        (r["doc_id"], r["fp"]) for r in spark.read.parquet(os.path.join(d, "c1")).collect()
    )
    b = sorted(
        (r["doc_id"], r["fp"]) for r in spark.read.parquet(os.path.join(d, "c2")).collect()
    )
    assert a == b


def test_curation_reads_through_the_seam(spark, tmp_path):
    """run_curation must honor the edit overlay: edited content is
    curated, tombstoned docs are not curated back in."""
    import os

    from pyspark.sql import functions as F

    from ocr_spark import datagen
    from ocr_spark.jobs.curate import run_curation
    from ocr_spark.jobs.edits import append_edits, delete_documents

    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "curated")
    datagen.generate_to_path(src, n_docs=40, seed=55, scramble=True)
    docs = spark.read.parquet(src)
    a, b = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()
    ]
    append_edits(
        docs.where(F.col("doc_id") == a).selectExpr(
            "doc_id",
            "transform(spans, s -> struct(s.kind as kind, upper(s.text) as "
            "text, s.media_ref as media_ref, s.offset as offset)) as spans",
            "meta",
        ),
        src,
    )
    delete_documents(spark, docs.where(F.col("doc_id") == b), src)

    stats = run_curation(spark, src, out)
    assert stats["input"] == 39  # tombstoned doc not seen at all
    cur = spark.read.parquet(out)
    assert cur.where(F.col("doc_id") == b).count() == 0
    ra = cur.where(F.col("doc_id") == a).first()
    if ra is not None:  # may be filtered by quality/dedup stages
        assert ra["doc_text"] == ra["doc_text"].upper()
