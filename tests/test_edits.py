"""Incremental edit → re-derive (§3.3): only the edited docs' buckets are
rewritten; edited content lands; untouched docs' rows are byte-identical;
the manifest records the edit commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark import datagen
from ocr_spark.jobs.edits import apply_edits, compact_overlay
from ocr_spark.jobs.extract_job import bucketed, run_extraction

N_BUCKETS = 8


def _bucket_files(output_path: str) -> dict[str, tuple]:
    """bucket dir → sorted (filename, mtime_ns, size) tuple."""
    out = {}
    for d in os.listdir(output_path):
        if not d.startswith("bucket="):
            continue
        full = os.path.join(output_path, d)
        out[d] = tuple(
            sorted(
                (f, os.stat(os.path.join(full, f)).st_mtime_ns,
                 os.stat(os.path.join(full, f)).st_size)
                for f in os.listdir(full)
                if not f.startswith(".")
            )
        )
    return out


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edits")
    src = os.path.join(d, "docs.parquet")
    out = os.path.join(d, "spans_out")
    man = os.path.join(d, "manifest")
    datagen.generate_to_path(src, n_docs=120, seed=42, scramble=True)
    st = run_extraction(
        spark, src, out, man, run_id="base", n_buckets=N_BUCKETS
    )
    assert st["status"] == "ok"
    return src, out, man


def test_apply_edits_touches_only_edited_buckets(spark, pipeline):
    src, out, man = pipeline
    before = _bucket_files(out)
    before_rows = {
        r["doc_id"]: (r["doc_text"], r["n_words"])
        for r in spark.read.parquet(out).select(
            "doc_id", "doc_text", "n_words"
        ).collect()
    }

    # edit two documents: uppercase every text span
    docs = spark.read.parquet(src)
    edit_ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()]
    updates = docs.where(F.col("doc_id").isin(edit_ids)).select(
        "doc_id",
        F.expr(
            "transform(spans, s -> struct(s.kind as kind, "
            "upper(s.text) as text, s.media_ref as media_ref, "
            "s.offset as offset))"
        ).alias("spans"),
        "meta",
    )
    st = apply_edits(
        spark, updates, src, out, man, run_id="edit-1", n_buckets=N_BUCKETS
    )
    assert st["status"] == "ok" and st["edited_docs"] == 2
    touched = {f"bucket={b}" for b in st["touched_buckets"]}
    assert 1 <= len(touched) <= 2

    # only touched bucket dirs rewrote
    after = _bucket_files(out)
    assert set(after) == set(before)
    for b in before:
        if b in touched:
            assert after[b] != before[b], f"{b} should have been rewritten"
        else:
            assert after[b] == before[b], f"{b} rewritten unnecessarily"

    # edited docs reflect the new content; every other doc is identical
    after_rows = {
        r["doc_id"]: (r["doc_text"], r["n_words"])
        for r in spark.read.parquet(out).select(
            "doc_id", "doc_text", "n_words"
        ).collect()
    }
    assert set(after_rows) == set(before_rows)
    for doc_id, (text, n) in after_rows.items():
        if doc_id in edit_ids:
            assert text == before_rows[doc_id][0].upper()
            assert n == before_rows[doc_id][1]
        else:
            assert (text, n) == before_rows[doc_id]

    # manifest gained exactly one 'edited' row per touched bucket
    m = spark.read.parquet(man)
    edited = m.where(F.col("run_id") == "edit-1").collect()
    assert {r["bucket"] for r in edited} == set(st["touched_buckets"])
    assert all(r["status"] == "edited" for r in edited)


def test_edits_survive_later_rederivations(spark, tmp_path):
    """Edits are durable source-of-truth updates: a later edit of a
    CO-RESIDENT doc must not revert them (the overlay, not a transient
    union, feeds derivation), and a full fresh extraction run over the
    same input reproduces the edited content."""
    import os as _os

    from ocr_spark.jobs.extract_job import run_extraction as _run

    src = _os.path.join(tmp_path, "docs.parquet")
    out = _os.path.join(tmp_path, "out")
    man = _os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=60, seed=43, scramble=True)
    _run(spark, src, out, man, run_id="base", n_buckets=2)

    docs = spark.read.parquet(src)

    def upperize(ids):
        return docs.where(F.col("doc_id").isin(ids)).select(
            "doc_id",
            F.expr(
                "transform(spans, s -> struct(s.kind as kind, "
                "upper(s.text) as text, s.media_ref as media_ref, "
                "s.offset as offset))"
            ).alias("spans"),
            "meta",
        )

    a, b = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()]
    apply_edits(spark, upperize([a]), src, out, man, run_id="e1", n_buckets=2)
    text_a = spark.read.parquet(out).where(F.col("doc_id") == a).first()["doc_text"]
    assert text_a == text_a.upper() and text_a.strip()

    # second edit touching a co-resident doc (2 buckets → likely same);
    # doc a's edit must survive the bucket re-derivation
    apply_edits(spark, upperize([b]), src, out, man, run_id="e2", n_buckets=2)
    t = spark.read.parquet(out)
    assert t.where(F.col("doc_id") == a).first()["doc_text"] == text_a
    tb = t.where(F.col("doc_id") == b).first()["doc_text"]
    assert tb == tb.upper()

    # a FULL fresh derivation over the same input (new output+manifest)
    # reads through the overlay seam and reproduces the edits
    out2, man2 = _os.path.join(tmp_path, "out2"), _os.path.join(tmp_path, "man2")
    _run(spark, src, out2, man2, run_id="re", n_buckets=2)
    t2 = spark.read.parquet(out2)
    assert t2.where(F.col("doc_id") == a).first()["doc_text"] == text_a
    assert t2.count() == 60


def test_compact_overlay_folds_edits_into_base(spark, tmp_path):
    """Compaction folds the durable overlay into the base table (latest
    edit per doc wins), removes the overlay, and is idempotent; a fresh
    derivation over the compacted base reproduces the edited content
    without any overlay present."""
    from ocr_spark.jobs.extract_job import (
        edits_overlay_path, read_documents, run_extraction as _run,
    )

    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=50, seed=44, scramble=True)
    _run(spark, src, out, man, run_id="base", n_buckets=2)

    docs = spark.read.parquet(src)

    def rewrite(ids, fn):
        return docs.where(F.col("doc_id").isin(ids)).select(
            "doc_id",
            F.expr(
                f"transform(spans, s -> struct(s.kind as kind, "
                f"{fn}(s.text) as text, s.media_ref as media_ref, "
                f"s.offset as offset))"
            ).alias("spans"),
            "meta",
        )

    a, b = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()]
    # two batches; the second RE-edits doc a — compaction must keep the
    # latest (lower) version, not the first (upper)
    apply_edits(spark, rewrite([a, b], "upper"), src, out, man, run_id="e1", n_buckets=2)
    apply_edits(spark, rewrite([a], "lower"), src, out, man, run_id="e2", n_buckets=2)
    expected = {
        r["doc_id"]: r["doc_text"]
        for r in spark.read.parquet(out).select("doc_id", "doc_text").collect()
    }

    st = compact_overlay(spark, src)
    assert st["status"] == "ok" and st["folded_edit_rows"] == 3
    assert st["docs"] == 50
    # folded data files are gone; the (possibly empty) dir itself is
    # deliberately kept — deleting it would race a concurrent append
    ov_dir = edits_overlay_path(src)
    assert not (
        os.path.isdir(ov_dir)
        and any(f.endswith(".parquet") for f in os.listdir(ov_dir))
    )
    assert not os.path.exists(src + "_compacting")
    assert not os.path.exists(src + "_precompact")

    # the base table itself now carries the edits
    base_a = spark.read.parquet(src).where(F.col("doc_id") == a).first()
    assert all(s["text"] == s["text"].lower() for s in base_a["spans"] if s["text"] is not None)

    # read seam unchanged; fresh derivation reproduces identical output
    assert read_documents(spark, src).count() == 50
    out2, man2 = os.path.join(tmp_path, "out2"), os.path.join(tmp_path, "man2")
    _run(spark, src, out2, man2, run_id="re", n_buckets=2)
    got = {
        r["doc_id"]: r["doc_text"]
        for r in spark.read.parquet(out2).select("doc_id", "doc_text").collect()
    }
    assert got == expected

    # idempotent: nothing left to fold
    assert compact_overlay(spark, src)["status"] == "noop"


def test_compact_overlay_recovers_from_swap_crash(spark, tmp_path):
    """A crash between the two swap renames leaves `<base>_precompact`
    and no base — the next compact_overlay call must restore it."""
    src = os.path.join(tmp_path, "docs.parquet")
    datagen.generate_to_path(src, n_docs=10, seed=45, scramble=True)
    n0 = spark.read.parquet(src).count()
    os.rename(src, src + "_precompact")  # simulate the crash window
    st = compact_overlay(spark, src)
    assert st["status"] == "noop"  # no overlay — recovery only
    assert os.path.exists(src) and not os.path.exists(src + "_precompact")
    assert spark.read.parquet(src).count() == n0


def test_delete_then_reedit_follows_latest_wins(spark, tmp_path):
    """Tombstone ordering: edit→delete removes the doc; delete→re-edit
    restores it with the new content.  Compaction applies a winning
    tombstone permanently (doc absent from the rewritten base)."""
    from ocr_spark.jobs.edits import delete_documents
    from ocr_spark.jobs.extract_job import read_documents

    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    datagen.generate_to_path(src, n_docs=40, seed=47, scramble=True)
    run_extraction(spark, src, out, man, run_id="base", n_buckets=2)

    docs = spark.read.parquet(src)
    a, b = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").limit(2).collect()]

    def upperize(ids):
        return docs.where(F.col("doc_id").isin(ids)).select(
            "doc_id",
            F.expr(
                "transform(spans, s -> struct(s.kind as kind, "
                "upper(s.text) as text, s.media_ref as media_ref, "
                "s.offset as offset))"
            ).alias("spans"),
            "meta",
        )

    # edit a then delete a → gone from the seam
    apply_edits(spark, upperize([a]), src, out, man, run_id="e1", n_buckets=2)
    assert delete_documents(spark, docs.where(F.col("doc_id") == a), src) == 1
    assert read_documents(spark, src).where(F.col("doc_id") == a).count() == 0

    # delete b then re-edit b → present with the re-edited content
    delete_documents(spark, docs.where(F.col("doc_id") == b), src)
    apply_edits(spark, upperize([b]), src, out, man, run_id="e2", n_buckets=2)
    seam_b = read_documents(spark, src).where(F.col("doc_id") == b).first()
    assert seam_b is not None
    assert all(s["text"] == s["text"].upper() for s in seam_b["spans"] if s["text"] is not None)
    tb = spark.read.parquet(out).where(F.col("doc_id") == b).first()["doc_text"]
    assert tb == tb.upper()

    # compaction applies a's tombstone permanently and keeps b's edit
    st = compact_overlay(spark, src)
    assert st["status"] == "ok" and st["docs"] == 39
    base = spark.read.parquet(src)
    assert base.where(F.col("doc_id") == a).count() == 0
    base_b = base.where(F.col("doc_id") == b).first()
    assert all(s["text"] == s["text"].upper() for s in base_b["spans"] if s["text"] is not None)


def test_edits_stream_applies_batches_exactly_once(spark, tmp_path):
    """Streaming edit ingestion: queued edit files apply through the
    durable path in arrival order; a restarted stream with the same
    checkpoint reprocesses nothing; newly arriving edits are picked up
    incrementally."""
    from ocr_spark.streaming.pipeline import run_edits_stream

    src = os.path.join(tmp_path, "docs.parquet")
    out = os.path.join(tmp_path, "out")
    man = os.path.join(tmp_path, "man")
    edits_dir = os.path.join(tmp_path, "edits_in")
    ckpt = os.path.join(tmp_path, "ckpt")
    datagen.generate_to_path(src, n_docs=40, seed=49, scramble=True)
    run_extraction(spark, src, out, man, run_id="base", n_buckets=2)

    docs = spark.read.parquet(src)
    a, b, c = [
        r["doc_id"]
        for r in docs.select("doc_id").orderBy("doc_id").limit(3).collect()
    ]

    def edit_file(doc_id, fn):
        (
            docs.where(F.col("doc_id") == doc_id)
            .select(
                "doc_id",
                F.expr(
                    f"transform(spans, s -> struct(s.kind as kind, "
                    f"{fn}(s.text) as text, s.media_ref as media_ref, "
                    f"s.offset as offset))"
                ).alias("spans"),
                "meta",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(edits_dir)
        )

    edit_file(a, "upper")
    edit_file(b, "upper")
    run_edits_stream(spark, edits_dir, src, out, man, ckpt, n_buckets=2)

    t = spark.read.parquet(out)
    for d in (a, b):
        txt = t.where(F.col("doc_id") == d).first()["doc_text"]
        assert txt == txt.upper() and txt.strip()
    m = spark.read.parquet(man)
    n_stream_rows = m.where(F.col("run_id").startswith("stream-edit-")).count()
    assert n_stream_rows >= 1

    # restart with the same checkpoint: backlog already processed → the
    # manifest gains no new stream-edit commits
    run_edits_stream(spark, edits_dir, src, out, man, ckpt, n_buckets=2)
    m2 = spark.read.parquet(man)
    assert (
        m2.where(F.col("run_id").startswith("stream-edit-")).count()
        == n_stream_rows
    )

    # a new edit arrives → only it is processed
    edit_file(c, "lower")
    run_edits_stream(spark, edits_dir, src, out, man, ckpt, n_buckets=2)
    t3 = spark.read.parquet(out)
    tc = t3.where(F.col("doc_id") == c).first()["doc_text"]
    assert tc == tc.lower()
    ta = t3.where(F.col("doc_id") == a).first()["doc_text"]
    assert ta == ta.upper()  # earlier edit intact


def test_read_documents_as_of_travels_the_overlay(spark, tmp_path):
    """Snapshot-read analog: as_of_seq replays the seam at any earlier
    overlay commit — v0 (base), v1 (first edit), v2 (delete) are all
    reconstructible until compaction folds the history away."""
    from ocr_spark.jobs.edits import delete_documents
    from ocr_spark.jobs.extract_job import (
        overlay_versions, read_documents,
    )

    src = os.path.join(tmp_path, "docs.parquet")
    datagen.generate_to_path(src, n_docs=12, seed=50, scramble=True)
    docs = spark.read.parquet(src)
    a = docs.select("doc_id").orderBy("doc_id").first()["doc_id"]

    def first_text(df):
        r = df.where(F.col("doc_id") == a).first()
        if r is None:
            return None
        return next(s["text"] for s in r["spans"] if s["text"] is not None)

    v0_text = first_text(docs)
    from ocr_spark.jobs.edits import append_edits

    upd = docs.where(F.col("doc_id") == a).select(
        "doc_id",
        F.expr(
            "transform(spans, s -> struct(s.kind as kind, "
            "upper(s.text) as text, s.media_ref as media_ref, "
            "s.offset as offset))"
        ).alias("spans"),
        "meta",
    )
    append_edits(upd, src)
    delete_documents(spark, docs.where(F.col("doc_id") == a), src)

    vers = [r["edit_seq"] for r in overlay_versions(spark, src).collect()]
    assert len(vers) == 2 and vers == sorted(vers)
    seq_edit, seq_del = vers

    assert first_text(read_documents(spark, src, as_of_seq=seq_edit - 1)) == v0_text
    assert first_text(read_documents(spark, src, as_of_seq=seq_edit)) == v0_text.upper()
    assert first_text(read_documents(spark, src, as_of_seq=seq_del)) is None
    assert first_text(read_documents(spark, src)) is None  # latest = deleted

    # version listing carries the delete marker
    rows = overlay_versions(spark, src).collect()
    assert rows[0]["n_deletes"] == 0 and rows[1]["n_deletes"] == 1


def test_overlay_snapshot_ignores_inflight_writes(spark, tmp_path):
    """overlay_data_files must list only committed top-level data files:
    an in-flight append's _temporary subtree (and stray non-parquet
    files) are invisible — this is what makes compaction's
    snapshot-then-delete safe against concurrent edits."""
    from ocr_spark.jobs.edits import append_edits
    from ocr_spark.jobs.extract_job import overlay_data_files

    src = os.path.join(tmp_path, "docs.parquet")
    datagen.generate_to_path(src, n_docs=10, seed=52, scramble=True)
    docs = spark.read.parquet(src)
    append_edits(docs.limit(1), src)

    ov = src + "_edits"
    before = set(overlay_data_files(spark, src))
    assert before and all(f.endswith(".parquet") for f in before)
    # simulate an in-flight concurrent append + a marker file
    tmp = os.path.join(ov, "_temporary", "0", "task_1")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-inflight.parquet"), "w") as f:
        f.write("not yet committed")
    assert set(overlay_data_files(spark, src)) == before


def test_delete_wins_despite_clock_skew(spark, tmp_path, monkeypatch):
    """The edit_seq floor (existing max + 1): a tombstone written by a
    driver whose wall clock LAGS the edit driver's must still order
    after the edit — otherwise the durable delete silently never takes
    effect."""
    from ocr_spark.jobs import edits as edits_mod
    from ocr_spark.jobs.extract_job import read_documents

    src = os.path.join(tmp_path, "docs.parquet")
    datagen.generate_to_path(src, n_docs=10, seed=53, scramble=True)
    docs = spark.read.parquet(src)
    a = docs.select("doc_id").orderBy("doc_id").first()["doc_id"]

    edits_mod.append_edits(docs.where(F.col("doc_id") == a), src)

    # the deleting driver's clock is 1 hour behind
    import time as _time

    real = _time.time_ns()
    monkeypatch.setattr(
        edits_mod.time, "time_ns", lambda: real - 3_600_000_000_000
    )
    edits_mod.delete_documents(spark, docs.where(F.col("doc_id") == a), src)
    assert (
        read_documents(spark, src).where(F.col("doc_id") == a).count() == 0
    ), "skewed-clock tombstone lost latest-wins"


def test_append_edits_rejects_same_doc_twice_in_one_batch(spark, tmp_path):
    """A batch is unordered — two edits of one doc in a single batch
    have no defined winner, so the write must fail loudly instead of
    durably keeping an arbitrary row."""
    from ocr_spark.jobs.edits import append_edits

    src = os.path.join(tmp_path, "docs.parquet")
    datagen.generate_to_path(src, n_docs=10, seed=56, scramble=True)
    docs = spark.read.parquet(src)
    a = docs.select("doc_id").orderBy("doc_id").first()["doc_id"]
    doubled = docs.where(F.col("doc_id") == a).unionAll(
        docs.where(F.col("doc_id") == a)
    )
    with pytest.raises(ValueError, match="multiple rows"):
        append_edits(doubled, src)
    assert not os.path.exists(src + "_edits")  # nothing was written
