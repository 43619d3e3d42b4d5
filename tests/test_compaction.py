"""compaction_plan (jobs/compaction.py): deterministic bin semantics —
crossing-kept job sizes, over-target files left alone, singleton-job
demotion, partition-dir isolation, repartition invariance.

The cross-engine gate is the driver parity harness (``compaction_plan``
twin); these tests pin the semantics.
"""

from __future__ import annotations

from ocr_spark.jobs.compaction import compaction_plan

MB = 1024 * 1024


def _plan(spark, rows, target=8 * MB):
    df = spark.createDataFrame(rows, "dir string, path string, bytes bigint")
    return {
        r.path: (r.job, r.job_files, r.job_bytes)
        for r in compaction_plan(df, target).collect()
    }


def test_jobs_reach_target_and_big_files_kept(spark):
    rows = [("d", f"f{i}", 3 * MB) for i in range(6)]  # 18 MB of smalls
    rows.append(("d", "big", 32 * MB))
    got = _plan(spark, rows)
    assert got["big"] == (-1, 1, 32 * MB)
    jobs = {}
    for p, (j, n, jb) in got.items():
        if p != "big":
            jobs.setdefault(j, []).append(p)
    # 6 × 3 MB at 8 MB target: cum binning → job0 gets first 3 files
    # (crossing file kept), job1 the next 3.
    assert sorted(len(v) for v in jobs.values()) == [3, 3]
    for j, members in jobs.items():
        jb = {got[p][2] for p in members}
        assert jb == {3 * MB * len(members)}


def test_singleton_job_demoted(spark):
    # One small file in a dir → its would-be job has 1 member → as-is.
    got = _plan(spark, [("d", "lone", 1 * MB)])
    assert got["lone"] == (-1, 1, 1 * MB)


def test_partition_dirs_isolated(spark):
    rows = [("a", "a1", 3 * MB), ("a", "a2", 3 * MB),
            ("b", "b1", 3 * MB), ("b", "b2", 3 * MB)]
    got = _plan(spark, rows)
    # Each dir forms its own job 0; files never cross dirs.
    assert got["a1"][0] == got["a2"][0] == 0
    assert got["b1"][0] == got["b2"][0] == 0
    assert got["a1"][2] == 6 * MB and got["b1"][2] == 6 * MB


def test_repartition_invariance(spark):
    rows = [("d", f"f{i}", (i * 997 % 500 + 1) * 1024) for i in range(200)]
    df = spark.createDataFrame(rows, "dir string, path string, bytes bigint")
    one = {
        r.path: (r.job, r.job_files, r.job_bytes)
        for r in compaction_plan(df.coalesce(1), 2 * MB).collect()
    }
    many = {
        r.path: (r.job, r.job_files, r.job_bytes)
        for r in compaction_plan(df.repartition(7), 2 * MB).collect()
    }
    assert one == many
