"""Small-files compaction planning — the table-maintenance job behind
Iceberg ``rewrite_data_files`` / Delta ``OPTIMIZE`` bin-packing.

The small-files problem is THE chronic operational failure mode of a
10^12-document table: streaming ingest and per-batch dynamic overwrites
(streaming/pipeline.py, jobs/edits.py) each land many sub-target parquet
files; scans then pay per-file open/footer costs and the driver pays
per-file planning memory.  The fix is periodic compaction: group small
files into ~target-sized rewrite jobs, partition-local so rewrites never
shuffle data across partition dirs.

Planning rule (deterministic, engine/partitioning/run-invariant — the
requirement that rules out first-fit-decreasing's stateful bin search):
within each partition dir, files smaller than the target are ordered
``(bytes desc, path)`` (FFD's ordering), prefix-summed, and binned by
``job = cum_before div target`` — the ``corpus_mix`` crossing-kept
semantics: a job ends with the file that crosses the target, so every
job but the dir's last is ≥ target.  Files already ≥ target keep
``job = -1`` (left alone), and a would-be singleton job is demoted to
``-1`` too: rewriting one file buys nothing.

Scale shape: two shuffles — the per-dir order window (partition dirs are
many and file counts per dir bounded, the opposite of skew) and the
(dir, job) stats window; manifests are file-count-sized inputs (millions
of rows at 10^12 docs), trivially in-memory per partition.

Reference tie-in: the reference tracks per-file sizes for display
(server/src/utils/file.py ``size`` rollups) but has no maintenance
planner; this is beyond-reference scope (SURVEY.md training-pipeline
additions) paired with the zorder layout module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    dir_col: str = "dir",
    path_col: str = "path",
    size_col: str = "bytes",
) -> DataFrame:
    """File manifest → per-file rewrite-job assignment.

    Output: ``dir, path, bytes, job bigint, job_files bigint,
    job_bytes bigint`` — ``job = -1`` means "leave the file as-is"
    (already ≥ target, or a singleton group not worth rewriting); for
    kept jobs, ``job_files``/``job_bytes`` describe the whole job on
    every member row (the manifest a rewrite executor consumes).
    """
    f = files.select(
        F.col(dir_col).alias("dir"),
        F.col(path_col).alias("path"),
        F.col(size_col).cast("bigint").alias("bytes"),
    )
    w = (
        Window.partitionBy("dir")
        .orderBy(F.desc("bytes"), F.asc("path"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small = (
        f.where(F.col("bytes") < F.lit(target_bytes))
        .withColumn("_cum", F.sum("bytes").over(w))
        .withColumn(
            "job",
            F.expr(f"(_cum - bytes) div {int(target_bytes)}").cast(
                "bigint"
            ),
        )
        .drop("_cum")
    )
    big = f.where(F.col("bytes") >= F.lit(target_bytes)).withColumn(
        "job", F.lit(-1).cast("bigint")
    )
    u = small.unionByName(big)
    wg = Window.partitionBy("dir", "job")
    staged = u.withColumn(
        "_n", F.count(F.lit(1)).over(wg)
    ).withColumn("_jb", F.sum("bytes").over(wg))
    kept = (F.col("job") >= 0) & (F.col("_n") > 1)
    return staged.select(
        "dir",
        "path",
        "bytes",
        F.when(kept, F.col("job")).otherwise(F.lit(-1)).cast("bigint").alias("job"),
        F.when(kept, F.col("_n")).otherwise(F.lit(1)).cast("bigint").alias("job_files"),
        F.when(kept, F.col("_jb")).otherwise(F.col("bytes")).cast("bigint").alias("job_bytes"),
    )
