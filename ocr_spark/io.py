"""Storage seam (SURVEY.md §7.1): the pipeline is storage-agnostic
DataFrames; this module is the only place that knows whether the table
layer is Iceberg or plain parquet.

The sandbox has no Iceberg runtime jar (offline), so ``parquet`` is the
default catalog and carries the same commit protocol via the manifest
table (jobs/extract_job.py): dynamic-partition-overwrite data writes +
manifest-row commit point ≈ Iceberg's snapshot commit, at bucket
granularity.  On a cluster with
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` the
``iceberg`` catalog switches writes to real table commits and the resume
anti-join reads snapshot metadata instead of the manifest parquet.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    bucket_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Catalyst-visible storage bucketing: ``bucketBy(n, key).sortBy(key)``
    into the session catalog.  A bucketed scan reports
    ``HashPartitioning(key, n)`` as its output partitioning, so joins and
    aggregations between co-bucketed tables (same key, same n) satisfy
    their distribution requirement AT THE SCAN — no Exchange at all
    (asserted in tests/test_plan_shapes.py).  This is the durable twin of
    the jobs' directory-bucket scheme: extract_job's ``bucket=`` dirs give
    the commit/resume granularity, while catalog bucketing gives Catalyst
    the co-location proof it needs to elide the shuffle — at 100 TB the
    difference is re-shuffling the fact table on every derived-table join
    vs never.

    Reference tie-in: the reference co-locates page↔layout by directory
    convention (J2, celery_app.py:1038-1046); this is that idea at table
    granularity."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


@dataclass(frozen=True)
class Catalog:
    """kind = 'parquet' | 'iceberg'; root = path prefix or catalog name."""

    kind: str = "parquet"
    root: str = ""

    def _check(self, spark: SparkSession) -> None:
        if self.kind == "iceberg":
            try:
                spark._jvm.java.lang.Class.forName(
                    "org.apache.iceberg.catalog.Catalog"
                )
            except Exception as exc:
                raise RuntimeError(
                    "iceberg catalog requested but no Iceberg runtime jar on "
                    "the classpath; add --packages org.apache.iceberg:"
                    "iceberg-spark-runtime or use kind='parquet'"
                ) from exc

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if self.kind == "iceberg":
            self._check(spark)
            return spark.read.table(f"{self.root}.{table}" if self.root else table)
        return spark.read.parquet(f"{self.root}/{table}" if self.root else table)

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: tuple[str, ...] = (),
    ) -> None:
        if self.kind == "iceberg":
            self._check(df.sparkSession)
            w = df.writeTo(f"{self.root}.{table}" if self.root else table)
            if mode == "append":
                w.append()
            else:
                w.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(f"{self.root}/{table}" if self.root else table)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout for data-skipping scans:
    ``repartitionByRange(sort_col)`` + ``sortWithinPartitions`` before the
    write, so every output file covers a DISJOINT range of ``sort_col``
    and every parquet row group inside it a near-disjoint sub-range.

    Why it matters at 100 TB: parquet files carry per-row-group min/max
    statistics, and Spark pushes comparison predicates into the reader —
    but statistics only *prune* when the layout clusters values.  On a
    randomly-laid-out table every row group spans ~the full value range
    and a selective ``ts BETWEEN …`` scan still reads everything; on a
    range-clustered table the same scan reads only the row groups whose
    [min,max] intersect the predicate — the I/O drops with selectivity.
    This is the single-column special case of Z-ordering (the multi-column
    interleave adds nothing for one sort key), i.e. the layout lever that
    turns the events/asof/range-join family from full scans into point
    reads.  The pruning contract is asserted in
    tests/test_plan_shapes.py::test_sorted_layout_skips_row_groups via the
    written files' row-group statistics plus the scan's PushedFilters.

    ``repartitionByRange`` samples the column to build balanced range
    bounds (one extra pass; at cluster scale use a known partitioning
    column or persist upstream).
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )
