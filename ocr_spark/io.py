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
