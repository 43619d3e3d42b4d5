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
