"""SparkSession factory with scale-oriented defaults.

Design notes for the 1000-executor / 100 TB target (SURVEY.md §4):

* AQE on, with skew-join splitting and partition coalescing — mega-documents
  (the 0.1% skew tail, FIXTURES.md §1) produce skewed shuffle partitions that
  AQE re-splits at runtime.
* Arrow batches capped (``maxRecordsPerBatch``) because one row = one
  document and documents are fat (a mega-doc row holds up to 200k spans);
  unbounded batches would blow executor memory in the Python worker.
* ``spark.sql.shuffle.partitions`` is a *local* default; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant as long as it is
  high enough (set ≥ 2–3× total cores there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Cap on rows per Arrow batch handed to Python kernels.  Documents are fat
# rows (avg ~45 spans, mega-docs up to 200k spans); 512 docs/batch keeps the
# worst-case batch under ~100 MB while still amortizing kernel setup
# (the batching moral of reference server/src/engines/ocr_tesserocr.py:102-124:
# one engine init per batch, many items per init).
ARROW_MAX_RECORDS_PER_BATCH = 512


def get_spark(
    app_name: str = "ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry points serve tests, the driver harness, and bench runs at
    two parallelism levels (the N vs 4N scaling protocol in BASELINE.md).
    """
    if master is None:
        # spark-submit --master must win: setting .master() in code would
        # silently override the cluster manager the job was submitted to.
        from pyspark import SparkConf

        master = SparkConf().get("spark.master", None)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match total core count so one shuffle wave, no tiny
        # tasks.  local[N] → N; local-cluster[E,C,mem] → E*C; any other
        # cluster manager → a generic default (set explicitly on a real
        # cluster: ≥ 2-3× total cores; AQE coalescing absorbs the rest).
        spec = master.split("[")[-1].rstrip("]")
        parts = spec.split(",")
        try:
            if master.startswith("local-cluster"):
                shuffle_partitions = max(int(parts[0]) * int(parts[1]), 8)
            elif spec in ("*", ""):
                shuffle_partitions = 32
            else:
                shuffle_partitions = max(int(spec), 8)
        except ValueError:
            shuffle_partitions = 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        # Fat-row tables make scans COMPUTE-bound (the Arrow kernel costs
        # ~1ms/doc), so the default 128m split starves parallelism: 128 MB
        # of spans ≈ minutes of kernel work in one task.  16m splits keep
        # every core busy and bound straggler size; at real cluster scale
        # the table is many files anyway and AQE coalescing absorbs any
        # over-split on the shuffle side.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1048576")
        # The vectorized parquet reader pre-sizes column vectors for 4096
        # rows per batch by default; with fat rows (a mega-doc's spans
        # array is 10-30 MB) one reader batch can demand gigabytes of
        # contiguous vector memory and OOM a right-sized executor
        # (observed: "Cannot reserve additional contiguous bytes" on 4 GB
        # executors in local-cluster mode).  512-row reader batches bound
        # that at worst-case ~1 GB while costing nothing measurable on
        # thin tables — the same fat-row cap philosophy as
        # ARROW_MAX_RECORDS_PER_BATCH.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.ui.enabled", "false")
        # session-catalog tables (io.write_bucketed) land under /tmp, never
        # the repo working directory
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR", "/tmp/ocr_spark_warehouse"
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Mega-document rows are 10–30 MB — humongous objects under G1's
        # default region size, and Arrow/parquet JNI critical sections then
        # trigger GCLocker allocation stalls at high task concurrency
        # (observed: "Retried waiting for GCLocker too often" + 4x
        # throughput collapse at 32 threads).  32 MB regions keep mega-doc
        # rows out of the humongous path.
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        .config("spark.executor.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
    )
    if master.startswith("local-cluster"):
        # local-cluster executors spawn fresh Python workers that do NOT
        # inherit the driver's sys.path (unlike local[N], which forks the
        # driver env) — without this, every kernel closure referencing the
        # package dies with ModuleNotFoundError on deserialization.  On a
        # real cluster --py-files serves this purpose; for the in-process
        # local-cluster benches, ship the package directory via PYTHONPATH.
        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        existing = os.environ.get("PYTHONPATH", "")
        pypath = f"{pkg_parent}:{existing}" if existing else pkg_parent
        b = b.config("spark.executorEnv.PYTHONPATH", pypath)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
