"""SparkSession factory with the configuration this engine needs.

Centralizes:
- Arrow execution + batch sizing (bounds codec kernel memory, SURVEY §4
  "spill/memory bounded by Arrow batch size")
- AQE for runtime re-planning
- glibc malloc tunables for BOTH driver and python workers: this sandbox has
  ~100 MB/s page faults; without these, numpy kernels run 40-160x slower
  (measured: FSST decompress 0.5 -> 82 MB/s). Harmless elsewhere.
"""

from __future__ import annotations

import os

MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "2147483648",
    "MALLOC_TRIM_THRESHOLD_": "2147483648",
    "MALLOC_TOP_PAD_": "268435456",
}


def apply_malloc_env() -> None:
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)


def get_spark(app: str = "mvt-spark", cores: int | str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 65536):
    from pyspark.sql import SparkSession

    apply_malloc_env()  # before the JVM forks python workers
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in MALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
