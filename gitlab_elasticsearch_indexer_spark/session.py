"""SparkSession factory tuned for this engine.

Local-mode settings follow the scale design: AQE on (runtime skew/coalesce
re-planning), shuffle partitions ~ cores, Arrow enabled for every pandas
UDF kernel, UTC session timezone so results compare bit-for-bit with the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gitlab-es-indexer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # local[N] → N executor threads; size the shuffle to the parallelism.
    n_threads = cpus if "local" not in master else _local_threads(master, cpus)
    shuffle_partitions = shuffle_partitions or max(n_threads, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # skinny shuffle rows (posting entries) want big Arrow batches —
        # tiny batches made per-batch overhead dominate the pack stage;
        # kernels that expand rows slice their input internally
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _local_threads(master: str, default: int) -> int:
    # "local[8]" -> 8 ; "local[*]" -> default
    inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
    if inner.isdigit():
        return int(inner)
    return default
