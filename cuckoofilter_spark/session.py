"""SparkSession factory with the configs this library is tuned for.

Local mode is for tests/bench only; the same settings are what we'd
ship in ``spark-submit --conf`` on a real cluster (see ``jobs/``).
Rationale per setting:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- Arrow on + a batch size large enough that the numpy hot loop
  amortizes the JVM<->Python hop (the only boundary that matters for
  sketch-build throughput, SURVEY.md §3.1).
- ``shuffle.partitions`` sized to cores in local mode; on a cluster
  this is set per-job to ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH = 65536


def get_spark(
    app: str = "cuckoofilter-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    return builder.getOrCreate()
