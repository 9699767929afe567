"""SparkSession builder with the engine's required settings.

- Arrow on (all Python boundaries are vectorized; per-row Python UDFs are
  banned by BASELINE.json:15 and linted in tests).
- AQE on (runtime coalescing + skew-join handling).
- session timezone pinned to UTC so results hash-match the DuckDB oracle
  (duckdb parquet timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "inverted-index-engine",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(8, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # zstd shuffle/spill compression: the salted-merge shuffle moves
        # ~16 B/posting of monotone int arrays — zstd roughly halves the
        # bytes hitting disk vs lz4, which is the binding constraint for
        # multi-GB shuffles on shared/virtualized disks
        .config("spark.io.compression.codec", "zstd")
        # RocksDB state store: the production provider for large streaming
        # state (spills to disk, incremental checkpoints); also required by
        # the Spark 4 transformWithStateInPandas surface
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    )
    return builder.getOrCreate()
