"""SparkSession construction tuned for the CLK pipeline.

Local-mode defaults mirror what we'd set on a real cluster via
``spark-submit --conf``; everything is parametric so the same code runs at
N and 4N executors unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

# Arrow batches of ~10k rows keep encode UDF memory bounded
# (~10k rows x 128 B CLK + masks ≈ tens of MB per task).
DEFAULT_ARROW_BATCH = 10_000


def build_session(
    app_name: str = "clkhash-spark",
    cores: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    """Build a local SparkSession; on a cluster, spark-submit confs win."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x task slots keeps all cores busy without tiny-partition
        # overhead at local scale; AQE coalesces further at runtime.
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(DEFAULT_ARROW_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for key, value in extra_conf.items():
            builder = builder.config(key, str(value))
    return builder.getOrCreate()
