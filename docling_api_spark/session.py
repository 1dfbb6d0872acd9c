"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` threads; the same configuration
carries to a real cluster (AQE, Arrow batching, UTC timezone are
cluster-size independent — shuffle partition count is the one knob that
scales with executor count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One Arrow batch ≈ this many rows flows through every pandas UDF.
# 4096 rows × 64 KB worst-case payload ≈ 256 MB absolute-worst batch
# (typical ≈ 8 MB); halves the Python<->JVM roundtrips vs 2048 while
# staying far under executor memory with 32 concurrent tasks.
ARROW_BATCH_ROWS = 4096


def get_spark(
    app_name: str = "docling_api_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so tests and bench agree with the driver harness.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; "local[*]" → os cpu count
        inner = master.split("[")[-1].rstrip("]") if "[" in master else str(cpus)
        shuffle_partitions = os.cpu_count() or 8 if inner == "*" else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
