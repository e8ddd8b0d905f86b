"""SparkSession builder with the engine's tuned defaults.

Scale posture (SURVEY.md §4): AQE on (incl. skew-join splitting), Arrow on
with large batches (all custom kernels are vectorized pandas UDFs), shuffle
partitions sized for the sandbox but overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    # broadcast the polygon cell index / raster dim tables aggressively
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    "spark.sql.session.timeZone": "UTC",
    # local mode: the driver JVM IS the executor — size it for 32
    # concurrent tasks streaming Arrow batches
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "geotiff_spark",
    master: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**DEFAULT_CONFIGS, **(extra or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
