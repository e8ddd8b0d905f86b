"""AQE skew-join splitting fires under the engine's session defaults —
the runtime complement to explicit hot-cell salting (plans/salting.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 95% of the left side lands on one key -> one giant partition
        a = (
            spark.range(0, 400_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 20 != 0, F.lit(1)).otherwise(F.col("id")),
            )
            .withColumn("pay", F.concat(F.lit("x" * 60), F.col("id").cast("string")))
        )
        b = (
            spark.range(0, 50_000)
            .withColumn("k", (F.col("id") % 30_000).cast("long"))
            .withColumn("pay2", F.concat(F.lit("y" * 60), F.col("id").cast("string")))
        )
        j = a.join(b, "k")
        rows = j.count()
        _ = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1, plan[:2000]
        assert rows == 762_500
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
