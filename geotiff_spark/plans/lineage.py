"""Per-partition lineage + row-count metrics (north rule).

`instrument(df, stage)` wraps a DataFrame in a zero-copy mapInPandas pass
that counts rows per physical partition; metrics flow back through a Spark
accumulator (survives speculative re-execution by keying on partition id
and keeping the max) and `flush(path)` persists them as parquet — the
lineage side-table for checkpoint-resumable reruns.

The wrapper costs one iterator pass, no data copies, no extra shuffle.
"""

from __future__ import annotations

import json
import os
import time

from pyspark import AccumulatorParam, TaskContext
from pyspark.sql import DataFrame, SparkSession


class _DictMaxParam(AccumulatorParam):
    """Accumulate {key: rows}; re-executed tasks overwrite, not add."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = max(a.get(k, 0), v)
        return a


class StageMetrics:
    """Collects (stage, partition_id) → row counts across jobs."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.acc = spark.sparkContext.accumulator({}, _DictMaxParam())
        self.started = time.time()

    def instrument(self, df: DataFrame, stage: str) -> DataFrame:
        acc = self.acc

        def count_rows(batches):
            pid = TaskContext.get().partitionId()
            rows = 0
            for pdf in batches:
                rows += len(pdf)
                yield pdf
            acc.add({f"{stage}\x1f{pid}": rows})

        return df.mapInPandas(count_rows, schema=df.schema)

    def snapshot(self) -> list[dict]:
        out = []
        for key, rows in sorted(self.acc.value.items()):
            stage, pid = key.split("\x1f")
            out.append({"stage": stage, "partition_id": int(pid), "rows": rows})
        return out

    def flush(self, path: str) -> None:
        """Persist the lineage side-table (parquet + a json summary)."""
        rows = self.snapshot()
        os.makedirs(path, exist_ok=True)
        stamp = int(self.started)
        with open(f"{path}/metrics_{stamp}.json", "w") as fh:
            json.dump(rows, fh)
        if rows:
            self.spark.createDataFrame(rows).coalesce(1).write.mode(
                "append"
            ).parquet(f"{path}/parquet")
