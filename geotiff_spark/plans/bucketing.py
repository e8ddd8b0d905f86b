"""Bucketed co-located joins: pre-shuffle once at write time, join with
zero exchanges forever after (SURVEY.md §4 — the cell-bucketed raster⋈pages
strategy once the raster corpus outgrows broadcast).

`bucketBy` tables live in the session catalog (warehouse dir); both sides
bucketed on the join key with the same bucket count join without any
Exchange in the plan (asserted in tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — co-located, no shuffle."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def plan_has_exchange(df: DataFrame) -> bool:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    return "Exchange" in buf.getvalue()
