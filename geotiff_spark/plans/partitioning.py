"""Adaptive partitioning by cell prefix (north rule).

The cell token is a base-4 quadkey whose prefixes are valid coarser cells
(geotiff_spark.functions.cells). Partitioning output by a token prefix
gives spatial locality (co-located cells share files → partition pruning
on spatial predicates), but a FIXED prefix depth either under-splits hot
regions or over-splits empty ones. choose_prefix_depth measures the actual
histogram and picks the shallowest depth whose largest bucket fits the
target, deepening only where needed (hot prefixes get longer prefixes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_histogram(df: DataFrame, token: str, depth: int) -> DataFrame:
    return (
        df.groupBy(F.substring(F.col(token), 1, depth).alias("prefix"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def choose_prefix_depth(
    df: DataFrame,
    token: str,
    target_rows: int,
    max_depth: int = 12,
) -> int:
    """Shallowest depth whose largest prefix bucket ≤ target_rows."""
    for depth in range(1, max_depth + 1):
        biggest = (
            prefix_histogram(df, token, depth)
            .agg(F.max("n").alias("m"))
            .collect()[0]["m"]
        )
        if biggest is None or biggest <= target_rows:
            return depth
    return max_depth


def adaptive_prefix_column(
    df: DataFrame,
    token: str,
    target_rows: int,
    base_depth: int | None = None,
    max_depth: int = 12,
    out: str = "cell_prefix",
) -> DataFrame:
    """Variable-depth prefix: start at the shallowest uniform depth, then
    extend the prefix a further 2 levels for hot prefixes (> target_rows).
    Result: a partition key whose buckets are balanced against the
    measured distribution — hot cities split finer, oceans stay coarse.
    """
    depth = base_depth or choose_prefix_depth(df, token, target_rows * 4, max_depth)
    deep = min(depth + 2, max_depth)
    hist = prefix_histogram(df, token, depth)
    hot = [r["prefix"] for r in hist.filter(F.col("n") > target_rows).collect()]
    col = F.when(
        F.substring(F.col(token), 1, depth).isin(hot) if hot else F.lit(False),
        F.substring(F.col(token), 1, deep),
    ).otherwise(F.substring(F.col(token), 1, depth))
    return df.withColumn(out, col)


def repartition_by_prefix(
    df: DataFrame,
    token: str,
    target_rows: int,
    **kwargs,
) -> DataFrame:
    """Adaptive cell-prefix repartition: spatial locality with measured
    balance. Use before partitioned writes (`partitionBy(out)`) or
    co-located cell joins."""
    with_prefix = adaptive_prefix_column(df, token, target_rows, **kwargs)
    return with_prefix.repartition(F.col("cell_prefix"))
