"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  dot product stays JVM-side (zip_with + aggregate: whole-stage codegen,
  no Python). Queries are broadcast; the corpus is never shuffled.
- lsh_topk: the scale path — random-hyperplane (sign) LSH buckets shrink
  the candidate set; exact re-rank inside buckets. Recall < 1 by design;
  probe multiple hash tables to trade cost for recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (cosine, self excluded).

    Broadcast the (small) query side against the corpus — at 100 TB the
    corpus scan is embarrassingly parallel, one shuffle for the per-query
    top-k (and that aggregates only k rows per partition thanks to the
    window's partial TakeOrdered behavior under AQE).
    """
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qvec")
    )
    c = corpus.select(F.col(key).alias("nn_id"), F.col(vec).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nn_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank")
    )


def bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int = 1337):
    """Sign-LSH buckets for all tables in one Arrow-batched pandas UDF:
    one (dim x n_planes*n_tables) seeded-Gaussian matmul per batch.
    Deterministic (fixed seed), no stored model — returns the per-table
    bucket array for one explode + equi-join."""
    planes = (
        np.random.default_rng(seed)
        .standard_normal((dim, n_planes * n_tables))
        .astype(np.float64)
    )
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(vec: pd.Series) -> pd.Series:
        mat = np.vstack(vec.to_numpy())
        signs = (mat.astype(np.float64) @ planes) > 0
        signs = signs.reshape(len(mat), n_tables, n_planes)
        b = (signs * weights).sum(axis=2)
        # table t gets its own bucket id space
        b = b + (np.arange(n_tables, dtype=np.int64) << n_planes)
        return pd.Series(list(b))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = union over hash tables of same-bucket
    vectors (one explode + equi-join), exact cosine re-rank on candidates
    only. Recall tunes via (n_planes, n_tables)."""
    bu = bucket_udf(dim, n_planes, n_tables)
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qvec"),
        F.explode(bu(F.col(vec))).alias("bucket"),
    )
    c = corpus.select(
        F.col(key).alias("nn_id"), F.col(vec).alias("cvec"),
        F.explode(bu(F.col(vec))).alias("bucket"),
    )
    cand = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("nn_id") != F.col("query_id"))
        .select("query_id", "qvec", "nn_id", "cvec")
        .distinct()
    )
    scored = cand.withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank")
    )
