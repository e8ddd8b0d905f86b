"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  dot product stays JVM-side (zip_with + aggregate: whole-stage codegen,
  no Python). Queries are broadcast; the corpus is never shuffled.
- lsh_topk: the scale path — random-hyperplane (sign) LSH buckets shrink
  the candidate set; exact re-rank inside buckets. Recall < 1 by design;
  probe multiple hash tables to trade cost for recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
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


def hyperplane_bucket(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    """Sign-LSH bucket id: bit i = sign(dot(vec, h_i)) with deterministic
    pseudo-random hyperplanes h_i[j] = sin(seed + i*dim + j) (fixed,
    reproducible, no stored model)."""
    def plane_term(plane: int):
        offset = float(seed + plane * dim)
        return lambda x, j: x.cast("double") * F.sin(
            F.lit(offset) + j.cast("double")
        )

    bucket = F.lit(0)
    for i in range(n_planes):
        dot = F.aggregate(
            F.transform(vec, plane_term(i)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = union over hash tables of same-bucket
    vectors, exact cosine re-rank on candidates only."""
    q = queries.select(F.col(key).alias("query_id"), F.col(vec).alias("qvec"))
    c = corpus.select(F.col(key).alias("nn_id"), F.col(vec).alias("cvec"))

    cand = None
    for t in range(n_tables):
        qb = q.withColumn("bucket", hyperplane_bucket(F.col("qvec"), dim, n_planes, seed=97 + t * 131))
        cb = c.withColumn("bucket", hyperplane_bucket(F.col("cvec"), dim, n_planes, seed=97 + t * 131))
        pairs = cb.join(F.broadcast(qb), "bucket").filter(
            F.col("nn_id") != F.col("query_id")
        ).select("query_id", "qvec", "nn_id", "cvec")
        cand = pairs if cand is None else cand.unionByName(pairs)

    scored = cand.distinct().withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nn_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank")
    )
