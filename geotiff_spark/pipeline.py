"""Flagship pipeline: geo-documents → cell encode → PIP join → raster
sample → zonal stats.

The driver's testdata has no geotagged pages, so documents are enriched
with DETERMINISTIC lat/lon derived from doc_id by plain integer arithmetic
— the same expression is reproducible in any ANSI-SQL engine (DuckDB
oracle), keeping the whole spatial path inside the driver's correctness
gate:

    lat = 36 + ((doc_id * 2654435761) % 220000) / 10000.0   -- [36, 58)
    lon = -10 + ((doc_id * 40503 + 7) % 400000) / 10000.0   -- [-10, 30)

(a Europe-sized box, where the polygon set lives)

Both stay JVM-side in Spark (no UDF) and bit-match DuckDB since they're
exact int64 ops followed by one IEEE division.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from geotiff_spark.operators import extract as ex
from geotiff_spark.operators import sample as smp
from geotiff_spark.operators import spatial_join as sj

DEFAULT_RES = 7

AUSTRIAN_RASTER = (
    "/root/reference/resources/"
    "austrian_capitals_model_tie_point_and_pixel_scale_pixel_is_area.tif"
)


def load_table(spark: SparkSession, sf_dir: str, name: str,
               parallel: bool = True) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if parallel and name == "documents":
        # single-row-group source → 1-partition scan → every pandas-UDF
        # stage of the spatial pipeline (PIP refine, LAEA projection,
        # raster gather) would run on one core (guide §2.5); no-op when
        # the scan already has parallelism. parallel=False opts a
        # JVM-light caller (one cheap expression + an aggregation that
        # shuffles anyway) out of the extra exchange.
        from geotiff_spark.plans.partitioning import ensure_map_parallelism

        df = ensure_map_parallelism(df)
    return df


def geo_documents_light(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_documents without the degenerate-scan fan-out — for
    JVM-codegen-only consumers (cell assign/compact) where the per-row
    work is a handful of integer ops and the downstream aggregation
    reshuffles anyway, so the fan-out exchange is pure overhead."""
    docs = load_table(spark, sf_dir, "documents", parallel=False)
    return _with_latlon(docs)


def _with_latlon(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "lat",
        F.lit(36.0) + ((F.col("doc_id") * F.lit(2654435761)) % F.lit(220000)) / F.lit(10000.0),
    ).withColumn(
        "lon",
        F.lit(-10.0) + ((F.col("doc_id") * F.lit(40503) + F.lit(7)) % F.lit(400000)) / F.lit(10000.0),
    )


def geo_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic (lat, lon) — pure JVM expressions."""
    return _with_latlon(load_table(spark, sf_dir, "documents"))


def geo_documents_with_cell(spark: SparkSession, sf_dir: str, res: int = DEFAULT_RES) -> DataFrame:
    return ex.with_cell(geo_documents(spark, sf_dir), res)


def doc_pip_join(spark: SparkSession, sf_dir: str, res: int = DEFAULT_RES) -> DataFrame:
    """Documents ⋈ admin polygons (broadcast cell index + exact refine)."""
    docs = geo_documents_with_cell(spark, sf_dir, res)
    return sj.pip_join(spark, docs, res)


def laea_udf():
    """EPSG:4326 → EPSG:3035 forward as a vectorized pandas UDF."""
    from geotiff_spark.functions.proj import laea_forward

    @pandas_udf("struct<x:double,y:double>")
    def project(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = laea_forward(lon.to_numpy(float), lat.to_numpy(float))
        return pd.DataFrame({"x": x, "y": y})

    return project


def flagship_sampled(
    spark: SparkSession, sf_dir: str, res: int = DEFAULT_RES,
    sample_mode: str = "auto",
) -> DataFrame:
    """The flagship pipeline up to the per-document sampled value:
    geo documents → PIP join → project to EPSG:3035 → sample the
    austrian coverage raster. Shared by zonal_stats and zonal_mode.
    sample_mode passes through to with_raster_sample ('auto' broadcasts
    here — the corpus is tiny; 'copartition' forces the large-corpus
    branch, driver-gated by zonal_stats_copart)."""
    hits = doc_pip_join(spark, sf_dir, res)
    proj = laea_udf()
    hits = hits.withColumn("xy", proj(F.col("lon"), F.col("lat")))
    return smp.with_raster_sample(
        hits.withColumn("x", F.col("xy.x")).withColumn("y", F.col("xy.y")),
        spark,
        [AUSTRIAN_RASTER],
        AUSTRIAN_RASTER.rsplit("/", 1)[-1],
        mode=sample_mode,
    )


def flagship(spark: SparkSession, sf_dir: str, res: int = DEFAULT_RES) -> DataFrame:
    """End-to-end: geo documents → PIP join → project to EPSG:3035 →
    sample the austrian coverage raster → zonal stats per polygon.

    Single shuffle (the final groupBy); the joins are broadcast; every
    kernel is an Arrow-batched pandas UDF.
    """
    return (
        smp.zonal_stats(flagship_sampled(spark, sf_dir, res))
        .withColumnRenamed("n_points", "n_docs")
        .orderBy("poly_id")
    )
