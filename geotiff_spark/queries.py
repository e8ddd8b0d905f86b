"""Query registry: name → (spark_fn, oracle_sql | None).

Every operator claimed in SURVEY.md §2 gets an entry here; the driver runs
the Spark side at sf=0.01 and the oracle in DuckDB and compares row count +
schema + order-insensitive value hash. Column names are aligned on both
sides (aliases everywhere).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotiff_spark import oracle, pipeline
from geotiff_spark.operators import extract as ex

Registry = dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Spatial operators (the engine's reason to exist)
# --------------------------------------------------------------------------

def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo documents → cell id at res 7 (tile assignment)."""
    return (
        pipeline.geo_documents_with_cell(spark, sf_dir, res=7)
        .select("doc_id", "cell")
    )


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-in-polygon join (broadcast cell index + refine)."""
    return pipeline.doc_pip_join(spark, sf_dir, res=7).select("doc_id", "poly_id")


def q_pip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        pipeline.doc_pip_join(spark, sf_dir, res=7)
        .groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster zonal stats (no SQL oracle: raster decode not expressible;
    driver records rows-only check)."""
    return pipeline.flagship(spark, sf_dir, res=7)


def spatial_queries() -> Registry:
    return {
        "cell_assign": (q_cell_assign, oracle.cell_sql(7)),
        "pip_join": (q_pip_join, oracle.pip_join_sql()),
        "pip_counts": (q_pip_counts, oracle.pip_counts_sql()),
        "zonal_stats": (q_zonal_stats, None),
    }


# --------------------------------------------------------------------------
# Assemble
# --------------------------------------------------------------------------

def registry() -> Registry:
    reg: Registry = {}
    reg.update(spatial_queries())
    from geotiff_spark.queries_relational import relational_queries

    reg.update(relational_queries())
    from geotiff_spark.queries_textdata import textdata_queries

    reg.update(textdata_queries())
    return reg
