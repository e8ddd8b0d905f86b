"""Point-in-polygon spatial join: broadcast cell-index equi-join + exact
ray-casting refinement on boundary cells only.

Plan shape (scale rationale, SURVEY.md §4):

    pages(+cell) ⋈broadcast cell_index(cell, poly_id, is_boundary)
        → interior hits pass through untouched (no Python)
        → boundary hits run the exact PIP pandas UDF (Arrow batches)

The equi-join on `cell` is the coarse prefilter (reference analog: R-tree
envelope search, /root/reference/src/coordinate_transform/tie_points.rs:188-192);
ray casting is the exact test (analog of Face::contains half-plane tests,
:205-229). The polygon index is a small dim → always broadcast: no shuffle
of the 10^12-row pages side, and AQE skew handling is irrelevant because
the big side never moves. Exactness: interior cells are proven inside at
index build time, so skipping the UDF there cannot change results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from geotiff_spark.functions import pip as pipmod
from geotiff_spark.sources import polygons as polysrc


def _polygon_lookup() -> dict[str, tuple[np.ndarray, list[np.ndarray]]]:
    return {
        p["poly_id"]: (np.asarray(p["ring"], dtype=np.float64),
                       [np.asarray(h, dtype=np.float64) for h in p["holes"]])
        for p in polysrc.synth_polygons()
    }


def pip_refine_udf(spark: SparkSession):
    """Exact PIP test as a vectorized pandas UDF over (poly_id, lon, lat).

    Polygon geometry rides a SparkContext broadcast — one copy per worker,
    not per task (at scale the polygon set is MBs, the pages are TBs).
    """
    bc = spark.sparkContext.broadcast(_polygon_lookup())

    @pandas_udf("boolean")
    def inside(poly_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        polys = bc.value
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        out = np.zeros(len(px), dtype=bool)
        # group by polygon: one vectorized ray-cast per polygon per batch
        pids = poly_id.to_numpy()
        for pid in pd.unique(pids):
            mask = pids == pid
            ring, holes = polys[pid]
            out[mask] = pipmod.points_in_polygon(px[mask], py[mask], ring, holes)
        return pd.Series(out)

    return inside


def pip_join(
    spark: SparkSession,
    pages_with_cell: DataFrame,
    res: int,
    how: str = "inner",
) -> DataFrame:
    """pages (with `cell`, `lat`, `lon`) ⋈ polygons → + poly_id.

    Returns one row per (page, containing polygon). Interior-cell hits skip
    the exact test; boundary-cell hits are refined. Pages without geotag
    (cell NULL) are dropped on inner, kept with NULL poly_id on left.
    """
    index = F.broadcast(polysrc.polygon_cell_index(spark, res))
    refine = pip_refine_udf(spark)

    joined = pages_with_cell.join(index, "cell", "inner")
    exact = joined.withColumn(
        "_inside",
        F.when(~F.col("is_boundary"), F.lit(True)).otherwise(
            refine(F.col("poly_id"), F.col("lon"), F.col("lat"))
        ),
    ).filter(F.col("_inside")).drop("_inside", "is_boundary")

    if how == "inner":
        return exact
    if how == "left":
        hits = exact.select("url", "poly_id")
        return pages_with_cell.join(hits, "url", "left")
    raise ValueError(f"unsupported how={how}")
