"""Raster sampling join: model-space points gather pixel values from
broadcast decoded rasters.

Engine form of get_value_at (/root/reference/src/lib.rs:126-130): a million
lookups become one vectorized gather ``data[(floor(ry)*w + floor(rx))*spp +
s]`` per Arrow batch (SURVEY.md §1.3). Out-of-bounds → NULL (reference:
None). Rasters are decoded once and broadcast (small side); at larger
raster corpora the same kernel runs on a cell-bucketed co-partitioned join
instead — the kernel signature is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from geotiff_spark.functions import transforms as tf
from geotiff_spark.functions.geotiff import read_geotiff


def load_raster_records(paths: list[str]) -> dict[str, dict]:
    """Driver-side decode of a small raster set → broadcastable records.

    The array is kept as raw bytes + dtype/shape so the broadcast pickles
    compactly; rehydration on executors is a zero-copy np.frombuffer.
    """
    records = {}
    for p in paths:
        with open(p, "rb") as fh:
            rec = read_geotiff(fh.read())
        rid = p.rsplit("/", 1)[-1]
        records[rid] = {
            "width": rec["width"],
            "height": rec["height"],
            "num_samples": rec["num_samples"],
            "dtype": str(rec["array"].dtype),
            "transform": rec["transform"],
            "raster_type": rec["raster_type"],
            "extent": rec["extent"],
            "data": rec["array"].tobytes(),
        }
    return records


def sample_udf(
    spark: SparkSession,
    records: dict[str, dict],
    sample: int = 0,
    strict: bool = True,
):
    """pandas UDF (raster_id, x, y) → double value (NULL out-of-bounds).
    strict=False maps tie-points coverage holes to NULL instead of
    failing the task (bulk-sampling semantics)."""
    bc = spark.sparkContext.broadcast(records)

    @pandas_udf("double")
    def sample_value(raster_id: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        recs = bc.value
        xs = x.to_numpy(dtype=np.float64)
        ys = y.to_numpy(dtype=np.float64)
        out = np.full(len(xs), np.nan)
        rids = raster_id.to_numpy()
        for rid in pd.unique(rids):
            rec = recs.get(rid)
            if rec is None:
                continue
            mask = rids == rid
            flat = np.frombuffer(rec["data"], dtype=np.dtype(rec["dtype"]))
            kind, coeffs = rec["transform"]
            idx, valid = tf.sample_indices(
                kind, coeffs, rec["width"], rec["height"],
                rec["num_samples"], rec["raster_type"],
                xs[mask], ys[mask], sample, strict,
            )
            vals = flat[idx].astype(np.float64)
            vals[~valid] = np.nan
            out[mask] = vals
        return pd.Series(out)

    return sample_value


def with_raster_sample(
    df: DataFrame,
    spark: SparkSession,
    raster_paths: list[str],
    raster_id: str | Column,
    x: str = "x",
    y: str = "y",
    out: str = "value",
    sample: int = 0,
    strict: bool = True,
) -> DataFrame:
    """Attach a sampled raster value column. `raster_id` may be a literal
    (every row samples one raster) or a column (per-row raster routing)."""
    records = load_raster_records(raster_paths)
    udf = sample_udf(spark, records, sample, strict)
    rid_col = F.lit(raster_id) if isinstance(raster_id, str) else raster_id
    return df.withColumn(out, udf(rid_col, F.col(x), F.col(y)))


def sample_exact_udf(spark: SparkSession, records: dict[str, dict], sample: int = 0):
    """Exact-value variant: returns struct<dtype, int_val (decimal(20,0)),
    float_val> so u64 samples above 2^63 and i64 extremes survive without
    a float round trip (SURVEY.md §1.3 / hard part #4 — Spark has no
    unsigned types; DecimalType(20,0) holds the full u64 range).
    """
    bc = spark.sparkContext.broadcast(records)

    @pandas_udf("struct<dtype:string,int_val:decimal(20,0),float_val:double>")
    def sample_value(raster_id: pd.Series, x: pd.Series, y: pd.Series) -> pd.DataFrame:
        from decimal import Decimal

        recs = bc.value
        xs = x.to_numpy(dtype=np.float64)
        ys = y.to_numpy(dtype=np.float64)
        rids = raster_id.to_numpy()
        out_dtype = np.full(len(xs), None, dtype=object)
        out_int = np.full(len(xs), None, dtype=object)
        out_float = np.full(len(xs), np.nan)
        for rid in pd.unique(rids):
            rec = recs.get(rid)
            if rec is None:
                continue
            mask = rids == rid
            dt = np.dtype(rec["dtype"])
            flat = np.frombuffer(rec["data"], dtype=dt)
            kind, coeffs = rec["transform"]
            idx, valid = tf.sample_indices(
                kind, coeffs, rec["width"], rec["height"],
                rec["num_samples"], rec["raster_type"],
                xs[mask], ys[mask], sample,
            )
            vals = flat[idx]
            midx = np.nonzero(mask)[0]
            for j, (v, ok) in enumerate(zip(vals, valid)):
                if not ok:
                    continue
                i = midx[j]
                out_dtype[i] = dt.name
                if dt.kind in "ui":
                    out_int[i] = Decimal(int(v))
                    out_float[i] = float(v)
                else:
                    out_float[i] = float(v)
        return pd.DataFrame(
            {"dtype": out_dtype, "int_val": out_int, "float_val": out_float}
        )

    return sample_value


def zonal_stats(joined: DataFrame, value: str = "value", key: str = "poly_id") -> DataFrame:
    """Zonal statistics: sample join → groupBy(polygon).agg — the raster
    zonal-stats operator (SURVEY.md §2.C aggregations). Partial aggregation
    (map-side combine) is automatic."""
    return joined.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.avg(value).alias("avg_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )
