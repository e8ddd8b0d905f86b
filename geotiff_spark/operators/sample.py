"""Raster sampling join: model-space points gather pixel values from
decoded rasters.

Engine form of get_value_at (/root/reference/src/lib.rs:126-130): a million
lookups become one vectorized gather ``data[(floor(ry)*w + floor(rx))*spp +
s]`` per Arrow batch (SURVEY.md §1.3). Out-of-bounds → NULL (reference:
None).

Scale shape (SURVEY.md §4.3): rasters are ALWAYS decoded on executors
(sources/rasters.py binaryFile → mapInPandas). A cheap header-only probe
(no pixel decode) sizes the decoded corpus, then:

- ``broadcast`` branch (corpus ≤ the size guard): decoded records are
  collected once and broadcast; sampling is a zero-shuffle Arrow gather.
- ``copartition`` branch (corpus above the guard): points shuffle by
  raster_id (optionally salted for hot rasters), each decoded raster row
  ships once per salt bucket, and the same gather kernel runs
  group-locally inside a cogroup — the pixel data never transits the
  driver, and per-raster work scales with executors, not driver cores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from geotiff_spark.functions import transforms as tf
from geotiff_spark.functions.geotiff import read_geotiff

# Decoded corpora at or under this many bytes broadcast; larger corpora
# take the co-partitioned join. Overridable per-session via the Spark
# conf ``spark.geotiff.sample.maxBroadcastBytes`` or per-call.
DEFAULT_MAX_BROADCAST_BYTES = 512 << 20

# Per-process caches so repeated sampling queries in one session don't
# re-run the decode/probe jobs for the same (small) raster corpus. Keyed
# by (path, mtime_ns, size) per sorted path — a raster rewritten
# mid-session invalidates the entry instead of serving stale pixels
# (ADVICE r04). Bounded — sampling corpora worth caching are the
# broadcastable ones.
_RECORDS_CACHE: dict[tuple, dict[str, dict]] = {}
_SIZES_CACHE: dict[tuple, int] = {}
_CACHE_MAX = 4


def _cache_key(paths: list[str]) -> tuple:
    import os

    parts = []
    for p in sorted(paths):
        try:
            st = os.stat(p)
            parts.append((p, st.st_mtime_ns, st.st_size))
        except OSError:
            parts.append((p, -1, -1))
    return tuple(parts)


def _add_record(records: dict, rid: str, rec: dict) -> None:
    """raster_id is the file BASENAME — two corpus paths sharing one
    basename would silently collapse to a single record (dict
    overwrite); fail loudly instead (ADVICE r04)."""
    if rid in records:
        raise ValueError(
            f"duplicate raster basename {rid!r} in corpus — raster_id is "
            "the basename, so each file needs a distinct one"
        )
    records[rid] = rec


def load_raster_records(paths: list[str]) -> dict[str, dict]:
    """Driver-side decode of a raster set → broadcastable records.

    Test/oracle path only (and the shape contract for the records dict):
    production queries go through :func:`load_raster_records_distributed`,
    which produces the identical records via the executor-side decode.
    """
    records = {}
    for p in paths:
        with open(p, "rb") as fh:
            rec = read_geotiff(fh.read())
        rid = p.rsplit("/", 1)[-1]
        _add_record(records, rid, {
            "width": rec["width"],
            "height": rec["height"],
            "num_samples": rec["num_samples"],
            "dtype": str(rec["array"].dtype),
            "transform": rec["transform"],
            "raster_type": rec["raster_type"],
            "extent": rec["extent"],
            "data": rec["array"].tobytes(),
        })
    return records


def load_raster_records_distributed(
    spark: SparkSession, paths: list[str]
) -> dict[str, dict]:
    """Executor-side decode (sources/rasters.py mapInPandas) collected to
    the broadcastable records dict. Decode parallelism = number of files;
    the driver only receives the finished arrays. Raises on any decode
    error row — a silently missing raster would turn into all-NULL
    samples downstream."""
    key = _cache_key(paths)
    cached = _RECORDS_CACHE.get(key)
    if cached is not None:
        return cached
    from geotiff_spark.functions.tiff import NUMPY_BY_NAME
    from geotiff_spark.sources.rasters import read_rasters

    records: dict[str, dict] = {}
    for r in read_rasters(spark, list(paths), glob="*").collect():
        if r["error"] is not None:
            raise RuntimeError(
                f"raster decode failed for {r['raster_id']}: {r['error']}"
            )
        _add_record(records, r["raster_id"], {
            "width": r["width"],
            "height": r["height"],
            "num_samples": r["num_samples"],
            # rasters DF carries reference-style names (u8/i16/f32 —
            # sample_type, A2); records use numpy names like the driver loop
            "dtype": str(NUMPY_BY_NAME[r["dtype"]]),
            "transform": (r["transform"]["kind"], list(r["transform"]["coeffs"])),
            "raster_type": r["raster_type"],
            "extent": (
                r["extent"]["minx"], r["extent"]["miny"],
                r["extent"]["maxx"], r["extent"]["maxy"],
            ),
            "data": bytes(r["data"]),
        })
    if len(_RECORDS_CACHE) >= _CACHE_MAX:
        _RECORDS_CACHE.pop(next(iter(_RECORDS_CACHE)))
    _RECORDS_CACHE[key] = records
    return records


def raster_decoded_sizes(spark: SparkSession, paths: list[str]) -> DataFrame:
    """(raster_id, decoded_bytes) WITHOUT decoding pixels: header/IFD
    parse only (dims × samples × dtype width). This is the probe that
    decides broadcast vs co-partitioned sampling — the decision must not
    itself materialize the corpus."""
    schema = StructType([
        StructField("raster_id", StringType()),
        StructField("decoded_bytes", LongType()),
        StructField("error", StringType()),
    ])

    def probe(batches):
        from geotiff_spark.functions import tiff

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rid = path.rsplit("/", 1)[-1]
                try:
                    _bo, ifds = tiff.parse_ifds(bytes(content))
                    meta, _segs = tiff.segment_plan(bytes(content), ifds[0])
                    nbytes = (
                        meta["width"] * meta["height"] * meta["num_samples"]
                        * np.dtype(meta["dtype_np"]).itemsize
                    )
                    rows.append({"raster_id": rid, "decoded_bytes": nbytes,
                                 "error": None})
                except Exception as exc:
                    rows.append({"raster_id": rid, "decoded_bytes": None,
                                 "error": f"{type(exc).__name__}: {exc}"})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(list(paths))
        .select("path", "content")
    )
    return scan.mapInPandas(probe, schema=schema)


def _total_decoded_bytes(spark: SparkSession, paths: list[str]) -> int:
    key = _cache_key(paths)
    cached = _SIZES_CACHE.get(key)
    if cached is not None:
        return cached
    rows = raster_decoded_sizes(spark, paths).collect()
    bad = [r for r in rows if r["error"] is not None]
    if bad:
        raise RuntimeError(
            f"raster header probe failed for {bad[0]['raster_id']}: "
            f"{bad[0]['error']}"
        )
    total = int(sum(r["decoded_bytes"] for r in rows))
    if len(_SIZES_CACHE) >= _CACHE_MAX:
        _SIZES_CACHE.pop(next(iter(_SIZES_CACHE)))
    _SIZES_CACHE[key] = total
    return total


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

    # deterministic in fact; marked otherwise so a downstream filter on
    # the sampled value (e.g. zonal_mode's isNotNull) cannot inline the
    # alias and re-plan a second ArrowEvalPython running the gather
    # twice (round 4, same pathology as dedup.minhash_signatures)
    return sample_value.asNondeterministic()


def sample_join_copartitioned(
    df: DataFrame,
    rasters: DataFrame,
    raster_id: Column,
    x: str = "x",
    y: str = "y",
    out: str = "value",
    sample: int = 0,
    strict: bool = True,
    n_salt: int = 1,
) -> DataFrame:
    """Sampling join for raster corpora too large to broadcast: cogroup
    points (shuffled by raster_id, optionally salted) with the decoded
    rasters DataFrame (each raster row ships once per salt bucket), and
    run the same vectorized gather group-locally. The pixel data never
    touches the driver. ``n_salt > 1`` splits a hot raster's points
    across n_salt tasks at the cost of shipping its pixels n_salt times —
    size it to points-per-raster skew, not to the corpus."""
    point_cols = [f.name for f in df.schema.fields]
    out_schema = StructType(df.schema.fields + [StructField(out, DoubleType())])
    pts = df.withColumn("__rid", raster_id)
    r = rasters.select(
        F.col("raster_id").alias("__rid"),
        "width", "height", "num_samples", "dtype",
        F.col("transform.kind").alias("t_kind"),
        F.col("transform.coeffs").alias("t_coeffs"),
        "raster_type", "data", "error",
    )
    keys = ["__rid"]
    if n_salt > 1:
        keys = ["__rid", "__salt"]
        pts = pts.withColumn(
            "__salt", F.pmod(F.hash(F.col(x), F.col(y)), F.lit(n_salt))
        )
        r = r.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )

    def kernel(_key, pts_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        res = pts_pdf[point_cols].copy()
        if len(r_pdf) == 0:
            res[out] = np.nan  # unknown raster_id → NULL, like broadcast
            return res
        from geotiff_spark.functions.tiff import NUMPY_BY_NAME

        rec = r_pdf.iloc[0]
        if rec["error"] is not None:
            raise RuntimeError(
                f"raster decode failed for {rec['__rid']}: {rec['error']}"
            )
        flat = np.frombuffer(bytes(rec["data"]), dtype=NUMPY_BY_NAME[rec["dtype"]])
        idx, valid = tf.sample_indices(
            rec["t_kind"], list(rec["t_coeffs"]),
            int(rec["width"]), int(rec["height"]), int(rec["num_samples"]),
            rec["raster_type"],
            pts_pdf[x].to_numpy(np.float64), pts_pdf[y].to_numpy(np.float64),
            sample, strict,
        )
        vals = flat[idx].astype(np.float64)
        vals[~valid] = np.nan
        res[out] = vals
        return res

    return (
        pts.groupBy(*keys)
        .cogroup(r.groupBy(*keys))
        .applyInPandas(kernel, schema=out_schema)
    )


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
    mode: str = "auto",
    max_broadcast_bytes: int | None = None,
    n_salt: int = 1,
) -> DataFrame:
    """Attach a sampled raster value column. `raster_id` may be a literal
    (every row samples one raster) or a column (per-row raster routing).

    mode: 'auto' (header-probe the decoded size, broadcast under the
    guard, co-partition above it), 'broadcast', or 'copartition'. Both
    branches produce identical values (pytest-pinned)."""
    rid_col = F.lit(raster_id) if isinstance(raster_id, str) else raster_id
    if mode == "auto":
        if max_broadcast_bytes is None:
            max_broadcast_bytes = int(
                spark.conf.get(
                    "spark.geotiff.sample.maxBroadcastBytes",
                    str(DEFAULT_MAX_BROADCAST_BYTES),
                )
            )
        total = _total_decoded_bytes(spark, raster_paths)
        mode = "broadcast" if total <= max_broadcast_bytes else "copartition"
    if mode == "broadcast":
        records = load_raster_records_distributed(spark, raster_paths)
        udf = sample_udf(spark, records, sample, strict)
        return df.withColumn(out, udf(rid_col, F.col(x), F.col(y)))
    if mode == "copartition":
        from geotiff_spark.sources.rasters import read_rasters

        rasters = read_rasters(spark, list(raster_paths), glob="*")
        return sample_join_copartitioned(
            df, rasters, rid_col, x, y, out, sample, strict, n_salt
        )
    raise ValueError(f"unknown sampling mode {mode!r}")


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
