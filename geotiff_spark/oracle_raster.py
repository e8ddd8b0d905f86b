"""Exact DuckDB oracles for the raster path (zonal stats, tile stats).

Raster decode is not expressible in ANSI SQL, but everything downstream of
it is: the trusted (golden-verified, bit-exact vs the reference fixtures)
numpy decoder materializes each raster once as a (ix, iy, value) pixel
parquet, and the oracle SQL re-expresses the rest of the pipeline —
EPSG:3035 LAEA projection (closed-form Snyder trig), inverse
tiepoint+scale transform, floor, bounds check, pixel gather, groupBy —
over that table. This puts the flagship zonal-stats query and the tiling
stats under the driver's hash-match gate instead of a rows-only check.

Transform semantics mirrored here:
- inverse affine / tiepoint+scale: two FMAs
  (/root/reference/src/coordinate_transform/affine_transform.rs:39-44,
   tie_point_and_pixel_scale.rs:39-49)
- sampling: floor + half-open bounds (/root/reference/src/lib.rs:164-199)

All raster values in the reference fixtures are integers (u8/i16), so
every aggregate (sum/avg/min/max) is exact in float64 regardless of
accumulation order — the only cross-engine risk is a trig ulp flipping a
floor() at a pixel boundary, which for 1000 m pixels needs a point within
~1e-9 m of a boundary (deterministic inputs; verified green at both sf).
"""

from __future__ import annotations

import os

import numpy as np

ORACLE_DIR = "/tmp/geotiff_spark_oracle_v1"

AUSTRIAN = (
    "/root/reference/resources/"
    "austrian_capitals_model_tie_point_and_pixel_scale_pixel_is_area.tif"
)
RESOURCE_DIR = "/root/reference/resources"


def _write_parquet(path: str, cols: dict[str, np.ndarray]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table(cols), path)


def pixel_tables() -> tuple[str, str]:
    """Materialize (once per boot) and return paths of:
    - the flagship austrian raster pixel table (ix, iy, value)
    - the band-0 pixel table of every reference fixture
      (raster_id, ix, iy, value)
    """
    import glob

    from geotiff_spark.operators.sample import load_raster_records

    austrian_path = f"{ORACLE_DIR}/austrian_pixels.parquet"
    all_path = f"{ORACLE_DIR}/fixture_pixels_band0.parquet"
    marker = f"{ORACLE_DIR}/_DONE"
    if os.path.exists(marker):
        return austrian_path, all_path
    os.makedirs(ORACLE_DIR, exist_ok=True)

    paths = sorted(glob.glob(f"{RESOURCE_DIR}/*.tif"))
    records = load_raster_records(paths)

    rids, ixs, iys, vals = [], [], [], []
    for rid, rec in records.items():
        h, w, spp = rec["height"], rec["width"], rec["num_samples"]
        flat = np.frombuffer(rec["data"], dtype=np.dtype(rec["dtype"]))
        band0 = flat.reshape(h, w, spp)[:, :, 0].astype(np.float64)
        iy, ix = np.divmod(np.arange(h * w, dtype=np.int64), w)
        rids.append(np.full(h * w, rid, dtype=object))
        ixs.append(ix)
        iys.append(iy)
        vals.append(band0.ravel())
        if rid == AUSTRIAN.rsplit("/", 1)[-1]:
            _write_parquet(
                austrian_path,
                {"ix": ix, "iy": iy, "value": band0.ravel()},
            )
    _write_parquet(
        all_path,
        {
            "raster_id": np.concatenate(rids),
            "ix": np.concatenate(ixs),
            "iy": np.concatenate(iys),
            "value": np.concatenate(vals),
        },
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return austrian_path, all_path


def _laea_xy_sql(lat_expr: str = "lat", lon_expr: str = "lon") -> str:
    """SELECT-fragment computing EPSG:3035 (x, y) from lat/lon degrees —
    the same Snyder closed form as functions.proj.laea_forward, with every
    point-independent term precomputed by the identical numpy arithmetic
    and embedded at full precision."""
    from geotiff_spark.functions.proj import laea_constants

    c = laea_constants()
    e, e2, qp = c["e"], c["e2"], c["qp"]
    return f"""
  SELECT *,
         {c['fe']!r} + b * {c['d']!r} * COS(beta) * SIN(dlon) AS x,
         {c['fn']!r} + (b / {c['d']!r}) *
           ({c['cos_beta1']!r} * SIN(beta)
            - {c['sin_beta1']!r} * COS(beta) * COS(dlon)) AS y
  FROM (
    SELECT *,
           {c['rq']!r} * SQRT(2.0 / (1.0 + {c['sin_beta1']!r} * SIN(beta)
             + {c['cos_beta1']!r} * COS(beta) * COS(dlon))) AS b
    FROM (
      SELECT *,
             ASIN(LEAST(GREATEST(q / {qp!r}, -1.0), 1.0)) AS beta,
             RADIANS({lon_expr}) - {c['lon0']!r} AS dlon
      FROM (
        SELECT *,
               (1.0 - {e2!r}) * (sinphi / (1.0 - {e2!r} * sinphi * sinphi)
                 - (1.0 / (2.0 * {e!r}))
                   * LN((1.0 - {e!r} * sinphi) / (1.0 + {e!r} * sinphi))) AS q
        FROM (SELECT *, SIN(RADIANS({lat_expr})) AS sinphi FROM __pts__)
      )
    )
  )
"""


def zonal_stats_sql() -> str:
    """Flagship oracle: PIP hits → LAEA x/y → inverse tiepoint+scale →
    floor/bounds → pixel gather → per-polygon stats."""
    from geotiff_spark import oracle
    from geotiff_spark.operators.sample import load_raster_records

    austrian_path, _ = pixel_tables()
    rec = load_raster_records([AUSTRIAN])[AUSTRIAN.rsplit("/", 1)[-1]]
    rx0, ry0, mx, my, sx, sy = rec["transform"][1]
    w, h = rec["width"], rec["height"]
    laea = _laea_xy_sql().replace(
        "__pts__",
        f"""(
      SELECT h.doc_id, h.poly_id,
             {oracle.LAT_SQL} AS lat, {oracle.LON_SQL} AS lon
      FROM hits h
    )""",
    )
    return f"""
WITH hits AS ({oracle.pip_join_sql()}),
proj AS ({laea}),
idx AS (
  SELECT doc_id, poly_id,
         CASE WHEN rx >= 0.0 AND rx < {w} AND ry >= 0.0 AND ry < {h}
              THEN CAST(FLOOR(rx) AS BIGINT) END AS ix,
         CASE WHEN rx >= 0.0 AND rx < {w} AND ry >= 0.0 AND ry < {h}
              THEN CAST(FLOOR(ry) AS BIGINT) END AS iy
  FROM (
    SELECT doc_id, poly_id,
           (x - {mx!r}) / {sx!r} + {rx0!r} AS rx,
           (y - {my!r}) / -({sy!r}) + {ry0!r} AS ry
    FROM proj
  )
),
sampled AS (
  SELECT i.poly_id, px.value AS value
  FROM idx i
  LEFT JOIN read_parquet('{austrian_path}') px
    ON px.ix = i.ix AND px.iy = i.iy
)
SELECT poly_id,
       COUNT(*) AS n_docs,
       AVG(value) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM sampled
GROUP BY poly_id
"""


def tile_stats_sql(tile_size: int = 256) -> str:
    """Tiling oracle: band-0 pixel table → tile coords by integer
    division → per-tile min/mean/max."""
    _, all_path = pixel_tables()
    return f"""
SELECT raster_id,
       CAST(ix // {tile_size} AS INTEGER) AS tile_x,
       CAST(iy // {tile_size} AS INTEGER) AS tile_y,
       MIN(value) AS v_min,
       AVG(value) AS v_mean,
       MAX(value) AS v_max
FROM read_parquet('{all_path}')
GROUP BY raster_id, tile_x, tile_y
"""
