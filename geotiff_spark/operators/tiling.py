"""Raster tiling: dense rasters ↔ fixed-size tile tables.

The distributed layout for raster data at scale: a (raster_id, tile_x,
tile_y) keyed table of fixed-size tiles, partitionable by tile coords and
joinable against cell-indexed page data. Complements the page-side "tile
assignment" (cell encode): this is the raster side of the tiling engine.

- raster_to_tiles: explode decoded rasters into edge-clipped tiles
- tiles_to_raster: exact inverse (tested bit-identical round trip)
- tile_stats: per-tile min/mean/max — the pruning index for value
  predicates (query "tiles with elevation > t" without touching pixels)
- vectorize_threshold: raster→vector — cells whose sampled pixel passes a
  predicate, i.e. the coverage of a value mask in cell space
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

TILE_SCHEMA = StructType(
    [
        StructField("raster_id", StringType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("tile_w", IntegerType()),
        StructField("tile_h", IntegerType()),
        StructField("num_samples", IntegerType()),
        StructField("dtype", StringType()),
        StructField("data", BinaryType()),
    ]
)


def raster_to_tiles(rasters: DataFrame, tile_size: int = 256) -> DataFrame:
    """Explode rasters (RASTER_SCHEMA rows) into edge-clipped tiles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geotiff_spark.functions.tiff import NUMPY_BY_NAME

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["error"] is not None:
                    continue
                dt = NUMPY_BY_NAME[r["dtype"]]
                h, w, spp = r["height"], r["width"], r["num_samples"]
                arr = np.frombuffer(bytes(r["data"]), dtype=dt).reshape(h, w, spp)
                for ty in range(0, -(-h // tile_size)):
                    for tx in range(0, -(-w // tile_size)):
                        block = arr[
                            ty * tile_size : (ty + 1) * tile_size,
                            tx * tile_size : (tx + 1) * tile_size,
                        ]
                        rows.append({
                            "raster_id": r["raster_id"],
                            "tile_x": tx, "tile_y": ty,
                            "tile_w": block.shape[1],
                            "tile_h": block.shape[0],
                            "num_samples": spp,
                            "dtype": r["dtype"],
                            "data": np.ascontiguousarray(block).tobytes(),
                        })
            yield pd.DataFrame(rows, columns=[f.name for f in TILE_SCHEMA.fields])

    return rasters.mapInPandas(run, schema=TILE_SCHEMA)


def tiles_to_raster(tiles_pdf: pd.DataFrame, tile_size: int = 256) -> np.ndarray:
    """Driver/test-side inverse: reassemble one raster's tiles."""
    from geotiff_spark.functions.tiff import NUMPY_BY_NAME

    dt = NUMPY_BY_NAME[tiles_pdf["dtype"].iloc[0]]
    spp = int(tiles_pdf["num_samples"].iloc[0])
    w = int(
        (tiles_pdf["tile_x"] * tile_size + tiles_pdf["tile_w"]).max()
    )
    h = int(
        (tiles_pdf["tile_y"] * tile_size + tiles_pdf["tile_h"]).max()
    )
    out = np.zeros((h, w, spp), dtype=dt)
    for _, t in tiles_pdf.iterrows():
        block = np.frombuffer(bytes(t["data"]), dtype=dt).reshape(
            t["tile_h"], t["tile_w"], spp
        )
        y0, x0 = t["tile_y"] * tile_size, t["tile_x"] * tile_size
        out[y0 : y0 + t["tile_h"], x0 : x0 + t["tile_w"]] = block
    return out


def tile_stats(tiles: DataFrame) -> DataFrame:
    """Per-tile value stats — the min/max pruning index for raster
    predicates (band 0)."""
    schema = StructType([
        StructField("raster_id", StringType()),
        StructField("tile_x", IntegerType()),
        StructField("tile_y", IntegerType()),
        StructField("v_min", DoubleType()),
        StructField("v_mean", DoubleType()),
        StructField("v_max", DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geotiff_spark.functions.tiff import NUMPY_BY_NAME

        for pdf in batches:
            rows = []
            for _, t in pdf.iterrows():
                dt = NUMPY_BY_NAME[t["dtype"]]
                arr = np.frombuffer(bytes(t["data"]), dtype=dt).reshape(
                    t["tile_h"], t["tile_w"], t["num_samples"]
                )[:, :, 0]
                rows.append({
                    "raster_id": t["raster_id"],
                    "tile_x": int(t["tile_x"]), "tile_y": int(t["tile_y"]),
                    "v_min": float(arr.min()), "v_mean": float(arr.mean()),
                    "v_max": float(arr.max()),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return tiles.mapInPandas(run, schema=schema)


def build_pyramid(
    tiles: DataFrame, levels: int = 3, tile_size: int = 256
) -> DataFrame:
    """Tile pyramid (overview levels): level k+1 halves level k by 2×2
    mean (integer floor-mean for integer dtypes — deterministic).

    Level-0 tiles in → all levels out with a `level` column. Each level
    derives from the previous by one grouped shuffle on the parent tile
    key: 4 child tiles (2×2 block) aggregate into one parent tile — a
    logarithmic number of shrinking jobs, classic map-reduce pyramid.
    """
    from pyspark.sql.types import IntegerType

    levelled = tiles.withColumn("level", F.lit(0))
    out = levelled
    schema = StructType(
        [StructField("level", IntegerType())] + TILE_SCHEMA.fields
    )

    def downsample(key, pdf):
        from geotiff_spark.functions.tiff import NUMPY_BY_NAME

        rid, lvl, px, py = key
        dt = NUMPY_BY_NAME[pdf["dtype"].iloc[0]]
        spp = int(pdf["num_samples"].iloc[0])
        # assemble the up-to-2x2 parent block from child tiles
        full = np.zeros((2 * tile_size, 2 * tile_size, spp), dtype=dt)
        max_y = max_x = 0
        for _, t in pdf.iterrows():
            block = np.frombuffer(bytes(t["data"]), dtype=dt).reshape(
                t["tile_h"], t["tile_w"], spp
            )
            oy = (int(t["tile_y"]) % 2) * tile_size
            ox = (int(t["tile_x"]) % 2) * tile_size
            full[oy : oy + t["tile_h"], ox : ox + t["tile_w"]] = block
            max_y = max(max_y, oy + int(t["tile_h"]))
            max_x = max(max_x, ox + int(t["tile_w"]))
        full = full[:max_y, :max_x]
        # pad odd dims so the 2x2 mean is defined at edges
        ph, pw = -(-full.shape[0] // 2) * 2, -(-full.shape[1] // 2) * 2
        if (ph, pw) != full.shape[:2]:
            padded = np.zeros((ph, pw, spp), dtype=dt)
            padded[: full.shape[0], : full.shape[1]] = full
            # replicate edge rows/cols so padding doesn't bias the mean
            if ph > full.shape[0]:
                padded[full.shape[0]:, : full.shape[1]] = full[-1:]
            if pw > full.shape[1]:
                padded[:, full.shape[1]:] = padded[:, full.shape[1] - 1 : full.shape[1]]
            full = padded
        down = (
            full.reshape(ph // 2, 2, pw // 2, 2, spp)
            .astype(np.float64)
            .mean(axis=(1, 3))
        )
        if np.issubdtype(dt, np.integer):
            down = np.floor(down)
        down = down.astype(dt)
        return pd.DataFrame([{
            "level": int(lvl) + 1,
            "raster_id": rid,
            "tile_x": int(px), "tile_y": int(py),
            "tile_w": down.shape[1], "tile_h": down.shape[0],
            "num_samples": spp,
            "dtype": pdf["dtype"].iloc[0],
            "data": np.ascontiguousarray(down).tobytes(),
        }])

    current = levelled
    for _lvl in range(levels):
        parents = (
            current.withColumn("px", (F.col("tile_x") / 2).cast("int"))
            .withColumn("py", (F.col("tile_y") / 2).cast("int"))
            .groupBy("raster_id", "level", "px", "py")
            .applyInPandas(downsample, schema=schema)
        )
        out = out.unionByName(parents)
        current = parents
    return out


def vectorize_threshold(
    rasters: DataFrame, res: int, threshold: float, sample: int = 0
) -> DataFrame:
    """Raster → vector: distinct cells (at `res`) whose covering pixel
    value exceeds `threshold` — the cell-space footprint of a value mask.
    Each pixel center is transformed to model space, encoded to a cell;
    output (raster_id, cell, n_pixels, v_max)."""
    schema = StructType([
        StructField("raster_id", StringType()),
        StructField("cell", LongType()),
        StructField("n_pixels", LongType()),
        StructField("v_max", DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geotiff_spark.functions import cells as cellmod
        from geotiff_spark.functions import transforms as tf
        from geotiff_spark.functions.tiff import NUMPY_BY_NAME

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["error"] is not None:
                    continue
                dt = NUMPY_BY_NAME[r["dtype"]]
                h, w, spp = r["height"], r["width"], r["num_samples"]
                arr = np.frombuffer(bytes(r["data"]), dtype=dt).reshape(h, w, spp)
                vals = arr[:, :, sample].astype(np.float64)
                ys, xs = np.nonzero(vals > threshold)
                if len(ys) == 0:
                    continue
                # pixel centers -> model space (lon=x, lat=y convention)
                t = r["transform"]
                mx, my = tf.to_model(
                    t["kind"], list(t["coeffs"]),
                    xs.astype(np.float64) + 0.5, ys.astype(np.float64) + 0.5,
                )
                cell = cellmod.latlon_to_cell(
                    np.clip(my, -90, 90), np.clip(mx, -180, 180), res
                )
                v = vals[ys, xs]
                order = np.argsort(cell, kind="stable")
                cvals, starts = np.unique(cell[order], return_index=True)
                bounds = np.append(starts, len(order))
                for i, c in enumerate(cvals):
                    sel = order[bounds[i]:bounds[i + 1]]
                    rows.append({
                        "raster_id": r["raster_id"], "cell": int(c),
                        "n_pixels": int(len(sel)),
                        "v_max": float(v[sel].max()),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return rasters.mapInPandas(run, schema=schema)
