"""Raster ingest: binaryFile scan → mapInPandas decode → rasters DataFrame.

Engine equivalent of GeoTiff::read (/root/reference/src/lib.rs:49-84), run
once per file on executors. Decode is a whole-file kernel (the reference has
no windowed read either), so the unit of parallelism is the file; Spark's
binaryFile source distributes files across partitions, and at 100 TB the
rasters table is written once to Parquet and reused — the decode cost is
paid one time per raster, not per query.

Schema (SURVEY.md §1.3): data carried as raw native-endian numpy bytes +
dtype tag. Spark has no unsigned types, so u16..u64 must NOT round-trip
through long columns — the bytes+tag form is lossless for all 10 dtypes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

RASTER_SCHEMA = StructType(
    [
        StructField("raster_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("num_samples", IntegerType()),
        StructField("dtype", StringType()),
        StructField(
            "transform",
            StructType(
                [
                    StructField("kind", StringType()),
                    StructField("coeffs", ArrayType(DoubleType())),
                ]
            ),
        ),
        StructField("raster_type", StringType()),
        StructField("geo_keys", MapType(StringType(), StringType())),
        StructField(
            "extent",
            StructType(
                [
                    StructField("minx", DoubleType()),
                    StructField("miny", DoubleType()),
                    StructField("maxx", DoubleType()),
                    StructField("maxy", DoubleType()),
                ]
            ),
        ),
        StructField("data", BinaryType()),
        StructField("error", StringType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the UDF: executors only need the pure-numpy kernel
    from geotiff_spark.functions.geotiff import read_geotiff

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            try:
                rec = read_geotiff(bytes(content))
                rows.append(
                    {
                        "raster_id": path.rsplit("/", 1)[-1],
                        "width": rec["width"],
                        "height": rec["height"],
                        "num_samples": rec["num_samples"],
                        "dtype": rec["dtype"],
                        "transform": {
                            "kind": rec["transform"][0],
                            "coeffs": [float(c) for c in rec["transform"][1]],
                        },
                        "raster_type": rec["raster_type"],
                        "geo_keys": {
                            k: str(v) for k, v in rec["geo_keys"].items()
                        },
                        "extent": {
                            "minx": rec["extent"][0],
                            "miny": rec["extent"][1],
                            "maxx": rec["extent"][2],
                            "maxy": rec["extent"][3],
                        },
                        "data": rec["array"].tobytes(),
                        "error": None,
                    }
                )
            except Exception as exc:  # error-status row, don't kill the job
                rows.append(
                    {
                        "raster_id": path.rsplit("/", 1)[-1],
                        "width": None,
                        "height": None,
                        "num_samples": None,
                        "dtype": None,
                        "transform": None,
                        "raster_type": None,
                        "geo_keys": None,
                        "extent": None,
                        "data": None,
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                )
        yield pd.DataFrame(rows)


def read_rasters(spark: SparkSession, path: str, glob: str = "*.tif") -> DataFrame:
    """Scan GeoTIFF files and decode to the rasters DataFrame.

    ``spark.read.format('binaryFile')`` parallelizes across files; decode
    runs in ``mapInPandas`` (Arrow batches, no per-row Python overhead on
    the Spark side; the kernel itself is whole-file numpy).
    """
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return scan.mapInPandas(_decode_batches, schema=RASTER_SCHEMA)


def rasters_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection (column pruning keeps `data` unread when a
    query needs only dims/extent — e.g. partition pruning of page→raster
    assignment via A3 extents)."""
    return df.select(
        "raster_id", "width", "height", "num_samples", "dtype",
        "transform", "raster_type", "extent", "error",
    )
