"""Synthetic Common-Crawl-style pages table (BASELINE.json::input_hint
schema: url, warc_ts, html, text, lang) — deterministic per row id, so the
same table materializes identically at any partitioning/parallelism.

Generation is a vectorized mapInPandas over spark.range(n): per-row values
derive from splitmix64(id), never from stateful RNGs, so the table is
reproducible and embarrassingly parallel (no shuffle). Geotag coordinates
follow a skewed mixture (hot cities + uniform background, FIXTURES.md §1)
so hot-cell salting is exercised honestly.

The html template embeds text between fixed markers; the engine's extractor
must recover it byte-identically per url (north-rule invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

LANGS = np.array(["en", "de", "fr", "es", "it", "pt", "nl", "pl"])
LANG_WEIGHTS = np.array([0.45, 0.12, 0.10, 0.10, 0.07, 0.06, 0.05, 0.05])

# hot cities (lat, lon) — a few dominate, producing hot cells
HOT_CITIES = np.array(
    [
        (48.2082, 16.3738),   # Vienna
        (47.3769, 8.5417),    # Zurich
        (48.1351, 11.5820),   # Munich
        (52.5200, 13.4050),   # Berlin
        (41.9028, 12.4964),   # Rome
        (40.4168, -3.7038),   # Madrid
        (51.5074, -0.1278),   # London
        (40.7128, -74.0060),  # New York
    ]
)
# strongly skewed: first two cities absorb most geotagged traffic
CITY_WEIGHTS = np.array([0.40, 0.25, 0.10, 0.08, 0.05, 0.05, 0.04, 0.03])

GEO_FRACTION = 0.6  # fraction of pages carrying a geotag
HOT_FRACTION = 0.7  # of geotagged: drawn from hot cities vs uniform
EPOCH_START = np.datetime64("2026-01-01T00:00:00")
WINDOW_SECONDS = 30 * 24 * 3600

HTML_PREFIX = b"<html><head><title>page</title></head><body><article>"
HTML_SUFFIX = b"</article><footer>crawl</footer></body></html>"

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data spark cell raster tile "
    "join page crawl web text index query shuffle partition skew broadcast "
    "polygon sample elevation city river mountain valley".split()
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic per-id 64-bit mix (public-domain splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(~0)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(~0)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(~0)
    return z ^ (z >> np.uint64(31))


def _unit(x: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) per id."""
    return _splitmix64(x + np.uint64(salt * 0x9E3779B9)).astype(np.float64) / 2.0**64


def synth_pages_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Generate page rows for the given int64 ids (pure numpy/pandas)."""
    ids = ids.astype(np.uint64)
    n = ids.size

    url = np.char.add(
        np.char.add(
            "https://site",
            (ids % np.uint64(1000)).astype(np.int64).astype(str),
        ),
        np.char.add(".example/p/", ids.astype(np.int64).astype(str)),
    )

    ts_off = (_unit(ids, 1) * WINDOW_SECONDS).astype("int64")
    warc_ts = EPOCH_START + ts_off.astype("timedelta64[s]")

    lang_idx = np.searchsorted(np.cumsum(LANG_WEIGHTS), _unit(ids, 2), side="right")
    lang = LANGS[np.clip(lang_idx, 0, len(LANGS) - 1)]

    has_geo = _unit(ids, 3) < GEO_FRACTION
    hot = _unit(ids, 4) < HOT_FRACTION
    city_idx = np.searchsorted(np.cumsum(CITY_WEIGHTS), _unit(ids, 5), side="right")
    city_idx = np.clip(city_idx, 0, len(HOT_CITIES) - 1)
    # hot: city + small jitter; background: uniform over a wide box
    jlat = (_unit(ids, 6) - 0.5) * 0.2
    jlon = (_unit(ids, 7) - 0.5) * 0.2
    lat_hot = HOT_CITIES[city_idx, 0] + jlat
    lon_hot = HOT_CITIES[city_idx, 1] + jlon
    lat_bg = (_unit(ids, 8) - 0.5) * 160.0   # [-80, 80)
    lon_bg = (_unit(ids, 9) - 0.5) * 360.0   # [-180, 180)
    lat = np.where(hot, lat_hot, lat_bg)
    lon = np.where(hot, lon_hot, lon_bg)

    w1 = _WORDS[(_splitmix64(ids + np.uint64(11)) % np.uint64(len(_WORDS))).astype(int)]
    w2 = _WORDS[(_splitmix64(ids + np.uint64(12)) % np.uint64(len(_WORDS))).astype(int)]
    w3 = _WORDS[(_splitmix64(ids + np.uint64(13)) % np.uint64(len(_WORDS))).astype(int)]
    base = np.char.add(np.char.add(np.char.add(w1, " "), w2), np.char.add(" ", w3))
    geotag = np.char.add(
        np.char.add(" geo: ", np.char.mod("%.5f", lat)),
        np.char.add(",", np.char.mod("%.5f", lon)),
    )
    text = np.where(has_geo, np.char.add(base, geotag), base)

    html = [
        HTML_PREFIX + t.encode("utf-8") + HTML_SUFFIX for t in text
    ]

    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.Series(warc_ts),
            "html": html,
            "text": text,
            "lang": lang,
        }
    )


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages DataFrame of n rows."""
    rng = spark.range(0, n, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield synth_pages_pdf(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages_parquet(spark: SparkSession, n: int, path: str) -> None:
    synth_pages(spark, n).write.mode("overwrite").parquet(path)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath.

    Probed by class lookup, not by a failed read: a read failure could
    equally mean a misconfigured catalog or a bad path, which must NOT
    silently degrade to the parquet branch."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def _looks_like_iceberg_table(path: str) -> bool:
    """True for catalog identifiers (no filesystem path exists) and for
    path-based tables carrying Iceberg's metadata/ layout. A plain
    parquet directory returns False, so a runtime jar on the classpath
    never hijacks parquet reads. Remote (s3/hdfs) path-based tables
    should pass source='iceberg' explicitly — this probe is local-fs."""
    import os

    if not os.path.exists(path):
        return "/" not in path  # db.table-style catalog identifier
    return os.path.isdir(os.path.join(path, "metadata"))


def load_pages(spark: SparkSession, path: str, source: str | None = None) -> DataFrame:
    """Pages scan: Iceberg table when the runtime is present (snapshot
    isolation + hidden partitioning at 10^12 rows) AND the target looks
    like an Iceberg table, parquet directory otherwise. `source` forces a
    branch ('iceberg' | 'parquet'). Both branches yield the same
    PAGES_SCHEMA columns, so every downstream operator is source-agnostic.
    """
    if source is None:
        source = (
            "iceberg"
            if iceberg_available(spark) and _looks_like_iceberg_table(path)
            else "parquet"
        )
    if source == "iceberg":
        return spark.read.format("iceberg").load(path)
    if source == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unknown pages source {source!r}")
