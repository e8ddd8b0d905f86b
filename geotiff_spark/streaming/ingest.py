"""Incremental crawl ingestion as Structured Streaming (SURVEY.md §2.C
streaming section — no reference counterpart; engine surface).

Event time = warc_ts. The batch kernels (cell encode, PIP map-join) are
stateless pandas UDFs, hence streaming-safe: the same fused_pages_pip
operator runs unchanged on a stream.

Provided operators:
- pages_stream: file-source stream over a pages parquet directory
- with_watermark + tumbling/sliding/session windowed cell counts
- streaming_dedup: stateful URL dedup within the watermark
- hot_cells_stream: per-window hot-cell detection (the streaming feed for
  the salting histogram)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotiff_spark.sources.pages import PAGES_SCHEMA


def pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream: each new parquet file in `path` is a micro-batch
    increment (the sandbox stand-in for an Iceberg/Kafka crawl feed)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_cell_counts(
    stream: DataFrame,
    res: int = 7,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding) per-cell page counts with late-data handling:
    rows later than the watermark are dropped per Spark semantics."""
    from geotiff_spark.operators.extract import with_fused_geo

    geo = with_fused_geo(
        stream, res, carry=("url", "warc_ts", "lang")
    ).filter(F.col("cell").isNotNull())
    geo = geo.withWatermark("warc_ts", watermark)
    win = (
        F.window("warc_ts", window, slide)
        if slide
        else F.window("warc_ts", window)
    )
    return geo.groupBy(win.alias("window"), "cell").agg(
        F.count(F.lit(1)).alias("n_pages")
    )


def session_cell_activity(
    stream: DataFrame,
    res: int = 7,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per cell: activity bursts separated by `gap`."""
    from geotiff_spark.operators.extract import with_fused_geo

    geo = with_fused_geo(
        stream, res, carry=("url", "warc_ts")
    ).filter(F.col("cell").isNotNull())
    geo = geo.withWatermark("warc_ts", watermark)
    return geo.groupBy(
        F.session_window("warc_ts", gap).alias("session"), "cell"
    ).agg(F.count(F.lit(1)).alias("n_pages"))


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful URL dedup bounded by the watermark (state is evictable —
    the unbounded-state variant is a non-starter at crawl scale)."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def hot_cells_stream(
    stream: DataFrame, res: int = 7, window: str = "30 minutes",
    threshold: int = 100,
) -> DataFrame:
    """Per-window cells above a count threshold — feeds the hot-cell list
    that the salted-join planner consumes."""
    counts = windowed_cell_counts(stream, res, window)
    return counts.filter(F.col("n_pages") >= threshold)


def running_cell_counts(
    stream: DataFrame,
    res: int = 7,
    watermark: str = "800 hours",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-cell RUNNING
    page count across micro-batches — state the built-in windowed aggs
    can't express (a monotone accumulator emitted every batch).

    Output per (cell, batch): rows_in_batch + running_total.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from geotiff_spark.operators.extract import with_fused_geo

    geo = with_fused_geo(stream, res, carry=("url", "warc_ts")).filter(
        F.col("cell").isNotNull()
    )
    geo = geo.withWatermark("warc_ts", watermark)

    def update(key, pdfs, state):
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += batch_rows
        state.update((total,))
        yield pd.DataFrame(
            {
                "cell": [key[0]],
                "batch_rows": [batch_rows],
                "running_total": [total],
            }
        )

    return geo.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType="cell long, batch_rows long, running_total long",
        stateStructType="total long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
):
    """Test/debug harness: drain a stream into an in-memory table."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
