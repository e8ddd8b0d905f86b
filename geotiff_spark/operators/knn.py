"""kNN join via cell ring expansion (north rule).

Candidates for each query point come from the grid cells within Chebyshev
ring radius r of the query's cell (the cell analog of the reference's
R-tree envelope search, /root/reference/src/coordinate_transform/
tie_points.rs:188-192); exact distances rank the candidates, and the
result is EXACT because a query only settles at radius r when its k-th
neighbor distance is within the ring-r safety bound (points outside the
disk are provably farther). Unsettled queries escalate to a larger ring —
a driver loop of at most `max_rounds` Spark jobs, each a broadcast join of
(query, candidate-cell) pairs against the cell-indexed corpus.

Distance metric: planar degrees sqrt(dlat² + dlon²) — deterministic and
ANSI-SQL-expressible, so the whole operator sits under the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geotiff_spark.functions import cells as cellmod


def _disk_cells_pdf(query_rows, radius: int):
    """Explode each query's disk-`radius` candidate cells (driver-side —
    queries are the small broadcast side)."""
    import pandas as pd

    out = []
    for r in query_rows:
        for c in cellmod.disk_cells(int(r["cell"]), radius):
            out.append((r["qid"], float(r["qlat"]), float(r["qlon"]), int(c)))
    return pd.DataFrame(out, columns=["qid", "qlat", "qlon", "cell"])


def knn_join(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 7,
    key: str = "doc_id",
    lat: str = "lat",
    lon: str = "lon",
    initial_radius: int = 1,
    max_rounds: int = 4,
) -> DataFrame:
    """Exact kNN join. corpus: (key, lat, lon [+cell]); queries: same.

    Returns (qid, nn_id, dist, rank), rank 1..k, self excluded, planar
    degree distance, ties broken by nn_id.
    """
    if "cell" not in corpus.columns:
        from geotiff_spark.operators.extract import cell_udf

        corpus = corpus.withColumn("cell", cell_udf(res)(F.col(lat), F.col(lon)))
    corpus = corpus.select(
        F.col(key).alias("nn_id"),
        F.col(lat).alias("nlat"),
        F.col(lon).alias("nlon"),
        "cell",
    )

    qrows = [
        {
            "qid": r[key],
            "qlat": r[lat],
            "qlon": r[lon],
            "cell": int(
                cellmod.latlon_to_cell([r[lat]], [r[lon]], res)[0]
            ),
        }
        for r in queries.select(key, lat, lon).collect()
    ]

    cell_h_deg, _cell_w_deg = cellmod.cell_size_degrees(res)
    results = None
    radius = initial_radius
    pending = qrows
    for _round in range(max_rounds):
        cand_cells = spark.createDataFrame(_disk_cells_pdf(pending, radius))
        scored = (
            corpus.join(F.broadcast(cand_cells), "cell")
            .filter(F.col("nn_id") != F.col("qid"))
            .withColumn(
                "dist",
                # explicit multiply (not pow) so the DuckDB oracle's
                # (a-b)*(a-b) matches bit-for-bit
                F.sqrt(
                    (F.col("nlat") - F.col("qlat")) * (F.col("nlat") - F.col("qlat"))
                    + (F.col("nlon") - F.col("qlon")) * (F.col("nlon") - F.col("qlon"))
                ),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nn_id"))
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nn_id", "dist", "rank")
        )
        # safety bound: a point outside disk-r differs by ≥ r+1 cells on
        # some axis, so even with worst-case intra-cell positions its
        # planar-degree distance is ≥ r · min-cell-extent (lat extent —
        # lon cells are 2× wider in degrees)
        safe = float(radius) * cell_h_deg
        stats = (
            topk.groupBy("qid")
            .agg(F.count(F.lit(1)).alias("n"), F.max("dist").alias("kth"))
            .collect()
        )
        # strict <: a corpus point at exactly the safety radius with a
        # smaller id could displace the k-th neighbor under the
        # (dist, nn_id) tie-break — force one more expansion on ties
        settled_ids = {
            r["qid"] for r in stats if r["n"] >= k and r["kth"] < safe
        }
        if _round == max_rounds - 1:
            settled_ids = {r["qid"] for r in stats} | settled_ids
        settled_df = topk.filter(
            F.col("qid").isin(list(settled_ids)) if settled_ids else F.lit(False)
        )
        results = settled_df if results is None else results.unionByName(settled_df)
        pending = [q for q in pending if q["qid"] not in settled_ids]
        if not pending:
            break
        radius *= 2
    return results.select(
        "qid", "nn_id", F.round("dist", 9).alias("dist"), "rank"
    )
