"""Cell-set compaction: replace every complete 4-sibling group by its
parent, recursively — the quadtree analog of H3's `compact`. Turns a
dense coverage (e.g. the vectorized footprint of a mask, or the set of
cells a corpus touches) into the minimal mixed-resolution cover, which is
what you broadcast as a spatial filter instead of millions of fine cells.

Reference role: the coarse-candidate side of the R-tree envelope
prefilter (/root/reference/src/coordinate_transform/tie_points.rs:173-195)
— a compacted cover is the broadcastable form of an envelope set.

Scale shape: the input is a DISTINCT cell table (bounded by 4^res, not by
data volume — ≤2.7e8 rows at res 14 no matter how many documents mapped
into them). Each of the `res` rounds is one groupBy on the shrinking
parent key plus one broadcast-size anti-join; data volume drops ≥4× per
round whenever compaction fires, so the loop is log-depth with
geometrically decaying shuffles. No driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell_id_col(res: int, ix="ix", iy="iy"):
    """int64 cell id (res << 57) | morton(ix, iy) as a JVM Column —
    unrolled bit-interleave, the Spark twin of cells.grid_to_cell and
    oracle.morton_sql."""
    morton = F.lit(0).cast("long")
    for i in range(res):
        morton = morton + F.shiftleft(
            F.shiftright(F.col(ix).cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        morton = morton + F.shiftleft(
            F.shiftright(F.col(iy).cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
    return F.lit(res).cast("long") * F.lit(1 << 57) + morton


def compact_cells(grid: DataFrame, res: int) -> DataFrame:
    """grid: DISTINCT (ix, iy) int rows at resolution `res` →
    (res, ix, iy, cell) rows of the minimal mixed-resolution cover.

    Bottom-up: at each level, parents owning all 4 children absorb them;
    everything else is final at its level. Exactly mirrors the chained-CTE
    SQL oracle (queries.py: COMPACT_ORACLE)."""
    finals: list[DataFrame] = []
    cur = grid.select(
        F.col("ix").cast("long").alias("ix"), F.col("iy").cast("long").alias("iy")
    )
    for r in range(res, 0, -1):
        lv = cur.withColumn(
            "px", F.shiftright("ix", 1)
        ).withColumn("py", F.shiftright("iy", 1))
        full = (
            lv.groupBy("px", "py")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == 4)
            .select("px", "py")
        )
        keep = (
            lv.join(F.broadcast(full), ["px", "py"], "left_anti")
            .select("ix", "iy")
            .withColumn("res", F.lit(r))
            .withColumn("cell", _cell_id_col(r))
        )
        finals.append(keep)
        cur = full.select(
            F.col("px").alias("ix"), F.col("py").alias("iy")
        )
    finals.append(
        cur.withColumn("res", F.lit(0)).withColumn("cell", _cell_id_col(0))
    )
    out = finals[0]
    for f in finals[1:]:
        out = out.unionByName(f)
    return out.select("res", "ix", "iy", "cell")


def compact_oracle_sql(res: int, grid_cte: str) -> str:
    """Chained-CTE DuckDB oracle for compact_cells: `grid_cte` must be a
    SELECT producing DISTINCT (ix, iy) at `res`. Generates one
    (level, complete-parents, finals) CTE triple per level — same
    bottom-up recursion as the engine, pure integer arithmetic."""
    from geotiff_spark import oracle

    parts = [f"WITH g{res} AS ({grid_cte})"]
    selects = []
    for r in range(res, 0, -1):
        parts.append(
            f"l{r} AS (SELECT ix, iy, ix // 2 AS px, iy // 2 AS py FROM g{r})"
        )
        parts.append(
            f"c{r} AS (SELECT px, py FROM l{r} GROUP BY px, py "
            f"HAVING COUNT(*) = 4)"
        )
        parts.append(
            f"f{r} AS (SELECT l.ix, l.iy FROM l{r} l "
            f"ANTI JOIN c{r} c ON l.px = c.px AND l.py = c.py)"
        )
        parts.append(f"g{r - 1} AS (SELECT px AS ix, py AS iy FROM c{r})")
        selects.append(
            f"SELECT {r} AS res, ix, iy, {oracle.morton_sql(r)} AS cell FROM f{r}"
        )
    selects.append(
        f"SELECT 0 AS res, ix, iy, {oracle.morton_sql(0)} AS cell FROM g0"
    )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
