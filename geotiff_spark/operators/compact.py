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
into them). The naive algorithm is `res` sequential rounds of
(groupBy parent + anti-join); measured at sf0.1 that costs ~7s of pure
round latency for a 62-cell result. This implementation instead uses the
closed form: an ancestor at level l is FORMABLE iff all 4^(res-l) of its
level-res descendants are present (induction on the recursive collapse),
and the compacted cover is exactly {formable a : parent(a) not formable}.
That is TWO shuffles total, independent of res — one groupBy counting
descendants per (level, ancestor) over the ≤res× ancestor explode of the
distinct-cell table, one left-anti self-join on the parent key. No
driver materialization, no sequential rounds.
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

    Closed form of the bottom-up collapse (see module docstring): an
    ancestor is formable iff all of its level-res descendants are
    present; output every formable cell whose parent is not. Matches the
    chained-CTE recursive SQL oracle (compact_oracle_sql) exactly — the
    deliberate engine-vs-oracle algorithm asymmetry IS the verification.

    Two shuffles, independent of res: groupBy(level, ancestor) over the
    ancestor explode, then one left-anti self-join on the parent key
    (level-0 cells, which have no parent, bypass the join)."""
    base = grid.select(
        F.col("ix").cast("long").alias("ix"),
        F.col("iy").cast("long").alias("iy"),
    )
    # (level, ancestor ix, iy) for every level res..0 — ≤(res+1)× blowup
    # of the already-tiny distinct-cell table, all row-local
    anc = base.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(l).alias("res"),
                    F.shiftright("ix", res - l).alias("ix"),
                    F.shiftright("iy", res - l).alias("iy"),
                )
                for l in range(res, -1, -1)
            ])
        ).alias("a")
    ).select("a.res", "a.ix", "a.iy")
    formable = (
        anc.groupBy("res", "ix", "iy")
        .agg(F.count(F.lit(1)).alias("n_desc"))
        # complete ⟺ every level-res descendant present (input rows are
        # distinct, so counts are exact)
        .filter(
            F.col("n_desc")
            == F.pow(F.lit(4), F.lit(res) - F.col("res")).cast("long")
        )
        .select("res", "ix", "iy")
    )
    parents = formable.select(
        (F.col("res") + 1).alias("res"),
        F.col("ix").alias("pix"),
        F.col("iy").alias("piy"),
    )
    out = formable.join(
        parents,
        (formable.res == parents.res)
        & (F.shiftright(formable.ix, 1) == parents.pix)
        & (F.shiftright(formable.iy, 1) == parents.piy),
        "left_anti",
    )
    # cell id needs a per-level Morton width; res is bounded (≤26), so
    # unroll a CASE over the levels — still pure JVM expressions
    cell = F.lit(None).cast("long")
    for l in range(res + 1):
        cell = F.when(F.col("res") == l, _cell_id_col(l)).otherwise(cell)
    return out.select("res", "ix", "iy", cell.alias("cell"))


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
