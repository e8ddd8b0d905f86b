"""Many-raster scale evidence for the sampling join (VERDICT r3 next #2).

Generates synthetic raster corpora (mixed codecs/layouts, deterministic
content, one pixel-scale transform per raster with distinct extents) and
measures, in subprocesses so each configuration gets a fresh JVM:

1. decode + record build (the executor-side path behind the broadcast
   branch) at two parallelism levels — wall must scale with cores, i.e.
   the old driver-sequential bottleneck is gone;
2. the co-partitioned sampling join at a 1x and 5x raster corpus with a
   fixed point load per raster — wall must scale with total work, not
   superlinearly with raster count, and never through the driver.

Usage: python scripts/raster_scale_evidence.py [--small 8] [--big 32]
       [--n1 200] [--n5 1000] [--runs 2]
Prints one JSON line per measurement plus a markdown table to paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_ROOT = "/tmp/geotiff_spark_raster_scale"


def gen_corpus(n: int) -> str:
    """n synthetic rasters, 256x256 u16, codecs cycling through
    none/deflate/packbits x strip/tile x predictor, each with its own
    100x100-unit extent at offset (1000*i, 500*i)."""
    out = f"{CORPUS_ROOT}/n{n}"
    marker = f"{out}/.complete"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import numpy as np
    from tiff_writer import write_tiff

    h = w = 256
    iy, ix = np.mgrid[0:h, 0:w]
    for i in range(n):
        arr = ((iy * 31 + ix * 17 + i * 101) % 60000).astype(np.uint16)
        comp = [1, 8, 32773][i % 3]
        layout = i % 2  # 0 strips, 1 tiles
        data = write_tiff(
            arr[:, :, None],
            compression=comp,
            rows_per_strip=None if layout else 32,
            tile=(64, 64) if layout else None,
            predictor=2 if (comp == 8 and i % 4 == 1) else 1,
            pixel_scale=[100.0 / w, 100.0 / h, 0.0],
            tie_points=[0.0, 0.0, 0.0, 1000.0 * i, 500.0 * i + 100.0, 0.0],
        )
        with open(f"{out}/r{i:05d}.tif", "wb") as fh:
            fh.write(data)
    open(marker, "w").close()
    return out


RUNNER = r"""
import json, sys, time
sys.path.insert(0, '__REPO__')
from pyspark.sql import functions as F
from geotiff_spark.session import get_spark
from geotiff_spark.operators import sample as smp

cores, corpus, n_rasters, points_per, job = (
    int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5],
)
spark = get_spark('raster-scale', master='local[%d]' % cores)
spark.sparkContext.setLogLevel('ERROR')
paths = [f'{corpus}/r{i:05d}.tif' for i in range(n_rasters)]

def timed(fn, warm=1, runs=2):
    for _ in range(warm):
        fn()
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best

if job == 'decode':
    def run():
        smp._RECORDS_CACHE.clear()
        recs = smp.load_raster_records_distributed(spark, paths)
        assert len(recs) == n_rasters
    wall = timed(run)
    out = {"job": "decode", "cores": cores, "n_rasters": n_rasters,
           "wall_sec": round(wall, 2),
           "rasters_per_sec": round(n_rasters / wall, 1)}
else:
    # deterministic in-bounds points routed across all rasters
    pts = (
        spark.range(n_rasters * points_per)
        .select(
            F.col('id').alias('pid'),
            F.format_string('r%05d.tif', (F.col('id') % n_rasters)
                            .cast('int')).alias('rid'),
            (1000.0 * (F.col('id') % n_rasters)
             + (F.col('id') * 37 % 1000) / 10.0).alias('x'),
            (500.0 * (F.col('id') % n_rasters)
             + (F.col('id') * 53 % 999) / 10.0 + 0.05).alias('y'),
        )
        .repartition(max(cores * 2, 8))
        .cache()
    )
    n_pts = pts.count()
    from geotiff_spark.sources.rasters import read_rasters
    rasters = read_rasters(spark, paths, glob='*')
    def run():
        res = smp.sample_join_copartitioned(
            pts, rasters, F.col('rid'))
        got = res.filter(F.col('value').isNotNull()).count()
        assert got == n_pts, (got, n_pts)
    wall = timed(run)
    out = {"job": "sample_copart", "cores": cores, "n_rasters": n_rasters,
           "n_points": n_pts, "wall_sec": round(wall, 2),
           "points_per_sec": round(n_pts / wall, 1)}
print(json.dumps(out))
spark.stop()
"""


def run_cfg(cores: int, corpus: str, n: int, points_per: int, job: str,
            runs: int) -> dict:
    script = RUNNER.replace("__REPO__", REPO)
    best = None
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "-c", script, str(cores), corpus, str(n),
             str(points_per), job],
            capture_output=True, text=True, timeout=1800, cwd=REPO,
        )
        r = None
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                r = json.loads(line)
        if r is None:
            raise RuntimeError(f"no result ({job}, cores={cores}):\n"
                               f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
        print(json.dumps(r))
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--big", type=int, default=32)
    ap.add_argument("--n1", type=int, default=200)
    ap.add_argument("--n5", type=int, default=1000)
    ap.add_argument("--points-per", type=int, default=5000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    c1 = gen_corpus(args.n1)
    c5 = gen_corpus(args.n5)
    print(f"corpora ready: {c1} ({args.n1}), {c5} ({args.n5})")

    dec_small = run_cfg(args.small, c1, args.n1, 0, "decode", args.runs)
    dec_big = run_cfg(args.big, c1, args.n1, 0, "decode", args.runs)
    s1 = run_cfg(args.big, c1, args.n1, args.points_per, "sample", args.runs)
    s5 = run_cfg(args.big, c5, args.n5, args.points_per, "sample", args.runs)

    ratio = args.big / args.small
    eff = (dec_small["wall_sec"] / dec_big["wall_sec"]) / ratio
    growth = s5["wall_sec"] / s1["wall_sec"]
    print("\n--- paste into BENCH/BASELINE.md ---\n")
    print(f"| decode+record build, {args.n1} rasters, local[{args.small}] "
          f"| {dec_small['wall_sec']} s | {dec_small['rasters_per_sec']}/s |")
    print(f"| decode+record build, {args.n1} rasters, local[{args.big}] "
          f"| {dec_big['wall_sec']} s | {dec_big['rasters_per_sec']}/s | "
          f"efficiency {eff:.2f} |")
    print(f"| co-partitioned sample join, {args.n1} rasters x "
          f"{args.points_per} pts | {s1['wall_sec']} s "
          f"| {s1['points_per_sec']}/s |")
    print(f"| co-partitioned sample join, {args.n5} rasters x "
          f"{args.points_per} pts | {s5['wall_sec']} s "
          f"| {s5['points_per_sec']}/s | {growth:.2f}x wall for "
          f"{args.n5 / args.n1:.0f}x rasters |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
