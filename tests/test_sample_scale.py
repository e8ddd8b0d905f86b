"""Round-4: the sampling join must never decode rasters on the driver.

VERDICT r3 "What's wrong" #1: load_raster_records decoded sequentially on
the driver and broadcast the dict — a driver OOM/serial bottleneck at a
100× raster corpus. These tests pin the replacement: executor-side decode
feeding a size-guarded broadcast, and a co-partitioned cogroup branch
above the guard, both bit-identical to the driver-loop reference path.
"""

from __future__ import annotations

import glob
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotiff_spark.operators import sample as smp

RESOURCE_DIR = "/root/reference/resources"
AUSTRIAN = (
    f"{RESOURCE_DIR}/"
    "austrian_capitals_model_tie_point_and_pixel_scale_pixel_is_area.tif"
)
MERC = f"{RESOURCE_DIR}/merc.tif"


def _all_fixture_paths():
    return sorted(glob.glob(f"{RESOURCE_DIR}/*.tif"))


def test_distributed_records_equal_driver_records(spark):
    """Executor-side decode must produce byte-identical records to the
    (trusted, golden-verified) driver loop for every reference fixture."""
    paths = _all_fixture_paths()
    smp._RECORDS_CACHE.clear()
    dist = smp.load_raster_records_distributed(spark, paths)
    ref = smp.load_raster_records(paths)
    assert sorted(dist) == sorted(ref)
    for rid in ref:
        a, b = dist[rid], ref[rid]
        for k in ("width", "height", "num_samples", "dtype", "raster_type"):
            assert a[k] == b[k], (rid, k)
        assert a["data"] == b["data"], rid
        assert a["transform"][0] == b["transform"][0], rid
        assert np.allclose(
            np.asarray(a["transform"][1], dtype=float),
            np.asarray([float(c) for c in b["transform"][1]], dtype=float),
        ), rid
        assert np.allclose(
            np.asarray(a["extent"], dtype=float),
            np.asarray(b["extent"], dtype=float),
        ), rid


def test_decode_runs_on_executors_not_driver(spark, monkeypatch):
    """Poisoning read_geotiff in the DRIVER process must not break the
    sampling path: pyspark python workers are separate processes, so a
    pass here proves the decode ran executor-side."""
    from geotiff_spark.functions import geotiff as gt

    smp._RECORDS_CACHE.clear()
    smp._SIZES_CACHE.clear()

    def boom(_data):
        raise AssertionError("decode ran on the driver")

    monkeypatch.setattr(gt, "read_geotiff", boom)
    pts = spark.range(5).select(
        F.col("id").alias("pid"),
        (F.lit(1871032.95) + F.col("id") * 1000).alias("x"),
        (F.lit(2749044.03) - F.col("id") * 1000).alias("y"),
    )
    out = smp.with_raster_sample(
        pts, spark, [AUSTRIAN], AUSTRIAN.rsplit("/", 1)[-1]
    ).collect()
    assert len(out) == 5


def _routing_points(spark):
    """Points routed per-row across two rasters (different transforms),
    plus out-of-bounds rows and an unknown raster id."""
    aus = AUSTRIAN.rsplit("/", 1)[-1]
    mer = MERC.rsplit("/", 1)[-1]
    rows = []
    for i in range(200):
        # austrian extent: x [4302000, 4809000), y [2621000, 2811000)
        rows.append((i, aus, 4302000.0 + (i * 3141) % 507000,
                     2621000.0 + (i * 2718) % 190000))
    for i in range(200, 400):
        # merc extent: x [1871033, 1901983), y [662409, 693359)
        rows.append((i, mer, 1871033.0 + (i * 991) % 30900,
                     662409.0 + (i * 577) % 30900))
    rows.append((400, aus, -1e9, -1e9))        # far out of bounds
    rows.append((401, "nope.tif", 0.0, 0.0))   # unknown raster id
    return spark.createDataFrame(
        rows, "pid long, rid string, x double, y double"
    )


@pytest.mark.parametrize("n_salt", [1, 3])
def test_copartition_equals_broadcast(spark, n_salt):
    pts = _routing_points(spark)
    paths = [AUSTRIAN, MERC]
    bc = smp.with_raster_sample(
        pts, spark, paths, F.col("rid"), mode="broadcast"
    ).collect()
    cp = smp.with_raster_sample(
        pts, spark, paths, F.col("rid"), mode="copartition", n_salt=n_salt
    ).collect()
    a = {r.pid: r.value for r in bc}
    b = {r.pid: r.value for r in cp}
    assert set(a) == set(b) and len(a) == 402
    for pid in a:
        va, vb = a[pid], b[pid]
        assert (va is None and vb is None) or va == vb, (pid, va, vb)
    assert a[400] is None and a[401] is None
    assert any(v is not None for v in a.values())


def test_auto_mode_size_guard_picks_branch(spark):
    """auto: small corpus broadcasts (ArrowEvalPython gather); a tiny
    guard forces the co-partitioned cogroup plan."""
    pts = _routing_points(spark)
    paths = [AUSTRIAN, MERC]
    smp._SIZES_CACHE.clear()
    small = smp.with_raster_sample(pts, spark, paths, F.col("rid"), mode="auto")
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in plan_small
    assert "ArrowEvalPython" in plan_small

    forced = smp.with_raster_sample(
        pts, spark, paths, F.col("rid"), mode="auto", max_broadcast_bytes=1
    )
    plan_forced = forced._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan_forced
    # and the forced branch still computes the same values
    a = {r.pid: r.value for r in small.collect()}
    b = {r.pid: r.value for r in forced.collect()}
    assert a == b


def test_header_probe_matches_decoded_sizes(spark):
    paths = _all_fixture_paths()
    probed = {
        r.raster_id: r.decoded_bytes
        for r in smp.raster_decoded_sizes(spark, paths).collect()
    }
    ref = smp.load_raster_records(paths)
    for rid, rec in ref.items():
        assert probed[rid] == len(rec["data"]), rid


def test_flagship_pipeline_unchanged_through_new_path(spark):
    """zonal_stats through the rebuilt sampling path must still match the
    committed golden shape at sf0.001 (full hash parity is the driver's
    oracle gate; here we pin non-degenerate output)."""
    from geotiff_spark.pipeline import flagship

    rows = flagship(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert any(r.avg_value is not None for r in rows)
