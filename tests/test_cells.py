"""Cell-index kernel properties (SURVEY.md §5.3 item 2)."""

from __future__ import annotations

import numpy as np
import pytest

from geotiff_spark.functions import cells as C

RNG = np.random.default_rng(7)


def test_roundtrip_grid():
    lat = RNG.uniform(-90, 90, 1000)
    lon = RNG.uniform(-180, 180, 1000)
    for res in (0, 1, 7, 12, 26):
        cell = C.latlon_to_cell(lat, lon, res)
        r, ix, iy = C.cell_to_grid(cell)
        assert (r == res).all()
        ix2, iy2 = C.latlon_to_grid(lat, lon, res)
        assert (ix == ix2).all() and (iy == iy2).all()


def test_determinism():
    lat = RNG.uniform(-90, 90, 100)
    lon = RNG.uniform(-180, 180, 100)
    a = C.latlon_to_cell(lat, lon, 9)
    b = C.latlon_to_cell(lat.copy(), lon.copy(), 9)
    assert (a == b).all()


def test_point_in_own_cell_bounds():
    lat = RNG.uniform(-89, 89, 500)
    lon = RNG.uniform(-179, 179, 500)
    cell = C.latlon_to_cell(lat, lon, 10)
    lat0, lon0, lat1, lon1 = C.cell_bounds(cell)
    assert (lat >= lat0).all() and (lat < lat1).all()
    assert (lon >= lon0).all() and (lon < lon1).all()


def test_token_prefix_property():
    lat = RNG.uniform(-89, 89, 200)
    lon = RNG.uniform(-179, 179, 200)
    fine = C.cell_to_token(C.latlon_to_cell(lat, lon, 12))
    coarse = C.cell_to_token(C.latlon_to_cell(lat, lon, 5))
    for f, c in zip(fine, coarse):
        assert len(f) == 12 and len(c) == 5
        assert f.startswith(c)


def test_parent_cell_matches_direct_encode():
    lat = RNG.uniform(-89, 89, 200)
    lon = RNG.uniform(-179, 179, 200)
    fine = C.latlon_to_cell(lat, lon, 14)
    par = C.parent_cell(fine, 6)
    direct = C.latlon_to_cell(lat, lon, 6)
    assert (par == direct).all()


def test_ring_adjacency():
    cell = int(C.latlon_to_cell([47.0], [9.0], 8)[0])
    r0 = C.ring_cells(cell, 0)
    assert list(r0) == [cell]
    r1 = C.ring_cells(cell, 1)
    assert len(r1) == 8
    r2 = C.ring_cells(cell, 2)
    assert len(r2) == 16
    # disk = union of rings
    disk = C.disk_cells(cell, 2)
    assert set(disk) == set(r0) | set(r1) | set(r2)
    # ring-1 cells are grid-adjacent
    _, ix, iy = C.cell_to_grid(np.asarray([cell]))
    for c in r1:
        _, jx, jy = C.cell_to_grid(np.asarray([int(c)]))
        assert max(abs(int(jx[0] - ix[0])), abs(int(jy[0] - iy[0]))) == 1


def test_lon_wrap_in_ring():
    cell = int(C.latlon_to_cell([0.0], [-179.99], 6)[0])
    r1 = C.ring_cells(cell, 1)
    assert len(r1) == 8  # wraps across the antimeridian, nothing clipped


def test_pole_clip_in_ring():
    cell = int(C.latlon_to_cell([89.99], [0.0], 6)[0])
    r1 = C.ring_cells(cell, 1)
    assert len(r1) == 5  # top row clipped


def test_res_out_of_range():
    with pytest.raises(ValueError):
        C.latlon_to_grid([0.0], [0.0], 27)


def test_cell_udf_exact_in_mixed_null_batches(spark):
    """Round-4 regression: cell ids are ~2^60 and only agree to ~2^8 in
    float64, so a NULL-bearing Arrow batch must NOT coerce the int64
    output through float (the old pd.Series.where() path did exactly
    that, masked by a filter-before-eval plan)."""
    import numpy as np

    from geotiff_spark.functions import cells as cellmod
    from geotiff_spark.operators.extract import cell_udf

    rows = [(float(47 + i % 5), float(8 + i % 9)) for i in range(40)]
    rows += [(None, None)] * 10  # force a mixed batch
    df = spark.createDataFrame(rows, "lat double, lon double")
    got = df.select("lat", "lon", cell_udf(7)("lat", "lon").alias("cell")).collect()
    n_null = sum(1 for r in got if r.cell is None)
    assert n_null == 10
    for r in got:
        if r.cell is None:
            continue
        truth = int(cellmod.latlon_to_cell(
            np.array([r.lat]), np.array([r.lon]), 7)[0])
        assert r.cell == truth, (r.lat, r.lon, r.cell, truth)
