"""PIP kernel vs brute force + cell-cover exactness (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np

from geotiff_spark.functions import cells as C
from geotiff_spark.functions import pip as P
from geotiff_spark.sources.polygons import synth_polygons

RNG = np.random.default_rng(11)


def _brute_inside(px, py, ring):
    """Independent scalar even-odd implementation as the oracle."""
    n = len(ring)
    out = []
    for x, y in zip(px, py):
        inside = False
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            if (y0 > y) != (y1 > y):
                xin = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
                if x < xin:
                    inside = not inside
        out.append(inside)
    return np.array(out)


def test_ray_cast_matches_bruteforce_random_polygons():
    for _ in range(10):
        n_vert = RNG.integers(3, 12)
        ang = np.sort(RNG.uniform(0, 2 * np.pi, n_vert))
        rad = RNG.uniform(0.5, 2.0, n_vert)
        ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
        px = RNG.uniform(-2.5, 2.5, 400)
        py = RNG.uniform(-2.5, 2.5, 400)
        got = P.points_in_ring(px, py, ring)
        want = _brute_inside(px, py, ring)
        assert (got == want).all()


def test_holes():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float)
    px = np.array([5.0, 2.0, 11.0])
    py = np.array([5.0, 2.0, 5.0])
    got = P.points_in_polygon(px, py, outer, [hole])
    assert list(got) == [False, True, False]


def test_cell_cover_exactness():
    """For every synthetic polygon: PIP via (cover join + refine-boundary)
    must equal direct PIP for random points."""
    res = 7
    for p in synth_polygons():
        ring = np.asarray(p["ring"], dtype=np.float64)
        holes = [np.asarray(h) for h in p["holes"]]
        cell_ids, boundary = P.polygon_cell_cover(ring, holes, res)
        cover = dict(zip(cell_ids.tolist(), boundary.tolist()))

        lon_min, lat_min = ring.min(axis=0) - 0.5
        lon_max, lat_max = ring.max(axis=0) + 0.5
        px = RNG.uniform(lon_min, lon_max, 600)
        py = RNG.uniform(lat_min, lat_max, 600)

        direct = P.points_in_polygon(px, py, ring, holes)

        cells_of_pts = C.latlon_to_cell(py, px, res)
        via_index = np.zeros(len(px), dtype=bool)
        for i, cid in enumerate(cells_of_pts.tolist()):
            b = cover.get(cid)
            if b is None:
                via_index[i] = False          # not covered -> outside
            elif not b:
                via_index[i] = True           # interior cell -> inside
            else:
                via_index[i] = bool(
                    P.points_in_polygon(px[i : i + 1], py[i : i + 1], ring, holes)[0]
                )
        assert (via_index == direct).all(), p["poly_id"]


def test_cover_has_interior_cells_for_big_polygons():
    big = next(p for p in synth_polygons() if p["poly_id"] == "P_alps_star")
    cell_ids, boundary = P.polygon_cell_cover(
        np.asarray(big["ring"]), [], 9
    )
    assert (~boundary).sum() > 0  # interior fast path actually engages


def test_cell_cover_exactness_random_polygons():
    """Cover+refine == direct PIP for random star-shaped polygons across
    resolutions (boundary classification must be conservative-correct)."""
    rng = np.random.default_rng(23)
    for trial in range(6):
        n_vert = int(rng.integers(3, 14))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n_vert))
        rad = rng.uniform(0.3, 3.0, n_vert)
        cx, cy = float(rng.uniform(-30, 30)), float(rng.uniform(-50, 50))
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        res = int(rng.integers(5, 10))
        cell_ids, boundary = P.polygon_cell_cover(ring, [], res)
        cover = dict(zip(cell_ids.tolist(), boundary.tolist()))

        px = rng.uniform(ring[:, 0].min() - 1, ring[:, 0].max() + 1, 500)
        py = rng.uniform(ring[:, 1].min() - 1, ring[:, 1].max() + 1, 500)
        direct = P.points_in_polygon(px, py, ring, [])
        cells_of_pts = C.latlon_to_cell(py, px, res)
        for i, cid in enumerate(cells_of_pts.tolist()):
            b = cover.get(cid)
            if b is None:
                got = False
            elif not b:
                got = True
            else:
                got = bool(P.points_in_polygon(px[i:i+1], py[i:i+1], ring, [])[0])
            assert got == direct[i], (trial, res, px[i], py[i])
