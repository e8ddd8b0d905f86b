"""Point-in-polygon kernels + polygon→cell cover, vectorized numpy.

The exact containment test is the engine's analog of the reference's
half-plane cross-product Face::contains
(/root/reference/src/coordinate_transform/tie_points.rs:205-229); for
general (non-convex, holed) polygons we use the standard even-odd
ray-casting rule, vectorized over point arrays.

The cell cover mirrors the reference's envelope-prefilter-then-exact-test
pattern (R-tree search → Face::contains, tie_points.rs:182-195): interior
cells are proven fully-inside at index build time, so only boundary-cell
candidates pay the exact ray-cast at join time — exactness preserved.
"""

from __future__ import annotations

import numpy as np

from . import cells as cellmod


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray casting: points (px, py) vs one closed ring
    (ring: (n,2) float64, first==last optional). Returns bool array.
    Points exactly on an edge follow the half-open convention of the
    crossing test (deterministic, documented)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    x0, y0 = r[:, 0], r[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)

    # vectorized over points x edges: for moderate ring sizes this is the
    # right trade — candidate batches are the big axis
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(len(r)):
        cond = (y0[i] > py) != (y1[i] > py)
        if not cond.any():
            continue
        t = (py - y0[i]) / (y1[i] - y0[i])
        xin = x0[i] + t * (x1[i] - x0[i])
        inside ^= cond & (px < xin)
    return inside


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    ring: np.ndarray,
    holes: list[np.ndarray] | None = None,
) -> np.ndarray:
    """Containment with holes: inside outer ring and in no hole."""
    inside = points_in_ring(px, py, ring)
    for hole in holes or []:
        inside &= ~points_in_ring(px, py, np.asarray(hole))
    return inside


def _segments_cross_rect(ring: np.ndarray, rx0, ry0, rx1, ry1) -> bool:
    """Any ring edge intersects the axis-aligned rect? Conservative exact
    test via separating-axis on each segment vs rect."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    x0, y0 = r[:, 0], r[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    # quick reject: segment bbox vs rect
    bb = (
        (np.maximum(x0, x1) >= rx0)
        & (np.minimum(x0, x1) <= rx1)
        & (np.maximum(y0, y1) >= ry0)
        & (np.minimum(y0, y1) <= ry1)
    )
    if not bb.any():
        return False
    x0, y0, x1, y1 = x0[bb], y0[bb], x1[bb], y1[bb]
    # an endpoint inside the rect → crosses
    if (
        ((x0 >= rx0) & (x0 <= rx1) & (y0 >= ry0) & (y0 <= ry1)).any()
        or ((x1 >= rx0) & (x1 <= rx1) & (y1 >= ry0) & (y1 <= ry1)).any()
    ):
        return True
    # segment vs each rect edge: standard orientation test
    rect_edges = [
        (rx0, ry0, rx1, ry0),
        (rx1, ry0, rx1, ry1),
        (rx1, ry1, rx0, ry1),
        (rx0, ry1, rx0, ry0),
    ]

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    for ex0, ey0, ex1, ey1 in rect_edges:
        d1 = orient(x0, y0, x1, y1, ex0, ey0)
        d2 = orient(x0, y0, x1, y1, ex1, ey1)
        d3 = orient(ex0, ey0, ex1, ey1, x0, y0)
        d4 = orient(ex0, ey0, ex1, ey1, x1, y1)
        if (((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))).any():
            return True
    return False


def polygon_cell_cover(
    ring: np.ndarray,
    holes: list[np.ndarray] | None,
    res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cover a polygon with grid cells at `res`.

    Returns (cell_ids int64, is_boundary bool): cells whose rectangle may
    intersect the polygon. is_boundary=False ⇒ the cell is PROVEN fully
    inside (all 4 corners in, no edge crossing, no hole touching) and join
    hits skip the exact PIP test. Polygon coords are (lon, lat) = (x, y).
    """
    r = np.asarray(ring, dtype=np.float64)
    lon_min, lat_min = r.min(axis=0)
    lon_max, lat_max = r.max(axis=0)
    ix0, iy0 = cellmod.latlon_to_grid([lat_min], [lon_min], res)
    ix1, iy1 = cellmod.latlon_to_grid([lat_max], [lon_max], res)
    xs = np.arange(ix0[0], ix1[0] + 1)
    ys = np.arange(iy0[0], iy1[0] + 1)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    n = np.int64(1) << np.int64(res)

    # cell rect bounds in lon/lat
    clon0 = gx / float(n) * 360.0 - 180.0
    clon1 = (gx + 1) / float(n) * 360.0 - 180.0
    clat0 = gy / float(n) * 180.0 - 90.0
    clat1 = (gy + 1) / float(n) * 180.0 - 90.0

    # classify via the 4 corners
    corners_in = np.ones(gx.shape, dtype=bool)
    any_in = np.zeros(gx.shape, dtype=bool)
    for cx, cy in ((clon0, clat0), (clon0, clat1), (clon1, clat0), (clon1, clat1)):
        inside = points_in_polygon(cx, cy, r, holes)
        corners_in &= inside
        any_in |= inside

    keep = np.zeros(gx.shape, dtype=bool)
    boundary = np.zeros(gx.shape, dtype=bool)
    all_rings = [r] + [np.asarray(h, dtype=np.float64) for h in (holes or [])]
    for i in range(gx.size):
        crossed = any(
            _segments_cross_rect(rr, clon0[i], clat0[i], clon1[i], clat1[i])
            for rr in all_rings
        )
        if corners_in[i] and not crossed:
            keep[i] = True            # interior: exact hit, no refinement
        elif any_in[i] or crossed:
            keep[i] = True
            boundary[i] = True        # boundary: refine with ray cast
        # else: a polygon smaller than one cell with no cell corner inside
        # is still covered — its edges lie inside the cell rect, so
        # `crossed` is True (endpoint-inside-rect check above).

    cell_ids = cellmod.grid_to_cell(gx[keep], gy[keep], res)
    return cell_ids, boundary[keep]
