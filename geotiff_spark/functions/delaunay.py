"""Incremental Delaunay triangulation following the delaunator algorithm
(Mapbox delaunator, ISC — the same algorithm behind the `delaunator` crate
the reference uses at /root/reference/src/coordinate_transform/tie_points.rs:29).

Parity matters beyond topology: the reference's piecewise-warp arithmetic
depends on each triangle's vertex ORDER and the triangle list order (the
first containing face wins, and locate/interpolate rounding differs per
vertex rotation — the austrian tie-points extent-corner golden is decided
by the last ulp). This port reproduces delaunator's seeding, insertion
order, hull walk, and flip bookkeeping; predicates are plain f64 (the
crate uses robust predicates — divergence is possible only on
near-degenerate inputs, none of which the fixtures or sane GeoTIFFs hit).
"""

from __future__ import annotations

import math

EPS = 2 ** -52


def _orient2d(ax, ay, bx, by, cx, cy) -> float:
    """Positive when (a, b, c) turn counterclockwise."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _in_circle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    dx = ax - px
    dy = ay - py
    ex = bx - px
    ey = by - py
    fx = cx - px
    fy = cy - py
    ap = dx * dx + dy * dy
    bp = ex * ex + ey * ey
    cp = fx * fx + fy * fy
    # positive determinant ⟺ p strictly inside the circumcircle of the
    # CCW triangle (a, b, c)
    return (
        dx * (ey * cp - bp * fy)
        - dy * (ex * cp - bp * fx)
        + ap * (ex * fy - ey * fx)
    ) > 0


def _circumradius2(ax, ay, bx, by, cx, cy) -> float:
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = 0.5 / (dx * ey - dy * ex)
    x = (ey * bl - dy * cl) * d
    y = (dx * cl - ex * bl) * d
    return x * x + y * y


def _circumcenter(ax, ay, bx, by, cx, cy):
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = 0.5 / (dx * ey - dy * ex)
    return ax + (ey * bl - dy * cl) * d, ay + (dx * cl - ex * bl) * d


class Triangulation:
    """delaunator-convention triangulation: math-CCW seed/triangles/hull,
    insertion ordered by distance from the seed circumcenter, hull-walk
    triangle creation, iterative legalization. Verified against the
    reference's austrian tie-point goldens, which are sensitive to the
    exact triangle list and vertex rotations this produces.
    """

    def __init__(self, points):
        self.px = [float(p[0]) for p in points]
        self.py = [float(p[1]) for p in points]
        n = len(points)
        if n < 3:
            raise ValueError("need at least 3 points")
        self.triangles: list[int] = []
        self.halfedges: list[int] = []
        self.hull_prev = [0] * n
        self.hull_next = [0] * n
        self.hull_tri = [0] * n
        self._run(n)

    # -- core ---------------------------------------------------------------

    def _run(self, n):
        px, py = self.px, self.py
        min_x, max_x = min(px), max(px)
        min_y, max_y = min(py), max(py)
        cx = (min_x + max_x) / 2
        cy = (min_y + max_y) / 2

        def dist2(i, x, y):
            return (px[i] - x) ** 2 + (py[i] - y) ** 2

        i0 = min(range(n), key=lambda i: dist2(i, cx, cy))
        i1 = min(
            (i for i in range(n) if i != i0),
            key=lambda i: dist2(i, px[i0], py[i0]),
        )
        best = None
        i2 = None
        for i in range(n):
            if i in (i0, i1):
                continue
            o = _orient2d(px[i0], py[i0], px[i1], py[i1], px[i], py[i])
            if o == 0:
                continue
            r = _circumradius2(px[i0], py[i0], px[i1], py[i1], px[i], py[i])
            if best is None or r < best:
                best = r
                i2 = i
        if i2 is None:
            raise ValueError("all points are collinear")
        if _orient2d(px[i0], py[i0], px[i1], py[i1], px[i2], py[i2]) < 0:
            i1, i2 = i2, i1

        ccx, ccy = _circumcenter(
            px[i0], py[i0], px[i1], py[i1], px[i2], py[i2]
        )
        order = sorted(
            (i for i in range(n) if i not in (i0, i1, i2)),
            key=lambda i: (dist2(i, ccx, ccy), i),
        )

        self.hull_start = i0
        hn, hp, ht = self.hull_next, self.hull_prev, self.hull_tri
        hn[i0], hn[i1], hn[i2] = i1, i2, i0
        hp[i2], hp[i1], hp[i0] = i1, i0, i2
        ht[i0], ht[i1], ht[i2] = 0, 1, 2
        self._add_triangle(i0, i1, i2, -1, -1, -1)

        xp = yp = None
        for i in order:
            x, y = px[i], py[i]
            if xp is not None and abs(x - xp) <= EPS and abs(y - yp) <= EPS:
                continue
            xp, yp = x, y

            # find a visible hull edge (linear walk; delaunator hashes —
            # same resulting edge for non-degenerate input)
            e = self.hull_start
            while True:
                q = hn[e]
                if _orient2d(x, y, px[e], py[e], px[q], py[q]) < 0:
                    break
                e = q
                if e == self.hull_start:
                    e = -1
                    break
            if e == -1:
                continue  # coincident / fully inside numerical degeneracy

            q = hn[e]
            t = self._add_triangle(e, i, q, -1, -1, ht[e])
            ht[i] = self._legalize(t + 2)
            ht[e] = t

            # walk forward
            nxt = hn[q]
            while _orient2d(x, y, px[q], py[q], px[nxt], py[nxt]) < 0:
                t = self._add_triangle(q, i, nxt, ht[i], -1, ht[q])
                ht[i] = self._legalize(t + 2)
                hn[q] = q  # removed
                q = nxt
                nxt = hn[q]

            # walk backward
            if e == self.hull_start:
                prv = hp[e]
                while _orient2d(x, y, px[prv], py[prv], px[e], py[e]) < 0:
                    t = self._add_triangle(prv, i, e, -1, ht[e], ht[prv])
                    self._legalize(t + 2)
                    ht[prv] = t
                    hn[e] = e  # removed
                    e = prv
                    prv = hp[e]

            self.hull_start = e
            hp[i] = e
            hn[e] = i
            hp[q] = i
            hn[i] = q

    # -- helpers ------------------------------------------------------------

    def _link(self, a: int, b: int) -> None:
        if a != -1:
            while len(self.halfedges) <= a:
                self.halfedges.append(-1)
            self.halfedges[a] = b
        if b != -1:
            while len(self.halfedges) <= b:
                self.halfedges.append(-1)
            self.halfedges[b] = a

    def _add_triangle(self, i0, i1, i2, a, b, c) -> int:
        t = len(self.triangles)
        self.triangles += [i0, i1, i2]
        while len(self.halfedges) < t + 3:
            self.halfedges.append(-1)
        self._link(t, a)
        self._link(t + 1, b)
        self._link(t + 2, c)
        return t

    def _legalize(self, a: int) -> int:
        tri = self.triangles
        he = self.halfedges
        px, py = self.px, self.py
        stack: list[int] = []
        ar = 0
        while True:
            b = he[a]
            a0 = a - a % 3
            ar = a0 + (a + 2) % 3
            if b == -1:  # convex hull edge
                if not stack:
                    break
                a = stack.pop()
                continue
            b0 = b - b % 3
            al = a0 + (a + 1) % 3
            bl = b0 + (b + 2) % 3
            p0 = tri[ar]
            pr = tri[a]
            pl = tri[al]
            p1 = tri[bl]
            illegal = _in_circle(
                px[p0], py[p0], px[pr], py[pr], px[pl], py[pl], px[p1], py[p1]
            )
            if illegal:
                tri[a] = p1
                tri[b] = p0
                hbl = he[bl]
                if hbl == -1:
                    # edge on convex hull: fix hull_tri reference
                    e = self.hull_start
                    while True:
                        if self.hull_tri[e] == bl:
                            self.hull_tri[e] = a
                            break
                        e = self.hull_prev[e]
                        if e == self.hull_start:
                            break
                self._link(a, hbl)
                self._link(b, he[ar])
                self._link(ar, bl)
                br = b0 + (b + 1) % 3
                stack.append(br)
            else:
                if not stack:
                    break
                a = stack.pop()
        return ar

    # -- outputs ------------------------------------------------------------

    def triangle_list(self) -> list[tuple[int, int, int]]:
        t = self.triangles
        return [tuple(t[i : i + 3]) for i in range(0, len(t), 3)]

    def hull(self) -> list[int]:
        out = [self.hull_start]
        e = self.hull_next[self.hull_start]
        while e != self.hull_start:
            out.append(e)
            e = self.hull_next[e]
        return out
