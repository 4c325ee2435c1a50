"""Constructive geometry: Buffer, Delaunay triangulation, MakeValid
(reference ogr/ogr_geometry.h:563-591 — OGRGeometry::Buffer /
DelaunayTriangulation / MakeValid, which delegate to GEOS; here the
public algorithms are implemented directly).

- ``buffer_point`` / ``buffer_polygon``: GEOS-style round buffer with
  ``quadsegs`` segments per quadrant (default 8). Polygon buffers fold
  edge capsules into the ring with the Greiner-Hormann union
  (functions/overlay.py) — positive distances on simple polygons.
- ``delaunay``: Bowyer-Watson incremental triangulation with a super
  triangle; the standard empty-circumcircle construction.
- ``make_valid_ring``: even-odd decomposition of a self-intersecting
  ring into simple sub-rings (the bow-tie repair MakeValid performs in
  its 'linework' strategy).
"""

from __future__ import annotations

import numpy as np

from .geom import ring_area
from .overlay import _seg_intersect, polygon_union


def circle_ring(cx: float, cy: float, r: float, quadsegs: int = 8) -> np.ndarray:
    n = 4 * quadsegs
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1)
    return np.vstack([ring, ring[:1]])


def buffer_point(x: float, y: float, dist: float, quadsegs: int = 8) -> np.ndarray:
    """Round buffer of a point: closed ring."""
    return circle_ring(x, y, dist, quadsegs)


def _capsule(p: np.ndarray, q: np.ndarray, r: float,
             quadsegs: int = 8) -> np.ndarray:
    """Round-capped buffer of segment pq (a 'stadium'), closed ring."""
    d = q - p
    L = float(np.hypot(d[0], d[1]))
    if L < 1e-15:
        return circle_ring(p[0], p[1], r, quadsegs)
    ang = np.arctan2(d[1], d[0])
    n = 2 * quadsegs
    # semicircle at q (from -90deg to +90deg relative to direction)
    th_q = ang + np.linspace(-np.pi / 2, np.pi / 2, n + 1)
    th_p = ang + np.linspace(np.pi / 2, 3 * np.pi / 2, n + 1)
    pts = np.vstack([
        np.stack([q[0] + r * np.cos(th_q), q[1] + r * np.sin(th_q)], 1),
        np.stack([p[0] + r * np.cos(th_p), p[1] + r * np.sin(th_p)], 1),
    ])
    return np.vstack([pts, pts[:1]])


def buffer_polygon(ring: np.ndarray, dist: float,
                   quadsegs: int = 8) -> np.ndarray:
    """Positive round buffer of a simple polygon ring: the polygon
    unioned with each edge's capsule (Minkowski sum with a disc,
    decomposed). Returns a single closed ring; raises if a union step
    fragments (cannot happen for positive buffers of simple rings)."""
    if dist <= 0:
        raise NotImplementedError("negative/zero buffer distance")
    r = np.asarray(ring, np.float64)
    if np.allclose(r[0], r[-1]):
        r = r[:-1]
    acc = np.vstack([r, r[:1]])
    for i in range(len(r)):
        cap = _capsule(r[i], r[(i + 1) % len(r)], dist, quadsegs)
        parts = polygon_union(acc, cap)
        if len(parts) != 1:
            raise ValueError("buffer union fragmented")
        acc = parts[0]
    return acc


def buffer_area(ring: np.ndarray, dist: float, quadsegs: int = 8) -> float:
    return abs(ring_area(buffer_polygon(ring, dist, quadsegs)))


# ------------------------------------------------------------------ Delaunay


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation. Returns (T, 3) vertex
    index triangles (order normalized ascending per triangle, sorted)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int64)
    # super-triangle
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    M = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 10.0
    sup = np.array([(cx - 20 * M, cy - M), (cx + 20 * M, cy - M),
                    (cx, cy + 20 * M)])
    allp = np.vstack([pts, sup])
    tris: list[tuple] = [(n, n + 1, n + 2)]

    def circum(tri):
        a, b, c = allp[list(tri)]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        if abs(d) < 1e-30:
            return (0.0, 0.0), np.inf
        ux = ((a[0] ** 2 + a[1] ** 2) * (b[1] - c[1])
              + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
              + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])) / d
        uy = ((a[0] ** 2 + a[1] ** 2) * (c[0] - b[0])
              + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
              + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])) / d
        rr = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        return (ux, uy), rr

    cc = {tris[0]: circum(tris[0])}
    for i in range(n):
        p = allp[i]
        bad = [t for t in tris
               if (p[0] - cc[t][0][0]) ** 2 + (p[1] - cc[t][0][1]) ** 2
               <= cc[t][1] * (1 + 1e-12)]
        # boundary of the cavity: edges appearing once
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            del cc[t]
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                t = (a, b, i)
                tris.append(t)
                cc[t] = circum(t)
    out = [tuple(sorted(t)) for t in tris
           if all(v < n for v in t)]
    return np.array(sorted(out), np.int64).reshape(-1, 3)


# ----------------------------------------------------------------- MakeValid


def make_valid_ring(ring: np.ndarray, _depth: int = 0) -> list[np.ndarray]:
    """Split a self-intersecting ring into simple sub-rings at its
    first self-crossing, recursively (bow-tie untwist — the linework
    part of GEOS MakeValid). Simple input returns itself."""
    r = np.asarray(ring, np.float64)
    if np.allclose(r[0], r[-1]):
        r = r[:-1]
    m = len(r)
    if _depth > m:
        raise ValueError("make_valid: did not converge")
    for i in range(m):
        a1, a2 = r[i], r[(i + 1) % m]
        for j in range(i + 2, m):
            if i == 0 and j == m - 1:
                continue  # adjacent through the closure
            b1, b2 = r[j], r[(j + 1) % m]
            hit = _seg_intersect(tuple(a1), tuple(a2), tuple(b1), tuple(b2))
            if hit == "degenerate" or hit is None:
                continue
            t, _u = hit
            p = a1 + t * (a2 - a1)
            # split: ring1 = p, r[i+1..j], p ; ring2 = p, r[j+1..i], p
            ring1 = np.vstack([[p], r[i + 1:j + 1], [p]])
            ring2 = np.vstack([[p], r[j + 1:], r[:i + 1], [p]])
            out = []
            for sub in (ring1, ring2):
                if len(sub) >= 4:
                    out.extend(make_valid_ring(sub, _depth + 1))
            return out
    return [np.vstack([r, r[:1]])]


def make_valid_area(ring: np.ndarray) -> float:
    """Area under the even-odd repair: sum of |area| of the untwisted
    sub-rings (matches GEOS MakeValid on bow-ties)."""
    return sum(abs(ring_area(s)) for s in make_valid_ring(ring))


def swap_xy(geom):
    """`gdal vector swap-xy` (apps/gdalalg_vector_swap_xy.cpp,
    OGRGeometry::swapXY): exchange the coordinate order of every
    vertex, all geometry kinds (autotest
    test_gdalalg_vector_swap_xy.py: POINT (1 2) -> POINT (2 1))."""
    from .wkb import Geom

    return Geom(geom.kind, [r[:, ::-1].copy() for r in geom.rings],
                poly_ring_counts=list(geom.poly_ring_counts or []) or None)
