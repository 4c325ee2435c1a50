"""gdal_grid scattered-point gridding algorithms (reference
alg/gdalgrid.cpp; app apps/gdal_grid_lib.cpp).

Node convention: node (i, j) sits at
``(xmin + (i+0.5)*dx, ymin + (j+0.5)*dy)`` with ``dx=(xmax-xmin)/nx``,
``dy=(ymax-ymin)/ny`` (dy may be negative — row 0 is the ymin side,
matching the -txe/-tye argument order).

Search window: rotated ellipse (radius1, radius2, angle degrees,
counterclockwise), both radii 0 meaning "all points". ``min_points``
below which a node becomes nodata; ``max_points`` caps the nearest
points used (invdistnn).

Algorithms: invdist (power/smoothing; exact-hit rule r2 < 1e-13 takes
the point value), invdistnn, average, minimum, maximum, range, count,
average_distance, average_distance_pts, nearest.
"""

from __future__ import annotations

import numpy as np

_EXACT_HIT_R2 = 1e-13


def _node_coords(xmin, xmax, ymin, ymax, nx, ny):
    dx = (xmax - xmin) / nx
    dy = (ymax - ymin) / ny
    cx = xmin + (np.arange(nx) + 0.5) * dx
    cy = ymin + (np.arange(ny) + 0.5) * dy
    return np.meshgrid(cx, cy)


def _ellipse_mask(dxs, dys, radius1, radius2, angle_deg):
    """Boolean mask of points inside the rotated search ellipse
    (GDALGridExtractPointsIntoBuffers rotation convention)."""
    if radius1 <= 0 and radius2 <= 0:
        return np.ones(dxs.shape, bool)
    a = np.radians(angle_deg)
    ca, sa = np.cos(a), np.sin(a)
    xr = dxs * ca + dys * sa
    yr = -dxs * sa + dys * ca
    r1 = radius1 if radius1 > 0 else 1e300
    r2 = radius2 if radius2 > 0 else 1e300
    return (xr / r1) ** 2 + (yr / r2) ** 2 <= 1.0


def build_tin(px, py):
    """Delaunay TIN of the scatter points -> (T, 3) CCW triangles
    (the once-per-actor state of the distributed linear gridder).

    Duplicate coordinates are merged onto their first occurrence
    before triangulating (the incremental algorithm corrupts on
    exact duplicates; GDAL's qhull path joggles/merges the same way —
    alg/gdalgrid.cpp GDALGridLinear)."""
    from .delaunay import Triangulation

    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    if len(px) < 3:
        return np.empty((0, 3), np.int64)
    pts = np.c_[px, py]
    uniq, first = np.unique(pts, axis=0, return_index=True)
    if len(uniq) < 3:
        return np.empty((0, 3), np.int64)
    if len(uniq) == len(pts):
        return Triangulation(pts).triangles_ccw()
    return first[Triangulation(uniq).triangles_ccw()]


def linear_eval(tri, px, py, pz, cx, cy, radius, nodata) -> np.ndarray:
    """Evaluate GGA_Linear on the regular node grid (cx, cy) given a
    prebuilt TIN: barycentric interpolation inside the hull; outside,
    nearest point if within ``radius`` (radius < 0 = unlimited — the
    gdal_grid_lib default -1), else nodata. The triangle scan is
    vectorized per triangle over the grid nodes its bbox covers;
    triangles whose y-span misses every row are skipped up front, so
    a row-block evaluation only pays for its own triangles."""
    nx, ny = len(cx), len(cy)
    gx, gy = np.meshgrid(cx, cy)
    out = np.full(gx.size, np.nan, np.float64)
    dx = cx[1] - cx[0] if nx > 1 else 1.0
    dy = cy[1] - cy[0] if ny > 1 else 1.0
    if len(tri):
        ty0 = np.minimum.reduce([py[tri[:, 0]], py[tri[:, 1]], py[tri[:, 2]]])
        ty1 = np.maximum.reduce([py[tri[:, 0]], py[tri[:, 1]], py[tri[:, 2]]])
        ylo, yhi = (cy.min(), cy.max())
        tri = tri[(ty1 >= ylo) & (ty0 <= yhi)]
    for a, b, c in tri:
        ax, ay, bx, by, cx2, cy2 = px[a], py[a], px[b], py[b], px[c], py[c]
        x0, x1 = min(ax, bx, cx2), max(ax, bx, cx2)
        y0, y1 = min(ay, by, cy2), max(ay, by, cy2)
        i0 = max(0, int(np.ceil((x0 - cx[0]) / dx - 1e-9)) if dx > 0
                 else int(np.ceil((x1 - cx[0]) / dx - 1e-9)))
        i1 = min(nx - 1, int(np.floor((x1 - cx[0]) / dx + 1e-9)) if dx > 0
                 else int(np.floor((x0 - cx[0]) / dx + 1e-9)))
        j0 = max(0, int(np.ceil((y0 - cy[0]) / dy - 1e-9)) if dy > 0
                 else int(np.ceil((y1 - cy[0]) / dy - 1e-9)))
        j1 = min(ny - 1, int(np.floor((y1 - cy[0]) / dy + 1e-9)) if dy > 0
                 else int(np.floor((y0 - cy[0]) / dy + 1e-9)))
        if i1 < i0 or j1 < j0:
            continue
        nxs = cx[i0:i1 + 1][None, :]
        nys = cy[j0:j1 + 1][:, None]
        det = (by - ay) * (cx2 - ax) - (bx - ax) * (cy2 - ay)
        if det == 0:
            continue
        l1 = ((by - cy2) * (nxs - cx2) + (cx2 - bx) * (nys - cy2)) / -det
        l2 = ((cy2 - ay) * (nxs - cx2) + (ax - cx2) * (nys - cy2)) / -det
        l3 = 1.0 - l1 - l2
        eps = -1e-10
        m = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        if not m.any():
            continue
        vals = l1 * pz[a] + l2 * pz[b] + l3 * pz[c]
        jj, ii = np.nonzero(m)
        out[(jj + j0) * nx + (ii + i0)] = vals[m]
    # outside the hull
    miss = np.isnan(out)
    if miss.any():
        if radius == 0.0:
            out[miss] = nodata
        else:
            mx = gx.ravel()[miss]
            my = gy.ravel()[miss]
            fill = np.full(mx.shape, nodata, np.float64)
            if len(px):
                d2 = ((px[None, :] - mx[:, None]) ** 2
                      + (py[None, :] - my[:, None]) ** 2)
                k = np.argmin(d2, axis=1)
                best = d2[np.arange(len(mx)), k]
                ok = (np.ones(len(mx), bool) if radius < 0
                      else best <= radius * radius)
                fill[ok] = pz[k[ok]]
            out[miss] = fill
    return out.reshape(ny, nx)


def grid_points(px, py, pz, algo: str, *, xmin, xmax, ymin, ymax,
                nx: int, ny: int, power: float = 2.0,
                smoothing: float = 0.0, radius1: float = 0.0,
                radius2: float = 0.0, radius: float = 0.0,
                angle: float = 0.0, min_points: int = 0,
                max_points: int = 0, nodata: float = 0.0) -> np.ndarray:
    """Grid the scattered points -> (ny, nx) float64 array."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pz = np.asarray(pz, np.float64)
    gx, gy = _node_coords(xmin, xmax, ymin, ymax, nx, ny)
    if algo == "linear":
        return linear_eval(build_tin(px, py), px, py, pz,
                           gx[0, :], gy[:, 0], radius, nodata)
    out = np.full(gx.size, nodata, np.float64)
    gxf = gx.ravel()
    gyf = gy.ravel()
    rad = radius if radius > 0 else 0.0

    for i in range(gx.size):
        # per-node deltas: a dense (nodes, points) matrix would be
        # O(nx*ny*n_points) memory (hundreds of GB at 256^2 x 100k)
        dx = px - gxf[i]
        dy = py - gyf[i]
        r2i = dx * dx + dy * dy
        if algo == "invdistnn":
            m = (r2i <= rad * rad if rad > 0
                 else np.ones(r2i.shape, bool))
        else:
            m = _ellipse_mask(dx[None, :], dy[None, :],
                              radius1, radius2, angle)[0]
        rr = r2i[m]
        zz = pz[m]
        if algo in ("invdist", "invdistnn"):
            if algo == "invdistnn" and max_points > 0 and len(rr) > max_points:
                keep = np.argsort(rr, kind="stable")[:max_points]
                rr = rr[keep]
                zz = zz[keep]
            if len(rr) == 0 or len(rr) < min_points:
                continue
            hit = rr < _EXACT_HIT_R2
            if hit.any():
                out[i] = zz[np.argmax(hit)]
                continue
            w = 1.0 / (rr + smoothing * smoothing) ** (power / 2.0)
            out[i] = (w * zz).sum() / w.sum()
        elif algo == "average":
            if len(zz) == 0 or len(zz) < min_points:
                continue
            out[i] = zz.mean()
        elif algo == "minimum":
            if len(zz) == 0 or len(zz) < min_points:
                continue
            out[i] = zz.min()
        elif algo == "maximum":
            if len(zz) == 0 or len(zz) < min_points:
                continue
            out[i] = zz.max()
        elif algo == "range":
            if len(zz) == 0 or len(zz) < min_points:
                continue
            out[i] = zz.max() - zz.min()
        elif algo == "count":
            if len(zz) < min_points:
                continue
            out[i] = len(zz)
        elif algo == "average_distance":
            if len(rr) == 0 or len(rr) < min_points:
                continue
            out[i] = np.sqrt(rr).mean()
        elif algo == "average_distance_pts":
            if len(zz) < 2 or len(zz) < min_points:
                continue
            sx = px[m]
            sy = py[m]
            ii, jj = np.triu_indices(len(sx), k=1)
            out[i] = np.hypot(sx[ii] - sx[jj], sy[ii] - sy[jj]).mean()
        elif algo == "nearest":
            if len(rr) == 0:
                continue
            out[i] = zz[np.argmin(rr)]
        else:
            raise NotImplementedError(f"gdal_grid algorithm {algo!r}")
    return out.reshape(ny, nx)


def linear_eval_assign(tri, px, py, pz, cx, cy, radius, nodata):
    """linear_eval + per-node provenance for the bucketed scale path:
    returns (values (ny, nx), tri_idx (ny, nx) int64 — index into
    ``tri`` of the winning triangle, -1 where the nearest-point
    fallback / nodata applied). Same semantics as linear_eval
    (triangle scan order, last containing triangle wins, unlimited
    nearest fallback at radius < 0)."""
    nx, ny = len(cx), len(cy)
    gx, gy = np.meshgrid(cx, cy)
    out = np.full(gx.size, np.nan, np.float64)
    who = np.full(gx.size, -1, np.int64)
    dx = cx[1] - cx[0] if nx > 1 else 1.0
    dy = cy[1] - cy[0] if ny > 1 else 1.0
    keep = np.arange(len(tri))
    if len(tri):
        ty0 = np.minimum.reduce([py[tri[:, 0]], py[tri[:, 1]], py[tri[:, 2]]])
        ty1 = np.maximum.reduce([py[tri[:, 0]], py[tri[:, 1]], py[tri[:, 2]]])
        ylo, yhi = (cy.min(), cy.max())
        sel = (ty1 >= ylo) & (ty0 <= yhi)
        tri = tri[sel]
        keep = keep[sel]
    for ti, (a, b, c) in enumerate(tri):
        ax, ay, bx, by, cx2, cy2 = px[a], py[a], px[b], py[b], px[c], py[c]
        x0, x1 = min(ax, bx, cx2), max(ax, bx, cx2)
        y0, y1 = min(ay, by, cy2), max(ay, by, cy2)
        # same descending-axis mapping as linear_eval (dx/dy < 0
        # swaps which bbox corner bounds which index)
        i0 = max(0, int(np.ceil((x0 - cx[0]) / dx - 1e-9)) if dx > 0
                 else int(np.ceil((x1 - cx[0]) / dx - 1e-9)))
        i1 = min(nx - 1, int(np.floor((x1 - cx[0]) / dx + 1e-9)) if dx > 0
                 else int(np.floor((x0 - cx[0]) / dx + 1e-9)))
        j0 = max(0, int(np.ceil((y0 - cy[0]) / dy - 1e-9)) if dy > 0
                 else int(np.ceil((y1 - cy[0]) / dy - 1e-9)))
        j1 = min(ny - 1, int(np.floor((y1 - cy[0]) / dy + 1e-9)) if dy > 0
                 else int(np.floor((y0 - cy[0]) / dy + 1e-9)))
        if i1 < i0 or j1 < j0:
            continue
        nxs = cx[i0:i1 + 1][None, :]
        nys = cy[j0:j1 + 1][:, None]
        det = (by - ay) * (cx2 - ax) - (bx - ax) * (cy2 - ay)
        if det == 0:
            continue
        l1 = ((by - cy2) * (nxs - cx2) + (cx2 - bx) * (nys - cy2)) / -det
        l2 = ((cy2 - ay) * (nxs - cx2) + (ax - cx2) * (nys - cy2)) / -det
        l3 = 1.0 - l1 - l2
        eps = -1e-10
        m = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        if not m.any():
            continue
        vals = l1 * pz[a] + l2 * pz[b] + l3 * pz[c]
        jj, ii = np.nonzero(m)
        flat = (jj + j0) * nx + (ii + i0)
        out[flat] = vals[m]
        who[flat] = keep[ti]
    miss = np.isnan(out)
    if miss.any():
        if radius == 0.0:
            out[miss] = nodata
        else:
            mx = gx.ravel()[miss]
            my = gy.ravel()[miss]
            fill = np.full(mx.shape, nodata, np.float64)
            if len(px):
                d2 = ((px[None, :] - mx[:, None]) ** 2
                      + (py[None, :] - my[:, None]) ** 2)
                k = np.argmin(d2, axis=1)
                best = d2[np.arange(len(mx)), k]
                ok = (np.ones(len(mx), bool) if radius < 0
                      else best <= radius * radius)
                fill[ok] = pz[k[ok]]
            out[miss] = fill
    return out.reshape(ny, nx), who.reshape(ny, nx)


def tri_circumcircles(tri, px, py):
    """(cx, cy, r) per triangle — the certainty test of the bucketed
    TIN path: a local-Delaunay triangle whose circumcircle lies fully
    inside the bucket's point-collection region is provably a global
    Delaunay triangle (the empty-circle property is checked against
    every point that could violate it)."""
    ax, ay = px[tri[:, 0]], py[tri[:, 0]]
    bx, by = px[tri[:, 1]], py[tri[:, 1]]
    cx_, cy_ = px[tri[:, 2]], py[tri[:, 2]]
    d = 2.0 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
    d = np.where(d == 0, np.nan, d)
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx_ * cx_ + cy_ * cy_
    ux = (a2 * (by - cy_) + b2 * (cy_ - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx_ - bx) + b2 * (ax - cx_) + c2 * (bx - ax)) / d
    r = np.hypot(ax - ux, ay - uy)
    return ux, uy, r


# ------------------------------------------------------------------
# convex-hull machinery for the bucketed linear gridder's exactness
# gates (VERDICT r4 directive #2).  All points live inside the global
# convex hull, so (a) a local-Delaunay triangle whose circumcircle's
# intersection WITH THE HULL lies inside the bucket's collection
# region is provably global-Delaunay even when the circle itself
# bulges far outside the region (hull-boundary slivers), and (b) a
# node strictly outside the hull provably misses every global
# triangle (barycentric reach of the eps=-1e-10 containment test is
# <= eps * triangle height <= ~4e-8 for this domain), so its value
# is the nearest-point fallback and can be computed distributed.


def convex_hull(px, py) -> np.ndarray:
    """Monotone-chain convex hull -> (H, 2) CCW vertices.  Hull of a
    union of per-batch hulls equals the hull of all points, so this
    runs per batch with a small driver-side merge."""
    pts = np.unique(np.c_[np.asarray(px, np.float64),
                          np.asarray(py, np.float64)], axis=0)
    if len(pts) <= 2:
        return pts

    def half(seq):
        out = []
        for q in seq:
            while len(out) >= 2 and (
                    (out[-1][0] - out[-2][0]) * (q[1] - out[-2][1])
                    - (out[-1][1] - out[-2][1]) * (q[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(q)
        return out

    lo = half(pts)
    hi = half(pts[::-1])
    return np.asarray(lo[:-1] + hi[:-1], np.float64)


def dist_outside_poly(qx, qy, poly) -> np.ndarray:
    """Distance from each query point to a convex CCW polygon
    (0 inside).  Vectorized over queries; O(H) edge passes."""
    qx = np.asarray(qx, np.float64)
    qy = np.asarray(qy, np.float64)
    h = len(poly)
    if h == 0:
        return np.full(qx.shape, np.inf)
    if h == 1:
        return np.hypot(qx - poly[0, 0], qy - poly[0, 1])
    inside = np.ones(qx.shape, bool)
    d_edge = np.full(qx.shape, np.inf)
    for i in range(h):
        ax, ay = poly[i]
        bx, by = poly[(i + 1) % h]
        cross = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        inside &= cross >= 0
        vx, vy = bx - ax, by - ay
        l2 = vx * vx + vy * vy
        t = (np.clip(((qx - ax) * vx + (qy - ay) * vy) / l2, 0.0, 1.0)
             if l2 > 0 else 0.0)
        d_edge = np.minimum(d_edge, np.hypot(qx - (ax + t * vx),
                                             qy - (ay + t * vy)))
    if h == 2:
        return d_edge
    return np.where(inside, 0.0, d_edge)


def clip_poly_halfplane(poly, a, b, c) -> np.ndarray:
    """Convex polygon ∩ {a*x + b*y <= c} (Sutherland–Hodgman)."""
    out = []
    h = len(poly)
    for i in range(h):
        p = poly[i]
        q = poly[(i + 1) % h]
        fp = a * p[0] + b * p[1] - c
        fq = a * q[0] + b * q[1] - c
        if fp <= 0:
            out.append((p[0], p[1]))
        if (fp < 0) != (fq < 0) and fp != fq:
            t = fp / (fp - fq)
            out.append((p[0] + t * (q[0] - p[0]),
                        p[1] + t * (q[1] - p[1])))
    return (np.asarray(out, np.float64) if out
            else np.empty((0, 2), np.float64))


def disc_hull_inside_rect(ux, uy, r, hull, rx0, rx1, ry0, ry1,
                          eps=1e-9) -> np.ndarray:
    """Per-disc test: does (disc ∩ hull) lie inside the rectangle?
    True iff no part of the hull outside the rect comes within r of
    the disc center.  The hull\\rect remainder is covered by the four
    outer half-plane clips (overlapping at corners — harmless for an
    emptiness test)."""
    ux = np.asarray(ux, np.float64)
    uy = np.asarray(uy, np.float64)
    r = np.asarray(r, np.float64)
    ok = np.isfinite(r)
    for a, b, c in ((1.0, 0.0, rx0), (-1.0, 0.0, -rx1),
                    (0.0, 1.0, ry0), (0.0, -1.0, -ry1)):
        piece = clip_poly_halfplane(hull, a, b, c)
        if len(piece) == 0:
            continue
        d = dist_outside_poly(ux, uy, piece)
        ok &= d > r + eps
    return ok
