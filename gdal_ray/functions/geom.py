"""Geometry kernels: predicates, measures, constructive ops, and the
broadcast spatial index.

The reference delegates these to GEOS (reference ogr/ogrgeometry.cpp;
predicates ogr/ogr_geometry.h:549-556, constructive :563-591) and uses
*prepared geometries* + envelope pre-filters inside layer algebra
(reference ogr/ogrsf_frmts/generic/ogrlayer.cpp:3426-3500). Here:

- point-in-polygon is vectorized even-odd ray casting (many points vs
  one polygon per call; the polygon's edge arrays are the "prepared"
  form, built once),
- the broadcast side index is ``PackedPolygonIndex`` — Hilbert-sorted
  packed entries with a uniform grid bucket directory, the same role
  as FlatGeobuf's packed Hilbert R-tree (reference
  ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-120) and the quadtree
  used by gdalgrid kNN (reference alg/gdalgrid.cpp:260-276): build
  once per actor from a ``ray.put`` table, query per batch,
- measures: shoelace area (holes negative), perimeter, centroid,
- constructive: Sutherland-Hodgman rect clip (tile/cell bucketing),
  Douglas-Peucker simplify, segmentize.
"""

from __future__ import annotations

import numpy as np

from .wkb import Geom, POLYGON, wkb_to_geom

# ----------------------------------------------------------------- prepared PIP


class PreparedPolygon:
    """Edge-array form of a (multi)polygon for vectorized tests —
    the GEOS prepared-geometry analog (built once, queried many)."""

    __slots__ = ("x0", "y0", "x1", "y1", "bbox")

    def __init__(self, geom: Geom):
        if geom.kind not in (POLYGON, 6):
            raise ValueError("PreparedPolygon needs (Multi)Polygon")
        e0x, e0y, e1x, e1y = [], [], [], []
        for r in geom.rings:
            a = r[:-1] if np.array_equal(r[0], r[-1]) else r
            b = np.roll(a, -1, axis=0)
            e0x.append(a[:, 0]); e0y.append(a[:, 1])
            e1x.append(b[:, 0]); e1y.append(b[:, 1])
        self.x0 = np.concatenate(e0x); self.y0 = np.concatenate(e0y)
        self.x1 = np.concatenate(e1x); self.y1 = np.concatenate(e1y)
        self.bbox = geom.bbox()

    def contains_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd ray casting, vectorized as points x edges.

        Points exactly on an edge follow the half-open crossing rule
        (consistent, deterministic; matches the rasterize center rule).
        """
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        out = np.zeros(px.shape, dtype=bool)
        xmin, ymin, xmax, ymax = self.bbox
        cand = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        if not cand.any():
            return out
        cx = px[cand][:, None]
        cy = py[cand][:, None]
        y0 = self.y0[None, :]; y1 = self.y1[None, :]
        x0 = self.x0[None, :]; x1 = self.x1[None, :]
        straddle = (y0 <= cy) != (y1 <= cy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x0 + (cy - y0) * (x1 - x0) / (y1 - y0)
        crossings = (straddle & (xin > cx)).sum(axis=1)
        out[cand] = (crossings % 2) == 1
        return out

    def distance_to_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Distance from each point to the polygon boundary (0 inside)."""
        px = np.asarray(px, np.float64)[:, None]
        py = np.asarray(py, np.float64)[:, None]
        dx = self.x1 - self.x0
        dy = self.y1 - self.y0
        seg2 = dx * dx + dy * dy
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((px - self.x0) * dx + (py - self.y0) * dy) / np.where(seg2 == 0, 1, seg2)
        t = np.clip(t, 0, 1)
        qx = self.x0 + t * dx
        qy = self.y0 + t * dy
        d = np.sqrt((px - qx) ** 2 + (py - qy) ** 2).min(axis=1)
        inside = self.contains_points(px[:, 0], py[:, 0])
        return np.where(inside, 0.0, d)


# ----------------------------------------------------------------- measures
def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of one ring."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def geom_area(geom: Geom) -> float:
    """OGR_GEOM_AREA semantics (reference ogr/ogr_p.h:173): shell area
    minus hole areas, absolute."""
    if geom.kind not in (POLYGON, 6):
        return 0.0
    total = 0.0
    i = 0
    for cnt in geom.poly_ring_counts:
        shell = abs(ring_area(geom.rings[i]))
        holes = sum(abs(ring_area(r)) for r in geom.rings[i + 1 : i + cnt])
        total += shell - holes
        i += cnt
    return total


def geom_length(geom: Geom) -> float:
    total = 0.0
    for r in geom.rings:
        d = np.diff(r, axis=0)
        total += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return total


def geom_centroid(geom: Geom) -> tuple[float, float]:
    """Area-weighted centroid of a (multi)polygon (holes subtract)."""
    sa = 0.0; sx = 0.0; sy = 0.0
    i = 0
    for cnt in geom.poly_ring_counts or [len(geom.rings)]:
        for k, r in enumerate(geom.rings[i : i + cnt]):
            x, y = r[:, 0], r[:, 1]
            cross = x * np.roll(y, -1) - np.roll(x, -1) * y
            a = 0.5 * cross.sum()
            if a == 0:
                continue
            cx = np.sum((x + np.roll(x, -1)) * cross) / (6 * a)
            cy = np.sum((y + np.roll(y, -1)) * cross) / (6 * a)
            sign = 1.0 if k == 0 else -1.0
            aa = abs(a) * sign
            sa += aa; sx += cx * aa; sy += cy * aa
        i += cnt
    if sa == 0:
        xs = np.concatenate([r[:, 0] for r in geom.rings])
        ys = np.concatenate([r[:, 1] for r in geom.rings])
        return float(xs.mean()), float(ys.mean())
    return sx / sa, sy / sa


# ----------------------------------------------------------------- constructive
def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain convex hull (OGRGeometry::ConvexHull
    analog). Input (n, 2); returns a closed CCW ring."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    if len(pts) < 3:
        return np.vstack([pts, pts[:1]]) if len(pts) else pts

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])


def clip_ring_to_rect(ring: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray:
    """Sutherland-Hodgman clip of one ring to an axis-aligned rect.
    Returns a closed ring (possibly empty)."""
    pts = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    for axis, bound, keep_ge in ((0, xmin, True), (0, xmax, False),
                                 (1, ymin, True), (1, ymax, False)):
        if len(pts) == 0:
            break
        prev = np.roll(pts, 1, axis=0)
        cur_in = (pts[:, axis] >= bound) if keep_ge else (pts[:, axis] <= bound)
        prev_in = (prev[:, axis] >= bound) if keep_ge else (prev[:, axis] <= bound)
        out = []
        for i in range(len(pts)):
            p, c = prev[i], pts[i]
            if cur_in[i]:
                if not prev_in[i]:
                    t = (bound - p[axis]) / (c[axis] - p[axis])
                    out.append(p + t * (c - p))
                out.append(c)
            elif prev_in[i]:
                t = (bound - p[axis]) / (c[axis] - p[axis])
                out.append(p + t * (c - p))
        pts = np.array(out) if out else np.empty((0, 2))
    if len(pts) < 3:
        return np.empty((0, 2))
    return np.vstack([pts, pts[:1]])


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker (OGRGeometry::Simplify analog, tolerance in
    coordinate units). Iterative stack implementation."""
    pts = ring
    n = len(pts)
    if n < 3:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        p0, p1 = pts[i0], pts[i1]
        seg = p1 - p0
        L = np.hypot(*seg)
        mid = pts[i0 + 1 : i1]
        if L == 0:
            d = np.hypot(mid[:, 0] - p0[0], mid[:, 1] - p0[1])
        else:
            d = np.abs(seg[0] * (p0[1] - mid[:, 1]) - seg[1] * (p0[0] - mid[:, 0])) / L
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i0 + 1 + k] = True
            stack.append((i0, i0 + 1 + k))
            stack.append((i0 + 1 + k, i1))
    return pts[keep]


def segmentize_ring(ring: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_len (OGRGeometry::
    segmentize analog, apps/ogr2ogr_lib.cpp GeomOperation SEGMENTIZE)."""
    out = [ring[:1]]
    for i in range(len(ring) - 1):
        p0, p1 = ring[i], ring[i + 1]
        d = float(np.hypot(*(p1 - p0)))
        if d > max_len:
            k = int(np.ceil(d / max_len))
            t = np.linspace(0, 1, k + 1)[1:]
            out.append(p0 + t[:, None] * (p1 - p0))
        else:
            out.append(p1.reshape(1, 2))
    return np.vstack(out)


def make_valid_ring(ring: np.ndarray, shell: bool = True) -> np.ndarray:
    """Structural MakeValid (the common OGRGeometry::MakeValid cases,
    apps/ogr2ogr_lib.cpp:266): drop consecutive duplicate vertices,
    close the ring, and orient shells CCW / holes CW. A self-crossing
    ring (signed area 0 with > 3 distinct vertices, e.g. a bow-tie) is
    untwisted into simple sub-rings by functions/constructive
    .make_valid_ring; the LARGEST sub-ring is returned here (single-
    ring contract; multi-ring callers use the constructive API)."""
    pts = np.asarray(ring, np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    if len(pts) > 1:
        keep = np.ones(len(pts), bool)
        keep[1:] = (np.abs(np.diff(pts, axis=0)).sum(axis=1) > 0)
        pts = pts[keep]
    if len(pts) < 3:
        return np.empty((0, 2))
    closed = np.vstack([pts, pts[:1]])
    a = ring_area(closed)
    if a == 0.0:
        from .constructive import make_valid_ring as _untwist

        parts = _untwist(closed)
        if not parts:
            return np.empty((0, 2))
        closed = max(parts, key=lambda r: abs(ring_area(r)))
        a = ring_area(closed)
        if a == 0.0:
            return np.empty((0, 2))
    want_ccw = shell
    if (a > 0) != want_ccw:
        closed = closed[::-1].copy()
    return closed


def wrapdateline_ring(ring: np.ndarray) -> list[np.ndarray]:
    """-wrapdateline (apps/ogr2ogr_lib.cpp:303): a ring expressed in
    unwrapped longitudes (range (-360, 360), e.g. after reprojection
    across the antimeridian) is CLIPPED at lon = +/-180 and the
    overflow parts shifted back into range — proper Sutherland-Hodgman
    cuts, so the dateline edge is reconstructed exactly."""
    lon = ring[:, 0]
    if lon.max() <= 180.0 and lon.min() >= -180.0:
        return [ring.copy()]
    BIG = 1e9
    parts = []
    pieces = (
        (0.0, -180.0, 180.0),     # in-range part
        (-360.0, 180.0, 540.0),   # east overflow -> shift west
        (360.0, -540.0, -180.0),  # west overflow -> shift east
    )
    for shift, xmin, xmax in pieces:
        clipped = clip_ring_to_rect(ring, xmin, -BIG, xmax, BIG)
        if len(clipped) >= 4:
            r = clipped.copy()
            r[:, 0] += shift
            parts.append(r)
    return parts


# ----------------------------------------------------------------- broadcast index
class PackedPolygonIndex:
    """Broadcast-side spatial index over a polygon layer.

    Build once per actor from the (fid, wkb) arrays of a ``ray.put``
    table; query per batch. Structure: prepared polygons + per-feature
    bboxes + a uniform grid directory over the layer extent mapping
    grid cells -> candidate feature ids (CSR layout). Plays the role of
    FlatGeobuf's packed Hilbert R-tree / CPLQuadTree on the broadcast
    small side of the spatial join (SURVEY.md §2.4).
    """

    def __init__(self, fids: np.ndarray, wkbs, grid: int | None = None):
        self.fids = np.asarray(fids, np.int64)
        self.prepared = [PreparedPolygon(wkb_to_geom(bytes(w))) for w in wkbs]
        bb = np.array([p.bbox for p in self.prepared], dtype=np.float64)
        self.bboxes = bb
        n = len(self.prepared)
        g = grid or max(8, int(np.sqrt(max(n, 1)) * 2))
        self.g = g
        self.xmin = float(bb[:, 0].min()); self.ymin = float(bb[:, 1].min())
        self.xmax = float(bb[:, 2].max()); self.ymax = float(bb[:, 3].max())
        sx = (self.xmax - self.xmin) or 1.0
        sy = (self.ymax - self.ymin) or 1.0
        self._sx, self._sy = g / sx, g / sy
        cells: list[list[int]] = [[] for _ in range(g * g)]
        for i in range(n):
            cx0 = int(np.clip((bb[i, 0] - self.xmin) * self._sx, 0, g - 1))
            cx1 = int(np.clip((bb[i, 2] - self.xmin) * self._sx, 0, g - 1))
            cy0 = int(np.clip((bb[i, 1] - self.ymin) * self._sy, 0, g - 1))
            cy1 = int(np.clip((bb[i, 3] - self.ymin) * self._sy, 0, g - 1))
            for cy in range(cy0, cy1 + 1):
                base = cy * g
                for cx in range(cx0, cx1 + 1):
                    cells[base + cx].append(i)
        counts = np.array([len(c) for c in cells], dtype=np.int64)
        self._offsets = np.concatenate([[0], np.cumsum(counts)])
        self._entries = np.array(
            [i for c in cells for i in c], dtype=np.int64
        ) if counts.sum() else np.empty(0, dtype=np.int64)

    def _cell_of(self, px, py):
        cx = np.clip(((px - self.xmin) * self._sx).astype(np.int64), 0, self.g - 1)
        cy = np.clip(((py - self.ymin) * self._sy).astype(np.int64), 0, self.g - 1)
        return cy * self.g + cx

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """PIP join: returns (point_index, polygon_fid) pair arrays.

        Envelope pre-filter via grid+bbox (reference ogrlayer.cpp:3426
        envelope path) then exact ray-casting refinement per polygon
        over its candidate points (vectorized per polygon).
        """
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        inb = (px >= self.xmin) & (px <= self.xmax) & (py >= self.ymin) & (py <= self.ymax)
        idx = np.nonzero(inb)[0]
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        cells = self._cell_of(px[idx], py[idx])
        # group candidate points per polygon
        order = np.argsort(cells, kind="stable")
        sidx = idx[order]
        scell = cells[order]
        out_pt: list[np.ndarray] = []
        out_fid: list[np.ndarray] = []
        bounds = np.searchsorted(scell, np.arange(self.g * self.g + 1))
        per_poly: dict[int, list[np.ndarray]] = {}
        for c in np.unique(scell):
            pts_in_cell = sidx[bounds[c] : bounds[c + 1]]
            for poly_i in self._entries[self._offsets[c] : self._offsets[c + 1]]:
                per_poly.setdefault(int(poly_i), []).append(pts_in_cell)
        for poly_i, chunks in per_poly.items():
            cand = np.concatenate(chunks)
            bb = self.bboxes[poly_i]
            m = (px[cand] >= bb[0]) & (px[cand] <= bb[2]) & (py[cand] >= bb[1]) & (py[cand] <= bb[3])
            cand = cand[m]
            if len(cand) == 0:
                continue
            hit = self.prepared[poly_i].contains_points(px[cand], py[cand])
            if hit.any():
                out_pt.append(cand[hit])
                out_fid.append(np.full(int(hit.sum()), self.fids[poly_i], np.int64))
        if not out_pt:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_pt), np.concatenate(out_fid)

    def nearest(self, px: np.ndarray, py: np.ndarray, k: int = 1):
        """kNN by boundary distance (0 when inside): returns
        (dist, fid) arrays of shape (npoints, k). Brute-force over
        features per batch — the broadcast side is small by contract."""
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        d = np.stack([p.distance_to_points(px, py) for p in self.prepared], axis=1)
        kk = min(k, d.shape[1])
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        rows = np.arange(len(px))[:, None]
        dd = d[rows, part]
        order = np.argsort(dd, axis=1, kind="stable")
        part = part[rows, order]
        return d[rows, part], self.fids[part]
