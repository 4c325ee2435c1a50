"""Layer algebra: Intersection / Clip / Erase / Union-area between two
polygon layers (reference ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345+,
the index-nested-loop join: envelope pre-filter -> prepared-geometry
refinement -> GEOS overlay).

Ray-Data-native plan: the smaller layer B is broadcast (built once per
actor into a PackedPolygonIndex for the envelope grid pre-filter);
layer A streams through `map_batches`; the overlay geometry math is
Sutherland-Hodgman clipping, which is exact when the B side is convex
(rectangular zones, tiles, clip windows — the dominant cases here).
Non-convex B falls back to NotImplementedError rather than silently
approximating.

Outputs per (A, B) candidate pair that truly intersects:
    a_fid, b_fid, inter_area; plus per-A erase_area (A minus all B).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geom import PreparedPolygon, clip_ring_to_rect, ring_area
from ..functions.wkb import Geom, wkb_to_geom


def _is_convex(ring: np.ndarray) -> bool:
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        a, b, c = pts[i], pts[(i + 1) % n], pts[(i + 2) % n]
        cross = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        if cross != 0:
            s = 1 if cross > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def clip_ring_to_convex(ring: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman against an arbitrary CONVEX clip ring
    (counter-clockwise). Returns a closed ring (possibly empty)."""
    pts = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    cp = clip[:-1] if np.array_equal(clip[0], clip[-1]) else clip
    # ensure CCW clip ring
    if ring_area(np.vstack([cp, cp[:1]])) < 0:
        cp = cp[::-1]
    for i in range(len(cp)):
        if len(pts) == 0:
            break
        a = cp[i]
        b = cp[(i + 1) % len(cp)]
        ex, ey = b[0] - a[0], b[1] - a[1]
        prev = np.roll(pts, 1, axis=0)
        side_cur = ex * (pts[:, 1] - a[1]) - ey * (pts[:, 0] - a[0])
        side_prev = ex * (prev[:, 1] - a[1]) - ey * (prev[:, 0] - a[0])
        out = []
        for j in range(len(pts)):
            p, c = prev[j], pts[j]
            cin, pin = side_cur[j] >= 0, side_prev[j] >= 0
            if cin:
                if not pin:
                    t = side_prev[j] / (side_prev[j] - side_cur[j])
                    out.append(p + t * (c - p))
                out.append(c)
            elif pin:
                t = side_prev[j] / (side_prev[j] - side_cur[j])
                out.append(p + t * (c - p))
        pts = np.array(out) if out else np.empty((0, 2))
    if len(pts) < 3:
        return np.empty((0, 2))
    return np.vstack([pts, pts[:1]])


def intersection_area(a: Geom, b: Geom) -> float:
    """Area of A ∩ B. Convex single-ring B uses the exact
    Sutherland-Hodgman fast path; non-convex B routes through the
    general Greiner-Hormann overlay (functions/overlay.py — the GEOS
    OverlayNG stand-in, ogrlayer.cpp:3345+)."""
    if len(b.rings) == 1 and _is_convex(b.rings[0]):
        def clip_area(r: np.ndarray) -> float:
            clipped = clip_ring_to_convex(r, b.rings[0])
            return abs(ring_area(clipped)) if len(clipped) >= 4 else 0.0
    else:
        from ..functions.overlay import polygon_intersection_area

        def clip_area(r: np.ndarray) -> float:
            total = 0.0
            bi = 0
            for bcnt in (b.poly_ring_counts or [len(b.rings)]):
                for bk, br in enumerate(b.rings[bi:bi + bcnt]):
                    area = polygon_intersection_area(r, br)
                    total += area if bk == 0 else -area  # B holes subtract
                bi += bcnt
            return total

    total = 0.0
    i = 0
    for cnt in (a.poly_ring_counts or [len(a.rings)]):
        for k, r in enumerate(a.rings[i:i + cnt]):
            area = clip_area(r)
            total += area if k == 0 else -area  # A holes subtract
        i += cnt
    return total


class LayerAlgebra:
    """Actor: broadcast B layer; per batch of A features, envelope
    pre-filter (bbox grid) then exact convex-clip overlay."""

    def __init__(self, b_fids: np.ndarray, b_wkbs: list[bytes]):
        self.b_fids = np.asarray(b_fids, np.int64)
        self.b_geoms = [wkb_to_geom(bytes(w)) for w in b_wkbs]
        self.b_bbox = np.array([g.bbox() for g in self.b_geoms])

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"a_fid": [], "b_fid": [], "inter_area": []}
        er = {"a_fid": [], "erase_area": []}
        for rec in t.to_pylist():
            g = wkb_to_geom(rec["geometry"])
            ax0, ay0, ax1, ay1 = g.bbox()
            a_area = sum(abs(ring_area(r)) * (1 if k == 0 else -1)
                         for k, r in enumerate(g.rings))
            covered = 0.0
            # envelope pre-filter (ogrlayer.cpp:3426)
            cand = np.nonzero((self.b_bbox[:, 0] <= ax1) & (self.b_bbox[:, 2] >= ax0)
                              & (self.b_bbox[:, 1] <= ay1) & (self.b_bbox[:, 3] >= ay0))[0]
            for bi in cand:
                area = intersection_area(g, self.b_geoms[bi])
                if area > 0:
                    out["a_fid"].append(rec["fid"])
                    out["b_fid"].append(int(self.b_fids[bi]))
                    out["inter_area"].append(area)
                    covered += area
            er["a_fid"].append(rec["fid"])
            # Erase area is exact when B features don't overlap each
            # other (true for the zone layers used here)
            er["erase_area"].append(max(a_area - covered, 0.0))
        inter = pa.table({
            "a_fid": pa.array(out["a_fid"], pa.int64()),
            "b_fid": pa.array(out["b_fid"], pa.int64()),
            "inter_area": pa.array(out["inter_area"], pa.float64()),
        })
        erase = pa.table({
            "a_fid": pa.array(er["a_fid"], pa.int64()),
            "erase_area": pa.array(er["erase_area"], pa.float64()),
        })
        # single output table: join kind flag
        n_i, n_e = inter.num_rows, erase.num_rows
        return pa.table({
            "kind": pa.array(["inter"] * n_i + ["erase"] * n_e, pa.string()),
            "a_fid": pa.concat_arrays([inter["a_fid"].combine_chunks(),
                                       erase["a_fid"].combine_chunks()]),
            "b_fid": pa.concat_arrays([inter["b_fid"].combine_chunks(),
                                       pa.nulls(n_e, pa.int64())]),
            "area": pa.concat_arrays([inter["inter_area"].combine_chunks(),
                                      erase["erase_area"].combine_chunks()]),
        })
