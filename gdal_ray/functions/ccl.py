"""Connected-component labeling (the polygonize core) + marching
squares (the contour core).

Reference semantics: alg/polygonize.cpp:87 traces 4- or 8-connected
runs of equal-valued pixels into polygons (run/arc assembly
alg/polygonize_polygonizer.cpp); alg/contour.cpp marching squares with
LEVEL_INTERVAL / FIXED_LEVELS. Here the per-tile kernels are numpy
union-find labelings and vectorized edge-crossing counts; the
cross-tile topology merge (each tile labeled independently, border
adjacencies merged with a second small shuffle) lives in
stages/polygonize.py — the "groupby-aggregate over cell-bucketed pixel
runs" decomposition of the north rule.
"""

from __future__ import annotations

import numpy as np


def label_components(values: np.ndarray, connect: int = 4) -> np.ndarray:
    """Label equal-valued connected regions; labels are int32 starting
    at 0, row-major-first-pixel order (deterministic). connect in {4, 8}
    (reference alg/polygonize.cpp 4/8-connected option).

    Vectorized min-label propagation with pointer-jumping: each pixel
    repeatedly adopts the smallest label among its equal-valued
    neighbors (then compresses via lab = lab[lab]), so whole chains
    collapse in O(log diameter) rounds of pure numpy."""
    v = np.asarray(values)
    h, w = v.shape
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)
    shifts = [(0, 1), (1, 0)]
    if connect == 8:
        shifts += [(1, 1), (1, -1)]
    while True:
        changed = False
        for dy, dx in shifts:
            ys = slice(max(dy, 0), h + min(dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            ys2 = slice(max(-dy, 0), h + min(-dy, 0))
            xs2 = slice(max(-dx, 0), w + min(-dx, 0))
            a_v, b_v = v[ys, xs], v[ys2, xs2]
            eq = a_v == b_v
            a_l, b_l = lab[ys, xs], lab[ys2, xs2]
            m = np.where(eq, np.minimum(a_l, b_l), a_l)
            if not np.array_equal(m, a_l):
                changed = True
            lab[ys, xs] = m
            m2 = np.where(eq, np.minimum(lab[ys, xs], b_l), b_l)
            if not np.array_equal(m2, b_l):
                changed = True
            lab[ys2, xs2] = m2
        # pointer jumping: labels index pixels; compress toward roots
        flat = lab.reshape(-1)
        for _ in range(2):
            nxt = flat[flat]
            if np.array_equal(nxt, flat):
                break
            flat = nxt
        lab = flat.reshape(h, w)
        if not changed:
            break
    _, labels = np.unique(lab.reshape(-1), return_inverse=True)
    return labels.reshape(h, w).astype(np.int32)


def region_table(values: np.ndarray, labels: np.ndarray) -> dict:
    """Per-region rows: value, n_pixels, bbox (the polygonize output
    attributes; polygon rings replaced by pixel-run extents)."""
    lab = labels.reshape(-1)
    val = np.asarray(values).reshape(-1)
    h, w = labels.shape
    ys, xs = np.divmod(np.arange(h * w), w)
    order = np.argsort(lab, kind="stable")
    lab_s = lab[order]
    bounds = np.searchsorted(lab_s, np.arange(lab_s[-1] + 2)) if len(lab_s) else [0]
    out = {"label": [], "value": [], "n_pixels": [],
           "xmin": [], "ymin": [], "xmax": [], "ymax": []}
    for r in range(len(bounds) - 1):
        sl = order[bounds[r]: bounds[r + 1]]
        if len(sl) == 0:
            continue
        out["label"].append(r)
        out["value"].append(val[sl[0]])
        out["n_pixels"].append(len(sl))
        out["xmin"].append(int(xs[sl].min()))
        out["ymin"].append(int(ys[sl].min()))
        out["xmax"].append(int(xs[sl].max()))
        out["ymax"].append(int(ys[sl].max()))
    return out


# ------------------------------------------------------------- marching squares


def contour_segment_count(z: np.ndarray, level: float) -> int:
    """Number of marching-squares segments the iso-line at ``level``
    produces over the grid (pixel-center lattice; saddle cells emit 2
    segments — reference alg/marching_squares case table)."""
    z = np.asarray(z, np.float64)
    a = z[:-1, :-1] >= level
    b = z[:-1, 1:] >= level
    c = z[1:, 1:] >= level
    d = z[1:, :-1] >= level
    code = (a.astype(np.int8) | (b.astype(np.int8) << 1)
            | (c.astype(np.int8) << 2) | (d.astype(np.int8) << 3))
    # cases 0 and 15 -> 0 segments; saddles 5 and 10 -> 2; else 1
    segs = np.where((code == 0) | (code == 15), 0,
                    np.where((code == 5) | (code == 10), 2, 1))
    return int(segs.sum())


def contour_levels(zmin: float, zmax: float, interval: float,
                   base: float = 0.0) -> np.ndarray:
    """LEVEL_INTERVAL semantics: levels base + k*interval intersecting
    (zmin, zmax) (reference alg/contour.cpp IntervalLevelRangeIterator)."""
    k0 = int(np.ceil((zmin - base) / interval))
    k1 = int(np.floor((zmax - base) / interval))
    if k1 < k0:
        return np.empty(0, np.float64)
    return base + np.arange(k0, k1 + 1, dtype=np.float64) * interval
