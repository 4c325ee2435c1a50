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


def region_rings(mask: np.ndarray, connect: int = 4) -> list[np.ndarray]:
    """Exact polygon rings (outer + holes) of a boolean region mask —
    the run/arc assembly of the polygonizer (reference
    alg/polygonize_polygonizer.cpp semantics): every boundary edge of
    the region becomes a directed unit segment with the region on its
    LEFT; walking the segments yields closed rings in pixel-corner
    coordinates; collinear vertices are collapsed. At checkerboard
    corners ``connect=4`` prefers the RIGHT turn (diagonal regions
    stay separate) and ``connect=8`` the LEFT turn (the ring passes
    through the shared corner, keeping the diagonal halves one
    polygon — the 8CONNECTED polygonize rule). Returns closed (N, 2)
    rings — the first with positive shoelace area in image
    coordinates is the outer ring; opposite orientation = holes."""
    m = np.asarray(mask, bool)
    h, w = m.shape
    pad = np.zeros((h + 2, w + 2), bool)
    pad[1:-1, 1:-1] = m
    # directed edges with region on the left, image coords (x right,
    # y down): top edge of a cell goes +x, right edge +y, bottom -x,
    # left -y
    edges: dict = {}

    def add(p, q):
        edges.setdefault(p, []).append(q)

    ys, xs = np.nonzero(m)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if not pad[y, x + 1]:        # open above -> top edge, +x
            add((x, y), (x + 1, y))
        if not pad[y + 2, x + 1]:    # open below -> bottom edge, -x
            add((x + 1, y + 1), (x, y + 1))
        if not pad[y + 1, x]:        # open left -> left edge, -y
            add((x, y + 1), (x, y))
        if not pad[y + 1, x + 2]:    # open right -> right edge, +y
            add((x + 1, y), (x + 1, y + 1))

    rings = []
    while edges:
        start = min(edges)
        prev_dir = None
        cur = start
        ring = [start]
        while True:
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
                del edges[cur]
            else:
                # checkerboard corner: turn preference decides whether
                # diagonal regions split (right, 4-conn) or stay one
                # ring through the corner (left, 8-conn)
                dx, dy = prev_dir
                pref = (-dy, dx) if connect == 4 else (dy, -dx)
                pick = None
                for cand in outs:
                    d = (cand[0] - cur[0], cand[1] - cur[1])
                    if d == pref:
                        pick = cand
                        break
                if pick is None:
                    pick = outs[0]
                outs.remove(pick)
                if not outs:
                    del edges[cur]
                nxt = pick
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
            ring.append(cur)
        ring.append(start)
        arr = np.array(ring, np.float64)
        # collapse collinear runs
        keep = [0]
        for i in range(1, len(arr) - 1):
            a, b, c = arr[keep[-1]], arr[i], arr[i + 1]
            if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                keep.append(i)
        arr = np.vstack([arr[keep], arr[:1]])
        rings.append(arr)
    # outer ring first (largest absolute area)
    rings.sort(key=lambda r: -abs(ring_area_xy(r)))
    return rings


def ring_area_xy(ring: np.ndarray) -> float:
    x = ring[:-1, 0]
    y = ring[:-1, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


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


def contour_segments(z: np.ndarray, level: float,
                     x0: float = 0.0, y0: float = 0.0) -> np.ndarray:
    """Marching-squares iso-line segments at ``level`` with linearly
    interpolated endpoints, (N, 4) rows [xa, ya, xb, yb] in
    pixel-center coordinates offset by (x0, y0) (reference
    alg/marching_squares/square.h segment emission; saddles split by
    the cell-center mean, the reference's disambiguation).

    Vectorized: all cells of one case are emitted together; endpoint
    interpolation uses the SAME two corner values in adjacent cells,
    so segments shared across a tile border match bit-for-bit."""
    z = np.asarray(z, np.float64)
    va = z[:-1, :-1]
    vb = z[:-1, 1:]
    vc = z[1:, 1:]
    vd = z[1:, :-1]
    a = va >= level
    b = vb >= level
    c = vc >= level
    d = vd >= level
    code = (a.astype(np.int8) | (b.astype(np.int8) << 1)
            | (c.astype(np.int8) << 2) | (d.astype(np.int8) << 3))
    ys, xs = np.nonzero((code != 0) & (code != 15))
    if len(ys) == 0:
        return np.empty((0, 4), np.float64)
    cd = code[ys, xs]
    A, B, C, D = va[ys, xs], vb[ys, xs], vc[ys, xs], vd[ys, xs]

    def interp(v0, v1):
        # edges whose corners sit on the same side never enter the
        # case table, so a 0/0 here is computed-but-unused — silence it
        with np.errstate(divide="ignore", invalid="ignore"):
            return (level - v0) / (v1 - v0)

    # edge crossing points (edges: top a-b, right b-c, bottom d-c,
    # left a-d), in (x, y) with pixel centers at integer coords
    top = np.stack([xs + interp(A, B), ys + 0.0], 1)
    right = np.stack([xs + 1.0, ys + interp(B, C)], 1)
    bottom = np.stack([xs + interp(D, C), ys + 1.0], 1)
    left = np.stack([xs + 0.0, ys + interp(A, D)], 1)
    E = {"t": top, "r": right, "b": bottom, "l": left}

    # case -> edge pair(s); orientation: higher side on the LEFT of
    # a->b (the reference's ring orientation convention)
    CASES = {
        1: [("l", "t")], 2: [("t", "r")], 3: [("l", "r")],
        4: [("r", "b")], 6: [("t", "b")], 7: [("l", "b")],
        8: [("b", "l")], 9: [("b", "t")], 11: [("b", "r")],
        12: [("r", "l")], 13: [("r", "t")], 14: [("t", "l")],
    }
    segs = []
    for case, pairs in CASES.items():
        m = cd == case
        if not m.any():
            continue
        for ea, eb in pairs:
            segs.append(np.concatenate([E[ea][m], E[eb][m]], 1))
    # saddles (5, 10): choose pairing by the cell-center mean
    for case in (5, 10):
        m = cd == case
        if not m.any():
            continue
        mean_hi = ((A + B + C + D)[m] / 4.0) >= level
        if case == 5:  # a, c high
            p1 = [("l", "t"), ("r", "b")]   # mean low: two corners split
            p2 = [("l", "b"), ("r", "t")]   # mean high: connected saddle
        else:  # 10: b, d high
            p1 = [("t", "r"), ("b", "l")]
            p2 = [("t", "l"), ("b", "r")]
        for hi, pairs in ((False, p1), (True, p2)):
            mm = np.zeros_like(cd, bool)
            mm[m] = mean_hi == hi
            if not mm.any():
                continue
            for ea, eb in pairs:
                segs.append(np.concatenate([E[ea][mm], E[eb][mm]], 1))
    out = np.concatenate(segs, 0)
    out[:, 0] += x0
    out[:, 2] += x0
    out[:, 1] += y0
    out[:, 3] += y0
    return out


def assemble_polylines(segs: np.ndarray):
    """Join marching-squares segments into polylines (endpoint
    matching — the reference's cross-cell merge,
    alg/contour.cpp:331-383 / segment_merger.h). Returns a list of
    (points(N,2), closed) tuples, deterministic order."""
    if len(segs) == 0:
        return []
    import collections

    def key(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    adj: dict[tuple, list[int]] = collections.defaultdict(list)
    for i, s in enumerate(segs):
        adj[key(s[:2])].append(i)
        adj[key(s[2:])].append(i)
    used = np.zeros(len(segs), bool)
    out = []
    order = np.lexsort((segs[:, 1], segs[:, 0]))
    for i0 in order:
        if used[i0]:
            continue
        used[i0] = True
        pts = [tuple(segs[i0, :2]), tuple(segs[i0, 2:])]
        # extend forward then backward
        for end in (1, 0):
            while True:
                k = key(pts[-1] if end else pts[0])
                nxt = [j for j in adj[k] if not used[j]]
                if not nxt:
                    break
                j = nxt[0]
                used[j] = True
                pa_, pb_ = tuple(segs[j, :2]), tuple(segs[j, 2:])
                new = pb_ if key(pa_) == k else pa_
                if end:
                    pts.append(new)
                else:
                    pts.insert(0, new)
                if key(pts[0]) == key(pts[-1]):
                    break
            if key(pts[0]) == key(pts[-1]):
                break
        closed = key(pts[0]) == key(pts[-1]) and len(pts) > 2
        out.append((np.array(pts, np.float64), closed))
    return out


def contour_levels(zmin: float, zmax: float, interval: float,
                   base: float = 0.0) -> np.ndarray:
    """LEVEL_INTERVAL semantics: levels base + k*interval intersecting
    (zmin, zmax) (reference alg/contour.cpp IntervalLevelRangeIterator)."""
    k0 = int(np.ceil((zmin - base) / interval))
    k1 = int(np.floor((zmax - base) / interval))
    if k1 < k0:
        return np.empty(0, np.float64)
    return base + np.arange(k0, k1 + 1, dtype=np.float64) * interval
