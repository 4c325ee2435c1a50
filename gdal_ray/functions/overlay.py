"""General polygon-polygon intersection (Greiner-Hormann) — the
non-convex overlay core for layer algebra.

The reference delegates overlays to GEOS (OverlayNG) from the layer
methods (ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345+ Intersection /
Union / Erase). Here the intersection of two SIMPLE polygons (one
outer ring each, no self-intersections) is computed with the
Greiner-Hormann clipping algorithm (Greiner & Hormann 1998, ACM TOG —
public algorithm): pairwise edge intersections are inserted into both
vertex rings as linked neighbor nodes, marked alternately entry/exit,
and result rings traced by switching rings at each intersection.

Degeneracies (intersection at a vertex, collinear edge overlap) are
resolved by a deterministic micro-perturbation of the clip polygon
(~1e-9 of the bbox diagonal), the standard practical treatment; areas
move by O(perimeter * eps).
"""

from __future__ import annotations

import numpy as np

from .geom import ring_area


class _Node:
    __slots__ = ("pt", "nxt", "prv", "neighbor", "entry", "inter",
                 "visited", "alpha")

    def __init__(self, pt, inter=False, alpha=0.0):
        self.pt = (float(pt[0]), float(pt[1]))
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.entry = False
        self.inter = inter
        self.visited = False
        self.alpha = alpha


def _ring_open(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, np.float64)
    if len(r) > 1 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    return r


def _build(ring: np.ndarray) -> _Node:
    nodes = [_Node(p) for p in ring]
    n = len(nodes)
    for i, nd in enumerate(nodes):
        nd.nxt = nodes[(i + 1) % n]
        nd.prv = nodes[(i - 1) % n]
    return nodes[0]

def _iter_ring(head: _Node):
    nd = head
    while True:
        yield nd
        nd = nd.nxt
        if nd is head:
            break


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    """Even-odd rule PIP."""
    x, y = pt
    n = len(ring)
    inside = False
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > y) != (yj > y):
            xcross = xi + (y - yi) / (yj - yi) * (xj - xi)
            if x < xcross:
                inside = not inside
        j = i
    return inside


def _seg_intersect(p1, p2, q1, q2):
    """Proper intersection of open segments; returns (t, u) in (0,1)
    strict, or None; 'degenerate' marker when touching/collinear."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    den = rx * sy - ry * sx
    qpx, qpy = q1[0] - p1[0], q1[1] - p1[1]
    EPS = 1e-12
    if abs(den) < EPS:
        cross = qpx * ry - qpy * rx
        if abs(cross) < EPS:
            return "degenerate"
        return None
    t = (qpx * sy - qpy * sx) / den
    u = (qpx * ry - qpy * rx) / den
    if -EPS < t < EPS or 1 - EPS < t < 1 + EPS \
            or -EPS < u < EPS or 1 - EPS < u < 1 + EPS:
        if -EPS <= t <= 1 + EPS and -EPS <= u <= 1 + EPS:
            return "degenerate"
        return None
    if 0 < t < 1 and 0 < u < 1:
        return (t, u)
    return None


def _insert_intersections(s_head: _Node, c_head: _Node) -> int | str:
    count = 0
    s_edges = [(nd, nd.nxt) for nd in _iter_ring(s_head) if not nd.inter]
    c_edges = [(nd, nd.nxt) for nd in _iter_ring(c_head) if not nd.inter]
    pend: dict = {}
    for sa, sb in s_edges:
        for ca, cb in c_edges:
            r = _seg_intersect(sa.pt, sb.pt, ca.pt, cb.pt)
            if r == "degenerate":
                return "degenerate"
            if r is None:
                continue
            t, u = r
            pt = (sa.pt[0] + t * (sb.pt[0] - sa.pt[0]),
                  sa.pt[1] + t * (sb.pt[1] - sa.pt[1]))
            sn = _Node(pt, inter=True, alpha=t)
            cn = _Node(pt, inter=True, alpha=u)
            sn.neighbor = cn
            cn.neighbor = sn
            pend.setdefault(id(sa), (sa, []))[1].append(sn)
            pend.setdefault(id(ca), (ca, []))[1].append(cn)
            count += 1
    for _, (anchor, nodes) in pend.items():
        nodes.sort(key=lambda nd: nd.alpha)
        at = anchor
        for nd in nodes:
            nd.nxt = at.nxt
            nd.prv = at
            at.nxt.prv = nd
            at.nxt = nd
            at = nd
    return count


def _mark_entries(head: _Node, other_ring: np.ndarray) -> None:
    inside = _point_in_ring(head.pt, other_ring)
    for nd in _iter_ring(head):
        if nd.inter:
            nd.entry = not inside
            inside = not inside


def polygon_overlay(subject: np.ndarray, clip: np.ndarray,
                    mode: str = "intersection",
                    _depth: int = 0) -> list[np.ndarray]:
    """Greiner-Hormann overlay of two simple polygons -> closed rings.

    mode: 'intersection' | 'union' | 'difference' (subject - clip) —
    the three traversals differ only in which entry flags invert
    (Greiner & Hormann 1998 §4: union inverts both, difference
    inverts the clip side)."""
    s = _ring_open(subject)
    c = _ring_open(clip)
    if len(s) < 3 or len(c) < 3:
        if mode == "intersection":
            return []
        if mode == "union" or mode == "difference":
            return [np.vstack([s, s[:1]])] if len(s) >= 3 else (
                [np.vstack([c, c[:1]])] if mode == "union" and len(c) >= 3
                else [])
    s_head = _build(s)
    c_head = _build(c)
    n = _insert_intersections(s_head, c_head)
    if n == "degenerate":
        if _depth >= 3:
            raise ValueError("overlay: unresolved degeneracy")
        diag = float(np.hypot(c[:, 0].ptp(), c[:, 1].ptp())) or 1.0
        eps = diag * 1.7e-9 * (_depth + 1)
        return polygon_overlay(s, c + np.array([eps, eps * 0.61]), mode,
                               _depth + 1)
    if n == 0:
        # containment / disjoint
        s_in_c = _point_in_ring(s[0], c)
        c_in_s = _point_in_ring(c[0], s)
        sc = np.vstack([s, s[:1]])
        cc = np.vstack([c, c[:1]])
        if mode == "intersection":
            return [sc] if s_in_c else ([cc] if c_in_s else [])
        if mode == "union":
            if s_in_c:
                return [cc]
            if c_in_s:
                return [sc]
            return [sc, cc]
        # difference
        if s_in_c:
            return []
        if c_in_s:
            raise NotImplementedError(
                "overlay difference producing a hole (clip inside subject)")
        return [sc]
    _mark_entries(s_head, c)
    _mark_entries(c_head, s)
    if mode == "union":
        for nd in _iter_ring(s_head):
            if nd.inter:
                nd.entry = not nd.entry
        for nd in _iter_ring(c_head):
            if nd.inter:
                nd.entry = not nd.entry
    elif mode == "difference":
        for nd in _iter_ring(c_head):
            if nd.inter:
                nd.entry = not nd.entry
    inters = [nd for nd in _iter_ring(s_head) if nd.inter]
    out = []
    for start in inters:
        if start.visited:
            continue
        ring = []
        nd = start
        while True:
            nd.visited = True
            if nd.neighbor is not None:
                nd.neighbor.visited = True
            ring.append(nd.pt)
            if nd.entry:
                while True:
                    nd = nd.nxt
                    if nd.inter:
                        break
                    ring.append(nd.pt)
            else:
                while True:
                    nd = nd.prv
                    if nd.inter:
                        break
                    ring.append(nd.pt)
            nd = nd.neighbor
            if nd is start or nd.visited and nd is not start and \
                    (abs(nd.pt[0] - start.pt[0]) < 1e-15
                     and abs(nd.pt[1] - start.pt[1]) < 1e-15):
                break
            if nd.visited:
                break
        if len(ring) >= 3:
            arr = np.array(ring + [ring[0]], np.float64)
            out.append(arr)
    return out


def polygon_intersection(subject: np.ndarray, clip: np.ndarray) -> list[np.ndarray]:
    """Intersection of two simple polygons -> list of closed rings."""
    return polygon_overlay(subject, clip, "intersection")


def polygon_union(subject: np.ndarray, clip: np.ndarray) -> list[np.ndarray]:
    """Union; a result with >1 ring means disjoint parts (a union
    producing interior holes is out of scope and raises upstream)."""
    return polygon_overlay(subject, clip, "union")


def polygon_difference(subject: np.ndarray, clip: np.ndarray) -> list[np.ndarray]:
    """Subject minus clip (clip fully inside subject — a hole — raises
    NotImplementedError)."""
    return polygon_overlay(subject, clip, "difference")


def polygon_intersection_area(subject: np.ndarray, clip: np.ndarray) -> float:
    return sum(abs(ring_area(r)) for r in polygon_intersection(subject, clip))


def unary_union_area(rings: list[np.ndarray]) -> float:
    """UnaryUnion area by inclusion-exclusion over pairwise/triple
    intersections (exact for families where 4-wise intersections are
    empty; the area-space analog of GEOS UnaryUnion for layer
    statistics — full geometry union of arbitrary families is out of
    scope)."""
    n = len(rings)
    total = sum(abs(ring_area(_close(r))) for r in rings)
    # pairwise
    pair_cache: dict[tuple, list[np.ndarray]] = {}
    for i in range(n):
        for j in range(i + 1, n):
            inter = polygon_intersection(rings[i], rings[j])
            if inter:
                pair_cache[(i, j)] = inter
                total -= sum(abs(ring_area(r)) for r in inter)
    # triples (A∩B already computed; clip with C)
    for (i, j), inter in pair_cache.items():
        for k in range(j + 1, n):
            if (i, k) not in pair_cache and (j, k) not in pair_cache:
                continue
            add = 0.0
            for r in inter:
                add += polygon_intersection_area(r, rings[k])
            if add > 0:
                total += add
    return total


def _close(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, np.float64)
    if not np.allclose(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r
