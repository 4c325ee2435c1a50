"""Incremental Delaunay triangulation (Lawson flips) with a walking
point locator — the engine's equivalent of the reference's qhull-backed
``GDALTriangulation`` (reference alg/delaunay.c; consumer
alg/gdalgrid.cpp:2459 GDALGridLinear).

Scope: 2-D Delaunay over float64 scatter points, robust to the two
degeneracies real gridding inputs hit constantly — points exactly on an
existing edge (regular grids) and cocircular quads (regular grids
again, where any diagonal is a valid Delaunay choice; interpolation at
data points is diagonal-independent).

The structure is the classic triangle soup with adjacency:
``tri[t] = (a, b, c)`` CCW, ``nbr[t][j]`` = triangle across edge
``(tri[t][j], tri[t][(j+1)%3])`` or -1.  Points are inserted in Morton
(Z-curve) order so the walk from the previous insertion is O(1)
amortized.
"""

from __future__ import annotations

import numpy as np


def _morton_order(pts: np.ndarray) -> np.ndarray:
    """Insertion order along a Z-curve (21 bits/axis)."""
    mn = pts.min(axis=0)
    span = pts.ptp(axis=0)
    span[span == 0] = 1.0
    q = ((pts - mn) / span * ((1 << 21) - 1)).astype(np.uint64)

    def spread(v: np.ndarray) -> np.ndarray:
        v &= np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
    return np.argsort(code, kind="stable")


class Triangulation:
    """Delaunay triangulation of ``pts`` (n, 2).  ``triangles()``
    returns (T, 3) int64 vertex indices (each row sorted ascending,
    rows lexicographically sorted — same contract as
    ``constructive.delaunay``)."""

    def __init__(self, pts: np.ndarray):
        pts = np.asarray(pts, np.float64).reshape(-1, 2)
        n = len(pts)
        self.npts = n
        cx, cy = (pts.mean(axis=0) if n else (0.0, 0.0))
        m = max(pts[:, 0].ptp() if n else 0.0,
                pts[:, 1].ptp() if n else 0.0, 1.0) * 16.0
        self.v = np.empty((n + 3, 2), np.float64)
        self.v[:n] = pts
        self.v[n] = (cx - 20 * m, cy - m)
        self.v[n + 1] = (cx + 20 * m, cy - m)
        self.v[n + 2] = (cx, cy + 20 * m)
        # triangle soup (python lists; mutated in place)
        self.tri: list[list[int]] = [[n, n + 1, n + 2]]
        self.nbr: list[list[int]] = [[-1, -1, -1]]
        self.dead: list[bool] = [False]
        if n >= 1:
            last = 0
            for i in _morton_order(pts):
                last = self._insert(int(i), last)

    # ---------------------------------------------------- predicates

    def _orient(self, a: int, b: int, px: float, py: float) -> float:
        va, vb = self.v[a], self.v[b]
        return (vb[0] - va[0]) * (py - va[1]) - (vb[1] - va[1]) * (px - va[0])

    def _incircle(self, a: int, b: int, c: int, d: int) -> float:
        """> 0 when d is strictly inside the circumcircle of CCW
        (a, b, c) — the Lawson flip test."""
        v = self.v
        adx, ady = v[a, 0] - v[d, 0], v[a, 1] - v[d, 1]
        bdx, bdy = v[b, 0] - v[d, 0], v[b, 1] - v[d, 1]
        cdx, cdy = v[c, 0] - v[d, 0], v[c, 1] - v[d, 1]
        ad2 = adx * adx + ady * ady
        bd2 = bdx * bdx + bdy * bdy
        cd2 = cdx * cdx + cdy * cdy
        return (adx * (bdy * cd2 - cdy * bd2)
                - ady * (bdx * cd2 - cdx * bd2)
                + ad2 * (bdx * cdy - cdx * bdy))

    # ------------------------------------------------------- locate

    def _locate(self, px: float, py: float, start: int) -> tuple[int, int]:
        """Walk to the triangle containing (px, py). Returns
        (triangle, on_edge) with on_edge = local edge index when the
        point lies exactly on that edge, else -1."""
        t = start
        if self.dead[t]:
            t = next(i for i in range(len(self.tri) - 1, -1, -1)
                     if not self.dead[i])
        for _ in range(4 * len(self.tri) + 8):
            a, b, c = self.tri[t]
            o0 = self._orient(a, b, px, py)
            o1 = self._orient(b, c, px, py)
            o2 = self._orient(c, a, px, py)
            if o0 < 0 or o1 < 0 or o2 < 0:
                # step across the most-violated edge
                vals = (o0, o1, o2)
                j = int(np.argmin(vals))
                nt = self.nbr[t][j]
                if nt < 0:  # outside hull of current soup (can't happen
                    break   # inside the super-triangle)
                t = nt
                continue
            if o0 == 0.0:
                return t, 0
            if o1 == 0.0:
                return t, 1
            if o2 == 0.0:
                return t, 2
            return t, -1
        raise RuntimeError("delaunay: point location walk did not terminate")

    # -------------------------------------------------- maintenance

    def _set_nbr(self, t: int, old: int, new: int) -> None:
        if t < 0:
            return
        nb = self.nbr[t]
        for j in range(3):
            if nb[j] == old:
                nb[j] = new
                return

    def _edge_index(self, t: int, a: int, b: int) -> int:
        tr = self.tri[t]
        for j in range(3):
            if tr[j] == a and tr[(j + 1) % 3] == b:
                return j
        raise RuntimeError("delaunay: adjacency out of sync")

    def _legalize(self, t: int, j: int) -> None:
        """Flip edge j of t while it violates the Delaunay condition
        (iterative with an explicit stack)."""
        stack = [(t, j)]
        while stack:
            t, j = stack.pop()
            if self.dead[t]:
                continue
            o = self.nbr[t][j]
            if o < 0 or self.dead[o]:
                continue
            a, b = self.tri[t][j], self.tri[t][(j + 1) % 3]
            p = self.tri[t][(j + 2) % 3]       # apex of t
            ko = self._edge_index(o, b, a)
            q = self.tri[o][(ko + 2) % 3]      # apex of o
            if self._incircle(a, b, p, q) <= 0:
                continue
            # flip (a,b) -> (p,q):  t := (a, q, p), o := (b, p, q)
            t_ab_next = self.nbr[t][(j + 1) % 3]   # across (b, p)
            t_ab_prev = self.nbr[t][(j + 2) % 3]   # across (p, a)
            o_ba_next = self.nbr[o][(ko + 1) % 3]  # across (a, q)
            o_ba_prev = self.nbr[o][(ko + 2) % 3]  # across (q, b)
            self.tri[t] = [a, q, p]
            self.tri[o] = [q, b, p]
            self.nbr[t] = [o_ba_next, o, t_ab_prev]
            self.nbr[o] = [o_ba_prev, t_ab_next, t]
            self._set_nbr(o_ba_next, o, t)
            self._set_nbr(t_ab_next, t, o)
            stack.append((t, 0))   # edge (a, q)
            stack.append((o, 0))   # edge (q, b)

    # ------------------------------------------------------- insert

    def _insert(self, i: int, start: int) -> int:
        px, py = self.v[i]
        t, edge = self._locate(px, py, start)
        if edge < 0:
            a, b, c = self.tri[t]
            nab, nbc, nca = self.nbr[t]
            t1, t2 = len(self.tri), len(self.tri) + 1
            self.tri[t] = [a, b, i]
            self.nbr[t] = [nab, t1, t2]
            self.tri.append([b, c, i])
            self.nbr.append([nbc, t2, t])
            self.tri.append([c, a, i])
            self.nbr.append([nca, t, t1])
            self.dead += [False, False]
            self._set_nbr(nbc, t, t1)
            self._set_nbr(nca, t, t2)
            self._legalize(t, 0)
            self._legalize(t1, 0)
            self._legalize(t2, 0)
            return t
        # exactly on edge `edge` of t: 2 -> 4 split (or 1 -> 2 on hull)
        a, b = self.tri[t][edge], self.tri[t][(edge + 1) % 3]
        c = self.tri[t][(edge + 2) % 3]
        o = self.nbr[t][edge]
        n_bc = self.nbr[t][(edge + 1) % 3]
        n_ca = self.nbr[t][(edge + 2) % 3]
        t1 = len(self.tri)
        # t := (a, i, c), t1 := (i, b, c)
        self.tri[t] = [a, i, c]
        self.tri.append([i, b, c])
        self.nbr.append([-1, -1, -1])
        self.dead.append(False)
        if o >= 0:
            ko = self._edge_index(o, b, a)
            d = self.tri[o][(ko + 2) % 3]
            n_ad = self.nbr[o][(ko + 1) % 3]
            n_db = self.nbr[o][(ko + 2) % 3]
            t2 = len(self.tri)
            # o := (b, i, d), t2 := (i, a, d)
            self.tri[o] = [b, i, d]
            self.tri.append([i, a, d])
            self.nbr.append([-1, -1, -1])
            self.dead.append(False)
            self.nbr[t] = [t2, t1, n_ca]
            self.nbr[t1] = [o, n_bc, t]
            self.nbr[o] = [t1, t2, n_db]
            self.nbr[t2] = [t, n_ad, o]
            self._set_nbr(n_bc, t, t1)
            self._set_nbr(n_ad, o, t2)
            self._legalize(t, 2)    # (c, a)
            self._legalize(t1, 1)   # (b, c)
            self._legalize(o, 2)    # (d, b)
            self._legalize(t2, 1)   # (a, d)
        else:
            self.nbr[t] = [-1, t1, n_ca]
            self.nbr[t1] = [-1, n_bc, t]
            self._set_nbr(n_bc, t, t1)
            self._legalize(t, 2)
            self._legalize(t1, 1)
        return t

    # ------------------------------------------------------- output

    def triangles(self) -> np.ndarray:
        n = self.npts
        out = [tuple(sorted(tr)) for tr, dd in zip(self.tri, self.dead)
               if not dd and max(tr) < n]
        if not out:
            return np.empty((0, 3), np.int64)
        return np.array(sorted(out), np.int64)

    def triangles_ccw(self) -> np.ndarray:
        """(T, 3) triangles in their stored CCW orientation (for
        barycentric interpolation, where winding matters)."""
        n = self.npts
        out = [tr for tr, dd in zip(self.tri, self.dead)
               if not dd and max(tr) < n]
        if not out:
            return np.empty((0, 3), np.int64)
        return np.array(out, np.int64)


def delaunay_triangles(points: np.ndarray) -> np.ndarray:
    """(T, 3) sorted triangle index rows (drop-in for
    ``constructive.delaunay`` at any size)."""
    return Triangulation(points).triangles()
