"""WAsP .map wind-atlas vector driver (reference
ogr/ogrsf_frmts/wasp/ogrwasplayer.cpp, ogrwaspdatasource.cpp;
conformance autotest/ogr/ogr_wasp.py).

The .map file: 4 header lines (WKT or "no spatial ref sys", then the
three fixed calibration lines ogrwaspdatasource.cpp:313-323), then per
feature an attribute line — elevation "%11.3f %11d" (height,
n-points) or roughness "%11.3f %11.3f %11d" (z-left, z-right,
n-points) — followed by the coordinates, three x/y pairs per line
("%11.1f %11.1f ", ogrwasplayer.cpp:355-373, :534-556).

Elevation comes from the LineString Z (averaged, AvgZ :836) or a
named field; roughness lines carry (left, right) fields; roughness
POLYGONS are reduced to the shared boundaries between touching zones
with differing roughness (WriteRoughness(polygon) :411 — the
reference computes GEOS poly∩poly linestrings; this engine matches
shared edges exactly, the fixture semantics, and documents that
partial-edge overlaps are out of scope), then contiguous boundaries
with compatible (left,right) merge via the endpoint-neighbor walk of
~OGRWAsPLayer (:75-245, only endpoints shared by exactly TWO
boundaries merge — the "pichart" corner rule).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geom import simplify_ring
from ..functions.wkb import LINESTRING, Geom, geom_to_wkb

_HEADER = ("no spatial ref sys\n"
           "  0.0 0.0 0.0 0.0\n"
           "  1.0 0.0 1.0 0.0\n"
           "  1.0 0.0\n")


def _coords_block(pts: np.ndarray, indent: str) -> str:
    out = []
    for v in range(len(pts)):
        if v % 3 == 0:
            out.append("\n" + indent)
        out.append(f"{pts[v, 0]:11.1f} {pts[v, 1]:11.1f} ")
    return "".join(out) + "\n"


def _simplify(pts: np.ndarray, tolerance: float | None) -> np.ndarray:
    if tolerance is None or tolerance <= 0 or len(pts) < 3:
        return pts
    return simplify_ring(pts, tolerance)


def write_wasp_elevation(path: str, lines, heights=None, wkt: str | None = None,
                         tolerance: float | None = None) -> None:
    """lines: list of (n,2) or (n,3) arrays; height from ``heights`` or
    the mean Z (AvgZ)."""
    with open(path, "w") as f:
        f.write((wkt + "\n") if wkt else _HEADER.split("\n", 1)[0] + "\n")
        f.write("  0.0 0.0 0.0 0.0\n  1.0 0.0 1.0 0.0\n  1.0 0.0\n")
        for i, pts in enumerate(lines):
            pts = np.asarray(pts, np.float64)
            if heights is not None:
                h = float(heights[i])
            elif pts.shape[1] >= 3:
                h = float(pts[:, 2].mean())
            else:
                raise ValueError("wasp: no height field and no Z")
            xy = _simplify(pts[:, :2], tolerance)
            f.write(f"{h:11.3f} {len(xy):11d}")
            f.write(_coords_block(xy, ""))


def write_wasp_roughness_lines(path: str, lines, left, right,
                               wkt: str | None = None,
                               tolerance: float | None = None) -> None:
    with open(path, "w") as f:
        f.write((wkt + "\n") if wkt else "no spatial ref sys\n")
        f.write("  0.0 0.0 0.0 0.0\n  1.0 0.0 1.0 0.0\n  1.0 0.0\n")
        for i, pts in enumerate(lines):
            xy = _simplify(np.asarray(pts, np.float64)[:, :2], tolerance)
            f.write(f"{float(left[i]):11.3f} {float(right[i]):11.3f} "
                    f"{len(xy):11d}")
            f.write(_coords_block(xy, "  "))


def _poly_boundaries(rings, zs):
    """Shared-edge boundaries between roughness zones. A ring edge of
    polygon i whose reverse appears in polygon j (j earlier in the
    stack, per WriteRoughness's oZones scan) yields a boundary with
    left=z_i, right=z_j; equal-roughness neighbors are skipped
    (bMerge && isEqual, ogrwasplayer.cpp:427)."""
    edges: dict[tuple, int] = {}
    bounds = []  # (pts(2,2), left, right)
    for i, ring in enumerate(rings):
        r = np.asarray(ring, np.float64)[:, :2]
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        for k in range(len(r) - 1):
            a = (round(r[k, 0], 9), round(r[k, 1], 9))
            b = (round(r[k + 1, 0], 9), round(r[k + 1, 1], 9))
            j = edges.get((b, a))
            if j is not None and j != i:
                if zs[i] != zs[j]:
                    bounds.append((np.array([a, b]), zs[i], zs[j]))
            edges[(a, b)] = i
    return bounds


def _merge_boundaries(bounds):
    """The ~OGRWAsPLayer endpoint-neighbor merge: only endpoints shared
    by exactly two boundaries with compatible left/right merge."""
    n = len(bounds)
    pmap: dict[tuple, list[int]] = {}
    lines = [b[0].copy() for b in bounds]
    lr = [[b[1], b[2]] for b in bounds]
    for i, ln in enumerate(lines):
        pmap.setdefault(tuple(ln[0]), []).append(i)
        pmap.setdefault(tuple(ln[-1]), []).append(i)
    start_nb = [-1] * n
    end_nb = [-1] * n
    for ids in pmap.values():
        if len(ids) != 2:
            continue
        i, j = ids
        pi, pj = lines[i], lines[j]
        if lr[i] == lr[j]:
            if tuple(pi[-1]) == tuple(pj[0]):
                end_nb[i] = j
                start_nb[j] = i
            if tuple(pj[-1]) == tuple(pi[0]):
                end_nb[j] = i
                start_nb[i] = j
        if lr[i][0] == lr[j][1] and lr[i][1] == lr[j][0]:
            if tuple(pi[0]) == tuple(pj[0]):
                start_nb[i] = j
                start_nb[j] = i
            if tuple(pi[-1]) == tuple(pj[-1]):
                end_nb[i] = j
                end_nb[j] = i
    merged = [False] * n
    out = []

    def walk(i):
        merged[i] = True
        pts = lines[i]
        left, right = lr[i]
        if start_nb[i] >= 0:
            pts = pts[::-1]
            left, right = right, left
        j = end_nb[i] if start_nb[i] < 0 else start_nb[i]
        while j >= 0 and not merged[j]:
            merged[j] = True
            other = lines[j]
            if tuple(pts[-1]) != tuple(other[0]):
                other = other[::-1]
            pts = np.vstack([pts, other[1:]])
            if end_nb[j] >= 0 and not merged[end_nb[j]]:
                j = end_nb[j]
            elif start_nb[j] >= 0 and not merged[start_nb[j]]:
                j = start_nb[j]
            else:
                j = -1
        out.append((pts, left, right))

    for i in range(n):
        if not merged[i] and (start_nb[i] < 0 or end_nb[i] < 0):
            walk(i)
    for i in range(n):
        if not merged[i]:
            walk(i)
    return out


def write_wasp_roughness_polys(path: str, rings, zs,
                               wkt: str | None = None,
                               tolerance: float | None = None) -> None:
    """rings: list of closed (n,2)/(n,3) rings; zs the per-polygon
    roughness (None = mean Z of the ring)."""
    zvals = []
    for i, r in enumerate(rings):
        r = np.asarray(r, np.float64)
        if zs is not None:
            zvals.append(float(zs[i]))
        elif r.shape[1] >= 3:
            zvals.append(float(r[:-1, 2].mean()
                               if np.array_equal(r[0, :2], r[-1, :2])
                               else r[:, 2].mean()))
        else:
            raise ValueError("wasp: no roughness field and no Z")
    bounds = _merge_boundaries(_poly_boundaries(rings, zvals))
    with open(path, "w") as f:
        f.write((wkt + "\n") if wkt else "no spatial ref sys\n")
        f.write("  0.0 0.0 0.0 0.0\n  1.0 0.0 1.0 0.0\n  1.0 0.0\n")
        for pts, left, right in bounds:
            xy = _simplify(pts, tolerance)
            f.write(f"{left:11.3f} {right:11.3f} {len(xy):11d}")
            f.write(_coords_block(xy, "  "))


def read_wasp(path: str) -> pa.Table:
    """Read a .map back: one LINESTRING row per feature with height
    (elevation map) or z_left/z_right (roughness map) columns."""
    with open(path) as f:
        text = f.read()
    lines = text.splitlines()
    body = lines[4:]
    rows = []
    i = 0
    is_rough = None
    while i < len(body):
        toks = body[i].split()
        i += 1
        if not toks:
            continue
        if is_rough is None:
            is_rough = len(toks) == 3
        n = int(toks[-1])
        attrs = [float(t) for t in toks[:-1]]
        coords: list[float] = []
        while len(coords) < 2 * n and i < len(body):
            coords.extend(float(t) for t in body[i].split())
            i += 1
        pts = np.array(coords[:2 * n], np.float64).reshape(n, 2)
        rows.append((attrs, pts))
    cols: dict[str, list] = {"fid": list(range(len(rows))),
                             "geometry": [], }
    if is_rough:
        cols["z_left"] = [r[0][0] for r in rows]
        cols["z_right"] = [r[0][1] for r in rows]
    else:
        cols["height"] = [r[0][0] for r in rows]
    for attrs, pts in rows:
        cols["geometry"].append(geom_to_wkb(Geom(LINESTRING, [pts])))
    return pa.table({
        "fid": pa.array(cols["fid"], pa.int64()),
        "geometry": pa.array(cols["geometry"], pa.binary()),
        **{k: pa.array(v, pa.float64()) for k, v in cols.items()
           if k not in ("fid", "geometry")},
    })
