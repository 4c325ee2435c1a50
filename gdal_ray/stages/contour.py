"""Distributed contour polyline extraction with cross-tile stitching.

Reference semantics: alg/contour.cpp (ContourGenerator: marching
squares -> segment merge -> polyline features; :331-383) and
alg/marching_squares/segment_merger.h. The Ray decomposition:

1. the grid splits into tiles with a one-sample overlap row/column, so
   every marching-squares CELL belongs to exactly one tile while both
   tiles of a shared border compute bit-identical crossing points;
2. a map_batches task contours each tile per level and assembles LOCAL
   polylines (functions/ccl.py); chains that never touch an interior
   tile border (or that closed locally) are FINAL and emit result rows
   immediately — only border-touching chains (O(perimeter), not
   O(area)) go to the stitch exchange;
3. a tiny groupby(level) stitch stage merges border chains on matching
   endpoints and emits the remaining rows.

Output rows: (level:float64, closed:bool, n_pts:int64, length:float64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.ccl import assemble_polylines, contour_segments

_ROW_SCHEMA = pa.schema([
    ("level", pa.float64()),
    ("closed", pa.bool_()),
    ("n_pts", pa.int64()),
    ("length", pa.float64()),
])

_CHAIN_SCHEMA = pa.schema([
    ("level", pa.float64()),
    ("pts", pa.binary()),
])


def grid_to_contour_tiles(grid: np.ndarray, tile: int = 32) -> pa.Table:
    """Split a grid into overlapping contour tiles (one extra sample
    row/col so border cells interpolate from the same values on both
    sides)."""
    h, w = grid.shape
    rows = {"ty": [], "tx": [], "y0": [], "x0": [], "h": [], "w": [],
            "gh": [], "gw": [], "values": []}
    for y0 in range(0, max(h - 1, 1), tile):
        for x0 in range(0, max(w - 1, 1), tile):
            sub = grid[y0:min(y0 + tile + 1, h), x0:min(x0 + tile + 1, w)]
            rows["ty"].append(y0 // tile)
            rows["tx"].append(x0 // tile)
            rows["y0"].append(y0)
            rows["x0"].append(x0)
            rows["h"].append(sub.shape[0])
            rows["w"].append(sub.shape[1])
            rows["gh"].append(h)
            rows["gw"].append(w)
            rows["values"].append(sub.astype(np.float64).tobytes())
    return pa.table({
        "ty": pa.array(rows["ty"], pa.int32()),
        "tx": pa.array(rows["tx"], pa.int32()),
        "y0": pa.array(rows["y0"], pa.int64()),
        "x0": pa.array(rows["x0"], pa.int64()),
        "h": pa.array(rows["h"], pa.int32()),
        "w": pa.array(rows["w"], pa.int32()),
        "gh": pa.array(rows["gh"], pa.int64()),
        "gw": pa.array(rows["gw"], pa.int64()),
        "values": pa.array(rows["values"], pa.binary()),
    })


def _length(pts: np.ndarray) -> float:
    return float(np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1])).sum())


def _on_interior_border(p, x0, y0, x1, y1, gw, gh) -> bool:
    x, y = float(p[0]), float(p[1])
    eps = 1e-9
    onb = (abs(x - x0) < eps or abs(x - x1) < eps
           or abs(y - y0) < eps or abs(y - y1) < eps)
    if not onb:
        return False
    # global raster edge is not stitchable
    on_global = (abs(x) < eps or abs(x - (gw - 1)) < eps
                 or abs(y) < eps or abs(y - (gh - 1)) < eps)
    if on_global:
        # a corner can sit on both; stitchable if it also lies on an
        # interior border line
        interior = ((abs(x - x0) < eps and x0 > 0)
                    or (abs(x - x1) < eps and x1 < gw - 1)
                    or (abs(y - y0) < eps and y0 > 0)
                    or (abs(y - y1) < eps and y1 < gh - 1))
        return interior
    return True


def merge_chains(chains: list[np.ndarray]):
    """Stitch polyline chains on coinciding endpoints; returns
    (pts, closed) like assemble_polylines."""
    def key(p):
        return (round(float(p[0]), 9), round(float(p[1]), 9))

    import collections

    adj = collections.defaultdict(list)
    for i, c in enumerate(chains):
        adj[key(c[0])].append(i)
        adj[key(c[-1])].append(i)
    used = [False] * len(chains)
    out = []
    for i0 in range(len(chains)):
        if used[i0]:
            continue
        used[i0] = True
        pts = chains[i0]
        while True:
            k = key(pts[-1])
            nxt = [j for j in adj[k] if not used[j]]
            if not nxt:
                # try extending at the head by reversing
                k0 = key(pts[0])
                nxt = [j for j in adj[k0] if not used[j]]
                if not nxt:
                    break
                pts = pts[::-1]
                k = k0
            j = nxt[0]
            used[j] = True
            c = chains[j]
            if key(c[0]) == k:
                pts = np.concatenate([pts, c[1:]])
            else:
                pts = np.concatenate([pts, c[::-1][1:]])
            if key(pts[0]) == key(pts[-1]):
                break
        closed = key(pts[0]) == key(pts[-1]) and len(pts) > 2
        out.append((pts, closed))
    return out


def contour_lines(tiles, levels: np.ndarray):
    """Tiles Dataset -> (final_rows Dataset, per the module contract).

    Per-tile assembly finalizes interior polylines; border chains are
    stitched by a groupby(level) merge stage; the union is returned.
    """
    lv = [float(v) for v in levels]

    def per_tile(t: pa.Table):
        frows = {"level": [], "closed": [], "n_pts": [], "length": []}
        crows = {"level": [], "pts": []}
        for rec in t.to_pylist():
            g = np.frombuffer(rec["values"], np.float64) \
                .reshape(rec["h"], rec["w"])
            x0, y0 = rec["x0"], rec["y0"]
            x1 = x0 + rec["w"] - 1
            y1 = y0 + rec["h"] - 1
            gw, gh = rec["gw"], rec["gh"]
            for level in lv:
                segs = contour_segments(g, level, x0=x0, y0=y0)
                for pts, closed in assemble_polylines(segs):
                    touches = (not closed) and (
                        _on_interior_border(pts[0], x0, y0, x1, y1, gw, gh)
                        or _on_interior_border(pts[-1], x0, y0, x1, y1, gw, gh))
                    if touches:
                        crows["level"].append(level)
                        crows["pts"].append(pts.tobytes())
                    else:
                        frows["level"].append(level)
                        frows["closed"].append(closed)
                        frows["n_pts"].append(len(pts))
                        frows["length"].append(_length(pts))
        final = pa.table({
            "level": pa.array(frows["level"], pa.float64()),
            "closed": pa.array(frows["closed"], pa.bool_()),
            "n_pts": pa.array(frows["n_pts"], pa.int64()),
            "length": pa.array(frows["length"], pa.float64()),
        })
        chains = pa.table({
            "level": pa.array(crows["level"], pa.float64()),
            "pts": pa.array(crows["pts"], pa.binary()),
        })
        return final, chains

    # two-output split: run per-tile once, emit tagged rows, filter
    def tagged(t: pa.Table) -> pa.Table:
        final, chains = per_tile(t)
        a = final.append_column("__chain__",
                                pa.array([False] * final.num_rows))
        a = a.append_column("pts", pa.array([b""] * final.num_rows,
                                            pa.binary()))
        b = pa.table({
            "level": chains["level"],
            "closed": pa.array([False] * chains.num_rows),
            "n_pts": pa.array([0] * chains.num_rows, pa.int64()),
            "length": pa.array([0.0] * chains.num_rows, pa.float64()),
            "__chain__": pa.array([True] * chains.num_rows),
            "pts": chains["pts"],
        })
        return pa.concat_tables([a, b], promote_options="default")

    # materialize the (small) row output so the finals/chains branches
    # don't re-run the tile contouring
    both = tiles.map_batches(tagged, batch_format="pyarrow").materialize()

    import pyarrow.compute as pc

    finals = both.map_batches(
        lambda t: t.filter(pc.invert(t["__chain__"]))
                   .select(["level", "closed", "n_pts", "length"]),
        batch_format="pyarrow")
    chains_ds = both.map_batches(
        lambda t: t.filter(t["__chain__"]), batch_format="pyarrow")

    def stitch(t: pa.Table) -> pa.Table:
        rows = {"level": [], "closed": [], "n_pts": [], "length": []}
        if t.num_rows:
            level = float(t["level"][0].as_py())
            chains = [np.frombuffer(b.as_py(), np.float64).reshape(-1, 2)
                      for b in t["pts"]]
            for pts, closed in merge_chains(chains):
                rows["level"].append(level)
                rows["closed"].append(closed)
                rows["n_pts"].append(len(pts))
                rows["length"].append(_length(pts))
        return pa.table({
            "level": pa.array(rows["level"], pa.float64()),
            "closed": pa.array(rows["closed"], pa.bool_()),
            "n_pts": pa.array(rows["n_pts"], pa.int64()),
            "length": pa.array(rows["length"], pa.float64()),
        })

    stitched = chains_ds.groupby("level").map_groups(
        stitch, batch_format="pyarrow")
    return finals.union(stitched)
