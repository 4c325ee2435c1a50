"""Distributed polygonize: per-tile labeling + cross-tile boundary
merge (reference alg/polygonize.cpp done single-pass/single-node; the
distributed decomposition is the north rule's "polygonization as
groupby-aggregate over cell-bucketed pixel runs").

Plan:
1. Each grid tile is labeled independently (``label_components``) —
   the heavy, perfectly-parallel pass. Every region gets a globally
   unique provisional id ``(tile_index << 24) | local_label`` and
   emits one stats row (value, n_pixels, bbox in global coords).
2. Each tile also emits its four border strips (values + labels).
   Strips meet at a shared boundary key; equal values across the
   boundary yield (gid_a, gid_b) adjacency pairs — a tiny second
   shuffle (groupby boundary key).
3. The region graph (regions + adjacency pairs, orders of magnitude
   smaller than the pixels) is merged with union-find and the stats
   combined per final root.

Tile row schema: tx:int32, ty:int32, x0:int64, y0:int64, h:int32,
w:int32, values:binary (int32 row-major).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.ccl import label_components

TILE_GRID_SCHEMA = pa.schema([
    ("tx", pa.int32()), ("ty", pa.int32()),
    ("x0", pa.int64()), ("y0", pa.int64()),
    ("h", pa.int32()), ("w", pa.int32()),
    ("values", pa.binary()),
])


def grid_to_tiles(values: np.ndarray, tile: int = 256) -> pa.Table:
    """Split a full int grid into tile rows (test/ingest helper)."""
    v = np.asarray(values, np.int32)
    H, W = v.shape
    rows = {n: [] for n in TILE_GRID_SCHEMA.names}
    for ty, y0 in enumerate(range(0, H, tile)):
        for tx, x0 in enumerate(range(0, W, tile)):
            sub = v[y0:y0 + tile, x0:x0 + tile]
            rows["tx"].append(tx); rows["ty"].append(ty)
            rows["x0"].append(x0); rows["y0"].append(y0)
            rows["h"].append(sub.shape[0]); rows["w"].append(sub.shape[1])
            rows["values"].append(np.ascontiguousarray(sub).tobytes())
    return pa.table({f.name: pa.array(rows[f.name], f.type) for f in TILE_GRID_SCHEMA})


def _label_batch(t: pa.Table, connect: int, tiles_per_row: int) -> pa.Table:
    out = {"kind": [], "key": [], "gid": [], "gid2": [], "value": [],
           "n_pixels": [], "xmin": [], "ymin": [], "xmax": [], "ymax": [],
           "payload": []}

    def emit(kind, key=0, gid=0, gid2=0, value=0, n_pixels=0,
             xmin=0, ymin=0, xmax=0, ymax=0, payload=b""):
        out["kind"].append(kind); out["key"].append(key)
        out["gid"].append(gid); out["gid2"].append(gid2)
        out["value"].append(int(value)); out["n_pixels"].append(int(n_pixels))
        out["xmin"].append(int(xmin)); out["ymin"].append(int(ymin))
        out["xmax"].append(int(xmax)); out["ymax"].append(int(ymax))
        out["payload"].append(payload)

    for rec in t.to_pylist():
        h, w = rec["h"], rec["w"]
        v = np.frombuffer(rec["values"], np.int32).reshape(h, w)
        labels = label_components(v, connect)
        tile_index = rec["ty"] * tiles_per_row + rec["tx"]
        base = np.int64(tile_index) << 24
        lab = labels.reshape(-1).astype(np.int64)
        val = v.reshape(-1)
        ys, xs = np.divmod(np.arange(h * w), w)
        order = np.argsort(lab, kind="stable")
        ls = lab[order]
        starts = np.searchsorted(ls, np.arange(int(ls[-1]) + 1))
        starts = np.append(starts, h * w)
        for r in range(len(starts) - 1):
            sl = order[starts[r]: starts[r + 1]]
            emit("region", gid=int(base | r), value=val[sl[0]], n_pixels=len(sl),
                 xmin=rec["x0"] + int(xs[sl].min()), ymin=rec["y0"] + int(ys[sl].min()),
                 xmax=rec["x0"] + int(xs[sl].max()), ymax=rec["y0"] + int(ys[sl].max()))
        # border strips: key packs (axis, boundary coord, other coord)
        glab = (base | lab.reshape(h, w)).astype(np.int64)
        for kind_key, vals, labs in (
            (("v", rec["tx"] + 1, rec["ty"]), v[:, -1], glab[:, -1]),   # right
            (("v", rec["tx"], rec["ty"]), v[:, 0], glab[:, 0]),         # left
            (("h", rec["ty"] + 1, rec["tx"]), v[-1, :], glab[-1, :]),   # bottom
            (("h", rec["ty"], rec["tx"]), v[0, :], glab[0, :]),         # top
        ):
            axis, b, o = kind_key
            key = (1 if axis == "v" else 2) * (1 << 40) + b * (1 << 20) + o
            emit("border", key=key,
                 payload=vals.astype(np.int32).tobytes() + labs.tobytes())
        if connect == 8:
            # corner junctions: diagonal adjacency across 4 tiles
            # (roles 0=TL 1=TR 2=BL 3=BR of the emitting tile relative
            # to the junction it touches)
            for role, (jy, jx), cy, cx in (
                (3, (rec["ty"] + 1, rec["tx"] + 1), h - 1, w - 1),
                (2, (rec["ty"] + 1, rec["tx"]), h - 1, 0),
                (1, (rec["ty"], rec["tx"] + 1), 0, w - 1),
                (0, (rec["ty"], rec["tx"]), 0, 0),
            ):
                key = 3 * (1 << 40) + jy * (1 << 20) + jx
                payload = np.array([role, v[cy, cx]], np.int32).tobytes() \
                    + np.array([glab[cy, cx]], np.int64).tobytes()
                emit("corner", key=key, payload=payload)

    return pa.table({
        "kind": pa.array(out["kind"], pa.string()),
        "key": pa.array(out["key"], pa.int64()),
        "gid": pa.array(out["gid"], pa.int64()),
        "gid2": pa.array(out["gid2"], pa.int64()),
        "value": pa.array(out["value"], pa.int64()),
        "n_pixels": pa.array(out["n_pixels"], pa.int64()),
        "xmin": pa.array(out["xmin"], pa.int64()),
        "ymin": pa.array(out["ymin"], pa.int64()),
        "xmax": pa.array(out["xmax"], pa.int64()),
        "ymax": pa.array(out["ymax"], pa.int64()),
        "payload": pa.array(out["payload"], pa.binary()),
    })


def _adjacency_pairs(g: pd.DataFrame, connect: int = 4) -> pd.DataFrame:
    """Two border strips with the same key: equal values across the
    boundary union their labels. 8-connected also matches each cell
    against its diagonal neighbors (i-1, i+1) on the other side."""
    empty = pd.DataFrame({"gid": pd.Series([], dtype="int64"),
                          "gid2": pd.Series([], dtype="int64")})
    if len(g) != 2:
        return empty
    bufs = []
    for p in g["payload"]:
        raw = np.frombuffer(p, np.uint8)
        n = len(raw) // 12  # int32 value + int64 label per cell
        vals = np.frombuffer(raw[: 4 * n].tobytes(), np.int32)
        labs = np.frombuffer(raw[4 * n:].tobytes(), np.int64)
        bufs.append((vals, labs))
    (va, la), (vb, lb) = bufs
    m = min(len(va), len(vb))
    out = []
    eq = va[:m] == vb[:m]
    if eq.any():
        out.append(np.stack([la[:m][eq], lb[:m][eq]], axis=1))
    if connect == 8 and m > 1:
        dg = va[: m - 1] == vb[1:m]  # a[i] ~ b[i+1]
        if dg.any():
            out.append(np.stack([la[: m - 1][dg], lb[1:m][dg]], axis=1))
        dg2 = va[1:m] == vb[: m - 1]  # a[i+1] ~ b[i]
        if dg2.any():
            out.append(np.stack([la[1:m][dg2], lb[: m - 1][dg2]], axis=1))
    if not out:
        return empty
    pairs = np.unique(np.concatenate(out, axis=0), axis=0)
    return pd.DataFrame({"gid": pairs[:, 0], "gid2": pairs[:, 1]})


def _corner_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """A 4-tile junction (8-connected only): diagonal roles
    (TL=0 <-> BR=3 and TR=1 <-> BL=2) union when values match."""
    cells = {}
    for p in g["payload"]:
        raw = np.frombuffer(p, np.uint8)
        role, val = np.frombuffer(raw[:8].tobytes(), np.int32)
        lab = int(np.frombuffer(raw[8:].tobytes(), np.int64)[0])
        cells[int(role)] = (int(val), lab)
    out = []
    for a, b in ((0, 3), (1, 2)):
        if a in cells and b in cells and cells[a][0] == cells[b][0]:
            out.append((cells[a][1], cells[b][1]))
    if not out:
        return pd.DataFrame({"gid": pd.Series([], dtype="int64"),
                             "gid2": pd.Series([], dtype="int64")})
    arr = np.array(out, np.int64)
    return pd.DataFrame({"gid": arr[:, 0], "gid2": arr[:, 1]})


def polygonize_tiles(tiles_ds, connect: int = 4,
                     tiles_per_row: int = 1 << 12) -> pa.Table:
    """Distributed polygonize over a tiled grid Dataset. Returns the
    merged per-region table (value, n_pixels, xmin..ymax), sorted by
    (ymin, xmin, value) for determinism."""
    parts = tiles_ds.map_batches(
        lambda t: _label_batch(t, connect, tiles_per_row),
        batch_format="pyarrow", batch_size=4)

    regions: list[pa.Table] = []
    borders: list[pa.Table] = []
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        mask = pa.compute.equal(b["kind"], "region")
        regions.append(b.filter(mask))
        borders.append(b.filter(pa.compute.invert(mask)))
    reg = pa.concat_tables(regions, promote_options="default")
    bor = pa.concat_tables(borders, promote_options="default")

    # adjacency pairs per boundary key (tiny; done driver-side — at
    # scale this is the second groupby shuffle)
    pairs: list[np.ndarray] = []
    bdf = bor.select(["key", "payload"]).to_pandas()
    for key, g in bdf.groupby("key"):
        p = _corner_pairs(g) if (int(key) >> 40) == 3 \
            else _adjacency_pairs(g, connect)
        if len(p):
            pairs.append(p[["gid", "gid2"]].to_numpy())

    gids = reg["gid"].to_numpy()
    index = {int(g): i for i, g in enumerate(gids)}
    parent = np.arange(len(gids), dtype=np.int64)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for arr in pairs:
        for a, b_ in arr.tolist():
            ra, rb = find(index[a]), find(index[b_])
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb

    roots = np.array([find(i) for i in range(len(gids))])
    df = reg.select(["value", "n_pixels", "xmin", "ymin", "xmax", "ymax"]).to_pandas()
    df["root"] = roots
    agg = df.groupby("root").agg(
        value=("value", "first"), n_pixels=("n_pixels", "sum"),
        xmin=("xmin", "min"), ymin=("ymin", "min"),
        xmax=("xmax", "max"), ymax=("ymax", "max"),
    ).sort_values(["ymin", "xmin", "value"]).reset_index(drop=True)
    return pa.Table.from_pandas(agg, preserve_index=False)
