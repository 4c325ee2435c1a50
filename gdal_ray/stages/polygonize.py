"""Distributed polygonize: per-tile labeling + hierarchical cross-tile
boundary merge (reference alg/polygonize.cpp is single-pass/single-node;
the distributed decomposition is the north rule's "polygonization as
groupby-aggregate over cell-bucketed pixel runs").

Plan (fully distributed — the driver never touches border payloads):

1. Each grid tile is labeled independently (``label_components``) —
   the heavy, perfectly-parallel pass. Every region gets a globally
   unique provisional id ``(tile_index << 24) | local_label``.
   Regions that do not touch the tile border are emitted FINAL
   immediately; border-touching regions stay OPEN and travel with the
   tile's four border strips (values + gids per edge cell).
2. Hierarchical 2x2 merge: level k groups tiles by
   ``(tx >> 1, ty >> 1)`` and runs ``groupby().map_groups``. Each
   group unions open regions across its internal seams (strips aligned
   by GLOBAL pixel coordinate, so ragged tile sizes and 8-connected
   diagonal adjacency across 4-tile corner junctions fall out of plain
   elementwise / +-1-offset matching), merges their stats with a local
   union-find over the group's open regions (bounded by the group
   perimeter), closes regions whose root no longer reaches the
   parent's outer border, and re-emits the outer strips with gids
   mapped to roots. O(log tiles) levels; per-level shuffle volume is
   O(total boundary), shrinking as regions close.
3. After the last level every region is final. The union of per-level
   final rows IS the result — O(regions) rows, the query output
   itself. Callers at 100 TB scale should ``write_parquet`` that
   union instead of collecting the table.

Tile row schema: tx:int32, ty:int32, x0:int64, y0:int64, h:int32,
w:int32, values:binary (int32 row-major).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ccl import label_components

TILE_GRID_SCHEMA = pa.schema([
    ("tx", pa.int32()), ("ty", pa.int32()),
    ("x0", pa.int64()), ("y0", pa.int64()),
    ("h", pa.int32()), ("w", pa.int32()),
    ("values", pa.binary()),
])

# merge-stage row kinds
K_OPEN, K_FINAL, K_BORDER = 0, 1, 2
# border sides
S_L, S_R, S_T, S_B = 0, 1, 2, 3

MERGE_SCHEMA = pa.schema([
    ("kind", pa.uint8()),
    ("tx", pa.int64()), ("ty", pa.int64()),
    ("side", pa.uint8()), ("off", pa.int64()),
    ("gid", pa.int64()), ("value", pa.int64()), ("n_pixels", pa.int64()),
    ("xmin", pa.int64()), ("ymin", pa.int64()),
    ("xmax", pa.int64()), ("ymax", pa.int64()),
    ("payload", pa.binary()),
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


class _Rows:
    """Column accumulator for MERGE_SCHEMA tables."""

    def __init__(self):
        self.c = {n: [] for n in MERGE_SCHEMA.names}

    def add(self, kind, tx, ty, side=0, off=0, gid=0, value=0, n_pixels=0,
            xmin=0, ymin=0, xmax=0, ymax=0, payload=b""):
        c = self.c
        c["kind"].append(kind); c["tx"].append(int(tx)); c["ty"].append(int(ty))
        c["side"].append(side); c["off"].append(int(off)); c["gid"].append(int(gid))
        c["value"].append(int(value)); c["n_pixels"].append(int(n_pixels))
        c["xmin"].append(int(xmin)); c["ymin"].append(int(ymin))
        c["xmax"].append(int(xmax)); c["ymax"].append(int(ymax))
        c["payload"].append(payload)

    def table(self) -> pa.Table:
        return pa.table({f.name: pa.array(self.c[f.name], f.type)
                         for f in MERGE_SCHEMA})


def _pack_strip(vals: np.ndarray, gids: np.ndarray) -> bytes:
    return vals.astype(np.int32).tobytes() + gids.astype(np.int64).tobytes()


def _unpack_strip(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    raw = np.frombuffer(payload, np.uint8)
    n = len(raw) // 12  # int32 value + int64 gid per cell
    vals = np.frombuffer(raw[: 4 * n].tobytes(), np.int32)
    gids = np.frombuffer(raw[4 * n:].tobytes(), np.int64)
    return vals, gids


def _label_batch(t: pa.Table, connect: int, tiles_per_row: int) -> pa.Table:
    """Level-0 pass: label each tile, close interior regions, emit open
    regions + the four border strips (keyed by global pixel offset)."""
    out = _Rows()
    for rec in t.to_pylist():
        h, w = rec["h"], rec["w"]
        tx, ty = rec["tx"], rec["ty"]
        v = np.frombuffer(rec["values"], np.int32).reshape(h, w)
        labels = label_components(v, connect)
        base = np.int64(ty * tiles_per_row + tx) << 24
        lab = labels.reshape(-1).astype(np.int64)
        val = v.reshape(-1)
        ys, xs = np.divmod(np.arange(h * w), w)
        border = np.zeros(h * w, bool).reshape(h, w)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        open_labels = set(np.unique(labels[border]).tolist())
        order = np.argsort(lab, kind="stable")
        ls = lab[order]
        starts = np.searchsorted(ls, np.arange(int(ls[-1]) + 1))
        starts = np.append(starts, h * w)
        for r in range(len(starts) - 1):
            sl = order[starts[r]: starts[r + 1]]
            out.add(K_OPEN if r in open_labels else K_FINAL, tx, ty,
                    gid=int(base | r), value=val[sl[0]], n_pixels=len(sl),
                    xmin=rec["x0"] + int(xs[sl].min()), ymin=rec["y0"] + int(ys[sl].min()),
                    xmax=rec["x0"] + int(xs[sl].max()), ymax=rec["y0"] + int(ys[sl].max()))
        glab = (base | lab.reshape(h, w)).astype(np.int64)
        for side, off, vals, gids in (
            (S_L, rec["y0"], v[:, 0], glab[:, 0]),
            (S_R, rec["y0"], v[:, -1], glab[:, -1]),
            (S_T, rec["x0"], v[0, :], glab[0, :]),
            (S_B, rec["x0"], v[-1, :], glab[-1, :]),
        ):
            out.add(K_BORDER, tx, ty, side=side, off=off,
                    payload=_pack_strip(vals, gids))
    return out.table()


def _concat_side(strips: list[tuple[int, np.ndarray, np.ndarray]]):
    """Concatenate (off, vals, gids) strips into coordinate-sorted
    (coords, vals, gids) arrays; coords are global pixel positions."""
    coords, vals, gids = [], [], []
    for off, v, g in sorted(strips, key=lambda s: s[0]):
        coords.append(off + np.arange(len(v), dtype=np.int64))
        vals.append(v)
        gids.append(g)
    return (np.concatenate(coords), np.concatenate(vals), np.concatenate(gids))


def _seam_edges(a, b, connect: int) -> list[tuple[int, int]]:
    """Union edges across one seam. ``a``/``b`` are the two sides'
    (coords, vals, gids); coords align by global position. Direct
    matches at equal coords; 8-connected adds +-1-offset diagonal
    matches (which also resolves 4-tile corner junctions, because a
    full-length seam is contiguous across original tile boundaries)."""
    ca, va, ga = a
    cb, vb, gb = b
    edges: list[tuple[int, int]] = []
    offsets = (0,) if connect == 4 else (0, 1, -1)
    for d in offsets:
        _, ia, ib = np.intersect1d(ca, cb + d, return_indices=True)
        if len(ia):
            eq = va[ia] == vb[ib]
            edges.extend(zip(ga[ia][eq].tolist(), gb[ib][eq].tolist()))
    return edges


def _merge_group(t: pa.Table, connect: int) -> pa.Table:
    """One 2x2 super-tile merge: seam union-find over open regions,
    stats merge, close-or-reemit, outer strips relabeled to roots."""
    kind = t["kind"].to_numpy()
    tx = t["tx"].to_numpy()
    ty = t["ty"].to_numpy()
    ptx, pty = int(tx[0]) >> 1, int(ty[0]) >> 1
    out = _Rows()

    # pass finals through untouched (normally filtered out upstream)
    for i in np.nonzero(kind == K_FINAL)[0]:
        r = {n: t[n][int(i)].as_py() for n in t.column_names}
        out.add(K_FINAL, ptx, pty, gid=r["gid"], value=r["value"],
                n_pixels=r["n_pixels"], xmin=r["xmin"], ymin=r["ymin"],
                xmax=r["xmax"], ymax=r["ymax"])

    # border strips by (cx, cy, side)
    side = t["side"].to_numpy()
    off = t["off"].to_numpy()
    strips: dict[tuple[int, int, int], list] = {}
    for i in np.nonzero(kind == K_BORDER)[0]:
        i = int(i)
        vals, gids = _unpack_strip(t["payload"][i].as_py())
        key = (int(tx[i]) & 1, int(ty[i]) & 1, int(side[i]))
        strips.setdefault(key, []).append((int(off[i]), vals, gids))

    def gather(pred_side_pairs):
        got = []
        for cx, cy, s in pred_side_pairs:
            got.extend(strips.get((cx, cy, s), []))
        return got

    # internal seams (both sides must exist)
    edges: list[tuple[int, int]] = []
    vseam_a = gather([(0, 0, S_R), (0, 1, S_R)])
    vseam_b = gather([(1, 0, S_L), (1, 1, S_L)])
    if vseam_a and vseam_b:
        edges += _seam_edges(_concat_side(vseam_a), _concat_side(vseam_b), connect)
    hseam_a = gather([(0, 0, S_B), (1, 0, S_B)])
    hseam_b = gather([(0, 1, S_T), (1, 1, S_T)])
    if hseam_a and hseam_b:
        edges += _seam_edges(_concat_side(hseam_a), _concat_side(hseam_b), connect)

    # union-find over the group's open regions (bounded by perimeter)
    open_idx = np.nonzero(kind == K_OPEN)[0]
    gid_col = t["gid"].to_numpy()
    index = {int(gid_col[i]): j for j, i in enumerate(open_idx)}
    parent = np.arange(len(open_idx), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return int(i)

    for a, b in edges:
        ra, rb = find(index[a]), find(index[b])
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    roots = np.array([find(j) for j in range(len(open_idx))], np.int64)
    open_gids = gid_col[open_idx]
    # vectorized gid -> root-gid mapping (searchsorted over sorted gids)
    order = np.argsort(open_gids)
    sorted_gids = open_gids[order]
    root_of_sorted = (open_gids[roots][order] if len(open_idx)
                      else np.array([], np.int64))

    def map_gids(g: np.ndarray) -> np.ndarray:
        return root_of_sorted[np.searchsorted(sorted_gids, g)]

    # parent outer strips, gids mapped to roots
    outer = {
        S_L: gather([(0, 0, S_L), (0, 1, S_L)]),
        S_R: gather([(1, 0, S_R), (1, 1, S_R)]),
        S_T: gather([(0, 0, S_T), (1, 0, S_T)]),
        S_B: gather([(0, 1, S_B), (1, 1, S_B)]),
    }
    still_open: set[int] = set()
    for s, lst in outer.items():
        for o, vals, gids in lst:
            mapped = map_gids(gids)
            still_open.update(mapped.tolist())
            out.add(K_BORDER, ptx, pty, side=s, off=o,
                    payload=_pack_strip(vals, mapped))

    # merged stats per root; close roots that left the outer border
    if len(open_idx):
        val = t["value"].to_numpy()[open_idx]
        npx = t["n_pixels"].to_numpy()[open_idx]
        x0 = t["xmin"].to_numpy()[open_idx]
        y0 = t["ymin"].to_numpy()[open_idx]
        x1 = t["xmax"].to_numpy()[open_idx]
        y1 = t["ymax"].to_numpy()[open_idx]
        ro = np.argsort(roots, kind="stable")
        rs = roots[ro]
        starts = np.nonzero(np.r_[True, rs[1:] != rs[:-1]])[0]
        bounds = np.r_[starts, len(rs)]
        for k in range(len(starts)):
            sl = ro[bounds[k]: bounds[k + 1]]
            g = int(open_gids[rs[bounds[k]]])
            out.add(K_OPEN if g in still_open else K_FINAL, ptx, pty,
                    gid=g, value=int(val[sl[0]]), n_pixels=int(npx[sl].sum()),
                    xmin=int(x0[sl].min()), ymin=int(y0[sl].min()),
                    xmax=int(x1[sl].max()), ymax=int(y1[sl].max()))
    return out.table()


def _region_table(tables: list[pa.Table]) -> pa.Table:
    cols = ["value", "n_pixels", "xmin", "ymin", "xmax", "ymax"]
    merged = pa.concat_tables([tt.select(cols) for tt in tables],
                              promote_options="default")
    idx = pc.sort_indices(merged, sort_keys=[("ymin", "ascending"),
                                             ("xmin", "ascending"),
                                             ("value", "ascending")])
    return merged.take(idx)


def polygonize_tiles(tiles_ds, connect: int = 4,
                     tiles_per_row: int = 1 << 12) -> pa.Table:
    """Distributed polygonize over a tiled grid Dataset. Returns the
    merged per-region table (value, n_pixels, xmin..ymax), sorted by
    (ymin, xmin, value) for determinism. The merge is the hierarchical
    2x2 plan in the module docstring; the driver only ever collects
    final per-region rows (the result itself)."""
    nt = tiles_ds.max(["tx", "ty"])
    ntx, nty = int(nt["max(tx)"]) + 1, int(nt["max(ty)"]) + 1
    levels = max(ntx - 1, nty - 1).bit_length()  # ceil(log2(max(ntx,nty)))

    cur = tiles_ds.map_batches(
        lambda t: _label_batch(t, connect, tiles_per_row),
        batch_format="pyarrow", batch_size=4).materialize()

    final_tables: list[pa.Table] = []

    def split_finals(ds):
        fin = ds.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], K_FINAL)),
            batch_format="pyarrow")
        live = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["kind"], K_FINAL)),
            batch_format="pyarrow")
        tabs = [b for b in fin.iter_batches(batch_size=None, batch_format="pyarrow")
                if b.num_rows]
        return tabs, live

    tabs, cur = split_finals(cur)
    final_tables += tabs
    for _ in range(levels):
        def add_parent(t: pa.Table) -> pa.Table:
            t = t.append_column("ptx", pc.shift_right(t["tx"], 1))
            return t.append_column("pty", pc.shift_right(t["ty"], 1))

        cur = (cur.map_batches(add_parent, batch_format="pyarrow")
               .groupby(["ptx", "pty"])
               .map_groups(lambda g: _merge_group(g, connect),
                           batch_format="pyarrow")
               .materialize())
        tabs, cur = split_finals(cur)
        final_tables += tabs

    # all seams processed: any region still open only touches the
    # global grid edge — close it
    leftover = [b for b in cur.iter_batches(batch_size=None, batch_format="pyarrow")
                if b.num_rows]
    for b in leftover:
        b = b.filter(pc.equal(b["kind"], K_OPEN))
        if b.num_rows:
            final_tables.append(b)
    return _region_table(final_tables)
