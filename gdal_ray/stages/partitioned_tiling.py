"""Metadata-partitioned warp+compose: the no-pixel-shuffle tiling path.

The fragment-shuffle compose (stages/tiling.py) moves every warped
pixel through a groupby exchange — correct, but the exchange is the
bottleneck. When the source table supports keyed reads (Lance `take`,
parquet row-group pruning, or a deterministic generator), the scalable
plan shuffles *metadata only*:

1. Footprint stage: compute each image's EPSG:3857 bbox from its
   georeference alone (no decode) and assign it to every quadtree
   partition cell its bbox touches.
2. Partition sizing (skew): start at ``base_zoom``; any cell holding
   more than ``max_images_per_part`` images splits into its four
   children, recursively (down to ``max_part_zoom``). The dense
   megacell ends up covered by many small leaves — this is the north
   rule's explicit skew handling, replacing key salting with adaptive
   partition refinement (deterministic, exact).
3. Compose stage: one task per leaf (bucketed groupby over the tiny
   assignment table): load/decode the leaf's images, warp them
   (stages/warp.py), compose every output tile whose ancestor at the
   leaf's zoom IS the leaf. Since the leaves partition the plane and
   every image overlapping a leaf is assigned to it, each tile is
   composed exactly once from exactly the right images — bit-identical
   to the fragment-shuffle path (tested).

Only (part_key, image_idx) pairs cross the wire; pixels stay inside
their task from decode to written tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.crs import WEB_MERCATOR_EXTENT
from ..functions.tiles import tile_key, unpack_tile_key
from ..stages.tiling import _compose_one
from ..stages.warp import WarpToTiles, src_bounds_3857, warp_image_to_tiles


def _cells_touched(bbox, z: int):
    """All (tx, ty) at zoom z intersecting a 3857 bbox."""
    n = 1 << z
    ext = WEB_MERCATOR_EXTENT
    size = 2 * ext / n
    xmin, ymin, xmax, ymax = bbox
    tx0 = int(np.clip((xmin + ext) // size, 0, n - 1))
    tx1 = int(np.clip((xmax + ext) // size, 0, n - 1))
    ty0 = int(np.clip((ext - ymax) // size, 0, n - 1))
    ty1 = int(np.clip((ext - ymin) // size, 0, n - 1))
    return [(tx, ty) for ty in range(ty0, ty1 + 1) for tx in range(tx0, tx1 + 1)]


def quadtree_partitions(bboxes: list[tuple], base_zoom: int = 10,
                        max_images_per_part: int = 64,
                        max_part_zoom: int = 18) -> pa.Table:
    """Assign image indices to quadtree leaf partitions.

    Returns (part_key:int64, salt:int32, image_idx:int64) rows. A
    leaf's zoom is encoded in its packed key, so mixed-depth leaves
    coexist. Leaves still over the threshold at ``max_part_zoom``
    (irreducible megacells: footprints comparable to the cell, so
    splitting deeper only duplicates work) are SALTED: their images
    split round-robin into ceil(n/threshold) salt groups, each group
    composing *partial* tiles that a small merge stage combines —
    the skew escape hatch when refinement bottoms out.
    """
    pending: dict[tuple, list[int]] = {}
    for i, bb in enumerate(bboxes):
        for (tx, ty) in _cells_touched(bb, base_zoom):
            pending.setdefault((base_zoom, tx, ty), []).append(i)

    leaves: dict[tuple, list[int]] = {}
    while pending:
        cell, idxs = pending.popitem()
        z, tx, ty = cell
        if len(idxs) <= max_images_per_part or z >= max_part_zoom:
            leaves[cell] = idxs
            continue
        # split: re-assign this cell's images to its four children,
        # keeping only children each image's bbox actually touches
        for i in idxs:
            for (cx, cy) in _cells_touched(bboxes[i], z + 1):
                if cx >> 1 == tx and cy >> 1 == ty:
                    pending.setdefault((z + 1, cx, cy), []).append(i)

    keys, salts, idxs_out = [], [], []
    for (z, tx, ty), idxs in leaves.items():
        k = int(tile_key(tx, ty, z))
        n_salt = max(1, -(-len(idxs) // max_images_per_part))
        for pos, i in enumerate(sorted(idxs)):
            keys.append(k)
            salts.append(pos % n_salt)
            idxs_out.append(i)
    return pa.table({"part_key": pa.array(keys, pa.int64()),
                     "salt": pa.array(salts, pa.int32()),
                     "image_idx": pa.array(idxs_out, pa.int64())})


def corpus_bboxes(num_images: int) -> list[tuple]:
    """3857 footprint bboxes of the synthetic corpus, from georef
    metadata only (no decode)."""
    from ..sources.images import georef, image_size

    out = []
    for i in range(num_images):
        gt, epsg = georef(i)
        n = image_size(i)
        out.append(src_bounds_3857(gt, epsg, n, n))
    return out


_EMPTY_OUT = pd.DataFrame({
    "tile_key": pd.Series([], dtype="int64"),
    "z": pd.Series([], dtype="int16"),
    "tx": pd.Series([], dtype="int32"),
    "ty": pd.Series([], dtype="int32"),
    "pixels": pd.Series([], dtype=object),
    "alpha": pd.Series([], dtype=object),
    "n_src": pd.Series([], dtype="int64"),
    "n_valid": pd.Series([], dtype="int64"),
    "checksum": pd.Series([], dtype="int64"),
    "winner": pd.Series([], dtype=object),
    "partial": pd.Series([], dtype=bool),
})


class ComposePartition:
    """Actor: process one (or more) leaf partitions end-to-end —
    load/decode the images, warp, compose only the tiles owned by the
    leaf. ``loader(idxs) -> pa.Table`` is the keyed read
    (Lance take / parquet pruning / deterministic synthesis)."""

    def __init__(self, zoom: int | None = None, resampling: str = "bilinear",
                 tile_size: int = 256, loader=None):
        from ..functions.codecs import decode_image
        from ..sources.images import georef, make_batch

        self._decode = decode_image
        self._georef = georef
        self._loader = loader or (lambda idxs: make_batch(np.asarray(idxs)))
        self.zoom = zoom
        self.resampling = resampling
        self.tile_size = tile_size

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        import zlib

        rows = []
        for (part_key, salt), sub in g.groupby(["part_key", "salt"], sort=True):
            pz, ptx, pty = (int(v) for v in unpack_tile_key(int(part_key)))
            salted = bool(sub["n_salt"].iloc[0] > 1)
            idxs = np.sort(sub["image_idx"].to_numpy())
            batch = self._loader(idxs)
            frags_by_tile: dict[int, list[dict]] = {}
            ids = batch["image_id"].to_pylist()
            for i, blob in enumerate(batch["bytes"]):
                px = self._decode(blob.as_py())
                gt, epsg = self._georef(int(idxs[i]))
                for fr in warp_image_to_tiles(
                        px, gt, epsg, ids[i], self.zoom,
                        resampling=self.resampling, tile_size=self.tile_size):
                    # keep only tiles owned by this leaf
                    if fr["z"] < pz:
                        # a fragment coarser than the leaf zoom has no
                        # owning leaf; silently dropping it would break
                        # bit-identity with the fragment-shuffle path
                        raise ValueError(
                            f"image {ids[i]} warps at z{fr['z']}, coarser than "
                            f"the leaf zoom z{pz}: the partitioned path needs "
                            "auto zoom >= base_zoom — lower base_zoom or use "
                            "the fragment-shuffle path (tiling.compose_tiles)")
                    if (fr["tx"] >> (fr["z"] - pz)) != ptx or \
                       (fr["ty"] >> (fr["z"] - pz)) != pty:
                        continue
                    fr["__sort__"] = int(idxs[i])
                    frags_by_tile.setdefault(fr["tile_key"], []).append(fr)
            for tk in sorted(frags_by_tile):
                r = _compose_one(frags_by_tile[tk], self.tile_size, salted)
                if salted:
                    # partial tile: winner array rides along (zlib'd)
                    # for the merge stage; tiny volume — hot leaves only
                    r["winner"] = zlib.compress(r.pop("winner"), 1)
                r["partial"] = salted
                rows.append(r)
        if not rows:
            return _EMPTY_OUT.copy()
        df = pd.DataFrame(rows)
        if "winner" not in df.columns:
            df["winner"] = b""
        return df[list(_EMPTY_OUT.columns)]


def merge_partials(g: pd.DataFrame, tile_size: int = 256) -> pd.DataFrame:
    """Merge salted partial tiles of one bucket (per-pixel max of the
    winner sort value — associative, same rule as compose)."""
    import zlib

    from ..functions.checksum import checksum_image
    from ..functions.codecs import decode_image, encode_image

    rows = []
    for tk, sub in g.groupby("tile_key", sort=True):
        canvas = np.zeros((tile_size, tile_size, 3), np.uint8)
        winner = np.full((tile_size, tile_size), np.iinfo(np.int64).min, np.int64)
        n_src = 0
        for rec in sub.to_dict("records"):
            p = decode_image(rec["pixels"])
            w = np.frombuffer(zlib.decompress(rec["winner"]),
                              np.int64).reshape(tile_size, tile_size)
            take = w > winner
            canvas[take] = p[take]
            winner[take] = w[take]
            n_src += int(rec["n_src"])
        valid = winner != np.iinfo(np.int64).min
        z, tx, ty = unpack_tile_key(int(tk))
        rows.append({
            "tile_key": int(tk), "z": np.int16(z), "tx": np.int32(tx),
            "ty": np.int32(ty),
            "pixels": encode_image(canvas, "raw"),
            "alpha": np.packbits(valid.astype(np.uint8)).tobytes(),
            "n_src": n_src, "n_valid": int(valid.sum()),
            "checksum": checksum_image(np.where(valid, canvas[:, :, 0], 0)),
        })
    out = pd.DataFrame(rows)
    if len(out) == 0:
        return _EMPTY_OUT.drop(columns=["winner", "partial"]).copy()
    return out


def warp_compose_partitioned(num_images: int, *, zoom: int | None = None,
                             resampling: str = "bilinear",
                             base_zoom: int = 10,
                             max_images_per_part: int = 64,
                             max_part_zoom: int = 18,
                             num_buckets: int | None = None,
                             concurrency: int = 8):
    """The metadata-shuffle tiling pipeline. Returns the composed
    tiles Dataset (schema = stages/tiling.TILE_SCHEMA, no winner/
    partial columns).

    The assignment table is split driver-side into unsalted leaves
    (compose -> final tiles directly, fully streaming) and salted hot
    leaves (compose partials -> small merge shuffle) — two independent
    pipelines over metadata, unioned at the end. Exchanges: the tiny
    assignment table in, the salted-leaf partial tiles out."""
    import pyarrow.compute as pc
    import ray.data

    assign = quadtree_partitions(corpus_bboxes(num_images), base_zoom,
                                 max_images_per_part, max_part_zoom)
    # per-(part) salt count so compose tasks know partial vs final
    pk = assign["part_key"].to_numpy()
    sl = assign["salt"].to_numpy()
    import collections

    nsalt = collections.Counter()
    for k, s in zip(pk.tolist(), sl.tolist()):
        nsalt[k] = max(nsalt[k], s + 1)
    ns = np.array([nsalt[k] for k in pk.tolist()], np.int32)
    assign = assign.append_column("n_salt", pa.array(ns))
    nb = num_buckets or max(64, concurrency * 4)
    b = (pd.util.hash_array(pk * np.int64(1000003) + sl)
         % np.uint64(nb)).astype(np.int64)
    assign = assign.append_column("__bucket__", pa.array(b))

    final_cols = ["tile_key", "z", "tx", "ty", "pixels", "alpha",
                  "n_src", "n_valid", "checksum"]
    kwargs = dict(zoom=zoom, resampling=resampling)
    salted_mask = pc.greater(assign["n_salt"], 1)

    a_plain = assign.filter(pc.invert(salted_mask))
    a_salted = assign.filter(salted_mask)

    def compose_of(table: pa.Table, conc: int):
        ds = ray.data.from_arrow(table)
        n_parts = max(1, min(nb, table.num_rows))
        return ds.repartition(n_parts).groupby("__bucket__").map_groups(
            ComposePartition, fn_constructor_kwargs=kwargs,
            batch_format="pandas", concurrency=conc, num_cpus=1)

    # size the two concurrent pools by their share of the work so the
    # union's branches never oversubscribe the cluster
    frac = a_salted.num_rows / max(1, assign.num_rows)
    conc_salted = max(1, min(int(concurrency * frac) + 1, concurrency // 2))
    conc_plain = max(2, concurrency - conc_salted)

    finals = compose_of(a_plain, conc_plain).map_batches(
        lambda t: t.select(final_cols), batch_format="pyarrow")
    if a_salted.num_rows == 0:
        return finals
    # exchange #2: partial tiles of the salted hot leaves (small)
    merged = compose_of(a_salted, conc_salted).groupby("tile_key").map_groups(
        merge_partials, batch_format="pandas")
    return finals.union(merged)
