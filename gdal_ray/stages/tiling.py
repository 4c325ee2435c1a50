"""Tile compose / overview pyramid / resume manifests.

The engine's spine (SURVEY.md §2.6): warp fragments shuffle on the
packed tile key, `groupby(tile_key).map_groups` composes each tile
(mosaic winner rule = GTI SORT_FIELD z-order, reference
frmts/gti/gdaltileindexdataset.cpp:87-88 — here the sort value is the
image's numeric suffix, falling back to a stable hash), overview zoom
levels are built from the zoom+1 tiles by masked 2x2 average
(reference apps/gdalalg_raster_tile.cpp:3136-3195 builds overviews
from finer-zoom tiles; average default :2083), and output manifests
make re-runs skip finished tiles (`--resume`, reference
apps/gdalalg_raster_tile.cpp:377,522) with per-partition lineage.

Skew (salted compose): a megacell tile touched by thousands of images
would make one `map_groups` task huge. ``compose_tiles(..., salt=k)``
splits each tile's fragments into k salt buckets, composes partials
per (tile_key, salt), then merges partials per tile_key. The mosaic
rule is associative (per-pixel max of winner sort-value), so the
salted result is bit-identical to the unsalted one — tested.

Composed-tile schema:
    tile_key:int64, z:int16, tx:int32, ty:int32,
    pixels:binary (raw, ts x ts x 3), alpha:binary (packbits validity),
    n_src:int64, n_valid:int64, checksum:int64
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.checksum import checksum_image
from ..functions.codecs import decode_image, encode_image
from ..functions.resample import reduce2x2
from ..functions.tiles import DEFAULT_TILE_SIZE, tile_key, unpack_tile_key

TILE_SCHEMA = pa.schema([
    ("tile_key", pa.int64()),
    ("z", pa.int16()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("pixels", pa.binary()),
    ("alpha", pa.binary()),
    ("n_src", pa.int64()),
    ("n_valid", pa.int64()),
    ("checksum", pa.int64()),
])

_ID_NUM = re.compile(r"^[A-Za-z]*0*(\d+)$")


def sort_value(image_id: str) -> int:
    """Mosaic z-order sort value of an image (SORT_FIELD analog):
    numeric suffix when present (preserves the corpus's lexicographic
    order), else a stable 64-bit content hash."""
    m = _ID_NUM.match(image_id)
    if m:
        return int(m.group(1))
    return int.from_bytes(hashlib.blake2b(image_id.encode(), digest_size=8).digest(),
                          "big", signed=True)


def _unpack_mask(buf: bytes, fh: int, fw: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, np.uint8), count=fh * fw) \
        .reshape(fh, fw).astype(bool)


def _paint(canvas: np.ndarray, winner: np.ndarray, frag: dict) -> None:
    """Paint one fragment where its sort value beats the current
    winner (associative per-pixel-max mosaic rule)."""
    y0, x0, fh, fw = frag["y0"], frag["x0"], frag["fh"], frag["fw"]
    px = decode_image(frag["pixels"])
    if px.ndim == 2:
        px = px[:, :, None].repeat(canvas.shape[2], axis=2)
    mask = _unpack_mask(frag["mask"], fh, fw)
    sv = frag["__sort__"]
    sub_w = winner[y0:y0 + fh, x0:x0 + fw]
    take = mask & (sv > sub_w)
    canvas[y0:y0 + fh, x0:x0 + fw][take] = px[take]
    sub_w[take] = sv


def _compose_one(recs: list[dict], tile_size: int, keep_winner: bool) -> dict:
    if len(recs) == 1 and not keep_winner:
        return _compose_single(recs[0], tile_size)
    canvas = np.zeros((tile_size, tile_size, 3), np.uint8)
    winner = np.full((tile_size, tile_size), np.iinfo(np.int64).min, np.int64)
    ids = set()
    for frag in recs:
        _paint(canvas, winner, frag)
        ids.add(frag["image_id"])
    valid = winner != np.iinfo(np.int64).min
    key = int(recs[0]["tile_key"])
    z, tx, ty = unpack_tile_key(key)
    row = {
        "tile_key": key, "z": np.int16(z), "tx": np.int32(tx), "ty": np.int32(ty),
        "pixels": encode_image(canvas, "raw"),
        "alpha": np.packbits(valid.astype(np.uint8)).tobytes(),
        "n_src": len(ids),
        "n_valid": int(valid.sum()),
        "checksum": checksum_image(np.where(valid, canvas[:, :, 0], 0)),
    }
    if keep_winner:
        row["winner"] = winner.tobytes()
    return row


def _compose_single(frag: dict, tile_size: int) -> dict:
    """Fast path: one fragment -> tile without the winner array (the
    common case — most tiles have a single contributing image)."""
    canvas = np.zeros((tile_size, tile_size, 3), np.uint8)
    valid = np.zeros((tile_size, tile_size), bool)
    y0, x0, fh, fw = frag["y0"], frag["x0"], frag["fh"], frag["fw"]
    px = decode_image(frag["pixels"])
    if px.ndim == 2:
        px = px[:, :, None].repeat(3, axis=2)
    mask = _unpack_mask(frag["mask"], fh, fw)
    sub = canvas[y0:y0 + fh, x0:x0 + fw]
    sub[mask] = px[mask]
    valid[y0:y0 + fh, x0:x0 + fw] = mask
    key = int(frag["tile_key"])
    z, tx, ty = unpack_tile_key(key)
    return {
        "tile_key": key, "z": np.int16(z), "tx": np.int32(tx), "ty": np.int32(ty),
        "pixels": encode_image(canvas, "raw"),
        "alpha": np.packbits(valid.astype(np.uint8)).tobytes(),
        "n_src": 1,
        "n_valid": int(valid.sum()),
        "checksum": checksum_image(np.where(valid, canvas[:, :, 0], 0)),
    }


def _per_key_groups(g: pd.DataFrame, key_cols: list[str]):
    """Yield record-lists per distinct key tuple (rows pre-sorted by
    the groupby shuffle within the bucket)."""
    for _, sub in g.groupby(key_cols, sort=True):
        yield sub.to_dict("records")


def _per_key_tables(t: pa.Table, key_cols: list[str]):
    """Arrow-native per-key split: sort by the (integer) key columns,
    find run boundaries, yield each run's records. Avoids the pandas
    object-dtype round-trip on the binary pixel columns — the compose
    stages are the hottest path in the engine."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return
    idx = pc.sort_indices(t, sort_keys=[(k, "ascending") for k in key_cols])
    t = t.take(idx)
    change = np.zeros(t.num_rows, bool)
    change[0] = True
    for k in key_cols:
        arr = t[k].to_numpy()
        change[1:] |= arr[1:] != arr[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], t.num_rows)
    for s, e in zip(starts, ends):
        yield t.slice(s, e - s).to_pylist()


def _rows_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    if not rows:
        return schema.empty_table()
    return pa.table({f.name: pa.array([r[f.name] for r in rows], f.type)
                     for f in schema})


def compose_tiles(fragments, tile_size: int = DEFAULT_TILE_SIZE,
                  salt: int | None = None, num_buckets: int = 256):
    """Fragments Dataset -> composed tiles Dataset.

    The shuffle key is a *bucket* of the tile key (hash % num_buckets),
    not the tile key itself: per-group task overhead would dominate
    with millions of tiny tile groups, so each `map_groups` task
    composes every tile in its bucket in one numpy loop. ``salt``
    splits each tile's fragments into k sub-buckets first (skewed
    megacells); the mosaic rule is associative per-pixel max of the
    winner sort value, so the salted result is bit-identical."""
    def add_keys(t: pa.Table) -> pa.Table:
        sv = np.array([sort_value(s) for s in t["image_id"].to_pylist()], np.int64)
        keys = t["tile_key"].to_numpy()
        b = (pd.util.hash_array(keys) % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column("__sort__", pa.array(sv))
        return t.append_column("__bucket__", pa.array(b))

    ds = fragments.map_batches(add_keys, batch_format="pyarrow")

    if not salt:
        def compose_bucket(t: pa.Table) -> pa.Table:
            rows = [_compose_one(recs, tile_size, False)
                    for recs in _per_key_tables(t, ["tile_key"])]
            return _rows_table(rows, TILE_SCHEMA)

        return ds.groupby("__bucket__").map_groups(
            compose_bucket, batch_format="pyarrow")

    def add_salt(t: pa.Table) -> pa.Table:
        s = (pd.util.hash_array(t["__sort__"].to_numpy()) % np.uint64(salt)).astype(np.int64)
        t = t.append_column("__salt__", pa.array(s))
        # partial-compose shuffle key: (tile_key, salt) hashed — this is
        # what spreads one hot tile's fragments across many tasks
        b2 = (pd.util.hash_array(t["tile_key"].to_numpy() * np.int64(1000003)
                                 + s) % np.uint64(num_buckets)).astype(np.int64)
        return t.set_column(t.schema.get_field_index("__bucket__"),
                            "__bucket__", pa.array(b2))

    partial_schema = pa.schema(
        [f for f in TILE_SCHEMA if f.name != "n_src"]
        + [pa.field("winner", pa.binary()), pa.field("__n_src_p", pa.int64()),
           pa.field("__bucket__", pa.int64())])

    def compose_partials(t: pa.Table) -> pa.Table:
        rows = []
        for recs in _per_key_tables(t, ["tile_key", "__salt__"]):
            r = _compose_one(recs, tile_size, True)
            r["__n_src_p"] = r.pop("n_src")
            # merge-stage shuffle key: bucket of the tile key alone
            r["__bucket__"] = int(pd.util.hash_array(
                np.array([r["tile_key"]], np.int64))[0] % num_buckets)
            rows.append(r)
        return _rows_table(rows, partial_schema)

    partials = ds.map_batches(add_salt, batch_format="pyarrow") \
        .groupby("__bucket__").map_groups(compose_partials, batch_format="pyarrow")

    def merge_bucket(t: pa.Table) -> pa.Table:
        rows = []
        for recs in _per_key_tables(t, ["tile_key"]):
            canvas = np.zeros((tile_size, tile_size, 3), np.uint8)
            winner = np.full((tile_size, tile_size), np.iinfo(np.int64).min, np.int64)
            n_src = 0
            for rec in recs:
                p = decode_image(rec["pixels"])
                w = np.frombuffer(rec["winner"], np.int64).reshape(tile_size, tile_size)
                take = w > winner
                canvas[take] = p[take]
                winner[take] = w[take]
                n_src += int(rec["__n_src_p"])
            valid = winner != np.iinfo(np.int64).min
            key = int(recs[0]["tile_key"])
            z, tx, ty = unpack_tile_key(key)
            rows.append({
                "tile_key": key, "z": np.int16(z), "tx": np.int32(tx),
                "ty": np.int32(ty),
                "pixels": encode_image(canvas, "raw"),
                "alpha": np.packbits(valid.astype(np.uint8)).tobytes(),
                "n_src": n_src,
                "n_valid": int(valid.sum()),
                "checksum": checksum_image(np.where(valid, canvas[:, :, 0], 0)),
            })
        return _rows_table(rows, TILE_SCHEMA)

    return partials.groupby("__bucket__").map_groups(merge_bucket, batch_format="pyarrow")


# ------------------------------------------------------------------ overviews


def _reduce_quads(q, c, csum, valid, method, tile_size):
    """Masked 2x2 reduction of (T, 2, T, 2, 3) quads -> (T, T, 3) uint8.

    Methods follow GDALRegenerateOverviewsEx semantics (reference
    gcore/overview.cpp): average = mean of contributing (valid) pixels;
    rms = sqrt of mean square; nearest = the first contributing sample
    in source scan order (TL, TR, BL, BR); min/max over contributing
    samples; mode = most frequent value, smallest value winning ties.
    Invalid parent pixels (no contributing child) come out 0.
    """
    cc = c[:, :, :, :, None]
    if method == "average":
        acc = (q * cc).sum(axis=(1, 3))
        avg = np.zeros((tile_size, tile_size, 3), np.float64)
        avg[valid] = acc[valid] / csum[valid][:, None]
        return np.clip(np.floor(avg + 0.5), 0, 255).astype(np.uint8)
    if method == "rms":
        acc = (q * q * cc).sum(axis=(1, 3))
        ms = np.zeros((tile_size, tile_size, 3), np.float64)
        ms[valid] = acc[valid] / csum[valid][:, None]
        return np.clip(np.floor(np.sqrt(ms) + 0.5), 0, 255).astype(np.uint8)
    # flatten the quad axis: (T, T, 4, 3) values + (T, T, 4) validity
    vals = q.transpose(0, 2, 1, 3, 4).reshape(tile_size, tile_size, 4, 3)
    vmask = (c.transpose(0, 2, 1, 3).reshape(tile_size, tile_size, 4) > 0)
    if method == "nearest":
        first = np.argmax(vmask, axis=2)  # first valid in TL,TR,BL,BR order
        out = np.take_along_axis(
            vals, first[:, :, None, None], axis=2)[:, :, 0, :]
        out[~valid] = 0
        return np.clip(out, 0, 255).astype(np.uint8)
    if method == "min" or method == "max":
        fill = np.inf if method == "min" else -np.inf
        masked = np.where(vmask[:, :, :, None], vals, fill)
        red = masked.min(axis=2) if method == "min" else masked.max(axis=2)
        red[~valid] = 0
        return np.clip(red, 0, 255).astype(np.uint8)
    if method == "mode":
        # count, for each candidate i, how many valid samples equal it;
        # candidates are biased so ties resolve to the smallest value
        eq = (vals[:, :, :, None, :] == vals[:, :, None, :, :])
        both = vmask[:, :, :, None, None] & vmask[:, :, None, :, None]
        counts = (eq & both).sum(axis=3).astype(np.float64)
        counts[~vmask[:, :, :, None].repeat(3, axis=3)] = -1
        score = counts - vals / 1024.0  # tie -> smallest value
        pick = np.argmax(score, axis=2)
        out = np.take_along_axis(vals, pick[:, :, None, :], axis=2)[:, :, 0, :]
        out[~valid] = 0
        return np.clip(out, 0, 255).astype(np.uint8)
    raise NotImplementedError(f"overview method {method!r}")


def build_overview_level(tiles, tile_size: int = DEFAULT_TILE_SIZE,
                         method: str = "average", num_buckets: int = 256):
    """One overview zoom: tiles at z -> tiles at z-1, built FROM the
    finer tiles (masked 2x2 reduce; average skips invalid pixels —
    reference overview-from-finer-zoom rule). Shuffle key is a bucket
    of the parent key (same rationale as compose_tiles)."""
    def to_parent(t: pa.Table) -> pa.Table:
        z = t["z"].to_numpy().astype(np.int64)
        tx = t["tx"].to_numpy().astype(np.int64)
        ty = t["ty"].to_numpy().astype(np.int64)
        pk = tile_key(tx >> 1, ty >> 1, z - 1)
        b = (pd.util.hash_array(pk) % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column("parent_key", pa.array(pk))
        return t.append_column("__bucket__", pa.array(b))

    def reduce_one(recs: list[dict]) -> dict:
        key = int(recs[0]["parent_key"])
        z, ptx, pty = unpack_tile_key(key)
        big = np.zeros((2 * tile_size, 2 * tile_size, 3), np.float64)
        cnt = np.zeros((2 * tile_size, 2 * tile_size), np.int32)
        n_src = 0
        for rec in recs:
            qx = (int(rec["tx"]) & 1) * tile_size
            qy = (int(rec["ty"]) & 1) * tile_size
            px = decode_image(rec["pixels"]).astype(np.float64)
            valid = _unpack_mask(rec["alpha"], tile_size, tile_size)
            big[qy:qy + tile_size, qx:qx + tile_size][valid] = px[valid]
            cnt[qy:qy + tile_size, qx:qx + tile_size] = valid
            n_src += int(rec["n_src"])
        # masked 2x2 reduce: (T, 2, T, 2, 3) quads + validity counts
        q = big.reshape(tile_size, 2, tile_size, 2, 3)
        c = cnt.reshape(tile_size, 2, tile_size, 2)
        csum = c.sum(axis=(1, 3))
        valid = csum > 0
        out = _reduce_quads(q, c, csum, valid, method, tile_size)
        return {
            "tile_key": key, "z": np.int16(z), "tx": np.int32(ptx),
            "ty": np.int32(pty),
            "pixels": encode_image(out, "raw"),
            "alpha": np.packbits(valid.astype(np.uint8)).tobytes(),
            "n_src": n_src,
            "n_valid": int(valid.sum()),
            "checksum": checksum_image(np.where(valid, out[:, :, 0], 0)),
        }

    def reduce_bucket(t: pa.Table) -> pa.Table:
        return _rows_table([reduce_one(recs)
                            for recs in _per_key_tables(t, ["parent_key"])],
                           TILE_SCHEMA)

    return tiles.map_batches(to_parent, batch_format="pyarrow") \
        .groupby("__bucket__").map_groups(reduce_bucket, batch_format="pyarrow")


# ------------------------------------------------------------------ resume


_SHARD_DIR = "_manifest_shards"


class _SinkFS:
    """pyarrow-FileSystem-routed sink I/O (matching the vsi.py
    dispatch): plain paths use LocalFileSystem with the exact
    tmp-write -> atomic-rename protocol; URI paths
    (file://, s3://, gs://, ...) resolve via FileSystem.from_uri so
    object-store backends work on real multi-node clusters, where an
    out_dir on worker-local disk would silently lose tiles (writes
    there are single-PUT atomic, so no rename step is needed)."""

    def __init__(self, out_dir: str):
        from pyarrow import fs

        if "://" in out_dir:
            self.fs, self.root = fs.FileSystem.from_uri(out_dir)
            self.atomic_rename = isinstance(self.fs, fs.LocalFileSystem)
        else:
            self.fs = fs.LocalFileSystem()
            self.root = out_dir
            self.atomic_rename = True

    def join(self, *parts: str) -> str:
        return "/".join([self.root, *parts])

    def mkdirs(self) -> None:
        self.fs.create_dir(self.join(_SHARD_DIR), recursive=True)

    def write_atomic(self, rel: str, writer) -> None:
        """``writer(stream)`` produces the content. Local: tmp +
        rename; object store: direct (PUT completes atomically)."""
        path = self.join(rel)
        if self.atomic_rename:
            with self.fs.open_output_stream(path + ".tmp") as f:
                writer(f)
            self.fs.move(path + ".tmp", path)
        else:
            with self.fs.open_output_stream(path) as f:
                writer(f)

    def read_text(self, rel: str) -> str:
        with self.fs.open_input_stream(self.join(rel)) as f:
            return f.read().decode()

    def append_text(self, rel: str, text: str) -> None:
        """Local FS appends in place; object stores read+rewrite
        (bounded: the manifest is metadata, O(finished files))."""
        path = self.join(rel)
        if self.atomic_rename:
            with open(path, "a") as f:
                f.write(text)
            return
        try:
            old = self.read_text(rel)
        except FileNotFoundError:
            old = ""
        with self.fs.open_output_stream(path) as f:
            f.write((old + text).encode())

    def listdir(self, rel: str, suffix: str = "") -> list[str]:
        from pyarrow import fs

        sel = fs.FileSelector(self.join(rel) if rel else self.root,
                              allow_not_found=True)
        return sorted(
            info.path.rsplit("/", 1)[-1]
            for info in self.fs.get_file_info(sel)
            if info.type == fs.FileType.File
            and info.path.endswith(suffix))

    def exists(self, rel: str) -> bool:
        from pyarrow import fs

        return (self.fs.get_file_info(self.join(rel)).type
                != fs.FileType.NotFound)

    def delete(self, rel: str) -> None:
        self.fs.delete_file(self.join(rel))

_EMPTY_SUMMARY = pa.table({
    "z": pa.array([], pa.int64()),
    "n_tiles": pa.array([], pa.int64()),
    "n_valid_px": pa.array([], pa.int64()),
})


def _write_block(t: pa.Table, out_dir: str,
                 codec: str = "raw") -> pa.Table:
    """Task-side writer: one parquet file + one manifest shard per
    block; returns a tiny per-zoom summary row set. Write order
    (tmp parquet -> atomic rename -> shard) keeps partial failures
    recoverable: a parquet without its shard is an orphan that
    ``clean_orphans`` removes on resume.

    ``codec``: payload encoding for the pixels column — "raw"
    (default), "png", or "jp2[:QUALITY]" (9/7 lossy through
    functions/jp2k.py encode_jp2_lossy; QUALITY defaults to the GDAL
    JP2OpenJPEG 25)."""
    import uuid

    import pyarrow.parquet as pq

    if t.num_rows == 0:
        return _EMPTY_SUMMARY
    if codec != "raw":
        from ..functions.codecs import decode_image

        blobs = []
        if codec.startswith("jp2"):
            from ..functions.jp2k import encode_jp2_lossy

            q = float(codec.split(":", 1)[1]) if ":" in codec else 25.0
            for payload in t["pixels"].to_pylist():
                blobs.append(encode_jp2_lossy(decode_image(payload),
                                              quality=q))
        elif codec == "png":
            from ..functions.codecs import encode_image

            for payload in t["pixels"].to_pylist():
                blobs.append(encode_image(decode_image(payload), "png"))
        else:
            raise ValueError(f"unknown tile codec {codec!r}")
        t = t.set_column(t.column_names.index("pixels"), "pixels",
                         pa.array(blobs, pa.binary()))
        t = t.append_column("codec",
                            pa.array([codec.split(":")[0]] * t.num_rows,
                                     pa.string()))
    sink = _SinkFS(out_dir)
    zs = t["z"].to_numpy()
    keys = t["tile_key"].to_numpy()
    tok = uuid.uuid4().hex[:12]
    fname = f"part-{tok}-z{int(zs.min())}-{int(zs.max())}.parquet"
    sink.write_atomic(fname, lambda f: pq.write_table(t, f))
    rec = {
        "file": fname,
        "key_min": int(keys.min()), "key_max": int(keys.max()),
        "n_rows": int(t.num_rows),
        "tile_keys": [int(k) for k in keys],
        "checksums": [int(c) for c in t["checksum"].to_numpy()],
    }
    sink.write_atomic(f"{_SHARD_DIR}/{tok}.json",
                      lambda f: f.write(json.dumps(rec).encode()))
    nv = t["n_valid"].to_numpy()
    uz = np.unique(zs)
    return pa.table({
        "z": pa.array(uz.astype(np.int64)),
        "n_tiles": pa.array([int((zs == z).sum()) for z in uz], pa.int64()),
        "n_valid_px": pa.array([int(nv[zs == z].sum()) for z in uz], pa.int64()),
    })


def write_tiles(tiles, out_dir: str, codec: str = "raw") -> dict:
    """Write composed tiles to partitioned parquet + per-partition
    lineage manifest — FROM THE TASKS, not the driver: each block's
    task writes its own parquet file and a manifest shard; only the
    tiny per-zoom summaries flow back. The shards are then folded into
    ``manifest.jsonl`` (append), which lists every finished tile with
    its checksum so a restarted run anti-joins pending tiles against it
    (the `--resume` skip-existing semantics + lineage record,
    reference apps/gdalalg_raster_tile.cpp:377,522)."""
    _SinkFS(out_dir).mkdirs()

    summaries = tiles.map_batches(
        lambda t: _write_block(t, out_dir, codec), batch_format="pyarrow")
    stats = {"n_tiles": 0, "n_valid_px": 0, "by_zoom": {}}
    for s in summaries.iter_batches(batch_size=None, batch_format="pyarrow"):
        for z, n, npx in zip(s["z"].to_numpy(), s["n_tiles"].to_numpy(),
                             s["n_valid_px"].to_numpy()):
            stats["n_tiles"] += int(n)
            stats["n_valid_px"] += int(npx)
            stats["by_zoom"][int(z)] = stats["by_zoom"].get(int(z), 0) + int(n)
    _fold_shards(out_dir)
    return stats


def _fold_shards(out_dir: str) -> None:
    """Fold completed shard files into manifest.jsonl (driver-side,
    metadata only — O(files), not O(tiles' pixels))."""
    sink = _SinkFS(out_dir)
    shards = sink.listdir(_SHARD_DIR, ".json")
    if not shards:
        return
    text = "".join(
        sink.read_text(f"{_SHARD_DIR}/{s}").rstrip("\n") + "\n"
        for s in shards)
    sink.append_text("manifest.jsonl", text)
    for s in shards:
        sink.delete(f"{_SHARD_DIR}/{s}")


def finished_tile_keys(out_dir: str) -> set[int]:
    """The set of tile keys already durably written: manifest.jsonl
    plus any not-yet-folded shards from an interrupted run."""
    sink = _SinkFS(out_dir)
    done: set[int] = set()
    if sink.exists("manifest.jsonl"):
        for line in sink.read_text("manifest.jsonl").splitlines():
            if line.strip():
                done.update(json.loads(line)["tile_keys"])
    for s in sink.listdir(_SHARD_DIR, ".json"):
        done.update(json.loads(sink.read_text(f"{_SHARD_DIR}/{s}"))["tile_keys"])
    return done


def clean_orphans(out_dir: str) -> list[str]:
    """Remove parquet files not recorded in the manifest or a shard
    (a task died between its parquet rename and its shard write).
    Call before a resumed run so re-composed tiles can't be read
    twice."""
    sink = _SinkFS(out_dir)
    recorded: set[str] = set()
    if sink.exists("manifest.jsonl"):
        recorded.update(
            json.loads(line)["file"]
            for line in sink.read_text("manifest.jsonl").splitlines()
            if line.strip())
    for s in sink.listdir(_SHARD_DIR, ".json"):
        recorded.add(json.loads(sink.read_text(f"{_SHARD_DIR}/{s}"))["file"])
    removed = []
    for p in sink.listdir("", ".parquet"):
        if p.startswith("part-") and p not in recorded:
            sink.delete(p)
            removed.append(p)
    for p in sink.listdir("", ".parquet.tmp"):
        if p.startswith("part-"):
            sink.delete(p)
    return removed


def resume_filter(fragments, out_dir: str):
    """Drop fragments whose tile is already in the output manifest
    (broadcast the finished-key set; anti-join inside map_batches)."""
    done = finished_tile_keys(out_dir)
    if not done:
        return fragments
    keys = pa.array(np.fromiter(done, np.int64, len(done)))

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(pc.is_in(t["tile_key"], value_set=keys)))

    return fragments.map_batches(f, batch_format="pyarrow")
