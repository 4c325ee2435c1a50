"""MBTiles + GeoPackage raster-tile pyramids over stdlib sqlite3.

Both formats store a web-mercator (or, for GPKG, arbitrary-CRS) tile
pyramid as PNG/JPEG blobs inside one SQLite file. The engine treats
them as a tile SOURCE (blobs -> the tiling stage's TILE_SCHEMA rows,
sharded Dataset reads over rowid ranges) and a tile SINK for the
pyramid built by ``stages/tiling.py`` (per-tile encode runs distributed
in map_batches tasks; only the final SQLite assembly is a single
writer, because one .mbtiles/.gpkg IS one SQLite database — the scale
path is one file per region partition, exactly like the reference's
directory-sharded tile outputs).

Reference semantics reproduced here:
- frmts/mbtiles/mbtilesdataset.cpp — TMS row origin (row 0 at the
  south edge), `metadata` table bounds clipping (default USE_BOUNDS),
  band-count promotion (JPEG RGB tiles exposed as RGBA with a
  presence-driven alpha), lower zoom levels exposed as overviews,
  EPSG:3857 only.
- ogr/ogrsf_frmts/gpkg raster side (gdalgpkgmbtilescommon.cpp) —
  `gpkg_tile_matrix_set` grid origin at the TOP-left, per-zoom
  `gpkg_tile_matrix` rows, raster window clipped to the
  `gpkg_contents` extent, arbitrary srs_id.

Conformance: the reference's own fixtures
(autotest/gdrivers/data/mbtiles/{world_l1,byte}.mbtiles,
autotest/gdrivers/data/gpkg/byte.gpkg) reproduce the published
checksums/geotransforms — see tests/test_mbtiles.py.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

from ..functions.checksum import checksum_image
from ..functions.codecs import decode_image, encode_image
from ..functions.crs import (MAX_MERC_LAT, WEB_MERCATOR_EXTENT,
                             lonlat_to_webmercator, webmercator_to_lonlat)
from ..functions.png import encode_png
from ..functions.tiles import DEFAULT_TILE_SIZE, tile_key, unpack_tile_key

_WEBP_MAGIC = b"RIFF"


def _decode_tile(blob: bytes) -> np.ndarray:
    if blob[:4] == _WEBP_MAGIC and blob[8:12] == b"WEBP":
        # lossless VP8L decodes natively; lossy VP8 raises inside
        from ..functions.webp import decode_webp

        return decode_webp(blob)
    return decode_image(blob)


def _ncomp(px: np.ndarray) -> int:
    return 1 if px.ndim == 2 else px.shape[2]


def _auto_band_count(blob: bytes) -> int:
    """MBTiles BAND_COUNT=AUTO: sample one tile; JPEG tiles (never
    carrying alpha) are promoted with a presence-alpha band, PNG tiles
    keep their own component count (mbtilesdataset.cpp open logic)."""
    px = _decode_tile(blob)
    n = _ncomp(px)
    if blob[:2] == b"\xff\xd8":  # JPEG: presence alpha appended
        n += 1
    return n


def _expand(px: np.ndarray, nb: int) -> np.ndarray:
    """Expand a decoded tile to nb bands (gray->RGB replication,
    presence alpha = 255)."""
    if px.ndim == 2:
        px = px[:, :, None]
    c = px.shape[2]
    if c == nb:
        return px
    h, w = px.shape[:2]
    out = np.empty((h, w, nb), px.dtype)
    if c == 2:  # gray+alpha
        gray, alpha = px[:, :, 0], px[:, :, 1]
        rgb_n = min(nb, 3)
        for i in range(rgb_n):
            out[:, :, i] = gray
        if nb == 4:
            out[:, :, 3] = alpha
        return out
    rgb = px[:, :, :3] if c >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
    if nb == 1:
        return px[:, :, :1]
    if nb == 2:
        out[:, :, 0] = px[:, :, 0]
        out[:, :, 1] = px[:, :, 3] if c == 4 else 255
        return out
    out[:, :, :3] = rgb[:, :, : min(3, nb)]
    if nb == 4:
        out[:, :, 3] = px[:, :, 3] if c == 4 else 255
    return out


def mbtiles_metadata(path: str) -> dict:
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


def is_mbtiles(path: str) -> bool:
    if not os.path.exists(path):
        return False
    with open(path, "rb") as fh:
        if fh.read(16) != b"SQLite format 3\x00":
            return False
    con = sqlite3.connect(path)
    try:
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type IN ('table','view')")}
    finally:
        con.close()
    return "tiles" in names and "metadata" in names


def gpkg_tile_tables(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        names = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        if "gpkg_contents" not in names:
            return []
        return [r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type IN "
            "('tiles', '2d-gridded-coverage')")]
    finally:
        con.close()


def _compose(tiles, nb: int, ox: int, oy: int, w: int, h: int,
             tile_size: int, dtype=np.uint8):
    """Paint decoded tiles into an (h, w, nb) canvas. ``tiles`` yields
    (tx, ty_row0_top, blob); (ox, oy) is the raster origin in GLOBAL
    pixel coordinates of the row-0-top tile grid."""
    canvas = np.zeros((h, w, nb), dtype)
    for tx, ty, blob in tiles:
        px = _expand(_decode_tile(blob), nb)
        ts_h, ts_w = px.shape[:2]
        gx, gy = tx * tile_size, ty * tile_size
        x0, y0 = gx - ox, gy - oy
        sx0, sy0 = max(0, -x0), max(0, -y0)
        dx0, dy0 = max(0, x0), max(0, y0)
        cw = min(ts_w - sx0, w - dx0)
        ch = min(ts_h - sy0, h - dy0)
        if cw <= 0 or ch <= 0:
            continue
        canvas[dy0:dy0 + ch, dx0:dx0 + cw] = \
            px[sy0:sy0 + ch, sx0:sx0 + cw]
    return canvas


def read_mbtiles(path: str, zoom: int | None = None,
                 band_count: int | None = None, use_bounds: bool = True,
                 tile_size: int = DEFAULT_TILE_SIZE) -> dict:
    """Open one zoom level of an .mbtiles into a mosaicked array.

    Returns the open_raster-style dict: pixels (h, w, nb) uint8, gt,
    epsg=3857, driver="MBTiles", plus the metadata table. ``zoom=None``
    reads the maximum zoom present; lower zooms are the overviews
    (read them with explicit ``zoom=``). ``use_bounds`` clips to the
    `bounds` metadata like the reference's default open path."""
    meta = mbtiles_metadata(path)
    con = sqlite3.connect(path)
    try:
        if zoom is None:
            zoom = con.execute(
                "SELECT MAX(zoom_level) FROM tiles").fetchone()[0]
        z = int(zoom)
        n = 1 << z
        rows = con.execute(
            "SELECT tile_column, tile_row, tile_data FROM tiles "
            "WHERE zoom_level = ?", (z,)).fetchall()
    finally:
        con.close()
    if not rows:
        raise ValueError(f"{path}: no tiles at zoom {z}")
    # TMS -> row-0-top
    tiles = [(int(tc), n - 1 - int(tr), blob) for tc, tr, blob in rows]
    nb = band_count if band_count is not None else _auto_band_count(
        tiles[0][2])

    ext = WEB_MERCATOR_EXTENT
    res = 2.0 * ext / (n * tile_size)
    if use_bounds and "bounds" in meta:
        wb, sb, eb, nbound = (float(v) for v in meta["bounds"].split(","))
        x0, y1 = lonlat_to_webmercator(wb, min(nbound, MAX_MERC_LAT))
        x1, y0 = lonlat_to_webmercator(eb, max(sb, -MAX_MERC_LAT))
        x0, y0, x1, y1 = float(x0), float(y0), float(x1), float(y1)
        w = int(round((x1 - x0) / res))
        h = int(round((y1 - y0) / res))
        ox = int(round((x0 + ext) / res))
        oy = int(round((ext - y1) / res))
        gt = (x0, res, 0.0, y1, 0.0, -res)
    else:
        txs = np.array([t[0] for t in tiles])
        tys = np.array([t[1] for t in tiles])
        cx0, cy0 = int(txs.min()), int(tys.min())
        w = (int(txs.max()) - cx0 + 1) * tile_size
        h = (int(tys.max()) - cy0 + 1) * tile_size
        ox, oy = cx0 * tile_size, cy0 * tile_size
        gt = (-ext + ox * res, res, 0.0, ext - oy * res, 0.0, -res)
    px = _compose(tiles, nb, ox, oy, w, h, tile_size)
    return {"pixels": px, "gt": gt, "epsg": 3857, "driver": "MBTiles",
            "zoom": z, "meta": meta}


def read_gpkg_tiles(path: str, table: str | None = None,
                    zoom: int | None = None,
                    band_count: int | None = None) -> dict:
    """Open one zoom of a GeoPackage tile pyramid, clipped to the
    gpkg_contents extent (gdalgpkgmbtilescommon.cpp window logic;
    row 0 is the TOP row, unlike MBTiles)."""
    con = sqlite3.connect(path)
    try:
        if table is None:
            t = gpkg_tile_tables(path)
            if not t:
                raise ValueError(f"{path}: no tile pyramid in gpkg_contents")
            table = t[0]
        cminx, cminy, cmaxx, cmaxy, srs = con.execute(
            "SELECT min_x, min_y, max_x, max_y, srs_id FROM gpkg_contents "
            "WHERE table_name = ?", (table,)).fetchone()
        sminx, _sminy, _smaxx, smaxy = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_tile_matrix_set "
            "WHERE table_name = ?", (table,)).fetchone()
        if zoom is None:
            zoom = con.execute(
                f'SELECT MAX(zoom_level) FROM "{table}"').fetchone()[0]
        z = int(zoom)
        mrow = con.execute(
            "SELECT tile_width, tile_height, pixel_x_size, pixel_y_size "
            "FROM gpkg_tile_matrix WHERE table_name = ? AND zoom_level = ?",
            (table, z)).fetchone()
        if mrow is None:
            raise ValueError(f"{path}: no gpkg_tile_matrix row at zoom {z}")
        tw, th, psx, psy = int(mrow[0]), int(mrow[1]), float(mrow[2]), \
            float(mrow[3])
        rows = con.execute(
            f'SELECT tile_column, tile_row, tile_data FROM "{table}" '
            "WHERE zoom_level = ?", (z,)).fetchall()
    finally:
        con.close()
    if not rows:
        raise ValueError(f"{path}: no tiles at zoom {z}")
    if tw != th:
        raise NotImplementedError("non-square GPKG tiles")
    tiles = [(int(tc), int(tr), blob) for tc, tr, blob in rows]
    nb = band_count if band_count is not None else _ncomp(
        _decode_tile(tiles[0][2]))
    w = int(round((cmaxx - cminx) / psx))
    h = int(round((cmaxy - cminy) / psy))
    ox = int(round((cminx - sminx) / psx))
    oy = int(round((smaxy - cmaxy) / psy))
    px = _compose(tiles, nb, ox, oy, w, h, tw)
    gt = (float(cminx), psx, 0.0, float(cmaxy), 0.0, -psy)
    return {"pixels": px, "gt": gt, "epsg": int(srs), "driver": "GPKG",
            "zoom": z, "table": table}


# ---------------------------------------------------------------------------
# Engine-native tile Dataset read (TILE_SCHEMA rows, rowid-sharded)
# ---------------------------------------------------------------------------

def _tile_rows_to_schema(rows, z: int, n: int, tms: bool,
                         tile_size: int) -> pa.Table:
    from ..stages.tiling import TILE_SCHEMA

    out = {k: [] for k in ("tile_key", "z", "tx", "ty", "pixels", "alpha",
                           "n_src", "n_valid", "checksum")}
    for tc, tr, blob in rows:
        tx = int(tc)
        ty = (n - 1 - int(tr)) if tms else int(tr)
        px = _expand(_decode_tile(blob), 3)
        if px.shape[0] != tile_size or px.shape[1] != tile_size:
            full = np.zeros((tile_size, tile_size, 3), np.uint8)
            full[:px.shape[0], :px.shape[1]] = px
            px = full
        valid = np.ones((tile_size, tile_size), bool)
        out["tile_key"].append(int(tile_key(tx, ty, z)))
        out["z"].append(z)
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["pixels"].append(encode_image(px, "raw"))
        out["alpha"].append(np.packbits(valid.astype(np.uint8)).tobytes())
        out["n_src"].append(1)
        out["n_valid"].append(int(valid.sum()))
        out["checksum"].append(checksum_image(px[:, :, 0]))
    arrs = [pa.array(out[f.name], f.type) for f in TILE_SCHEMA]
    return pa.Table.from_arrays(arrs, schema=TILE_SCHEMA)


def tiles_dataset(path: str, zoom: int | None = None,
                  table: str | None = None, shard_rows: int = 512,
                  tile_size: int = DEFAULT_TILE_SIZE):
    """Lazy Ray Dataset of TILE_SCHEMA rows from an .mbtiles or tiled
    .gpkg — one decode task per rowid shard, so a billion-tile pyramid
    streams through map_batches without driver materialization. Feeds
    straight into ``build_overview_level`` / ``write_tiles``."""
    import ray.data

    mb = is_mbtiles(path)
    tbl = "tiles" if mb else (table or gpkg_tile_tables(path)[0])
    con = sqlite3.connect(path)
    try:
        if zoom is None:
            zoom = con.execute(
                f'SELECT MAX(zoom_level) FROM "{tbl}"').fetchone()[0]
        z = int(zoom)
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{tbl}" '
            "WHERE zoom_level = ?", (z,)).fetchone()
    finally:
        con.close()
    if lo is None:
        raise ValueError(f"{path}: no tiles at zoom {z}")
    n = 1 << z
    bounds = list(range(int(lo), int(hi) + 2, shard_rows))
    if bounds[-1] != hi + 1:
        bounds.append(int(hi) + 1)
    items = [{"lo": a, "hi": b} for a, b in zip(bounds, bounds[1:])]

    def load(b: pa.Table) -> pa.Table:
        tabs = []
        cn = sqlite3.connect(path)
        try:
            for r in b.to_pylist():
                rows = cn.execute(
                    f'SELECT tile_column, tile_row, tile_data FROM "{tbl}" '
                    "WHERE zoom_level = ? AND rowid >= ? AND rowid < ?",
                    (z, r["lo"], r["hi"])).fetchall()
                tabs.append(_tile_rows_to_schema(rows, z, n, mb, tile_size))
        finally:
            cn.close()
        return pa.concat_tables(tabs)

    return ray.data.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# Write (pyramid sink)
# ---------------------------------------------------------------------------

def _encode_tile_batch(t: pa.Table, fmt: str, tile_size: int) -> pa.Table:
    """Distributed per-tile encode: TILE_SCHEMA row -> (z, tx, ty, blob).
    PNG tiles carry the validity mask as a real alpha channel; JPEG
    tiles are RGB (alpha unsupported by the format, like the
    reference's JPEG tile writer)."""
    from ..stages.tiling import _unpack_mask

    zs, txs, tys, blobs = [], [], [], []
    for rec in t.select(["z", "tx", "ty", "pixels", "alpha"]).to_pylist():
        px = decode_image(rec["pixels"])
        if px.ndim == 2:
            px = px[:, :, None].repeat(3, axis=2)
        valid = _unpack_mask(rec["alpha"], tile_size, tile_size)
        if fmt == "png":
            rgba = np.dstack([px, np.where(valid, 255, 0).astype(np.uint8)])
            blob = encode_png(rgba)
        elif fmt == "jpeg":
            blob = encode_image(px, "jpeg")
        else:
            raise NotImplementedError(f"tile format {fmt!r}")
        zs.append(int(rec["z"]))
        txs.append(int(rec["tx"]))
        tys.append(int(rec["ty"]))
        blobs.append(blob)
    return pa.table({"z": pa.array(zs, pa.int32()),
                     "tx": pa.array(txs, pa.int32()),
                     "ty": pa.array(tys, pa.int32()),
                     "blob": pa.array(blobs, pa.binary())})


def _encoded_stream(tiles, fmt: str, tile_size: int):
    enc = tiles.map_batches(
        lambda t: _encode_tile_batch(t, fmt, tile_size),
        batch_format="pyarrow")
    for b in enc.iter_batches(batch_size=256, batch_format="pyarrow"):
        yield b


def write_mbtiles(tiles, path: str, fmt: str = "png", name: str = "tiles",
                  description: str = "", tile_size: int = DEFAULT_TILE_SIZE,
                  bounds_lonlat: tuple | None = None) -> dict:
    """Sink a TILE_SCHEMA Dataset into one .mbtiles. Tile encode runs
    in map_batches tasks; the SQLite assembly streams the encoded
    (z, x, y, blob) rows on a single writer (one SQLite file == one
    writer by construction; shard per region for parallel sinks).
    Rows are stored TMS (row 0 south), per the spec."""
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    stats = {"n_tiles": 0, "zooms": set()}
    xmin = ymin = float("inf")
    xmax = ymax = float("-inf")
    try:
        con.execute("CREATE TABLE tiles (zoom_level INTEGER, "
                    "tile_column INTEGER, tile_row INTEGER, tile_data BLOB)")
        con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
        for b in _encoded_stream(tiles, fmt, tile_size):
            zs = b["z"].to_numpy()
            txs = b["tx"].to_numpy()
            tys = b["ty"].to_numpy()
            blobs = b["blob"].to_pylist()
            rows = [(int(z), int(tx), int((1 << int(z)) - 1 - int(ty)),
                     sqlite3.Binary(bl))
                    for z, tx, ty, bl in zip(zs, txs, tys, blobs)]
            con.executemany("INSERT INTO tiles VALUES (?,?,?,?)", rows)
            stats["n_tiles"] += len(rows)
            stats["zooms"].update(int(z) for z in np.unique(zs))
            zmaxb = zs.max()
            m = zs == zmaxb
            ext = WEB_MERCATOR_EXTENT
            res = 2 * ext / ((1 << int(zmaxb)) * tile_size)
            xmin = min(xmin, -ext + txs[m].min() * tile_size * res)
            xmax = max(xmax, -ext + (txs[m].max() + 1) * tile_size * res)
            ymax = max(ymax, ext - tys[m].min() * tile_size * res)
            ymin = min(ymin, ext - (tys[m].max() + 1) * tile_size * res)
        if not stats["n_tiles"]:
            raise ValueError("no tiles to write")
        if bounds_lonlat is None:
            w, s = webmercator_to_lonlat(xmin, ymin)
            e, n = webmercator_to_lonlat(xmax, ymax)
            bounds_lonlat = (float(w), float(s), float(e), float(n))
        zmin, zmax = min(stats["zooms"]), max(stats["zooms"])
        md = [("name", name), ("type", "overlay"),
              ("description", description or name), ("version", "1.1"),
              ("format", "png" if fmt == "png" else "jpg"),
              ("bounds", ",".join(repr(v) for v in bounds_lonlat)),
              ("minzoom", str(zmin)), ("maxzoom", str(zmax))]
        con.executemany("INSERT INTO metadata VALUES (?,?)", md)
        con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                    "(zoom_level, tile_column, tile_row)")
        con.commit()
    finally:
        con.close()
    stats["zooms"] = sorted(stats["zooms"])
    return stats


def write_gpkg_tiles(tiles, path: str, table: str = "tiles",
                     fmt: str = "png",
                     tile_size: int = DEFAULT_TILE_SIZE) -> dict:
    """Sink a TILE_SCHEMA Dataset into a GeoPackage tile pyramid
    (EPSG:3857 WebMercatorQuad matrix set; row 0 at the TOP). Same
    distributed-encode / single-assembly split as write_mbtiles."""
    if os.path.exists(path):
        os.unlink(path)
    ext = WEB_MERCATOR_EXTENT
    con = sqlite3.connect(path)
    stats = {"n_tiles": 0, "zooms": set()}
    xmin = ymin = float("inf")
    xmax = ymax = float("-inf")
    try:
        con.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id "
            "INTEGER PRIMARY KEY, organization TEXT, "
            "organization_coordsys_id INTEGER, definition TEXT, "
            "description TEXT)")
        con.execute(
            "INSERT INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84 / Pseudo-Mercator', 3857, 'EPSG', 3857, '', NULL)")
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
            "data_type TEXT, identifier TEXT, description TEXT, "
            "last_change TEXT, min_x REAL, min_y REAL, max_x REAL, "
            "max_y REAL, srs_id INTEGER)")
        con.execute(
            "CREATE TABLE gpkg_tile_matrix_set (table_name TEXT PRIMARY "
            "KEY, srs_id INTEGER, min_x REAL, min_y REAL, max_x REAL, "
            "max_y REAL)")
        con.execute(
            "CREATE TABLE gpkg_tile_matrix (table_name TEXT, zoom_level "
            "INTEGER, matrix_width INTEGER, matrix_height INTEGER, "
            "tile_width INTEGER, tile_height INTEGER, pixel_x_size REAL, "
            "pixel_y_size REAL)")
        con.execute(
            f'CREATE TABLE "{table}" (id INTEGER PRIMARY KEY, zoom_level '
            "INTEGER, tile_column INTEGER, tile_row INTEGER, "
            "tile_data BLOB)")
        for b in _encoded_stream(tiles, fmt, tile_size):
            zs = b["z"].to_numpy()
            txs = b["tx"].to_numpy()
            tys = b["ty"].to_numpy()
            blobs = b["blob"].to_pylist()
            rows = [(int(z), int(tx), int(ty), sqlite3.Binary(bl))
                    for z, tx, ty, bl in zip(zs, txs, tys, blobs)]
            con.executemany(
                f'INSERT INTO "{table}" (zoom_level, tile_column, '
                "tile_row, tile_data) VALUES (?,?,?,?)", rows)
            stats["n_tiles"] += len(rows)
            stats["zooms"].update(int(z) for z in np.unique(zs))
            zmaxb = zs.max()
            m = zs == zmaxb
            res = 2 * ext / ((1 << int(zmaxb)) * tile_size)
            xmin = min(xmin, -ext + txs[m].min() * tile_size * res)
            xmax = max(xmax, -ext + (txs[m].max() + 1) * tile_size * res)
            ymax = max(ymax, ext - tys[m].min() * tile_size * res)
            ymin = min(ymin, ext - (tys[m].max() + 1) * tile_size * res)
        if not stats["n_tiles"]:
            raise ValueError("no tiles to write")
        con.execute(
            "INSERT INTO gpkg_tile_matrix_set VALUES (?, 3857, ?, ?, ?, ?)",
            (table, -ext, -ext, ext, ext))
        for z in sorted(stats["zooms"]):
            n = 1 << z
            res = 2 * ext / (n * tile_size)
            con.execute(
                "INSERT INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
                (table, z, n, n, tile_size, tile_size, res, res))
        con.execute(
            "INSERT INTO gpkg_contents VALUES (?, 'tiles', ?, '', "
            "'2026-01-01T00:00:00.000Z', ?, ?, ?, ?, 3857)",
            (table, table, xmin, ymin, xmax, ymax))
        con.commit()
    finally:
        con.close()
    stats["zooms"] = sorted(stats["zooms"])
    return stats
