"""Esri Compact Cache V2 (ESRIC) reader (reference
frmts/esric/esric_dataset.cpp).

A cache is a ``conf.xml`` (CacheInfo: StorageFormat
esriMapCacheStorageModeCompactV2, PacketSize 128, TileCols/Rows,
LODInfos resolutions, TileOrigin) plus ``_alllayers/L%02d`` level
directories of ``R%04xC%04x.bundle`` files: a 64-byte header
(magic 3, ..., 40 at +32) then a 128x128 little-endian u64 tile
index — low 40 bits file offset, high 24 bits tile size; zero size
means missing tile (rendered as zeros).  Tiles are PNG or JPEG
payloads (decoded with the engine's own codecs); grayscale tiles
expand to the band count, missing alpha becomes opaque.

The dataset exposes the finest LOD as the base raster
(size = extent/resolution) and the coarser LODs as overviews,
matching the reference's AddOverviews."""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET

import numpy as np

BSZ = 128


def parse_conf(conf_path: str) -> dict:
    root = ET.parse(conf_path).getroot()

    def findtext(path, default=None):
        el = root.find(path)
        return el.text if el is not None and el.text else default

    fmt = findtext(".//CacheStorageInfo/StorageFormat", "")
    if fmt != "esriMapCacheStorageModeCompactV2":
        raise ValueError("not an esri V2 bundled cache")
    tsz = int(float(findtext(".//TileCacheInfo/TileCols", "256")))
    resolutions = sorted(
        float(el.text) for el in root.findall(
            ".//TileCacheInfo/LODInfos/LODInfo/Resolution"))
    ox = float(findtext(".//TileCacheInfo/TileOrigin/X", "-180"))
    oy = float(findtext(".//TileCacheInfo/TileOrigin/Y", "90"))
    wkt = findtext(".//TileCacheInfo/SpatialReference/WKT", "")
    epsg = 3857 if "3857" in wkt or "Mercator" in wkt else None
    res = resolutions[0]
    maxx, miny = -ox, -oy
    xsize = int((maxx - ox) / res)
    ysize = int((oy - miny) / res)
    level_ids = [int(el.text) for el in root.findall(
        ".//TileCacheInfo/LODInfos/LODInfo/LevelID") if el.text]
    return {"tsz": tsz, "resolutions": resolutions, "origin": (ox, oy),
            "min_lod": min(level_ids) if level_ids else 0,
            "xsize": xsize, "ysize": ysize, "epsg": epsg,
            "gt": (ox, res, 0.0, oy, 0.0, -res),
            "dname": os.path.join(os.path.dirname(conf_path), "_alllayers")}


def _read_bundle_index(path: str):
    with open(path, "rb") as f:
        header = f.read(64)
        if struct.unpack_from("<I", header, 0)[0] != 3 or \
                struct.unpack_from("<I", header, 32)[0] != 40:
            return None
        idx = np.frombuffer(f.read(BSZ * BSZ * 8), "<u8")
        data = f.read()  # remainder not needed; we reopen per tile
    return idx


def _decode_tile(payload: bytes, tsz: int, nbands: int) -> np.ndarray:
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..functions.png import decode_png

        px = decode_png(payload)
        if isinstance(px, tuple):
            px = px[0]
    elif payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg

        px = decode_jpeg(payload)
    else:
        raise ValueError("unknown tile payload")
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    out = np.zeros((tsz, tsz, nbands), np.uint8)
    if nbands % 2 == 0:
        out[:, :, -1] = 255  # opaque where alpha expected
    inb = px.shape[2]
    if inb >= nbands:
        out[:px.shape[0], :px.shape[1], :] = px[:tsz, :tsz, :nbands]
    elif inb == 3:
        out[:px.shape[0], :px.shape[1], :3] = px[:tsz, :tsz]
    elif inb == 1:
        for b in range(min(3, nbands)):
            out[:px.shape[0], :px.shape[1], b] = px[:tsz, :tsz, 0]
    elif inb == 2:  # gray+alpha
        for b in range(min(3, nbands)):
            out[:px.shape[0], :px.shape[1], b] = px[:tsz, :tsz, 0]
        if nbands == 4:
            out[:px.shape[0], :px.shape[1], 3] = px[:tsz, :tsz, 1]
    return out


def read_esric_level(conf_path: str, level_index: int,
                     nbands: int = 4) -> np.ndarray:
    """Render one LOD (0 = finest) to an (h, w, nbands) array.
    Missing bundles/tiles are zeros, like the reference."""
    conf = parse_conf(conf_path)
    return _render_level(conf, level_index, nbands)


def _render_level(conf: dict, level_index: int, nbands: int) -> np.ndarray:
    resolutions = conf["resolutions"]
    res = resolutions[level_index]
    tsz = conf["tsz"]
    w = max(1, int(round(conf["xsize"] * resolutions[0] / res)))
    h = max(1, int(round(conf["ysize"] * resolutions[0] / res)))
    # LOD number: finest LOD has the largest L number
    # (lxx = m_nMinLOD + nres - lvl - 1, esric_dataset.cpp:846-848)
    lxx = conf["min_lod"] + (len(resolutions) - 1 - level_index)

    out = np.zeros((h, w, nbands), np.uint8)
    ldir = os.path.join(conf["dname"], "L%02d" % lxx)
    if not os.path.isdir(ldir):
        return out
    ntx = -(-w // tsz)
    nty = -(-h // tsz)
    for fname in os.listdir(ldir):
        if not fname.endswith(".bundle"):
            continue
        row = int(fname[1:5], 16)
        col = int(fname[6:10], 16)
        with open(os.path.join(ldir, fname), "rb") as f:
            data = f.read()
        if struct.unpack_from("<I", data, 0)[0] != 3 or \
                struct.unpack_from("<I", data, 32)[0] != 40:
            continue
        idx = np.frombuffer(data, "<u8", BSZ * BSZ, 64)
        for block in np.flatnonzero(idx >> np.uint64(40)):
            by, bx = divmod(int(block), BSZ)
            ty = row + by
            tx = col + bx
            if tx >= ntx or ty >= nty:
                continue
            entry = int(idx[block])
            off = entry & 0xFFFFFFFFFF
            size = entry >> 40
            tile = _decode_tile(data[off:off + size], tsz, nbands)
            y0, x0 = ty * tsz, tx * tsz
            hh = min(tsz, h - y0)
            ww = min(tsz, w - x0)
            out[y0:y0 + hh, x0:x0 + ww] = tile[:hh, :ww]
    return out


def parse_tpkx(root_json: dict, tile_dir: str) -> dict:
    """tpkx (root.json) flavor of the same cache
    (esric_dataset.cpp InitializeFromJSON)."""
    ti = root_json["tileInfo"]
    tsz = int(ti["cols"])
    min_lod = int(root_json.get("minLOD", 0))
    max_lod = int(root_json.get("maxLOD", len(ti["lods"]) - 1))
    resolutions = sorted(
        lod["resolution"] for lod in ti["lods"]
        if min_lod <= int(lod["level"]) <= max_lod)
    ox = float(ti["origin"]["x"])
    oy = float(ti["origin"]["y"])
    res = resolutions[0]
    xsize = int((-ox - ox) / res)
    ysize = int((oy + oy) / res)
    return {"tsz": tsz, "resolutions": resolutions, "origin": (ox, oy),
            "min_lod": min_lod, "xsize": xsize, "ysize": ysize,
            "epsg": int(root_json.get("spatialReference", {})
                        .get("latestWkid", 3857)),
            "gt": (ox, res, 0.0, oy, 0.0, -res), "dname": tile_dir}


def read_tpkx_level(tpkx_path: str, level_index: int,
                    nbands: int = 4, extract_dir: str | None = None
                    ) -> np.ndarray:
    """Extract the .tpkx zip (once) and render one LOD."""
    import json
    import zipfile

    if extract_dir is None:
        extract_dir = "/tmp/gdal_ray_fixtures/tpkx_" + \
            os.path.splitext(os.path.basename(tpkx_path))[0]
    marker = os.path.join(extract_dir, "root.json")
    if not os.path.exists(marker):
        os.makedirs(extract_dir, exist_ok=True)
        with zipfile.ZipFile(tpkx_path) as z:
            z.extractall(extract_dir)
    with open(marker) as f:
        root_json = json.load(f)
    conf = parse_tpkx(root_json, os.path.join(extract_dir, "tile"))
    return _render_level(conf, level_index, nbands)
