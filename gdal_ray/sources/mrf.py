"""Meta Raster Format (MRF) reader (reference frmts/mrf).

An MRF dataset is an ``.mrf`` XML header (Raster: Size, PageSize,
Compression, data type; GeoTags: BoundingBox + Projection), a
``.idx`` tile index of big-endian (offset:u64, size:u64) pairs in
row-major page order, and a data file whose extension encodes the
compression: ``.til`` NONE (raw pages), ``.pzp`` DEFLATE (zlib),
``.ppg`` PNG, ``.pjg`` JPEG, ``.ptf`` TIF (each page its own
payload, decoded with the engine's codecs), ``.lrc`` LERC.  Pages
are full PageSize tiles; the raster crops the edge pages.  LERC
pages are decoded by functions/lerc.py (V1 CntZImage and Lerc2)."""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET

import numpy as np

_EXT = {"NONE": ".til", "DEFLATE": ".pzp", "PNG": ".ppg", "PPNG": ".ppg",
        "JPEG": ".pjg", "TIF": ".ptf", "LERC": ".lrc"}

_DTYPES = {"Byte": np.uint8, "Int16": np.int16, "UInt16": np.uint16,
           "Int32": np.int32, "UInt32": np.uint32, "Int64": np.int64,
           "UInt64": np.uint64, "Float32": np.float32,
           "Float64": np.float64}


def read_mrf(path: str):
    """-> (pixels, gt, meta)."""
    root = ET.parse(path).getroot()
    raster = root.find("Raster")
    size = raster.find("Size")
    w = int(size.get("x"))
    h = int(size.get("y"))
    nbands = int(size.get("c", "1"))
    page = raster.find("PageSize")
    pw = int(page.get("x", "512")) if page is not None else 512
    ph = int(page.get("y", "512")) if page is not None else 512
    # MRF default compression is PNG (frmts/mrf)
    comp = (raster.findtext("Compression") or "PNG").upper()
    dtype = _DTYPES[raster.findtext("DataType") or "Byte"]

    base = os.path.splitext(path)[0]
    idx_path = base + ".idx"
    data_path = base + _EXT.get(comp, ".til")
    with open(idx_path, "rb") as f:
        idx = np.frombuffer(f.read(), ">u8").reshape(-1, 2)
    with open(data_path, "rb") as f:
        data = f.read()

    ntx = -(-w // pw)
    nty = -(-h // ph)
    if nbands == 1:
        full = np.zeros((h, w), dtype)
    else:
        full = np.zeros((h, w, nbands), dtype)
    itemsize = np.dtype(dtype).itemsize

    for ti in range(min(len(idx), ntx * nty)):
        off, sz = int(idx[ti][0]), int(idx[ti][1])
        if sz == 0:
            continue
        ty, tx = divmod(ti, ntx)
        payload = data[off:off + sz]
        if comp == "NONE":
            page_px = np.frombuffer(
                payload, dtype, pw * ph * nbands).reshape(ph, pw, nbands)
        elif comp == "DEFLATE":
            import zlib

            raw = zlib.decompress(payload)
            page_px = np.frombuffer(
                raw, dtype, pw * ph * nbands).reshape(ph, pw, nbands)
        elif comp in ("PNG", "PPNG"):
            from ..functions.png import decode_png

            px = np.asarray(decode_png(payload))
            page_px = px[:, :, None] if px.ndim == 2 else px
        elif comp == "JPEG":
            from ..functions.jpeg import decode_jpeg

            px = np.asarray(decode_jpeg(payload))
            page_px = px[:, :, None] if px.ndim == 2 else px
        elif comp == "TIF":
            from .tiff import decode_tiff

            px = np.asarray(decode_tiff(payload)[0])
            page_px = px[:, :, None] if px.ndim == 2 else px
        elif comp == "LERC":
            from ..functions.lerc import decode_lerc

            px = decode_lerc(payload, pw, ph)
            page_px = px[:, :, None] if px.ndim == 2 else px
        else:
            raise NotImplementedError(f"MRF compression {comp}")
        y0, x0 = ty * ph, tx * pw
        hh = min(ph, h - y0)
        ww = min(pw, w - x0)
        sub = page_px[:hh, :ww]
        if nbands == 1:
            full[y0:y0 + hh, x0:x0 + ww] = sub[:, :, 0].astype(dtype)
        else:
            full[y0:y0 + hh, x0:x0 + ww] = sub[:, :, :nbands].astype(dtype)

    gt = None
    bbox = root.find("GeoTags/BoundingBox")
    if bbox is not None:
        minx = float(bbox.get("minx"))
        miny = float(bbox.get("miny"))
        maxx = float(bbox.get("maxx"))
        maxy = float(bbox.get("maxy"))
        gt = (minx, (maxx - minx) / w, 0.0, maxy, 0.0, -(maxy - miny) / h)
    meta = {"compression": comp, "dtype": np.dtype(dtype).name}
    return full, gt, meta
