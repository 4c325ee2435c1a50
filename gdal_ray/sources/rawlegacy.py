"""Legacy raw-binary rasters: ERDAS 7.x LAN/GIS and USGS DOQ (new
style). From-scratch numpy re-derivations of the published layouts,
conformed against the reference's own fixtures
(tests/test_rawlegacy.py):

- LAN (frmts/raw/landataset.cpp): 128-byte "HEADER"/"HEAD74" block,
  the byte at offset 8 doubling as the endianness probe, 4-bit packed
  / 8-bit / 16-bit BIL pixels, center-registered geotransform floats
  at offsets 112-127.
- DOQ2 (frmts/raw/doq2dataset.cpp): BEGIN_USGS_DOQ_HEADER keyword
  records, BYTE_COUNT data offset, BIP/BIL/BSQ band organization,
  XY_ORIGIN/HORIZONTAL_RESOLUTION georeferencing; short files
  zero-fill (truncated fixtures read like the reference's RawRasterBand
  with failed reads suppressed).
- DOQ1's only reference expectation is that a fake file fails to open
  (autotest/gdrivers/doq1.py) — sniff_doq1 therefore only rejects.
"""

from __future__ import annotations

import numpy as np

_ERD_HEADER = 128


def sniff_lan(data: bytes) -> bool:
    return (len(data) >= _ERD_HEADER
            and (data[:6] in (b"HEADER", b"HEAD74"))
            and data[16:24] != b"S LAT   ")


def read_lan(data: bytes):
    """-> (pixels (h, w) or (h, w, bands), gt | None, coordsys int).
    4-bit pixels expand to uint8 (high nibble first)."""
    if not sniff_lan(data):
        raise ValueError("not an ERDAS LAN/GIS file")
    bo = ">" if data[8] == 0 else "<"

    def i16(off):
        return int(np.frombuffer(data, bo + "i2", 1, off)[0])

    def f32(off):
        return float(np.frombuffer(data, bo + "f4", 1, off)[0])

    def i32(off):
        return int(np.frombuffer(data, bo + "i4", 1, off)[0])

    if data[:6] == b"HEADER":  # pre-7.4: sizes stored as float32
        w, h = int(f32(16)), int(f32(20))
    else:
        w, h = i32(16), i32(20)
    ptype = i16(6)
    nbands = i16(8)
    if ptype not in (0, 1, 2):
        raise NotImplementedError(f"LAN pixel type {ptype}")
    if w <= 0 or h <= 0 or nbands <= 0:
        raise ValueError("LAN: bad dimensions")

    if ptype == 1:  # 4-bit packed, BIL by band
        rowbytes = w * nbands // 2
        need = _ERD_HEADER + rowbytes * h
        buf = data[_ERD_HEADER:need]
        buf = buf + b"\x00" * (need - _ERD_HEADER - len(buf))
        packed = np.frombuffer(buf, np.uint8).reshape(h, nbands, w // 2)
        hi = packed >> 4
        lo = packed & 0x0F
        px = np.empty((h, nbands, w), np.uint8)
        px[:, :, 0::2] = hi
        px[:, :, 1::2] = lo
        px = np.transpose(px, (0, 2, 1))
    else:
        dt = np.uint8 if ptype == 0 else np.dtype(bo + "i2")
        isz = 1 if ptype == 0 else 2
        rowbytes = w * nbands * isz
        need = _ERD_HEADER + rowbytes * h
        buf = data[_ERD_HEADER:need]
        buf = buf + b"\x00" * (need - _ERD_HEADER - len(buf))
        px = np.frombuffer(buf, dt).reshape(h, nbands, w)
        px = np.transpose(px, (0, 2, 1))
    if nbands == 1:
        px = px[:, :, 0]

    gt = None
    xres, yres = f32(120), f32(124)
    if xres != 0.0 and yres != 0.0:
        ulx, uly = f32(112), f32(116)
        # stored corner is the pixel CENTER (landataset.cpp:510)
        gt = (ulx - xres * 0.5, xres, 0.0, uly + yres * 0.5, 0.0, -yres)
    return np.ascontiguousarray(px), gt, i16(88)


def sniff_doq2(data: bytes) -> bool:
    return data.lstrip()[:21] == b"BEGIN_USGS_DOQ_HEADER"


def sniff_doq1(data: bytes) -> bool:
    """DOQ1 identification per doq1dataset.cpp: bytes 150-155 hold the
    ASCII line count; the reference's own test fixture is rejected."""
    if len(data) < 212:
        return False
    try:
        int(data[150:156].decode("ascii").strip() or "x")
    except ValueError:
        return False
    return True


def _doq2_tokens(line: str) -> list[str]:
    toks, cur, q = [], "", False
    for c in line:
        if c == '"':
            q = not q
        elif c.isspace() and not q:
            if cur:
                toks.append(cur)
                cur = ""
        else:
            cur += c
    if cur:
        toks.append(cur)
    return toks


def read_doq2(data: bytes):
    """-> (pixels (h, w, bands), gt, meta dict)."""
    if not sniff_doq2(data):
        raise ValueError("not a USGS DOQ2 file")
    text = data[:65536].decode("latin-1")
    w = h = 0
    skip = 0
    res = 1.0
    org = "BIP"
    ox = oy = 0.0
    nbands = 0
    bpp = 1
    meta: dict[str, str] = {}
    for line in text.splitlines():
        toks = _doq2_tokens(line)
        if not toks:
            continue
        key = toks[0].upper()
        if key == "END_USGS_DOQ_HEADER":
            break
        if key == "SAMPLES_AND_LINES" and len(toks) >= 3:
            w, h = int(toks[1]), int(toks[2])
        elif key == "BYTE_COUNT":
            skip = int(toks[1])
        elif key == "HORIZONTAL_RESOLUTION":
            res = float(toks[1])
        elif key == "BAND_ORGANIZATION":
            org = toks[1].upper()
        elif key == "BAND_CONTENT":
            nbands += 1
        elif key == "BITS_PER_PIXEL":
            bpp = int(toks[1]) // 8
        elif key == "XY_ORIGIN" and len(toks) >= 3:
            ox, oy = float(toks[1]), float(toks[2])
        else:
            meta[key] = " ".join(toks[1:])
    if w <= 0 or h <= 0 or nbands == 0:
        raise ValueError("DOQ2: missing SAMPLES_AND_LINES / BAND_CONTENT")
    if bpp != 1:
        raise NotImplementedError(f"DOQ2 {bpp * 8}-bit pixels")
    need = skip + w * h * nbands
    buf = data[skip:need]
    buf = buf + b"\x00" * (need - skip - len(buf))
    raw = np.frombuffer(buf, np.uint8)
    if org == "BIP" or org == "SINGLE FILE":
        px = raw.reshape(h, w, nbands)
    elif org == "BIL":
        px = np.transpose(raw.reshape(h, nbands, w), (0, 2, 1))
    elif org == "BSQ":
        px = np.transpose(raw.reshape(nbands, h, w), (1, 2, 0))
    else:
        raise NotImplementedError(f"DOQ2 band organization {org}")
    gt = (ox, res, 0.0, oy, 0.0, -res)
    return np.ascontiguousarray(px), gt, meta


# ---------------------------------------------------------------------------
# Idrisi RST (frmts/idrisi/IdrisiDataset.cpp): raw top-down binary next
# to an ASCII .rdc documentation file ("file format : IDRISI Raster
# A.1"); data types byte / integer (i2 LE) / real (f4 LE) / rgb24.
# ---------------------------------------------------------------------------

_RST_DTYPES = {"byte": ("u1", 1), "integer": ("<i2", 1),
               "real": ("<f4", 1), "rgb24": ("u1", 3)}


def parse_rdc(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            out[k.strip().lower()] = v.strip()
    return out


def read_rst(path: str):
    """-> (pixels, gt | None, rdc dict)."""
    import os

    stem = os.path.splitext(path)[0]
    rdc_path = None
    for ext in (".rdc", ".RDC"):
        if os.path.exists(stem + ext):
            rdc_path = stem + ext
            break
    if rdc_path is None:
        raise FileNotFoundError(f"{path}: no .rdc documentation file")
    with open(rdc_path, "r", encoding="latin-1") as fh:
        rdc = parse_rdc(fh.read())
    dtype_name = rdc.get("data type", "byte").lower()
    if dtype_name not in _RST_DTYPES:
        raise NotImplementedError(f"RST data type {dtype_name}")
    dt, nb = _RST_DTYPES[dtype_name]
    dt = np.dtype(dt)
    w = int(rdc["columns"])
    h = int(rdc["rows"])
    with open(path, "rb") as fh:
        buf = fh.read(w * h * nb * dt.itemsize)
    buf = buf + b"\x00" * (w * h * nb * dt.itemsize - len(buf))
    px = np.frombuffer(buf, dt).reshape((h, w, nb) if nb > 1 else (h, w))
    if nb == 3:
        px = px[:, :, ::-1]  # stored BGR like the reference notes
    gt = None
    try:
        minx, maxx = float(rdc["min. x"]), float(rdc["max. x"])
        miny, maxy = float(rdc["min. y"]), float(rdc["max. y"])
        unit = float(rdc.get("unit dist.", "1") or 1)
        gt = (minx * unit, (maxx - minx) * unit / w, 0.0,
              maxy * unit, 0.0, -(maxy - miny) * unit / h)
    except (KeyError, ValueError):
        pass
    return np.ascontiguousarray(px), gt, rdc


def write_rst(path: str, pixels: np.ndarray, gt=None) -> None:
    import os

    px = np.asarray(pixels)
    if px.dtype == np.uint8 and px.ndim == 2:
        tname = "byte"
        store = px
    elif px.dtype == np.int16:
        tname, store = "integer", px.astype("<i2")
    elif px.dtype == np.float32:
        tname, store = "real", px.astype("<f4")
    elif px.ndim == 3 and px.shape[2] == 3:
        tname, store = "rgb24", px[:, :, ::-1]
    else:
        raise NotImplementedError(f"RST write for {px.dtype}/{px.ndim}d")
    h, w = px.shape[:2]
    with open(path, "wb") as fh:
        fh.write(np.ascontiguousarray(store).tobytes())
    if gt is None:
        gt = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    minx, maxx = gt[0], gt[0] + gt[1] * w
    maxy, miny = gt[3], gt[3] + gt[5] * h
    vals = np.asarray(px, np.float64)
    lines = ["file format : IDRISI Raster A.1",
             "file title  : ",
             f"data type   : {tname}",
             "file type   : binary",
             f"columns     : {w}",
             f"rows        : {h}",
             "ref. system : plane",
             "ref. units  : m",
             "unit dist.  : 1.0000000",
             f"min. X      : {minx:.7f}",
             f"max. X      : {maxx:.7f}",
             f"min. Y      : {miny:.7f}",
             f"max. Y      : {maxy:.7f}",
             "pos`n error : unknown",
             "resolution  : unknown",
             f"min. value  : {vals.min():g}",
             f"max. value  : {vals.max():g}",
             f"display min : {vals.min():g}",
             f"display max : {vals.max():g}",
             "value units : unspecified",
             "value error : unknown",
             "flag value  : none",
             "flag def`n  : none",
             "legend cats : 0"]
    with open(os.path.splitext(path)[0] + ".rdc", "w") as fh:
        fh.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# USGS LULC Composite Theme Grid (frmts/ctg/ctgdataset.cpp): 80-char
# records; 5 header records, then one record per cell with UTM zone,
# cell-center easting/northing and the six LULC theme values.
# ---------------------------------------------------------------------------

def sniff_ctg(data: bytes) -> bool:
    if len(data) < 400:
        return False
    head = data[:400]
    if not all(32 <= b < 127 for b in head):
        return False
    try:
        rows = int(head[0:10])
        cols = int(head[20:30])
        cell = int(head[35:40])
        zone = int(head[50:55])
    except ValueError:
        return False
    return rows > 0 and cols > 0 and 0 < cell < 10000 and 0 < zone <= 60


def read_ctg(data: bytes):
    """-> (pixels (h, w, 6) int32, gt, utm_zone)."""
    if not sniff_ctg(data):
        raise ValueError("not a CTG grid-cell file")
    h = int(data[0:10])
    w = int(data[20:30])
    cell = int(data[35:40])
    zone = int(data[50:55])
    hdr3 = data[3 * 80:4 * 80]
    nw_e = int(hdr3[40:50])
    nw_n = int(hdr3[50:60])
    px = np.zeros((h, w, 6), np.int32)
    pos = 5 * 80
    n = len(data)
    while pos + 80 <= n:
        rec = data[pos:pos + 80]
        pos += 80
        if int(rec[0:3]) != zone:
            raise ValueError("CTG: unexpected UTM zone in record")
        x = int(rec[3:11]) - cell // 2
        y = int(rec[11:19]) + cell // 2
        cx = (x - nw_e) // cell
        cy = (nw_n - y) // cell
        if not (0 <= cx < w and 0 <= cy < h):
            raise ValueError("CTG: cell out of range")
        for i in range(6):
            v = int(rec[20 + 10 * i:30 + 10 * i])
            px[cy, cx, i] = 0 if v >= 2000000000 else v
    gt = (float(nw_e), float(cell), 0.0, float(nw_n), 0.0, -float(cell))
    return px, gt, zone


# ---------------------------------------------------------------------------
# Natural Resources Canada BYN geoid grids (frmts/raw/byndataset.cpp):
# 80-byte little-endian header of arc-second bounds, Int16/Int32 rows.
# ---------------------------------------------------------------------------

def sniff_byn(path: str, data: bytes) -> bool:
    return path.lower().endswith((".byn", ".err")) and len(data) >= 80


def read_byn(data: bytes):
    """-> (pixels, gt, info)."""
    import struct

    if len(data) < 80:
        raise ValueError("BYN: truncated header")
    (south, north, west, east, dlat, dlon, _glob, _typ) = \
        struct.unpack_from("<4i4h", data, 0)
    factor = struct.unpack_from("<d", data, 24)[0]
    (sizeof, _vdatum, _descr, _subtype, _datum, _ell, byteorder,
     scale) = struct.unpack_from("<8h", data, 32)
    fs, fn, fw, fe = float(south), float(north), float(west), float(east)
    fdlat, fdlon = float(dlat), float(dlon)
    if scale == 1:
        k = 1000.0
        fs, fn, fw, fe, fdlat, fdlon = (v * k for v in
                                        (fs, fn, fw, fe, fdlat, fdlon))
    if fdlat == 0 or fdlon == 0:
        raise ValueError("BYN: zero spacing")
    w = int((fe - fw + 1.0) / fdlon + 1.0)
    h = int((fn - fs + 1.0) / fdlat + 1.0)
    if sizeof == 2:
        dt = np.dtype("<i2" if byteorder == 1 else ">i2")
    elif sizeof == 4:
        dt = np.dtype("<i4" if byteorder == 1 else ">i4")
    else:
        raise NotImplementedError(f"BYN nSizeOf {sizeof}")
    need = 80 + w * h * dt.itemsize
    buf = data[80:need]
    buf = buf + b"\x00" * (need - 80 - len(buf))
    px = np.frombuffer(buf, dt).reshape(h, w)
    gt = ((fw - fdlon / 2.0) / 3600.0, fdlon / 3600.0, 0.0,
          (fn + fdlat / 2.0) / 3600.0, 0.0, -fdlat / 3600.0)
    info = {"scale": 1.0 / factor if factor else 0.0,
            "nodata": 32767.0 if sizeof == 2 else 9999.0 * factor}
    return np.ascontiguousarray(px), gt, info
