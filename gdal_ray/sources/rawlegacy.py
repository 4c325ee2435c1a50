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
