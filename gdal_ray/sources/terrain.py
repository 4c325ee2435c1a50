"""Terrain / elevation grid drivers: DTED, SRTMHGT, SAGA GIS.

- DTED (reference frmts/dted/): MIL-PRF-89020B cell structure — UHL
  (80 B) + DSI (648 B) + ACC (2700 B) headers, then one record per
  longitude column: 0xAA sentinel, 3-byte block count, lon/lat counts,
  big-endian SIGN-MAGNITUDE int16 elevations running south->north,
  4-byte byte-sum checksum. Grid is cell-center registered: the UHL
  origin names the CENTER of the south-west post.
- SRTMHGT (reference frmts/srtmhgt/): headerless big-endian int16,
  1201x1201 (3") or 3601x3601 (1") or the 0.5" variant, 1-degree tile
  whose south-west corner is encoded in the FILENAME (n43w080.hgt);
  post-centered like DTED.
- SAGA (reference frmts/saga/): .sgrd ASCII header (DATAFORMAT,
  CELLCOUNT_X/Y, POSITION_XMIN/YMIN naming the CENTER of the lower-
  left cell, CELLSIZE, TOPTOBOTTOM) + .sdat raw payload, bottom-up
  when TOPTOBOTTOM=FALSE.
"""

from __future__ import annotations

import re

import numpy as np

# ------------------------------------------------------------------ DTED


def _dted_angle(s: str) -> float:
    """DDDMMSSH or DDMMSSH -> signed degrees."""
    s = s.strip()
    hemi = s[-1].upper()
    digits = s[:-1]
    sec = float(digits[-2:])
    minute = float(digits[-4:-2])
    deg = float(digits[:-4])
    v = deg + minute / 60.0 + sec / 3600.0
    return -v if hemi in ("S", "W") else v


def read_dted(data: bytes):
    """-> (elevations (nrows, ncols) int16 north-up, gt)."""
    if data[:3] != b"UHL":
        raise ValueError("not a DTED file (missing UHL)")
    uhl = data[:80].decode("ascii", "replace")
    lon0 = _dted_angle(uhl[4:12])
    lat0 = _dted_angle(uhl[12:20])
    # intervals in tenths of arc-seconds
    dx = float(uhl[20:24]) / 36000.0
    dy = float(uhl[24:28]) / 36000.0
    ncols = int(uhl[47:51])   # number of longitude lines
    nrows = int(uhl[51:55])   # number of latitude points
    base = 80 + 648 + 2700    # UHL + DSI + ACC
    rec = 8 + 2 * nrows + 4
    out = np.empty((nrows, ncols), np.int16)
    for c in range(ncols):
        off = base + c * rec
        if data[off] != 0xAA:
            raise ValueError(f"bad DTED record sentinel at column {c}")
        col = np.frombuffer(data[off + 8: off + 8 + 2 * nrows],
                            ">u2").astype(np.int32)
        # sign-magnitude (dted_api.c: negative when the high bit set)
        neg = (col & 0x8000) != 0
        val = np.where(neg, -(col & 0x7FFF).astype(np.int32), col)
        out[:, c] = val[::-1].astype(np.int16)  # south->north to north-up
    gt = (lon0 - dx / 2.0, dx, 0.0,
          lat0 + (nrows - 1) * dy + dy / 2.0, 0.0, -dy)
    return out, gt


def write_dted(elev: np.ndarray, lon0: float, lat0: float) -> bytes:
    """Level-appropriate DTED cell for a (n, n) north-up int16 grid
    whose south-west post CENTER is (lon0, lat0), spanning 1 degree."""
    elev = np.asarray(elev, np.int16)
    nrows, ncols = elev.shape
    dx_t = round(36000.0 / (ncols - 1))   # tenths of arc-seconds
    dy_t = round(36000.0 / (nrows - 1))

    # both origin fields are DDDMMSS + hemisphere (8 bytes)
    def ang8(v: float, lon: bool) -> bytes:
        hemi = ("W" if v < 0 else "E") if lon else ("S" if v < 0 else "N")
        v = abs(v)
        d = int(v + 1e-9)
        m = int((v - d) * 60 + 1e-9)
        s = int(round(((v - d) * 60 - m) * 60))
        return f"{d:03d}{m:02d}{s:02d}{hemi}".encode()

    uhl = (b"UHL1" + ang8(lon0, True) + ang8(lat0, False)
           + f"{dx_t:04d}".encode() + f"{dy_t:04d}".encode()
           + b"    " + b"U  " + b"            "
           + f"{ncols:04d}".encode() + f"{nrows:04d}".encode()
           + b"0" + b" " * (80 - 56)).ljust(80, b" ")
    dsi = b"DSI" + b" " * 645
    acc = b"ACC" + b" " * 2697
    recs = bytearray()
    for c in range(ncols):
        col = elev[::-1, c].astype(np.int32)  # north-up -> south->north
        mag = np.where(col < 0, (-col) | 0x8000, col).astype(">u2")
        hdr = bytes([0xAA]) + c.to_bytes(3, "big") \
            + c.to_bytes(2, "big") + (0).to_bytes(2, "big")
        body = hdr + mag.tobytes()
        recs += body + (sum(body) & 0xFFFFFFFF).to_bytes(4, "big")
    return uhl + dsi + acc + bytes(recs)


# -------------------------------------------------------------- SRTMHGT

_HGT_NAME = re.compile(r"([NSns])(\d{2})([EWew])(\d{3})")


def read_srtmhgt(data: bytes, filename: str):
    """-> (elevations int16 north-up, gt); tile georef from the
    filename's south-west corner (srtmhgtdataset.cpp)."""
    m = _HGT_NAME.search(filename)
    if not m:
        raise ValueError("SRTMHGT needs a [NS]yy[EW]xxx filename")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    n = int(round((len(data) // 2) ** 0.5))
    if n * n * 2 != len(data) or n < 2:
        raise ValueError(f"SRTMHGT size {len(data)} is not square int16")
    px = np.frombuffer(data, ">i2").reshape(n, n).astype(np.int16)
    step = 1.0 / (n - 1)
    gt = (lon - step / 2.0, step, 0.0,
          lat + 1 + step / 2.0, 0.0, -step)
    return px, gt


def write_srtmhgt(elev: np.ndarray) -> bytes:
    elev = np.asarray(elev, np.int16)
    n = elev.shape[0]
    if elev.shape != (n, n):
        raise ValueError("SRTMHGT tiles are square")
    return elev.astype(">i2").tobytes()


def srtmhgt_name(lat: int, lon: int) -> str:
    return (f"{'N' if lat >= 0 else 'S'}{abs(lat):02d}"
            f"{'E' if lon >= 0 else 'W'}{abs(lon):03d}.hgt")


# ------------------------------------------------------------------ SAGA

_SAGA_TYPES = {"BIT": "u1", "BYTE_UNSIGNED": "u1", "BYTE": "i1",
               "SHORTINT_UNSIGNED": "u2", "SHORTINT": "i2",
               "INTEGER_UNSIGNED": "u4", "INTEGER": "i4",
               "FLOAT": "f4", "DOUBLE": "f8"}


def read_saga(sgrd_text: str, sdat: bytes):
    """-> (pixels north-up, gt, nodata)."""
    kv = {}
    for line in sgrd_text.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().upper()] = v.strip()
    w = int(kv["CELLCOUNT_X"])
    h = int(kv["CELLCOUNT_Y"])
    dt = _SAGA_TYPES.get(kv.get("DATAFORMAT", "FLOAT").upper())
    if dt is None:
        raise NotImplementedError(f"SAGA type {kv.get('DATAFORMAT')}")
    bo = ">" if kv.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE" else "<"
    dtype = np.dtype(bo + dt)
    off = int(kv.get("DATAFILE_OFFSET", 0))
    px = np.frombuffer(sdat[off:], dtype, count=h * w).reshape(h, w) \
        .astype(dtype.newbyteorder("="))
    if kv.get("TOPTOBOTTOM", "FALSE").upper() == "FALSE":
        px = px[::-1]  # stored bottom-up
    cs = float(kv["CELLSIZE"])
    # POSITION_XMIN/YMIN name the CENTER of the lower-left cell
    x0 = float(kv["POSITION_XMIN"]) - cs / 2.0
    y1 = float(kv["POSITION_YMIN"]) - cs / 2.0 + h * cs
    nod = float(kv["NODATA_VALUE"]) if "NODATA_VALUE" in kv else None
    zf = float(kv.get("Z_FACTOR", 1.0))
    if zf != 1.0:
        px = px * zf
    return px, (x0, cs, 0.0, y1, 0.0, -cs), nod


def write_saga(px: np.ndarray, gt, nodata: float = -99999.0):
    """-> (sgrd_text, sdat bytes); bottom-up little-endian like the
    reference's CreateCopy."""
    px = np.ascontiguousarray(px)
    fmt = {"u1": "BYTE_UNSIGNED", "i1": "BYTE", "u2": "SHORTINT_UNSIGNED",
           "i2": "SHORTINT", "u4": "INTEGER_UNSIGNED", "i4": "INTEGER",
           "f4": "FLOAT", "f8": "DOUBLE"}.get(
               px.dtype.newbyteorder("=").str[1:])
    if fmt is None:
        raise NotImplementedError(f"SAGA type for {px.dtype}")
    h, w = px.shape
    if gt[2] or gt[4]:
        raise NotImplementedError("SAGA grids are axis-aligned")
    cs = gt[1]
    hdr = "\n".join([
        "NAME\t= gdal_ray", "DESCRIPTION\t= ", "UNIT\t= ",
        "DATAFILE_OFFSET\t= 0", f"DATAFORMAT\t= {fmt}",
        "BYTEORDER_BIG\t= FALSE",
        f"POSITION_XMIN\t= {gt[0] + cs / 2.0!r}",
        f"POSITION_YMIN\t= {gt[3] + gt[5] * (h - 0.5)!r}",
        f"CELLCOUNT_X\t= {w}", f"CELLCOUNT_Y\t= {h}",
        f"CELLSIZE\t= {cs!r}", "Z_FACTOR\t= 1.000000",
        f"NODATA_VALUE\t= {nodata!r}", "TOPTOBOTTOM\t= FALSE"]) + "\n"
    sdat = px[::-1].astype(px.dtype.newbyteorder("<")).tobytes()
    return hdr, sdat
