"""GRIB edition-1 raster reader (reference frmts/grib/, degrib's
GRIB1 path). WMO FM 92-VIII Ed.1 is fully public:

    IS ("GRIB" + 3-byte msg length + edition) | PDS | [GDS] | [BMS]
    | BDS | "7777"

- PDS octet 8 flags say whether GDS/BMS follow; octets 27-28 hold the
  decimal scale D (sign-magnitude).
- GDS: data-representation type (0 lat/lon, 1 Mercator, 10 rotated
  lat/lon read as plain), Ni/Nj, first/last lat-lon in millidegrees
  (sign-magnitude 3-byte), increments, scanning mode.
- BMS: bitmap of present values.
- BDS: binary scale E (sign-magnitude 2-byte), reference value R as
  a 4-byte IBM/360 float, bits-per-value, then the big-endian N-bit
  packed array.  Y = (R + X * 2^E) / 10^D.

A file is a sequence of messages = bands (GDAL's band model).
Missing values (bitmap 0) surface as 9999.0 with nodata 9999.0,
matching the reference's GRIB1 nodata convention.
"""

from __future__ import annotations

import struct

import numpy as np

NODATA = 9999.0
UNDEFINED = 9.999e20  # degrib's primary missing value


def _u3(b: bytes, o: int) -> int:
    return (b[o] << 16) | (b[o + 1] << 8) | b[o + 2]


def _s3(b: bytes, o: int) -> int:
    v = _u3(b, o)
    return -(v & 0x7FFFFF) if v & 0x800000 else v


def _s2(b: bytes, o: int) -> int:
    v = (b[o] << 8) | b[o + 1]
    return -(v & 0x7FFF) if v & 0x8000 else v


def _ibm_float(b: bytes, o: int) -> float:
    a = b[o]
    mant = _u3(b, o + 1)
    if mant == 0 and a in (0, 0x40):
        return 0.0
    sign = -1.0 if a & 0x80 else 1.0
    exp = (a & 0x7F) - 64
    return sign * (mant / float(1 << 24)) * (16.0 ** exp)


def _unpack_bits(data: bytes, nbits: int, n: int) -> np.ndarray:
    if nbits == 0:
        return np.zeros(n, np.int64)
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    need = n * nbits
    if len(bits) < need:
        bits = np.concatenate([bits, np.zeros(need - len(bits), np.uint8)])
    bits = bits[:need].reshape(n, nbits).astype(np.int64)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
    return bits @ weights


def split_grib_messages(data: bytes) -> list[bytes]:
    out = []
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        idx = data.find(b"GRIB", pos)
        if idx < 0:
            break
        ln = _u3(data, idx + 4)
        if data[idx + 7] != 1:
            raise NotImplementedError(
                f"GRIB edition {data[idx + 7]} (only edition 1)")
        out.append(data[idx:idx + ln])
        pos = idx + ln
    return out


def decode_grib1_message(msg: bytes):
    """One GRIB1 message -> (values (nj, ni) float64 north-up, gt,
    meta dict)."""
    pos = 8
    # ---- PDS
    pds_len = _u3(msg, pos)
    pds = msg[pos:pos + pds_len]
    flags = pds[7]
    has_gds = bool(flags & 0x80)
    has_bms = bool(flags & 0x40)
    dscale = _s2(pds, 26)
    param = pds[8]
    level_type = pds[9]
    pos += pds_len
    if not has_gds:
        raise NotImplementedError("GRIB1 without GDS (predefined grids)")
    # ---- GDS
    gds_len = _u3(msg, pos)
    gds = msg[pos:pos + gds_len]
    gtype = gds[5]
    ni = (gds[6] << 8) | gds[7]
    nj = (gds[8] << 8) | gds[9]
    lat1 = _s3(gds, 10) / 1000.0
    lon1 = _s3(gds, 13) / 1000.0
    lat2 = _s3(gds, 17) / 1000.0
    lon2 = _s3(gds, 20) / 1000.0
    scan = gds[27]
    pos += gds_len
    proj = None
    if gtype == 5:
        # polar stereographic: La1/Lo1 first point, LoV orientation,
        # Dx/Dy in whole meters, true-scale latitude fixed at 60
        # (WMO GRIB1 GDS template 5; sphere R=6367470 m, and the
        # spherical proj4 stere akm1 formula reproduces the
        # reference's geotransform bit-for-bit — degrib1.cpp +
        # autotest grib.py test_grib_grib1_south_polar_stereographic)
        lov = _s3(gds, 17) / 1000.0
        dxm = float((gds[20] << 16) | (gds[21] << 8) | gds[22])
        dym = float((gds[23] << 16) | (gds[24] << 8) | gds[25])
        south = bool(gds[26] & 0x80)
        R = 6367470.0
        phits = np.deg2rad(60.0)
        akm1 = np.cos(phits) / np.tan(np.pi / 4 - phits / 2)
        phi = np.deg2rad(lat1)
        lam = np.deg2rad(lon1 - lov)
        if south:
            t = np.tan(np.pi / 4 + phi / 2)
            x1, y1 = R * akm1 * t * np.sin(lam), R * akm1 * t * np.cos(lam)
        else:
            t = np.tan(np.pi / 4 - phi / 2)
            x1, y1 = R * akm1 * t * np.sin(lam), -R * akm1 * t * np.cos(lam)
        proj = {"proj": "stere", "lat_0": -90.0 if south else 90.0,
                "lat_ts": -60.0 if south else 60.0, "lon_0": lov, "R": R}
    elif gtype not in (0, 1, 10):
        raise NotImplementedError(f"GRIB1 grid type {gtype}")
    # ---- BMS
    bitmap = None
    if has_bms:
        bms_len = _u3(msg, pos)
        unused = msg[pos + 3]
        bm_bits = np.unpackbits(
            np.frombuffer(msg[pos + 6:pos + bms_len], np.uint8))
        total = (bms_len - 6) * 8 - unused
        bitmap = bm_bits[:total].astype(bool)
        pos += bms_len
    # ---- BDS
    bds_len = _u3(msg, pos)
    bds = msg[pos:pos + bds_len]
    bflags = bds[3] >> 4
    if bflags & 0x4:
        raise NotImplementedError("GRIB1 complex/second-order packing")
    unused_bits = bds[3] & 0x0F
    escale = _s2(bds, 4)
    ref = _ibm_float(bds, 6)
    nbits = bds[10]
    npts = ni * nj
    nvals = int(bitmap.sum()) if bitmap is not None else npts
    if nbits:
        avail = ((bds_len - 11) * 8 - unused_bits) // nbits
        nvals = min(nvals, avail)
    x = _unpack_bits(bds[11:], nbits, nvals)
    vals = (ref + x.astype(np.float64) * (2.0 ** escale)) / (10.0 ** dscale)
    nodata = None
    if bitmap is not None:
        # degrib1.cpp: missing resets to 9999 only when 9999 lies
        # OUTSIDE [min, max] — where min is PRE-SEEDED with the
        # reference value (the theoretical packed minimum,
        # degrib1.cpp:1681), not the actual data minimum
        minv = ref * (2.0 ** escale) / (10.0 ** dscale)
        maxv = float(vals.max()) if len(vals) else minv
        if maxv < NODATA or minv > NODATA:
            nodata = NODATA
        else:
            nodata = UNDEFINED
        full = np.full(npts, nodata)
        idx = np.nonzero(bitmap[:npts])[0][:len(vals)]
        full[idx] = vals[:len(idx)]
        vals = full
    elif len(vals) < npts:
        vals = np.concatenate([vals, np.full(npts - len(vals), NODATA)])
        nodata = NODATA
    grid = vals.reshape(nj, ni)
    if scan & 0x80:       # -i direction
        grid = grid[:, ::-1]
    south_up = bool(scan & 0x40)  # +j = south->north
    if south_up:
        grid = grid[::-1]
        lat1, lat2 = lat2, lat1  # top latitude first
    if gtype == 5:
        sx = -dxm if scan & 0x80 else dxm
        top = y1 + (nj - 1) * dym + dym / 2.0 if south_up else y1 + dym / 2.0
        gt = (x1 - sx / 2.0, sx, 0.0, top, 0.0, -dym)
    else:
        dx = (lon2 - lon1) / (ni - 1) if ni > 1 else 1.0
        dy = (lat2 - lat1) / (nj - 1) if nj > 1 else 1.0  # neg going down
        gt = (lon1 - dx / 2.0, dx, 0.0, lat1 - dy / 2.0, 0.0, dy)
    meta = {"param": param, "level_type": level_type, "grid_type": gtype,
            "ni": ni, "nj": nj, "has_bitmap": bitmap is not None,
            "nodata": nodata, "proj": proj}
    return grid, gt, meta


def read_grib1(data: bytes):
    """-> (bands list[(nj, ni) float64], gt of band 1, metas). The
    dataset takes band 1's size; messages with a different grid are
    placed top-left and zero-padded (the reference warns 'data access
    may be incomplete' and does the same — bug3246.grb golden), with
    the native (ni, nj) kept in the meta."""
    msgs = split_grib_messages(data)
    if not msgs:
        raise ValueError("no GRIB messages found")
    bands, metas = [], []
    gt0 = None
    shape0 = None
    for m in msgs:
        grid, gt, meta = decode_grib1_message(m)
        if gt0 is None:
            gt0 = gt
            shape0 = grid.shape
        if grid.shape != shape0:
            full = np.zeros(shape0)
            sh = min(shape0[0], grid.shape[0])
            sw = min(shape0[1], grid.shape[1])
            full[:sh, :sw] = grid[:sh, :sw]
            grid = full
        bands.append(grid)
        metas.append(meta)
    return bands, gt0, metas
