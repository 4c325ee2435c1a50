"""USGS ASCII DEM (and CDED) reader — from-scratch numpy/py rewrite of
the reference's frmts/usgsdem/usgsdemdataset.cpp semantics:

- A-record fields at fixed byte offsets (coord system 156, ground/
  vertical units 528, corners 546, dx/dy/vres 816, profile count 858),
  Fortran 'D' exponents folded to 'E'.
- Data start detection: new-format 1024 (with the CR-at-1024 -> 1025
  quirk), undocumented 893 and 918 layouts, old-format 864.
- B-record profiles are COLUMNS: free-form integer tokens (row, col,
  point count, col count), fixed-24-char doubles (xstart, ystart,
  elevation offset, 2 skipped), then point-count elevations; the
  raster is nodata(-32767)-initialized and each profile is placed by
  its y start (dygap), bottom-up within the column.
- UTM rasters snap the y extent to the grid and take gt[0] from the
  first profile's x start; geographic rasters convert arc-seconds.
- Float32 when vertical units are feet or the vertical resolution is
  fractional, else Int16 with clamping.

Conformed against all five reference fixtures incl. published
checksums and geotransforms (tests/test_usgsdem.py).
"""

from __future__ import annotations

import re

import numpy as np

NODATA = -32767


def sniff_usgsdem(data: bytes) -> bool:
    if len(data) < 1024:
        return False
    # the reference identifies by parsing; cheap proxy: the A record is
    # ASCII and one of the known data starts yields profile markers
    head = data[:1024]
    if not all(32 <= b < 127 or b in (10, 13) for b in head[:200]):
        return False
    try:
        _find_data_start(data)
        return True
    except ValueError:
        return False


class _Cursor:
    """Free-form token reader over the whole file, mirroring the
    reference's Buffer helpers (ints: whitespace-delimited; doubles:
    FIXED character count with D->E exponents)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read_int(self) -> int:
        d, n = self.data, len(self.data)
        i = self.pos
        while i < n and d[i:i + 1].isspace():
            i += 1
        j = i
        if i < n and d[i] in (43, 45):  # + -
            j += 1
        while j < n and 48 <= d[j] <= 57:
            j += 1
        self.pos = j
        if j == i or (j - i == 1 and d[i] in (43, 45)):
            raise ValueError("USGSDEM: expected integer")
        return int(d[i:j])

    def read_fixed_double(self, width: int) -> float:
        s = self.data[self.pos:self.pos + width]
        if len(s) < width:
            raise ValueError("USGSDEM: truncated double field")
        self.pos += width
        return float(s.replace(b"D", b"E").replace(b"d", b"e") or b"0")

    def align1024(self) -> None:
        self.pos = (self.pos + 1023) // 1024 * 1024


def _dconvert(data: bytes, off: int, width: int) -> float:
    s = data[off:off + width].replace(b"D", b"E").replace(b"d", b"e")
    s = s.strip()
    return float(s) if s else 0.0


def _read_int_at(data: bytes, off: int):
    c = _Cursor(data, off)
    v = c.read_int()
    return v, c.pos


def _find_data_start(data: bytes) -> tuple[int, bool]:
    c = _Cursor(data, 864)
    try:
        row = c.read_int()
        col = c.read_int()
    except ValueError:
        row = col = -1
    new_format = c.pos >= 1024 or row != 1 or col != 1
    if not new_format:
        return 864, False
    for start in (1024, 893, 918):
        try:
            c = _Cursor(data, start)
            i, j = c.read_int(), c.read_int()
        except ValueError:
            continue
        ok = (i == 1 and j in (0, 1)) if start == 1024 else \
            (i == 1 and j == 1)
        if ok:
            if start == 1024 and data[1024:1025] == b"\n" \
                    and data[2049:2050] == b"\n":
                return 1025, True
            return start, True
    raise ValueError("does not appear to be a USGS DEM file")


def read_usgsdem(data: bytes):
    """-> (pixels (h, w) int16|float32, gt, info dict)."""
    start, new_format = _find_data_start(data)

    cs, p = _read_int_at(data, 156)
    zone, _ = _read_int_at(data, p)
    gunit, p = _read_int_at(data, 528)
    vunit, _ = _read_int_at(data, p)
    dx = _dconvert(data, 816, 12)
    dy = _dconvert(data, 828, 12)
    vres = _dconvert(data, 840, 12)
    if dy == 0:
        raise ValueError("USGSDEM: zero y spacing")
    float_type = (vunit == 1 or vres < 1.0)

    corners = []
    off = 546
    for _ in range(4):  # SW NW NE SE
        x = _dconvert(data, off, 24)
        y = _dconvert(data, off + 24, 24)
        corners.append((x, y))
        off += 48
    xmin = min(corners[0][0], corners[1][0])
    xmax = max(corners[2][0], corners[3][0])
    ymin = min(corners[0][1], corners[3][1])
    ymax = max(corners[1][1], corners[2][1])
    nprofiles, _ = _read_int_at(data, 858)

    projected = cs in (1, 2, -9999)
    if projected:
        ymin = np.floor(ymin / dy) * dy
        ymax = np.ceil(ymax / dy) * dy
        c = _Cursor(data, start)
        for _ in range(4):
            c.read_int()
        dx_start = c.read_fixed_double(24)
        h = int((ymax - ymin) / dy + 1.5)
        w = nprofiles
        gt = (dx_start - dx / 2.0, dx, 0.0, ymax + dy / 2.0, 0.0, -dy)
    else:
        h = int((ymax - ymin) / dy + 1.5)
        w = nprofiles
        gt = ((xmin - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (ymax + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)

    dtype = np.float32 if float_type else np.int16
    px = np.full((h, w), NODATA, dtype)
    ymin_center = gt[3] + (h - 0.5) * gt[5]

    c = _Cursor(data, start)
    for i in range(w):
        try:
            c.read_int()          # row number (1)
            c.read_int()          # column number (i+1)
            npts = c.read_int()
            c.read_int()          # number of columns in profile (1)
            c.read_fixed_double(24)           # x start
            dy_start = c.read_fixed_double(24)
            elev_off = c.read_fixed_double(24)
            c.read_fixed_double(24)
            c.read_fixed_double(24)
        except ValueError:
            break  # truncated file: remaining columns stay nodata
        if not projected:
            dy_start /= 3600.0
        lygap = int((ymin_center - dy_start) / gt[5] + 0.5)
        ok = True
        for j in range(lygap, npts + lygap):
            try:
                elev = c.read_int()
            except ValueError:
                ok = False
                break
            iy = h - j - 1
            if iy < 0 or iy >= h or elev == NODATA:
                continue
            v = np.float32(elev * vres + elev_off)
            if float_type:
                px[iy, i] = v
            else:
                px[iy, i] = np.int16(min(32767.0, max(-32768.0, v)))
        if not ok:
            break
        if start == 1024:
            c.align1024()
    info = {"coord_system": cs, "zone": zone, "vunit": vunit,
            "new_format": new_format, "data_start": start,
            "float": float_type}
    return px, gt, info
