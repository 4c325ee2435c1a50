"""Golden Software Surfer grids (reference frmts/gsg: gsagdataset.cpp
GSAG ASCII, gsbgdataset.cpp GSBG binary v6, gs7bgdataset.cpp GS7BG
binary v7). All three store a single band bottom-up over a
node-registered extent (xlo..xhi are pixel CENTERS):

- GSAG  "DSAA": ASCII — nx ny / xlo xhi / ylo yhi / zlo zhi / rows.
- GSBG  "DSBB": int16 nx, ny; 6 doubles; float32 rows; blank value
  1.701410009187828e38 and above.
- GS7BG "DSRB": tagged sections (header 0x42525344, GRID 0x44495247,
  DATA 0x41544144), GRID = rows, cols int32 + minX minY xStep yStep
  zMin zMax rotation blank doubles; float64 rows.

Conformed against the reference fixtures gsg_binary.grd /
gsg_7binary.grd (both re-encodings of byte.tif, checksum 4672)."""

from __future__ import annotations

import struct

import numpy as np

GSBG_BLANK = 1.701410009187828e38


def sniff_surfer(data: bytes) -> bool:
    return data[:4] in (b"DSAA", b"DSBB", b"DSRB")


def _gt_from_extent(xlo, xhi, ylo, yhi, nx, ny):
    dx = (xhi - xlo) / (nx - 1) if nx > 1 else 1.0
    dy = (yhi - ylo) / (ny - 1) if ny > 1 else 1.0
    return (xlo - dx / 2.0, dx, 0.0, yhi + dy / 2.0, 0.0, -dy)


def read_surfer(data: bytes):
    """-> (pixels (h, w) float32/float64 north-up, gt, nodata)."""
    magic = data[:4]
    if magic == b"DSAA":
        toks = data[4:].split()
        nx, ny = int(toks[0]), int(toks[1])
        xlo, xhi, ylo, yhi = (float(t) for t in toks[2:6])
        vals = np.array(toks[8:8 + nx * ny], np.float64)
        px = vals.reshape(ny, nx)[::-1].astype(np.float32)
        return np.ascontiguousarray(px), \
            _gt_from_extent(xlo, xhi, ylo, yhi, nx, ny), GSBG_BLANK
    if magic == b"DSBB":
        nx, ny = struct.unpack_from("<2h", data, 4)
        xlo, xhi, ylo, yhi, _zlo, _zhi = struct.unpack_from("<6d", data, 8)
        px = np.frombuffer(data, "<f4", nx * ny, 56).reshape(ny, nx)
        return np.ascontiguousarray(px[::-1]), \
            _gt_from_extent(xlo, xhi, ylo, yhi, nx, ny), GSBG_BLANK
    if magic == b"DSRB":
        pos = 4
        hsize = struct.unpack_from("<I", data, pos)[0]
        pos += 4 + hsize
        grid = None
        while pos + 8 <= len(data):
            tag, size = struct.unpack_from("<II", data, pos)
            pos += 8
            if tag == 0x44495247:  # 'GRID'
                grid = pos
            elif tag == 0x41544144:  # 'DATA'
                if grid is None:
                    raise ValueError("GS7BG: DATA before GRID section")
                ny, nx = struct.unpack_from("<2i", data, grid)
                minx, miny, xstep, ystep, _zmin, _zmax, _rot, blank = \
                    struct.unpack_from("<8d", data, grid + 8)
                px = np.frombuffer(data, "<f8", nx * ny, pos).reshape(
                    ny, nx)
                gt = _gt_from_extent(minx, minx + xstep * (nx - 1),
                                     miny, miny + ystep * (ny - 1), nx, ny)
                return np.ascontiguousarray(px[::-1]), gt, blank
            pos += size
        raise ValueError("GS7BG: missing GRID/DATA sections")
    raise ValueError("not a Surfer grid")


def write_gsbg(pixels: np.ndarray, gt) -> bytes:
    """Surfer 6 binary grid from a north-up band + geotransform."""
    px = np.asarray(pixels, np.float32)
    ny, nx = px.shape
    xlo = gt[0] + gt[1] / 2.0
    xhi = xlo + gt[1] * (nx - 1)
    yhi = gt[3] + gt[5] / 2.0
    ylo = yhi + gt[5] * (ny - 1)
    finite = px[np.isfinite(px)]
    zlo = float(finite.min()) if finite.size else 0.0
    zhi = float(finite.max()) if finite.size else 0.0
    head = b"DSBB" + struct.pack("<2h", nx, ny) + \
        struct.pack("<6d", xlo, xhi, ylo, yhi, zlo, zhi)
    return head + np.ascontiguousarray(px[::-1]).tobytes()
