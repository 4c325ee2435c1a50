"""ASCII raster formats: Arc/Info ASCII Grid (reference
frmts/aaigrid/aaigriddataset.cpp) and the XYZ gridded-points driver
(frmts/xyz/xyzdataset.cpp).

AAIGrid: header keys (case-insensitive) ncols/nrows,
xllcorner|xllcenter, yllcorner|yllcenter, cellsize or dx+dy, optional
NODATA_value; data rows top-down. Geotransform per the reference:
gt = (xll, cell, 0, yll + nrows*cell, 0, -cell), with the *center
variants shifted by half a cell. Values parse as Int32 unless any
token carries a decimal point / exponent / nan (then Float32/Float64
by precision) — matching the driver's type sniff.

XYZ: whitespace/comma/semicolon-separated X Y Z lines (optional
non-numeric header line), one line per cell of a regular grid; the
grid step is inferred from the sorted unique coordinates and the
geotransform registers cell centers (xmin - step/2), per the
reference driver.

Both are single-file ASCII payloads; at engine scale they ride the
per-file map_batches open path (open_raster), one task per file.
"""

from __future__ import annotations

import math
import re
import struct

import numpy as np

_H_KEYS = ("ncols", "nrows", "xllcorner", "xllcenter", "yllcorner",
           "yllcenter", "cellsize", "dx", "dy", "nodata_value")


def read_aaigrid(text: str | bytes) -> tuple[np.ndarray, tuple, float | None]:
    """-> (array[rows, cols], geotransform, nodata)."""
    if isinstance(text, bytes):
        text = text.decode("ascii", "replace")
    pos = 0
    hdr: dict[str, float] = {}
    nodata_token = ""
    lines = text.splitlines()
    for li, line in enumerate(lines):
        parts = line.split()
        if len(parts) >= 2 and parts[0].lower() in _H_KEYS:
            hdr[parts[0].lower()] = float(parts[1])
            if parts[0].lower() == "nodata_value":
                nodata_token = parts[1]
            pos = li + 1
        elif parts:
            break
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("not an AAIGrid: missing ncols/nrows")
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    if "dx" in hdr or "dy" in hdr:
        cx, cy = hdr["dx"], hdr["dy"]
    else:
        cx = cy = hdr.get("cellsize", 1.0)
    xll = hdr.get("xllcorner", hdr.get("xllcenter", 0.0))
    yll = hdr.get("yllcorner", hdr.get("yllcenter", 0.0))
    if "xllcenter" in hdr:
        xll -= cx / 2.0
    if "yllcenter" in hdr:
        yll -= cy / 2.0
    gt = (xll, cx, 0.0, yll + nrows * cy, 0.0, -cy)
    nodata = hdr.get("nodata_value")

    body = "\n".join(lines[pos:])
    # type sniff: integer unless a decimal point/exponent/nan appears in
    # the body OR in the NODATA token (the reference derives the band
    # type from the nodata literal too, aaigrid.py test_aaigrid_6)
    is_float = (any(c in body for c in ".eE")
                or "nan" in body.lower()
                or any(c in nodata_token for c in ".eE")
                or "nan" in nodata_token.lower())
    vals = np.array(body.split(), np.float64)
    if vals.size != ncols * nrows:
        raise ValueError(f"AAIGrid body has {vals.size} values, "
                         f"want {ncols * nrows}")
    arr = vals.reshape(nrows, ncols)
    if not is_float:
        arr = arr.astype(np.int32)
    else:
        finite = arr[np.isfinite(arr)]
        if finite.size == 0 or np.abs(finite).max() < 3.4e38:
            arr = arr.astype(np.float32)
    return arr, gt, nodata


def write_aaigrid(arr: np.ndarray, gt=None, nodata=None,
                  decimal_precision: int = 6) -> str:
    """Array (+north-up geotransform) -> AAIGrid text."""
    arr = np.asarray(arr)
    nrows, ncols = arr.shape
    if gt is None:
        gt = (0.0, 1.0, 0.0, float(nrows), 0.0, -1.0)
    if gt[2] or gt[4]:
        raise ValueError("AAIGrid requires a north-up geotransform")
    cx, cy = gt[1], -gt[5]
    out = [f"ncols        {ncols}", f"nrows        {nrows}",
           f"xllcorner    {gt[0]:.12f}",
           f"yllcorner    {gt[3] - nrows * cy:.12f}"]
    if abs(cx - cy) < 1e-12 * max(abs(cx), abs(cy)):
        out.append(f"cellsize     {cx:.12f}")
    else:
        out.append(f"dx           {cx:.12f}")
        out.append(f"dy           {cy:.12f}")
    if nodata is not None:
        out.append(f"NODATA_value {nodata}")
    if np.issubdtype(arr.dtype, np.integer):
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in arr)
    else:
        body = "\n".join(" ".join(f"{v:.{decimal_precision}f}" for v in row)
                         for row in arr)
    return "\n".join(out) + "\n" + body + "\n"


def read_xyz(text: str | bytes) -> tuple[np.ndarray, tuple]:
    """XYZ gridded points -> (array[rows, cols] float64, geotransform).

    Lines may arrive in any order; the grid must be complete and
    regular (the reference driver requires equal spacing)."""
    if isinstance(text, bytes):
        text = text.decode("ascii", "replace")
    xs, ys, zs = [], [], []
    for line in text.splitlines():
        line = line.replace(",", " ").replace(";", " ").strip()
        if not line:
            continue
        parts = line.split()
        try:
            x, y, z = float(parts[0]), float(parts[1]), float(parts[2])
        except (ValueError, IndexError):
            if not xs:  # header line
                continue
            raise
        xs.append(x)
        ys.append(y)
        zs.append(z)
    x = np.array(xs)
    y = np.array(ys)
    z = np.array(zs)
    ux = np.unique(x)
    uy = np.unique(y)
    if ux.size * uy.size != x.size:
        raise ValueError("XYZ points do not form a complete grid")
    def step(u):
        if u.size < 2:
            return 1.0
        d = np.diff(u)
        if not np.allclose(d, d[0], rtol=1e-8):
            raise ValueError("XYZ grid spacing is irregular")
        return float(d[0])
    sx, sy = step(ux), step(uy)
    ci = np.searchsorted(ux, x)
    ri = np.searchsorted(uy, y)
    arr = np.full((uy.size, ux.size), np.nan)
    arr[uy.size - 1 - ri, ci] = z  # row 0 = max y (north-up)
    gt = (float(ux[0]) - sx / 2.0, sx, 0.0,
          float(uy[-1]) + sy / 2.0, 0.0, -sy)
    return arr, gt


def write_xyz(arr: np.ndarray, gt=None, precision: int = 6) -> str:
    """North-up array -> XYZ text (cell centers, row-major from the
    top — the order the reference driver writes)."""
    arr = np.asarray(arr, np.float64)
    nrows, ncols = arr.shape
    if gt is None:
        gt = (0.0, 1.0, 0.0, float(nrows), 0.0, -1.0)
    if gt[2] or gt[4]:
        raise ValueError("XYZ requires a north-up geotransform")
    lines = []
    for r in range(nrows):
        ycen = gt[3] + gt[5] * (r + 0.5)
        for c in range(ncols):
            xcen = gt[0] + gt[1] * (c + 0.5)
            lines.append(f"{xcen:.{precision}f} {ycen:.{precision}f} "
                         f"{arr[r, c]:.{precision}f}")
    return "\n".join(lines) + "\n"


def sniff_aaigrid(data: bytes) -> bool:
    head = data[:256].lstrip().lower()
    return head.startswith(b"ncols")


# ---------------------------------------------------------------------------
# GRASS ASCII Grid (frmts/aaigrid GRASSASCIIDataset)


def read_grassascii(text: str):
    """north:/south:/east:/west:/rows:/cols: header then values;
    gt = (west, (east-west)/cols, 0, north, 0, -(north-south)/rows).
    Returns (pixels float64, gt, nodata)."""
    lines = text.splitlines()
    hdr = {}
    i = 0
    for i, line in enumerate(lines):
        if ":" not in line:
            break
        k, _, v = line.partition(":")
        k = k.strip().lower()
        if k in ("north", "south", "east", "west", "rows", "cols",
                 "type", "null"):
            hdr[k] = v.strip()
        else:
            break
    rows = int(hdr["rows"])
    cols = int(hdr["cols"])
    north, south = float(hdr["north"]), float(hdr["south"])
    east, west = float(hdr["east"]), float(hdr["west"])
    nodata = float(hdr["null"]) if "null" in hdr else -9999.0
    vals = np.fromstring(" ".join(lines[i:]), sep=" ") \
        if False else np.array(" ".join(lines[i:]).split(), np.float64)
    px = vals[:rows * cols].reshape(rows, cols)
    gt = (west, (east - west) / cols, 0.0, north, 0.0,
          -(north - south) / rows)
    return px, gt, nodata


# ---------------------------------------------------------------------------
# ISG geoid grids (frmts/aaigrid ISGDataset::ParseHeader,
# aaigriddataset.cpp:775-1033)


def _isg_dms(s: str) -> float:
    m = re.match(r"\s*(-?)(\d+)\xb0(\d+)'(\d+(?:\.\d+)?)\"", s.strip())
    if not m:
        return float(s)
    sign = -1.0 if m.group(1) == "-" else 1.0
    return sign * (int(m.group(2)) + int(m.group(3)) / 60.0
                   + float(m.group(4)) / 3600.0)


def read_isg(text: str, skip_check: bool = False):
    """Returns (pixels float64, gt, nodata, approx_warning: bool).
    Reproduces the reference's rounding auto-correction (TryRoundTo)
    and the 0.005-relative approx fallback; inconsistent georef
    raises unless skip_check (ISG_SKIP_GEOREF_CONSISTENCY_CHECK)."""
    lines = text.splitlines()
    head = {}
    data_start = 0
    in_head = False
    for i, line in enumerate(lines):
        if line.startswith("begin_of_head"):
            in_head = True
            continue
        if line.startswith("end_of_head"):
            data_start = i + 1
            break
        if in_head:
            for sep in (":", "="):
                if sep in line:
                    k, _, v = line.partition(sep)
                    head[k.strip()] = v.strip()
                    break
    ver = float(head.get("ISG format", "0") or 0)
    units = head.get("coord units", "")
    conv = _isg_dms if units == "dms" else float
    lat_min = conv(head["lat min"])
    lat_max = conv(head["lat max"])
    lon_min = conv(head["lon min"])
    lon_max = conv(head["lon max"])
    dlat = conv(head["delta lat"])
    dlon = conv(head["delta lon"])
    nrows = int(head["nrows"])
    ncols = int(head["ncols"])
    nodata = float(head.get("nodata", "-9999"))
    if ver >= 2.0:
        lat_min -= dlat / 2
        lat_max += dlat / 2
        lon_min -= dlon / 2
        lon_max += dlon / 2

    def try_round(delta, rounded, vmin, vmax, nvals, tol):
        mn, mx, d = vmin, vmax, delta
        if rounded != delta and \
           abs(abs(vmin / rounded) - (math.floor(abs(vmin / rounded)) + 0.5)) < tol and \
           abs(abs(vmax / rounded) - (math.floor(abs(vmax / rounded)) + 0.5)) < tol:
            v = (math.floor(abs(vmin / rounded)) + 0.5) * rounded
            mn = -v if vmin < 0 else v
            v = (math.floor(abs(vmax / rounded)) + 0.5) * rounded
            mx = -v if vmax < 0 else v
            d = rounded
        elif rounded != delta and \
                abs(abs(vmin / rounded) - math.floor(abs(vmin / rounded) + 0.5)) < tol and \
                abs(abs(vmax / rounded) - math.floor(abs(vmax / rounded) + 0.5)) < tol:
            v = math.floor(abs(vmin / rounded) + 0.5) * rounded
            mn = -v if vmin < 0 else v
            v = math.floor(abs(vmax / rounded) + 0.5) * rounded
            mx = -v if vmax < 0 else v
            d = rounded
        if abs(mn + d * nvals - mx) < tol * d:
            return True, d, mn, mx
        return False, delta, vmin, vmax

    def rounded_of(s, delta):
        if s == "0.0167" or (delta < 1 and
                             abs(1. / delta - math.floor(1. / delta + 0.5))
                             < 0.06):
            return 1. / math.floor(1. / delta + 0.5)
        return delta

    r_dlon = rounded_of(head["delta lon"], dlon)
    r_dlat = rounded_of(head["delta lat"], dlat)
    ok1, dlon2, lon_min2, lon_max2 = try_round(dlon, r_dlon, lon_min,
                                               lon_max, ncols, 1e-2)
    ok2, dlat2, lat_min2, lat_max2 = try_round(dlat, r_dlat, lat_min,
                                               lat_max, nrows, 1e-2)
    warn = False
    if ok1 and ok2:
        dlon, lon_min, lon_max = dlon2, lon_min2, lon_max2
        dlat, lat_min, lat_max = dlat2, lat_min2, lat_max2
    elif head.get("delta lon") == "0.0167" and \
            head.get("delta lat") == "0.0167" and \
            (lambda a, b: a[0] and b[0])(
                try_round(dlon, 0.016667, lon_min, lon_max, ncols, 1e-1),
                try_round(dlat, 0.016667, lat_min, lat_max, nrows, 1e-1)):
        _, dlon, lon_min, lon_max = try_round(dlon, 0.016667, lon_min,
                                              lon_max, ncols, 1e-1)
        _, dlat, lat_min, lat_max = try_round(dlat, 0.016667, lat_min,
                                              lat_max, nrows, 1e-1)
    else:
        approx = (abs((lon_max - lon_min) / ncols - dlon) < 0.005 * dlon and
                  abs((lat_max - lat_min) / nrows - dlat) < 0.005 * dlat)
        if approx or skip_check:
            warn = True
            dlon = (lon_max - lon_min) / ncols
            dlat = (lat_max - lat_min) / nrows
        else:
            raise ValueError(
                "ISG: inconsistent extent/resolution/raster dimension "
                "(set skip_check=True to mirror "
                "ISG_SKIP_GEOREF_CONSISTENCY_CHECK)")
    gt = (lon_min, dlon, 0.0, lat_max, 0.0, -dlat)
    vals = np.array(" ".join(lines[data_start:]).split(), np.float64)
    px = vals[:nrows * ncols].reshape(nrows, ncols) \
        if len(vals) >= nrows * ncols else \
        np.pad(vals, (0, nrows * ncols - len(vals)),
               constant_values=nodata).reshape(nrows, ncols)
    return px, gt, nodata, warn


# ---------------------------------------------------------------------------
# NADCON LOS/LAS grid shift (frmts/raw/loslasdataset.cpp)


def read_loslas(data: bytes):
    """Header: int32 nx/ny at 64, floats min_lon/delta_lon/min_lat/
    delta_lat at 76; rows stored south-first, record length nx*4+4.
    Returns (pixels float32 north-up, gt)."""
    nx, ny = struct.unpack_from("<2i", data, 64)
    min_lon, delta_lon, min_lat, delta_lat = struct.unpack_from("<4f", data, 76)
    rec = nx * 4 + 4
    px = np.empty((ny, nx), np.float32)
    for i in range(ny):
        # row i from top reads record ny-i (southernmost record first)
        off = (ny - i) * rec + 4
        px[i] = np.frombuffer(data, "<f4", nx, off)
    gt = (min_lon - delta_lon * 0.5, float(delta_lon), 0.0,
          min_lat + (ny - 0.5) * delta_lat, 0.0, -1.0 * float(delta_lat))
    return px, gt
