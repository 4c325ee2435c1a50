"""Northwood/VerticalMapper GRD (surface) + GRC (classified) grids.

Reference: frmts/northwood (northwood.cpp nwt_ParseHeader /
nwt_LoadColors / createIP / linearColor, grddataset.cpp,
grcdataset.cpp). 1024-byte header: format byte at 4 ('1' grid, '8'
classified), 16-bit LE sizes at 9/11 (32-bit fallbacks at 128/132),
bounds doubles at 13..44, z-range floats at 45..60, color inflections
at 516+, bits-per-pixel selector at 1023. GRD exposes 4 bands: RGB
from a 4096-entry inflection color ramp indexed by raw>>4, and the Z
band with value = zmin + (raw-1)*(zmax-zmin)/65534, raw 0 = nodata
-1e37. GRC is a single band of class indices with a dictionary +
color table appended after the pixel data.
"""
from __future__ import annotations

import struct

import numpy as np

NODATA = -1.0e37
SCALE16 = 65534.0


def _parse_header(h: bytes) -> dict:
    g: dict = {}
    g["classified"] = h[4:5] == b"8"
    xs = struct.unpack("<H", h[9:11])[0]
    if xs == 0:
        xs = struct.unpack("<I", h[128:132])[0]
    ys = struct.unpack("<H", h[11:13])[0]
    if ys == 0:
        ys = struct.unpack("<I", h[132:136])[0]
    g["nx"], g["ny"] = xs, ys
    (g["minx"], g["maxx"], g["miny"], g["maxy"]) = struct.unpack(
        "<dddd", h[13:45])
    (g["zmin"], g["zmax"], g["zminscale"], g["zmaxscale"]) = \
        struct.unpack("<ffff", h[45:61])
    g["description"] = h[61:93].split(b"\x00")[0].decode(
        "latin-1", "replace")
    g["zunits_name"] = h[93:125].split(b"\x00")[0].decode(
        "latin-1", "replace")
    g["coordsys"] = h[256:512].split(b"\x00")[0].decode(
        "latin-1", "replace")
    n_infl = struct.unpack("<H", h[516:518])[0]
    infl = []
    for i in range(min(n_infl, 32)):
        z = struct.unpack("<f", h[518 + 7 * i:522 + 7 * i])[0]
        infl.append((z, h[522 + 7 * i], h[523 + 7 * i],
                     h[524 + 7 * i]))
    g["inflections"] = infl
    sel = h[1023]
    if g["classified"]:
        g["bits"] = 16 if sel == 0 else sel * 4
    else:
        g["bits"] = sel * 8
    g["step"] = (g["maxx"] - g["minx"]) / (xs - 1) if xs > 1 else 1.0
    return g


def _create_ip(index, r, g, b, cmap, wm):
    """northwood.cpp createIP: fill the ramp linearly up to index."""
    if index == 0:
        cmap[0] = (r, g, b)
        return 0
    if index <= wm:
        return wm
    r0, g0, b0 = cmap[wm]
    span = index - wm
    for i in range(wm + 1, index):
        t = i - wm
        cmap[i] = (int(r0 + t * (r - r0) / span + 0.5),
                   int(g0 + t * (g - g0) / span + 0.5),
                   int(b0 + t * (b - b0) / span + 0.5))
    cmap[index] = (r, g, b)
    return index


def _linear_color(lo, hi, mid):
    zl, rl, gl, bl = lo
    zh, rh, gh, bh = hi
    if mid < zl:
        return rl, gl, bl
    if mid > zh:
        return rh, gh, bh
    s = (mid - zl) / (zh - zl)
    return (int(s * (rh - rl) + rl + 0.5), int(s * (gh - gl) + gl + 0.5),
            int(s * (bh - bl) + bl + 0.5))


def _load_colors(g: dict, map_size: int = 4096) -> np.ndarray:
    cmap = [(0, 0, 0)] * map_size
    wm = _create_ip(0, 255, 255, 255, cmap, 0)
    infl = g["inflections"]
    if not infl:
        return np.array(cmap, np.uint8)
    zmin, zmax = g["zmin"], g["zmax"]
    if zmin <= infl[0][0]:
        wm = _create_ip(1, infl[0][1], infl[0][2], infl[0][3], cmap, wm)
    i = 1
    while i < len(infl):
        if zmin < infl[i][0]:
            r, gg, b = _linear_color(infl[i - 1], infl[i], zmin)
            wm = _create_ip(1, r, gg, b, cmap, wm)
            break
        i += 1
    if i >= len(infl):
        last = infl[-1]
        wm = _create_ip(1, last[1], last[2], last[3], cmap, wm)
        _create_ip(map_size - 1, last[1], last[2], last[3], cmap, wm)
    else:
        index = 0
        while i < len(infl):
            if zmax < infl[i][0]:
                r, gg, b = _linear_color(infl[i - 1], infl[i], zmax)
                index = map_size - 1
                wm = _create_ip(index, r, gg, b, cmap, wm)
                break
            index = int(((infl[i][0] - zmin) / (zmax - zmin))
                        * map_size)
            index = min(index, map_size - 1)
            wm = _create_ip(index, infl[i][1], infl[i][2], infl[i][3],
                            cmap, wm)
            i += 1
        if index < map_size - 1:
            last = infl[-1]
            _create_ip(map_size - 1, last[1], last[2], last[3], cmap,
                       wm)
    return np.array(cmap, np.uint8)


def read_grd(data: bytes) -> dict:
    g = _parse_header(data[:1024])
    nx, ny = g["nx"], g["ny"]
    raw = np.frombuffer(data, "<u2", nx * ny, 1024).reshape(ny, nx)
    scale = (g["zmax"] - g["zmin"]) / SCALE16
    z = np.where(raw == 0, NODATA,
                 g["zmin"] + (raw.astype(np.float64) - 1) * scale) \
        .astype(np.float32)
    cmap = _load_colors(g)
    idx = (raw >> 4).astype(np.int32)
    rgb = cmap[idx]  # (ny, nx, 3)
    gt = (g["minx"] - g["step"] / 2, g["step"], 0.0,
          g["maxy"] + g["step"] / 2, 0.0, -g["step"])
    return {"r": rgb[:, :, 0], "g": rgb[:, :, 1], "b": rgb[:, :, 2],
            "z": z, "gt": gt, "nodata": NODATA, "header": g,
            "driver": "NWT_GRD"}


def read_grc(data: bytes) -> dict:
    g = _parse_header(data[:1024])
    nx, ny = g["nx"], g["ny"]
    bpp = g["bits"] // 8
    if bpp == 1:
        px = np.frombuffer(data, np.uint8, nx * ny, 1024) \
            .reshape(ny, nx)
    else:
        px = np.frombuffer(data, "<u2", nx * ny, 1024).reshape(ny, nx)
    # class dictionary follows the pixel block
    pos = 1024 + nx * ny * bpp
    names = []
    palette = None
    if pos + 2 <= len(data):
        nitems = struct.unpack("<H", data[pos:pos + 2])[0]
        pos += 2
        entries = []
        for _ in range(nitems):
            if pos + 9 > len(data):
                break
            pixval = struct.unpack("<H", data[pos:pos + 2])[0]
            r, gg, b = data[pos + 3], data[pos + 4], data[pos + 5]
            uslen = struct.unpack("<H", data[pos + 7:pos + 9])[0]
            name = data[pos + 9:pos + 9 + uslen].split(b"\x00")[0] \
                .decode("latin-1", "replace")
            pos += 9 + uslen
            entries.append((pixval, r, gg, b, name))
        if entries:
            maxv = max(e[0] for e in entries)
            palette = np.zeros((maxv + 1, 3), np.uint8)
            names = [""] * (maxv + 1)
            for pixval, r, gg, b, name in entries:
                palette[pixval] = (r, gg, b)
                names[pixval] = name
    gt = (g["minx"] - g["step"] / 2, g["step"], 0.0,
          g["maxy"] + g["step"] / 2, 0.0, -g["step"])
    out = {"pixels": px, "gt": gt, "header": g, "driver": "NWT_GRC"}
    if palette is not None:
        out["palette"] = palette
        out["class_names"] = names
    return out
