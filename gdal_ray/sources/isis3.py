"""USGS ISIS3 cube reader (reference frmts/pds/isis3dataset.cpp). A
.cub (or detached .lbl + .cub) starts with a PVL label (`Object =
IsisCube`, hash comments, Group/Object nesting — same grammar as the
ODL parser in pdslabel.py): Core StartByte (1-based), Format
BandSequential or Tile (TileSamples x TileLines, tiles row-major then
band-major), Pixels Type/ByteOrder/Base/Multiplier. The ISIS special
NULL pixel per type is exposed as nodata (UnsignedByte 0, SignedWord
-32768, Real -3.4028226550889045e38). Conformed against the
reference's own fixtures (isis3_detached.lbl 9978, isis3_unit_test.cub
42403 — tests/test_planetary2.py)."""

from __future__ import annotations

import os
import re

import numpy as np

from .pdslabel import parse_odl

_TYPES = {
    "unsignedbyte": ("u1", 0.0),
    "signedword": ("i2", -32768.0),
    "unsignedword": ("u2", 0.0),
    "real": ("f4", -3.4028226550889045e38),
    "double": ("f8", -3.4028226550889045e38),
}


def sniff_isis3(data: bytes) -> bool:
    head = data[:256].lstrip()
    return head.startswith(b"Object") and b"IsisCube" in data[:256]


def read_isis3(path: str):
    """-> (pixels, gt | None, info)."""
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)
    if not sniff_isis3(head):
        raise ValueError(f"{path}: not an ISIS3 cube label")
    text = head.decode("latin-1", "replace")
    text = re.sub(r"^\s*#.*$", "", text, flags=re.M)  # hash comments
    lbl = parse_odl(text)
    core = "isiscube.core."
    start = int(float(lbl.get(core + "startbyte", "1"))) - 1
    fmt = lbl.get(core + "format", "BandSequential")
    w = int(lbl[core + "dimensions.samples"])
    h = int(lbl[core + "dimensions.lines"])
    nb = int(lbl.get(core + "dimensions.bands", "1"))
    ptype = lbl.get(core + "pixels.type", "Real").lower()
    if ptype not in _TYPES:
        raise NotImplementedError(f"ISIS3 pixel type {ptype}")
    base_dt, nodata = _TYPES[ptype]
    order = "<" if lbl.get(core + "pixels.byteorder",
                           "Lsb").lower() == "lsb" else ">"
    dt = np.dtype("u1") if base_dt == "u1" else np.dtype(order + base_dt)

    dpath = path
    if core + "^core" in lbl:
        fname = lbl[core + "^core"].strip('"')
        cand = os.path.join(os.path.dirname(path), fname)
        if not os.path.exists(cand):
            low = fname.lower()
            for f in os.listdir(os.path.dirname(path) or "."):
                if f.lower() == low:
                    cand = os.path.join(os.path.dirname(path), f)
                    break
        dpath = cand

    isz = dt.itemsize
    if fmt.lower() == "tile":
        tw = int(lbl[core + "tilesamples"])
        th = int(lbl[core + "tilelines"])
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        need = start + ntx * nty * nb * tw * th * isz
        with open(dpath, "rb") as fh:
            fh.seek(start)
            buf = fh.read(need - start)
        buf = buf + b"\x00" * (need - start - len(buf))
        tiles = np.frombuffer(buf, dt).reshape(nb, nty, ntx, th, tw)
        px = np.zeros((nb, h, w), dt)
        for ty in range(nty):
            for tx in range(ntx):
                ys, xs = ty * th, tx * tw
                ch = min(th, h - ys)
                cw = min(tw, w - xs)
                px[:, ys:ys + ch, xs:xs + cw] = \
                    tiles[:, ty, tx, :ch, :cw]
    else:
        need = start + w * h * nb * isz
        with open(dpath, "rb") as fh:
            fh.seek(start)
            buf = fh.read(need - start)
        buf = buf + b"\x00" * (need - start - len(buf))
        px = np.frombuffer(buf, dt).reshape(nb, h, w)
    px = np.transpose(px, (1, 2, 0)) if nb > 1 else px[0]

    info = {"nodata": nodata,
            "offset": float(lbl.get(core + "pixels.base", "0")),
            "scale": float(lbl.get(core + "pixels.multiplier", "1"))}
    gt = None
    m = "isiscube.mapping."
    if m + "upperleftcornerx" in lbl:
        def fnum(k):
            return float(lbl[k].split("<")[0])

        res = fnum(m + "pixelresolution") if m + "pixelresolution" in lbl \
            else None
        if res:
            gt = (fnum(m + "upperleftcornerx"), res, 0.0,
                  fnum(m + "upperleftcornery"), 0.0, -res)
    return np.ascontiguousarray(px), gt, info
