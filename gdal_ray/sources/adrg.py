"""ADRG (ARC Digitized Raster Graphics) reader (reference
frmts/adrg/adrgdataset.cpp) on the engine's ISO 8211 parser.

The ``.GEN`` file is ISO 8211: the image record carries GEN
(ZNA zone, ARV/BRV arc resolutions, LSO/PSO origin as +DDDMMSS.SS
strings) and SPR (NFL/NFC tile grid, PNC/PNL=128, BAD image file
name, TIF tile-index flag) fields, optionally a TIM tile index of
5-char ints.  The ``.IMG`` payload starts after its own 8211 header
(scan for the 0x1E+"IMG" marker then skip the padding, matching the
reference's offset walk); tiles are 128x128x3 band-sequential bytes,
zero-filled where the tile index is 0.  Geotransform per ZNA
(adrgdataset.cpp:758-806): zone 9/18 use the polar azimuthal
equidistant formulas with 111319.4907933 m/deg and 40075016.68558/ARV
pixels, other zones the geographic (LSO, 360/ARV, PSO, -360/BRV)."""

from __future__ import annotations

import math
import os

import numpy as np

from .s57 import Iso8211File


def _lon_from_string(s: str) -> float:
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:4]) + float(s[4:6]) / 60
                   + float(s[6:11]) / 3600)


def _lat_from_string(s: str) -> float:
    sign = 1 if s[0] == "+" else -1
    return sign * (float(s[1:3]) + float(s[3:5]) / 60
                   + float(s[5:10]) / 3600)


def read_adrg(gen_path: str, img_path: str | None = None):
    """-> (pixels uint8 [h,w,3], gt, meta)."""
    with open(gen_path, "rb") as f:
        iso = Iso8211File(f.read())

    gen = spr = tim_raw = None
    for rec in iso.records:
        if "GEN" in rec and "SPR" in rec:
            g = rec["GEN"][0]
            s = rec["SPR"][0]
            if isinstance(g, dict) and isinstance(s, dict) and \
                    g.get("ARV"):
                gen, spr = g, s
                if "TIM" in rec:
                    tim_raw = rec["TIM"][0]
                break
    if gen is None:
        raise ValueError("no image record in GEN file")

    zna = int(gen.get("ZNA", 0))
    arv = int(gen["ARV"])
    brv = int(gen.get("BRV", 0) or 0)
    lso = _lon_from_string(str(gen["LSO"]))
    pso = _lat_from_string(str(gen["PSO"]))
    nfl = int(spr["NFL"])
    nfc = int(spr["NFC"])
    bad = str(spr["BAD"]).strip()
    tif = str(spr.get("TIF", "N")).startswith("Y")

    tile_index = None
    if tif and tim_raw is not None:
        if isinstance(tim_raw, list):
            vals = []
            for grp in tim_raw:
                vals.extend(int(v) for v in grp.values())
            tile_index = vals
        elif isinstance(tim_raw, (bytes, bytearray)):
            txt = bytes(tim_raw).rstrip(b"\x1e").decode("ascii", "replace")
            tile_index = [int(txt[i:i + 5]) for i in
                          range(0, 5 * nfl * nfc, 5)]

    if img_path is None:
        img_path = os.path.join(os.path.dirname(gen_path), bad)
        if not os.path.exists(img_path):
            cands = [f for f in os.listdir(os.path.dirname(gen_path))
                     if f.lower() == bad.lower()]
            if cands:
                img_path = os.path.join(os.path.dirname(gen_path), cands[0])
    with open(img_path, "rb") as f:
        img = f.read()

    # skip the IMG file's 8211 header (adrgdataset.cpp:679-731)
    offset = 0
    i = 0
    n = len(img)
    while i < n:
        if img[i] == 30 and img[i + 1:i + 4] == b"IMG":
            offset = i + 1 + 3 + 4
            j = i + 1 + 3 + 4
            while j < n and img[j] == 0x20:
                offset += 1
                j += 1
            offset += 1
            break
        i += 1

    h = nfl * 128
    w = nfc * 128
    out = np.zeros((h, w, 3), np.uint8)
    tile_bytes = 128 * 128
    for block in range(nfl * nfc):
        if tile_index is not None:
            t = tile_index[block]
            if t <= 0:
                continue
            base = offset + (t - 1) * tile_bytes * 3
        else:
            base = offset + block * tile_bytes * 3
        by, bx = divmod(block, nfc)
        for b in range(3):
            start = base + b * tile_bytes
            tile = np.frombuffer(img, np.uint8, tile_bytes, start)
            out[by * 128:(by + 1) * 128, bx * 128:(bx + 1) * 128, b] = \
                tile.reshape(128, 128)

    if zna == 9:  # north polar
        gt = (111319.4907933 * (90.0 - pso) * math.sin(math.radians(lso)),
              40075016.68558 / arv, 0.0,
              -111319.4907933 * (90.0 - pso) * math.cos(math.radians(lso)),
              0.0, -40075016.68558 / arv)
    elif zna == 18:  # south polar
        gt = (111319.4907933 * (90.0 + pso) * math.sin(math.radians(lso)),
              40075016.68558 / arv, 0.0,
              111319.4907933 * (90.0 + pso) * math.cos(math.radians(lso)),
              0.0, -40075016.68558 / arv)
    else:
        gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
    meta = {"zna": zna, "arv": arv, "brv": brv, "bad": bad}
    return out, gt, meta
