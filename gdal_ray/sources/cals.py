"""CALS type-1 raster driver (the reference's frmts/cals).

MIL-STD-1840/MIL-R-28002A type-1: a 2048-byte space-padded text header
of 128-byte records (srcdocid/dstdocid/txtfilid/figid/srcgph/doccls/
rtype: 1/rorient/rpelcnt/rdensty/notes) followed by a raw CCITT Group
4 (T.6) codestream (calsdataset.cpp:237-330, 506-580).

Pixel polarity follows the reference's CALSWrapperSrcBand
(calsdataset.cpp:128-150): on write the source values are INVERTED
unless the source carries the white-first color table
((255,255,255),(0,0,0)); on read the band exposes the raw T.6 bits
(1 = black) with that white-first color table attached, so a
CALS->CALS copy round-trips bit-exactly while a plain 1-bit source
inverts once (autotest cals.py: small1bit 9907, oddsize1bit 3883).
"""
from __future__ import annotations

import re

import numpy as np

from ..functions.ccittg4 import decode_g4, encode_g4

CALS_WHITE_FIRST_CT = ((255, 255, 255), (0, 0, 0))


def read_cals(data: bytes) -> dict:
    header = data[:2048].decode("ascii", "replace")
    if "rtype: 1" not in header:
        raise ValueError("not a CALS type-1 file")
    m = re.search(r"rpelcnt:\s*(\d+)\s*,\s*(\d+)", header)
    if not m:
        raise ValueError("CALS: missing rpelcnt")
    w, h = int(m.group(1)), int(m.group(2))
    out: dict = {}
    m = re.search(r"rorient:\s*(-?\d+)\s*,\s*(-?\d+)", header)
    if m:
        a1, a2 = int(m.group(1)), int(m.group(2))
        if a1 != 0 or a2 != 270:
            out["pixel_path"] = a1
            out["line_progression"] = a2
    m = re.search(r"rdensty:\s*(\d+)", header)
    if m and int(m.group(1)):
        out["density"] = int(m.group(1))
    out["pixels"] = decode_g4(data[2048:], w, h)
    out["color_table"] = CALS_WHITE_FIRST_CT
    return out


def write_cals(img: np.ndarray, color_table=None, density: int = 200,
               pixel_path: int | None = None,
               line_progression: int | None = None) -> bytes:
    """0/1 (or 0/255) single-band image -> CALS bytes. Values invert
    unless color_table is the white-first CALS table."""
    if img.ndim != 2:
        raise ValueError("CALS supports a single 1-bit band")
    if img.shape[1] > 999999 or img.shape[0] > 999999:
        raise ValueError("CALS dimensions are limited to 999999")
    bits = (np.asarray(img) != 0).astype(np.uint8)
    if color_table != CALS_WHITE_FIRST_CT:
        bits = 1 - bits
    a1 = pixel_path if pixel_path is not None else 0
    a2 = line_progression if line_progression is not None else 270
    hdr = bytearray(b" " * 2048)
    fields = ["srcdocid: NONE", "dstdocid: NONE", "txtfilid: NONE",
              "figid: NONE", "srcgph: NONE", "doccls: NONE",
              "rtype: 1",
              "rorient: %03d,%03d" % (a1, a2),
              "rpelcnt: %06d,%06d" % (img.shape[1], img.shape[0]),
              "rdensty: %04d" % density,
              "notes: NONE"]
    for i, f in enumerate(fields):
        hdr[128 * i:128 * i + len(f)] = f.encode("ascii")
    return bytes(hdr) + encode_g4(bits)
