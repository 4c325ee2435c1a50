"""Minimal spec-compliant PNG codec (pure numpy + zlib).

Stands in for GDAL's PNG driver (reference frmts/png/) since no image
library (PIL/OpenCV) exists in this environment. Supports what the
engine needs:

- bit depth 8 and 16 (big-endian per spec), color types 0 (gray),
  2 (RGB), 4 (gray+alpha), 6 (RGBA),
- decode of all five scanline filters (None/Sub/Up/Average/Paeth);
  Sub/Up are vectorized, Average/Paeth fall back to a per-byte loop
  (our encoder always writes filter 0, so the hot decode path is the
  vectorized one),
- deterministic encode: filter 0, fixed zlib level, no ancillary
  chunks, no timestamps -> byte-identical re-runs (required for
  checkpoint-resume idempotence, SURVEY.md §7.4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode (h, w) or (h, w, c) uint8/uint16 array to PNG bytes."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    try:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    except KeyError:
        raise ValueError(f"unsupported channel count {c}")
    if pixels.dtype == np.uint8:
        depth = 8
        raw = pixels
    elif pixels.dtype == np.uint16:
        depth = 16
        raw = pixels.byteswap() if pixels.dtype.byteorder in ("<", "=") else pixels
    else:
        raise ValueError(f"unsupported dtype {pixels.dtype}")
    body = np.ascontiguousarray(raw).view(np.uint8).reshape(h, -1)
    # filter byte 0 (None) per scanline
    scan = np.zeros((h, body.shape[1] + 1), dtype=np.uint8)
    scan[:, 1:] = body
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    idat = zlib.compress(scan.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (h, w) or (h, w, c) uint8/uint16 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = depth = color_type = None
    idat = bytearray()
    plte = trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ValueError("unsupported PNG variant (compression/filter)")
            if color_type == 3:
                if depth not in (1, 2, 4, 8):
                    raise ValueError(f"unsupported palette depth {depth}")
            elif depth not in (8, 16) or \
                    color_type not in _COLOR_TYPE_CHANNELS:
                raise ValueError(f"unsupported depth/color {depth}/{color_type}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = _COLOR_TYPE_CHANNELS[color_type]
    bpp = max(1, channels * depth // 8)  # filter step in bytes
    raw = zlib.decompress(bytes(idat))
    if color_type == 3:
        # paletted: unfilter sub-byte-packed index rows, expand via
        # PLTE (+ tRNS alpha) like the reference's color-table path
        stride = (width * depth + 7) // 8
        out = _unfilter(raw, height, stride, 1)
        if depth == 8:
            idxs = out
        else:
            bits = np.unpackbits(out.reshape(height, stride), axis=1)
            grouped = bits.reshape(height, -1, depth)[:, :width, :]
            idxs = np.zeros((height, width), np.uint8)
            for b in range(depth):
                idxs = (idxs << 1) | grouped[:, :, b]
        idxs = idxs.reshape(height, width)
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            table = np.concatenate([plte, alpha[:, None]], axis=1)
        else:
            table = plte
        return table[idxs]
    if interlace == 0:
        stride = width * bpp
        if len(raw) != height * (stride + 1):
            raise ValueError("bad PNG payload size")
        out = _unfilter(raw, height, stride, bpp)
    else:
        # Adam7 (PNG spec 8.2): seven sub-images, each filtered
        # independently, scattered onto the (x_start, y_start,
        # x_step, y_step) grids
        out = np.empty((height, width * bpp), dtype=np.uint8)
        full = out.reshape(height, width, bpp)
        pos2 = 0
        for (x0, y0, dx, dy) in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                                 (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                                 (0, 1, 1, 2)):
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sp = wp * bpp
            sub = _unfilter(raw[pos2:pos2 + hp * (sp + 1)], hp, sp, bpp)
            pos2 += hp * (sp + 1)
            full[y0::dy, x0::dx] = sub.reshape(hp, wp, bpp)
    if depth == 8:
        arr = out.reshape(height, width, channels)
    else:
        arr = out.view(">u2").astype(np.uint16).reshape(height, width, channels)
    if channels == 1:
        return arr[:, :, 0]
    return arr


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters over one sub-image."""
    rows = np.frombuffer(raw, dtype=np.uint8,
                         count=height * (stride + 1)).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        line = rows[y, 1:].copy()
        if f == 0:
            rec = line
        elif f == 1:  # Sub — vectorized cumulative sum per byte lane
            lanes = line.reshape(-1, bpp).astype(np.uint64)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = rec
        prev = out[y]
    return out
