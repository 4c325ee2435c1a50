"""BMP raster driver (reference frmts/bmp/bmpdataset.cpp).

Read: BITMAPFILEHEADER + BITMAPINFOHEADER (also the 12-byte
BITMAPCOREHEADER and the V4/V5 108/124-byte extensions), bit depths
1/4/8 (paletted -> one index band + color table, GDAL's band model),
24/32-bit BGR(A) -> R,G,B(,A) bands, RLE8/RLE4 decompression,
bottom-up and top-down (negative height) row order, 4-byte row pads.

Write: 8-bit gray/paletted and 24-bit RGB, bottom-up, padded rows.

Conformance: the reference's own autotest/gcore/bmp_read.py checksums
(1bit 200 / 4bit_pal 2587 / 8bit_pal 4672 / byte_rle8 4672 /
red_rgb_1x1 band1 3) in tests/test_bmp.py.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_bmp(data: bytes) -> bool:
    return data[:2] == b"BM" and len(data) > 54


def decode_bmp(data: bytes):
    """-> (pixels, palette | None): paletted/gray files give (h, w)
    uint8 indices + (n, 3) RGB palette; 24/32-bit give (h, w, 3|4)
    uint8 in R,G,B(,A) order, palette None."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", data, 10)[0]
    hsize = struct.unpack_from("<I", data, 14)[0]
    if hsize == 12:  # BITMAPCOREHEADER
        w, h = struct.unpack_from("<HH", data, 18)
        planes, bits = struct.unpack_from("<HH", data, 22)
        comp, clr_used, pal_entry = 0, 0, 3
        top_down = False
    else:
        w, h = struct.unpack_from("<ii", data, 18)
        planes, bits = struct.unpack_from("<HH", data, 26)
        comp = struct.unpack_from("<I", data, 30)[0]
        clr_used = struct.unpack_from("<I", data, 46)[0]
        pal_entry = 4
        top_down = h < 0
        h = abs(h)
    if comp == 3:  # BITFIELDS: only the canonical 32-bit BGRA masks
        comp = 0
    if comp not in (0, 1, 2):
        raise NotImplementedError(f"BMP compression {comp}")

    palette = None
    if bits <= 8:
        n_pal = clr_used or (1 << bits)
        pal_off = 14 + hsize
        raw = np.frombuffer(data, np.uint8, count=n_pal * pal_entry,
                            offset=pal_off).reshape(n_pal, pal_entry)
        palette = raw[:, [2, 1, 0]].copy()  # BGR(A) -> RGB

    if comp in (1, 2):
        idx = _decode_rle(data[data_off:], w, h, rle4=(comp == 2))
    else:
        row_bytes = (w * bits + 7) // 8
        stride = (row_bytes + 3) & ~3
        rows = np.frombuffer(data, np.uint8, count=stride * h,
                             offset=data_off).reshape(h, stride)
        if bits == 1:
            idx = np.unpackbits(rows[:, :row_bytes], axis=1)[:, :w]
        elif bits == 4:
            hi = rows[:, :row_bytes] >> 4
            lo = rows[:, :row_bytes] & 0x0F
            idx = np.stack([hi, lo], axis=2).reshape(h, -1)[:, :w]
        elif bits == 8:
            idx = rows[:, :w]
        elif bits in (24, 32):
            nb = bits // 8
            px = rows[:, :w * nb].reshape(h, w, nb)
            order = [2, 1, 0] if nb == 3 else [2, 1, 0, 3]
            px = px[:, :, order]
            if not top_down:
                px = px[::-1]
            return np.ascontiguousarray(px), None
        else:
            raise NotImplementedError(f"BMP bit depth {bits}")
    if not top_down:
        idx = idx[::-1]
    return np.ascontiguousarray(idx), palette


def _decode_rle(buf: bytes, w: int, h: int, rle4: bool) -> np.ndarray:
    """RLE8/RLE4 (frmts/bmp/bmpdataset.cpp RLE loops): (n, v) runs,
    escapes 0=EOL 1=EOB 2=delta, else absolute mode padded to words.
    Rows come bottom-up like the uncompressed layout."""
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(buf)
    while i + 1 < n:
        cnt = buf[i]
        val = buf[i + 1]
        i += 2
        if cnt > 0:
            if rle4:
                pair = [(val >> 4) & 0xF, val & 0xF]
                for k in range(cnt):
                    if x < w and y < h:
                        out[y, x] = pair[k & 1]
                    x += 1
            else:
                end = min(x + cnt, w)
                if y < h and x < w:
                    out[y, x:end] = val
                x += cnt
        elif val == 0:      # end of line
            x = 0
            y += 1
        elif val == 1:      # end of bitmap
            break
        elif val == 2:      # delta
            x += buf[i]
            y += buf[i + 1]
            i += 2
        else:               # absolute mode
            m = val
            if rle4:
                nbytes = (m + 1) // 2
                vals = []
                for k in range(nbytes):
                    b = buf[i + k]
                    vals += [(b >> 4) & 0xF, b & 0xF]
                for k in range(m):
                    if x < w and y < h:
                        out[y, x] = vals[k]
                    x += 1
                i += (nbytes + 1) & ~1
            else:
                end = min(x + m, w)
                if y < h and x < w:
                    arr = np.frombuffer(buf, np.uint8, count=m, offset=i)
                    out[y, x:end] = arr[:end - x]
                x += m
                i += (m + 1) & ~1
    return out  # rows in stored (bottom-up) order; caller flips


def encode_bmp(px: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """8-bit (gray or paletted) and 24-bit RGB BMP writer, bottom-up."""
    px = np.asarray(px)
    h, w = px.shape[:2]
    if px.ndim == 2:
        pal = palette if palette is not None else \
            np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        n_pal = len(pal)
        stride = (w + 3) & ~3
        body = np.zeros((h, stride), np.uint8)
        body[:, :w] = px[::-1]
        pal4 = np.zeros((n_pal, 4), np.uint8)
        pal4[:, :3] = pal[:, [2, 1, 0]]  # RGB -> BGR
        data_off = 14 + 40 + n_pal * 4
        bits, pal_bytes = 8, pal4.tobytes()
    elif px.shape[2] == 3:
        stride = (w * 3 + 3) & ~3
        body = np.zeros((h, stride), np.uint8)
        body[:, :w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, -1)
        data_off = 14 + 40
        bits, pal_bytes, n_pal = 24, b"", 0
    else:
        raise NotImplementedError("BMP writer: 1-band uint8 or RGB only")
    raw = body.tobytes()
    filehdr = struct.pack("<2sIHHI", b"BM", data_off + len(raw), 0, 0,
                          data_off)
    infohdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, len(raw),
                          2835, 2835, n_pal, 0)
    return filehdr + infohdr + pal_bytes + raw
