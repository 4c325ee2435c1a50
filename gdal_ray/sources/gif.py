"""GIF raster driver (reference frmts/gif/gifdataset.cpp, which wraps
vendored giflib): GIF87a/89a read (global/local color tables, LZW
decompression, interlace passes, extension-block skip incl. the 89a
graphic-control transparency index -> nodata) and a GIF89a writer
(LZW with dictionary reset at 4096, no interlace).

Conformance (reference autotest/gdrivers/gif.py): bug407.gif band-1
checksum 57921 with the pinned 16-entry colormap; byte.tif CreateCopy
round-trip checksum 4672 — tests/test_gif.py.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def gif_info(data: bytes) -> dict:
    """Header-level open: screen/image dims + driver selection
    (reference routes width*height > 100e6 to the lazy BIGGIF driver
    — biggifdataset.cpp — which opens without decoding any pixels,
    e.g. fakebig.gif's claimed 32767x32767 frame)."""
    if not sniff_gif(data):
        raise ValueError("not a GIF file")
    sw, sh, flags = struct.unpack_from("<HHB", data, 6)
    pos = 13
    if flags & 0x80:
        pos += (2 << (flags & 7)) * 3
    w, h = sw, sh
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x21:
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b == 0x2C:
            _, _, w, h, _ = struct.unpack_from("<HHHHB", data, pos)
            break
        break
    return {"width": int(w), "height": int(h),
            "driver": "BIGGIF" if w * h > 100_000_000 else "GIF"}


def decode_gif(data: bytes):
    """First image frame -> (indices (h, w) uint8, palette (n, 3)
    uint8, meta dict with 'background' and optional 'transparent')."""
    if not sniff_gif(data):
        raise ValueError("not a GIF file")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3).copy()
        pos += n * 3
    meta = {"background": int(bg)}
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = data[pos]
                gc_flags = data[pos + 1]
                if gc_flags & 1:
                    meta["transparent"] = int(data[pos + 4])
                pos += 1 + sz
            while data[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
        _ix, _iy, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data, np.uint8, count=n * 3,
                                offset=pos).reshape(n, 3).copy()
            pos += n * 3
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        img = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: giflib 4-pass row order
            out = np.empty_like(img)
            rows = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                   np.arange(2, h, 4), np.arange(1, h, 2)])
            out[rows] = img
            img = out
        if pal is None:
            pal = np.zeros((2, 3), np.uint8)
        return img, pal, meta
    raise ValueError("GIF: no image block")


def _lzw_decode(buf: bytes, min_code: int, npix: int) -> np.ndarray:
    """GIF LZW: variable code width starting min_code+1, CLEAR resets
    the table, codes emit stored byte strings."""
    clear = 1 << min_code
    eoi = clear + 1
    bits = np.unpackbits(np.frombuffer(buf, np.uint8)[:, None],
                         axis=1, bitorder="little").ravel()
    out = np.empty(npix, np.uint8)
    no = 0
    # dictionary as (prefix_code, last_byte); roots are implicit
    prefix = np.zeros(4096, np.int32)
    last = np.zeros(4096, np.uint8)
    first_byte = np.zeros(4096, np.uint8)

    def reset():
        return clear + 2, min_code + 1

    next_code, width = reset()
    bp = 0
    prev = -1
    nbits = len(bits)
    scratch = np.empty(4096, np.uint8)
    while no < npix and bp + width <= nbits:
        code = 0
        for k in range(width):
            code |= int(bits[bp + k]) << k
        bp += width
        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            break
        if code < clear:
            entry_first = code
            ln = 1
            scratch[0] = code
        elif code < next_code:
            # walk the chain into scratch (reversed)
            ln = 0
            c = code
            while c >= clear + 2:
                scratch[ln] = last[c]
                c = prefix[c]
                ln += 1
            scratch[ln] = c
            ln += 1
            scratch[:ln] = scratch[:ln][::-1]
            entry_first = int(scratch[0])
        else:
            # KwKwK case: prev string + its first byte
            ln = 0
            c = prev
            while c >= clear + 2:
                scratch[ln] = last[c]
                c = prefix[c]
                ln += 1
            scratch[ln] = c
            ln += 1
            scratch[:ln] = scratch[:ln][::-1]
            scratch[ln] = first_byte[prev] if prev >= clear + 2 else prev
            ln += 1
            entry_first = int(scratch[0])
        take = min(ln, npix - no)
        out[no:no + take] = scratch[:take]
        no += take
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = entry_first
            first_byte[next_code] = (first_byte[prev]
                                     if prev >= clear + 2 else prev)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 indices + (n, 3) palette -> GIF89a bytes."""
    idx = np.ascontiguousarray(idx, np.uint8)
    h, w = idx.shape
    pal = np.asarray(palette, np.uint8)
    pbits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    n_pal = 1 << pbits
    pal_full = np.zeros((n_pal, 3), np.uint8)
    pal_full[:len(pal)] = pal[:n_pal]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pbits - 1) & 7), 0, 0)
    out += pal_full.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = max(2, pbits)
    out.append(min_code)
    out += _lzw_encode(idx.ravel(), min_code)
    out.append(0x3B)
    return bytes(out)


def _lzw_encode(seq: np.ndarray, min_code: int) -> bytes:
    """giflib egif_lib.c flow: emit code, THEN post-write width check
    (RunningCode >= MaxCode1 -> RunningBits++), reset at 4095; the
    new entry is inserted after the emit/reset."""
    clear = 1 << min_code
    eoi = clear + 1
    codes: list[tuple[int, int]] = []   # (code, width)
    width = min_code + 1
    table: dict[tuple[int, int], int] = {}
    next_code = clear + 2

    def emit(code: int):
        nonlocal width
        codes.append((code, width))
        if next_code >= (1 << width) and width < 12:
            width += 1

    emit(clear)
    prev = int(seq[0])
    for v in seq[1:]:
        v = int(v)
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        emit(prev)
        if next_code >= 4095:   # LZ_MAX_CODE: clear + reset, NO insert
            emit(clear)
            table.clear()
            width = min_code + 1
            next_code = clear + 2
        else:
            table[key] = next_code
            next_code += 1
        prev = v
    emit(prev)
    emit(eoi)
    # pack LSB-first into sub-blocks
    bits = bytearray()
    acc = nacc = 0
    for code, wd in codes:
        acc |= code << nacc
        nacc += wd
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        bits.append(acc & 0xFF)
    out = bytearray()
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)
