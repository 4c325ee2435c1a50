"""Raster Matrix Format (Panorama GIS .rsw / .mtw) reader — reference
frmts/rmf/rmfdataset.cpp + rmflzw.cpp. Little-endian header ("RSW\\0"
raster / "MTW\\0" elevation): bit depth at 0x34, height/width, tile
grid (nXTiles x nYTiles, tileWidth/Height, last-tile sizes), color
table and tile table offsets, LLX/LLY + pixel size georef, compression
byte. The tile table holds (offset, size) pairs row-major; offset 0 is
a null tile. 24-bit pixels are BGR (band 1 = byte 2). The LZW variant
is the hashed-table 12-bit coder of rmflzw.cpp, ported operation for
operation. Conformed against the reference's own checksums (byte.rsw
4672, byte-lzw 40503, float64.mtw 4672, rgbsmall 21212/21053/21349,
rgbsmall-lzw 40503/41429/40238, 1bit/4bit variants) in
tests/test_rawmisc.py."""

from __future__ import annotations

import struct

import numpy as np

_NO_PRED = 0xFFFF
_TABSIZE = 4096


def _lzw_update(tab, pred: int, follow: int):
    f = follow - 256 if follow >= 128 else follow
    local = ((pred + f) & 0xFFFFFFFF) | 0x0800
    local = ((local * local) & 0xFFFFFFFF) >> 6 & 0x0FFF
    nxt = local
    if tab[local][0]:  # used
        while tab[local][1] != 0:
            local = tab[local][1]
        nxt = (local + 101) & 0x0FFF
        while tab[nxt][0]:
            nxt += 1
            if nxt >= _TABSIZE:
                nxt = 0
        tab[local] = (tab[local][0], nxt, tab[local][2], tab[local][3])
    tab[nxt] = (True, 0, pred, follow)


def _lzw_table():
    tab = [(False, 0, 0, 0)] * _TABSIZE
    for code in range(256):
        _lzw_update(tab, _NO_PRED, code)
    return tab


def lzw_decompress(src: bytes, out_size: int) -> bytes:
    """RMFDataset::LZWDecompress (rmflzw.cpp LZWReadStream)."""
    if len(src) < 2:
        return b""
    tab = _lzw_table()
    out = bytearray()
    pos = 0
    n = len(src)
    code = (src[pos] << 4) & 0xFF0
    pos += 1
    code += (src[pos] >> 4) & 0x00F
    old_code = code
    bitsleft = True
    fin_char = tab[code][3]
    out.append(fin_char)
    count = _TABSIZE - 256
    while pos < n:
        if bitsleft:
            code = ((src[pos] & 0x0F) << 8) & 0xF00
            pos += 1
            if pos >= n:
                break
            code += src[pos]
            pos += 1
            bitsleft = False
        else:
            code = (src[pos] << 4) & 0xFF0
            pos += 1
            if pos >= n:
                break
            code += (src[pos] >> 4) & 0x00F
            bitsleft = True
        in_code = code
        last_char = 0
        new_code = False
        if not tab[code][0]:
            code = old_code
            last_char = fin_char
            new_code = True
        stack = []
        while tab[code][2] != _NO_PRED:
            if len(stack) >= _TABSIZE:
                return bytes(out)
            stack.append(tab[code][3])
            code = tab[code][2]
        fin_char = tab[code][3]
        out.append(fin_char)
        out.extend(reversed(stack))
        if new_code:
            fin_char = last_char
            out.append(fin_char)
        if count > 0:
            count -= 1
            _lzw_update(tab, old_code, fin_char)
        old_code = in_code
        if len(out) >= out_size:
            break
    return bytes(out[:out_size])


_DEM_PARAMS = {0x40: (4, 0x7, 0xFFFFFFF0, 0xFFFFFFF8),
               0x60: (8, 0x7F, 0, 0xFFFFFF80),
               0x80: (12, 0x7FF, 0xFFFFF000, 0xFFFFF800),
               0xA0: (16, 0x7FFF, 0, 0xFFFF8000),
               0xC0: (24, 0x7FFFFF, 0xFF000000, 0xFF800000),
               0xE0: (32, 0, 0, -0x80000000)}
_OUT_INT32 = -0x80000000


def _s32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def dem_decompress(src: bytes, n_cells: int):
    """RMFDataset::DEMDecompress (rmfdem.cpp): per-cell differences in
    0/4/8/12/16/24/32-bit runs accumulated onto the previous value."""
    out = np.zeros(n_cells, np.int32)
    oi = 0
    prev = 0
    pos = 0
    n = len(src)
    while pos < n and oi < n_cells:
        b = src[pos]
        pos += 1
        count = b & 0x1F
        typ = b & 0xE0
        if count == 0:
            if pos >= n:
                break
            count = 32 + src[pos]
            pos += 1
        count = min(count, n_cells - oi)
        if typ == 0x20:  # ZERO: repeat previous
            out[oi:oi + count] = prev
            oi += count
        elif typ == 0x00:  # OUT of range
            out[oi:oi + count] = _OUT_INT32
            oi += count
        elif typ == 0x40:  # INT4 nibble pairs
            k = count
            while k > 0 and pos < n:
                code = src[pos] & 0x0F
                if code > 0x7:
                    code |= -16  # INV_INT4
                if code == -8:  # OUT_INT4
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
                k -= 1
                if k == 0:
                    pos += 1
                    break
                code = (src[pos] >> 4) & 0x0F
                pos += 1
                if code > 0x7:
                    code |= -16
                if code == -8:
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
                k -= 1
        elif typ == 0x60:  # INT8
            for _ in range(count):
                if pos >= n:
                    break
                code = src[pos] - 256 if src[pos] >= 128 else src[pos]
                pos += 1
                if code == -128:  # OUT_INT8
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
        elif typ == 0x80:  # INT12 packed pairs
            k = count
            while k > 0 and pos + 1 < n:
                v16 = int.from_bytes(src[pos:pos + 2], "little",
                                     signed=True)
                code = v16 & 0x0FFF
                pos += 1
                if code > 0x7FF:
                    code |= -0x1000
                if code == -0x800:
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
                k -= 1
                if k == 0:
                    pos += 1
                    break
                if pos + 1 >= n:
                    break
                v16 = int.from_bytes(src[pos:pos + 2], "little",
                                     signed=True)
                code = (v16 >> 4) & 0x0FFF
                pos += 2
                if code > 0x7FF:
                    code |= -0x1000
                if code == -0x800:
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
                k -= 1
        elif typ == 0xA0:  # INT16
            for _ in range(count):
                if pos + 1 >= n + 1:
                    break
                code = int.from_bytes(src[pos:pos + 2], "little",
                                      signed=True)
                pos += 2
                if code == -0x8000:
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
        elif typ == 0xC0:  # INT24
            for _ in range(count):
                if pos + 2 >= n + 1:
                    break
                code = src[pos] | (src[pos + 1] << 8) | \
                    (src[pos + 2] << 16)
                pos += 3
                if code > 0x7FFFFF:
                    code |= -0x1000000
                if code == -0x800000:
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
        else:  # 0xE0 INT32
            for _ in range(count):
                if pos + 3 >= n + 1:
                    break
                code = int.from_bytes(src[pos:pos + 4], "little",
                                      signed=True)
                pos += 4
                if code == _OUT_INT32:
                    out[oi] = _OUT_INT32
                else:
                    prev = _s32(prev + code)
                    out[oi] = prev
                oi += 1
    return out


def sniff_rmf(data: bytes) -> bool:
    return data[:4] in (b"RSW\x00", b"MTW\x00", b"\x00WSR", b"\x00WTM")


def read_rmf(data: bytes):
    """-> (pixels, gt | None, info)."""
    if not sniff_rmf(data):
        raise ValueError("not an RMF file")
    big = data[:4] in (b"\x00WSR", b"\x00WTM")
    e = ">" if big else "<"
    is_mtw = data[:4] in (b"MTW\x00", b"\x00WTM")

    def u32(off):
        return struct.unpack_from(e + "I", data, off)[0]

    def f64(off):
        return struct.unpack_from(e + "d", data, off)[0]

    bits = u32(0x34)
    h, w = u32(0x38), u32(0x3C)
    nxt, nyt = u32(0x40), u32(0x44)
    th, tw = u32(0x48), u32(0x4C)
    lth, ltw = u32(0x50), u32(0x54)
    clr_off, clr_size = u32(0x60), u32(0x64)
    tbl_off, tbl_size = u32(0x68), u32(0x6C)
    epsg = struct.unpack_from(e + "i", data, 132)[0]
    pixel_size = f64(152)
    lly = f64(160)  # LLY precedes LLX in the header
    llx = f64(168)
    compression = data[208]

    if is_mtw:
        dt = np.dtype(e + {8: "i1", 16: "i2", 32: "i4",
                           64: "f8"}[bits])
        comps = 1
    elif bits == 24:
        dt = np.dtype("u1")
        comps = 3
    elif bits == 8:
        dt = np.dtype("u1")
        comps = 1
    elif bits == 32:
        dt = np.dtype("u1")
        comps = 4  # BGR0 storage; 3 bands exposed
    elif bits in (1, 4):
        dt = np.dtype("u1")
        comps = 1
    else:
        raise NotImplementedError(f"RMF bit depth {bits}")
    if compression not in (0, 1, 32):
        raise NotImplementedError(
            f"RMF compression {compression} (none/LZW/DEM supported)")
    if compression == 32 and not (is_mtw and bits == 32):
        raise NotImplementedError("RMF DEM compression on non-Int32")

    tiles = struct.unpack_from(f"{e}{tbl_size // 4}I", data, tbl_off)
    ncomp_out = 3 if (comps in (3, 4) and not is_mtw) else comps
    if bits >= 8:
        px = np.zeros((h, w, ncomp_out), np.uint8) if not is_mtw else \
            np.zeros((h, w), dt)
    else:
        px = np.zeros((h, w), np.uint8)
    for ty in range(nyt):
        for tx in range(nxt):
            idx = ty * nxt + tx
            off, size = tiles[2 * idx], tiles[2 * idx + 1]
            if off == 0:
                continue
            rw = ltw if (ltw and tx == nxt - 1) else tw
            rh = lth if (lth and ty == nyt - 1) else th
            raw_bytes = rw * rh * bits // 8
            buf = data[off:off + size]
            if compression == 1 and size != raw_bytes:
                buf = lzw_decompress(buf, raw_bytes)
            elif compression == 32 and size != raw_bytes:
                buf = dem_decompress(buf, rw * rh).tobytes()
            buf = buf[:raw_bytes] + b"\x00" * (raw_bytes - len(buf))
            ys, xs = ty * th, tx * tw
            if bits >= 8 and not is_mtw:
                tile = np.frombuffer(buf, np.uint8).reshape(
                    rh, rw, bits // 8)
                # pixels store BGR(0): band i = byte (3 - i), i.e.
                # iDstBand = nBands - nBand in the reference's
                # IReadBlock; 32-bit RSW exposes 3 bands
                if comps == 3:
                    tile = tile[:, :, ::-1]
                elif comps == 4 and not is_mtw:
                    tile = tile[:, :, 2::-1]
                px[ys:ys + rh, xs:xs + rw] = tile
            elif is_mtw:
                tile = np.frombuffer(buf, dt).reshape(rh, rw)
                px[ys:ys + rh, xs:xs + rw] = tile
            else:  # 1/4 bit packed
                bitarr = np.unpackbits(
                    np.frombuffer(buf, np.uint8).reshape(rh, -1), axis=1)
                if bits == 1:
                    tile = bitarr[:, :rw]
                else:  # 4-bit: high nibble first
                    nib = bitarr.reshape(rh, -1, 4)
                    vals = (nib[:, :, 0] * 8 + nib[:, :, 1] * 4 +
                            nib[:, :, 2] * 2 + nib[:, :, 3])
                    tile = vals[:, :rw]
                px[ys:ys + rh, xs:xs + rw] = tile
    if not is_mtw and comps == 3:
        pass  # (h, w, 3) RGB after the BGR swap
    elif not is_mtw and px.ndim == 3 and comps == 1:
        px = px[:, :, 0]

    palette = None
    if clr_off and clr_size:
        pal = np.frombuffer(data, np.uint8, clr_size,
                            clr_off).reshape(-1, 4)
        palette = pal[:, :3].copy()  # stored BGRA? RGB0 per spec
    gt = None
    if pixel_size:
        gt = (llx, pixel_size, 0.0, lly + h * pixel_size, 0.0,
              -pixel_size)
    info = {"epsg": epsg or None, "mtw": is_mtw, "bits": bits,
            "compression": compression}
    return np.ascontiguousarray(px), gt, info, palette
