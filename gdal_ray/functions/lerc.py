"""LERC (Limited Error Raster Compression) decoder — pure Python
port of the public LercLib semantics (reference
third_party/LercLib: Lerc2.h/.cpp, BitStuffer2, Huffman, RLE) and
the MRF-vendored LERC V1 (frmts/mrf/LERCV1 CntZImage).

Lerc2 blob: "Lerc2 " + version + [checksum v>=3] + 6/7 ints
(nRows, nCols, [nDim v>=4], numValidPixel, microBlockSize,
blobSize, dataType) + 3 doubles (maxZError, zMin, zMax); an RLE
bit mask (MSB-first validity bits); then either one-sweep raw
values, Huffman-coded bytes (delta or plain, canonical code table),
or per-microblock tiles: a compression flag byte (bits 0-1 mode:
0 raw, 1 bit-stuffed, 2 all-zero, 3 all-offset; bits 2-5 an
integrity code; bits 6-7 the offset's shrunken data type), an
offset, and BitStuffer2 payloads (numBitsByte with LUT flag,
variable-width count, 32-bit-word bit packing — the pre-v3 and v3+
bit orders both implemented).

LERC V1 (CntZImage 'version 11'): header + maxZError + two nested
images (count then z), each RLE- or bit-stuffed per 8x8 block with
its own float offset."""

from __future__ import annotations

import math
import struct

import numpy as np

_DT = {0: np.int8, 1: np.uint8, 2: np.int16, 3: np.uint16,
       4: np.int32, 5: np.uint32, 6: np.float32, 7: np.float64}
_DT_SIZE = {0: 1, 1: 1, 2: 2, 3: 2, 4: 4, 5: 4, 6: 4, 7: 8}
_DT_FMT = {0: "<b", 1: "<B", 2: "<h", 3: "<H", 4: "<i", 5: "<I",
           6: "<f", 7: "<d"}


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data, pos=0):
        self.data = data
        self.pos = pos

    def bytes(self, n):
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def u8(self):
        v = self.data[self.pos]
        self.pos += 1
        return v

    def i32(self):
        v = struct.unpack_from("<i", self.data, self.pos)[0]
        self.pos += 4
        return v

    def u32(self):
        v = struct.unpack_from("<I", self.data, self.pos)[0]
        self.pos += 4
        return v

    def f64(self):
        v = struct.unpack_from("<d", self.data, self.pos)[0]
        self.pos += 8
        return v


def _rle_decompress(r: _Reader, out_size: int) -> bytes:
    out = bytearray()
    while True:
        cnt = struct.unpack_from("<h", r.data, r.pos)[0]
        r.pos += 2
        if cnt == -32768:
            break
        if cnt > 0:
            out += r.bytes(cnt)
        else:
            b = r.u8()
            out += bytes([b]) * (-cnt)
    return bytes(out[:out_size])


def _bit_unstuff(r: _Reader, num_elements: int, num_bits: int,
                 version: int) -> np.ndarray:
    """BitStuffer2::BitUnStuff (v3+) / _Before_Lerc2v3."""
    num_uints = (num_elements * num_bits + 31) // 32
    num_bytes = num_uints * 4
    tail_bits = (num_elements * num_bits) & 31
    tail_bytes = (tail_bits + 7) >> 3
    not_needed = (4 - tail_bytes) if tail_bytes > 0 else 0
    if version >= 3:
        # BitStuffer2::BitUnStuff (v3+): elements are packed
        # LSB-first within each little-endian 32-bit word — i.e. a
        # plain little-endian bitstream
        used = num_bytes - not_needed
        buf = bytearray(r.bytes(used))
        buf += b"\x00" * (num_bytes - used)
        bits = np.unpackbits(np.frombuffer(bytes(buf), np.uint8),
                             bitorder="little")
        arrb = bits[:num_elements * num_bits].reshape(num_elements,
                                                      num_bits)
        weights = (1 << np.arange(num_bits, dtype=np.uint32))
        return (arrb.astype(np.uint32) * weights).sum(axis=1) \
            .astype(np.uint32)
    else:
        to_copy = (num_elements * num_bits + 7) // 8
        buf = bytearray(r.bytes(to_copy))
        buf += b"\x00" * (num_bytes - to_copy)
        words = np.frombuffer(bytes(buf), "<u4", num_uints).copy()
        # shift the last word left by the unneeded tail bytes
        last = int(words[num_uints - 1])
        for _ in range(not_needed):
            last = (last << 8) & 0xFFFFFFFF
        words[num_uints - 1] = last
    # unpack MSB-within-word... both variants consume bits from the
    # TOP of each little-endian 32-bit word
    out = np.empty(num_elements, np.uint32)
    bitpos = 0
    wi = 0
    for i in range(num_elements):
        if 32 - bitpos >= num_bits:
            v = (int(words[wi]) << bitpos) & 0xFFFFFFFF
            out[i] = v >> (32 - num_bits)
            bitpos += num_bits
            if bitpos == 32:
                bitpos = 0
                wi += 1
        else:
            v = (int(words[wi]) << bitpos) & 0xFFFFFFFF
            wi += 1
            acc = v >> (32 - num_bits)
            bitpos -= 32 - num_bits
            acc |= int(words[wi]) >> (32 - bitpos)
            out[i] = acc
    return out


def _bitstuffer2_decode(r: _Reader, max_elements: int,
                        version: int) -> np.ndarray:
    num_bits_byte = r.u8()
    bits67 = num_bits_byte >> 6
    nb = 4 if bits67 == 0 else 3 - bits67
    do_lut = bool(num_bits_byte & (1 << 5))
    num_bits = num_bits_byte & 31
    if nb == 1:
        n = r.u8()
    elif nb == 2:
        n = struct.unpack_from("<H", r.data, r.pos)[0]
        r.pos += 2
    else:
        n = r.u32()
    if not do_lut:
        if num_bits > 0:
            return _bit_unstuff(r, n, num_bits, version)
        return np.zeros(n, np.uint32)
    n_lut = r.u8() - 1
    lut = _bit_unstuff(r, n_lut, num_bits, version)
    nbits_lut = 0
    while (n_lut >> nbits_lut):
        nbits_lut += 1
    idxs = _bit_unstuff(r, n, nbits_lut, version)
    table = np.concatenate([[0], lut]).astype(np.uint32)
    return table[idxs]


# ---------------------------------------------------------------------------
# Huffman (Lerc2 byte path)


def _huffman_read_code_table(r: _Reader, version: int):
    ver, size, i0, i1 = struct.unpack_from("<4i", r.data, r.pos)
    r.pos += 16
    lengths = _bitstuffer2_decode(r, i1 - i0, version)
    code_len = [0] * size
    for i in range(i0, i1):
        k = i - (size if i >= size else 0)
        code_len[k] = int(lengths[i - i0])
    # BitUnStuffCodes: read each code MSB-first from 32-bit words
    words_start = r.pos
    codes = [0] * size
    bitpos = 0
    wi = 0

    def word(j):
        return struct.unpack_from("<I", r.data, words_start + 4 * j)[0]

    for i in range(i0, i1):
        k = i - (size if i >= size else 0)
        ln = code_len[k]
        if ln > 0:
            v = ((word(wi) << bitpos) & 0xFFFFFFFF) >> (32 - ln)
            if 32 - bitpos >= ln:
                bitpos += ln
                if bitpos == 32:
                    bitpos = 0
                    wi += 1
            else:
                bitpos += ln - 32
                wi += 1
                v |= word(wi) >> (32 - bitpos)
            codes[k] = v
    nwords = wi + (1 if bitpos > 0 else 0)
    r.pos = words_start + nwords * 4
    return code_len, codes


def _huffman_decode_values(r: _Reader, code_len, codes, count):
    """Decode `count` symbols from the 32-bit word stream."""
    decode = {}
    for sym, (ln, code) in enumerate(zip(code_len, codes)):
        if ln > 0:
            decode[(ln, code)] = sym
    max_len = max((ln for ln in code_len if ln), default=0)
    words = np.frombuffer(
        r.data, "<u4", (len(r.data) - r.pos) // 4, r.pos)
    # bit stream MSB-first across words
    out = np.empty(count, np.int32)
    acc = 0
    acc_bits = 0
    wi = 0
    for i in range(count):
        ln = 0
        code = 0
        while True:
            if acc_bits == 0:
                acc = int(words[wi])
                wi += 1
                acc_bits = 32
            code = (code << 1) | (acc >> 31)
            acc = (acc << 1) & 0xFFFFFFFF
            acc_bits -= 1
            ln += 1
            if (ln, code) in decode:
                out[i] = decode[(ln, code)]
                break
            if ln > max_len:
                raise ValueError("bad Huffman stream")
    used_words = wi
    r.pos += used_words * 4
    return out


# ---------------------------------------------------------------------------
# Lerc2


def _decode_lerc2(data: bytes) -> np.ndarray:
    r = _Reader(data, 6)
    version = r.i32()
    if version >= 3:
        r.u32()  # checksum (not verified)
    n_ints = 7 if version >= 4 else 6
    ints = [r.i32() for _ in range(n_ints)]
    max_z_error = r.f64()
    z_min = r.f64()
    z_max = r.f64()
    i = 0
    n_rows = ints[i]; i += 1
    n_cols = ints[i]; i += 1
    n_dim = 1
    if version >= 4:
        n_dim = ints[i]; i += 1
    num_valid = ints[i]; i += 1
    mb_size = ints[i]; i += 1
    _blob_size = ints[i]; i += 1
    dt = ints[i]
    dtype = _DT[dt]

    # mask
    num_bytes_mask = r.i32()
    total = n_rows * n_cols
    if num_valid == 0:
        mask = np.zeros(total, bool)
    elif num_valid == total:
        mask = np.ones(total, bool)
    else:
        raw = _rle_decompress(r, (total + 7) // 8)
        bits = np.unpackbits(np.frombuffer(raw, np.uint8))
        mask = bits[:total].astype(bool)

    out = np.zeros(total * n_dim, np.float64)
    if num_valid == 0:
        return out.reshape(n_rows, n_cols, n_dim).astype(dtype)
    if z_min == z_max:
        out[np.repeat(mask, n_dim)] = z_min
        return out.reshape(n_rows, n_cols, n_dim).astype(dtype)
    if version >= 4:
        # min/max per dim, in the DATA type's width (Lerc2.h
        # ReadMinMaxRanges reads nDim*sizeof(T) per bound)
        r.bytes(2 * _DT_SIZE[dt] * n_dim)

    one_sweep = r.u8()
    if one_sweep:
        sz = _DT_SIZE[dt]
        vals = np.frombuffer(r.bytes(num_valid * n_dim * sz),
                             _DT_FMT[dt][1:]).astype(np.float64)
        out[np.repeat(mask, n_dim)] = vals
        return out.reshape(n_rows, n_cols, n_dim).astype(dtype)

    try_huffman = version > 1 and dt in (0, 1) and max_z_error == 0.5
    if try_huffman:
        flag = r.u8()
        if flag in (1, 2):
            code_len, codes = _huffman_read_code_table(r, version)
            offset = 128 if dt == 0 else 0
            vals = _huffman_decode_values(
                r, code_len, codes, total * n_dim if mask.all() else
                int(mask.sum()) * n_dim)
            arr = out
            if flag == 1:  # delta Huffman (Lerc2::DecodeHuffman:
                # dim-major streams, per-dim prevVal chains; masked
                # pixels skipped with the IsValid(k-1)/IsValid(k-width)
                # neighbour rules; byte overflow semantics)
                deltas = (vals - offset).astype(np.int64)
                all_valid = bool(mask.all())
                vi = 0
                for idim in range(n_dim):
                    prev = 0
                    k = 0
                    for ii in range(n_rows):
                        for jj in range(n_cols):
                            if not all_valid and not mask[k]:
                                k += 1
                                continue
                            d = deltas[vi]
                            vi += 1
                            if jj > 0 and (all_valid or mask[k - 1]):
                                d += prev
                            elif ii > 0 and (all_valid or
                                             mask[k - n_cols]):
                                d += int(out[(k - n_cols) * n_dim
                                             + idim])
                            else:
                                d += prev
                            d &= 0xFF
                            out[k * n_dim + idim] = d
                            prev = d
                            k += 1
            else:
                if mask.all():
                    arr[:] = vals - offset
                else:
                    arr[np.repeat(mask, n_dim)] = vals - offset
            return arr.reshape(n_rows, n_cols, n_dim).astype(dtype)

    # tiled path
    num_tiles_v = (n_rows + mb_size - 1) // mb_size
    num_tiles_h = (n_cols + mb_size - 1) // mb_size
    inv_scale = 2 * max_z_error
    for it in range(num_tiles_v):
        i0 = it * mb_size
        th = min(mb_size, n_rows - i0)
        for jt in range(num_tiles_h):
            j0 = jt * mb_size
            tw = min(mb_size, n_cols - j0)
            for idim in range(n_dim):
                _read_lerc2_tile(r, out, mask, n_cols, n_dim, idim,
                                 i0, i0 + th, j0, j0 + tw, dt,
                                 inv_scale, z_max, version)
    return out.reshape(n_rows, n_cols, n_dim).astype(dtype)


def _read_var(r: _Reader, dt_used: int) -> float:
    fmt = _DT_FMT[dt_used]
    v = struct.unpack_from(fmt, r.data, r.pos)[0]
    r.pos += _DT_SIZE[dt_used]
    return float(v)


def _dt_used(dt: int, tc: int) -> int:
    if dt in (2, 4):      # short / int
        return dt - tc
    if dt in (3, 5):      # ushort / uint
        return dt - 2 * tc
    if dt == 6:           # float
        return 6 if tc == 0 else (2 if tc == 1 else 1)
    if dt == 7:           # double
        return 7 if tc == 0 else dt - 2 * tc + 1
    return dt


def _read_lerc2_tile(r, out, mask, n_cols, n_dim, idim, i0, i1, j0, j1,
                     dt, inv_scale, z_max, version):
    compr = r.u8()
    bits67 = compr >> 6
    compr &= 3
    if compr == 2:  # all zero
        for ii in range(i0, i1):
            for jj in range(j0, j1):
                k = ii * n_cols + jj
                if mask[k]:
                    out[k * n_dim + idim] = 0
        return
    if compr == 0:  # raw values
        sz = _DT_SIZE[dt]
        fmt = _DT_FMT[dt]
        for ii in range(i0, i1):
            for jj in range(j0, j1):
                k = ii * n_cols + jj
                if mask[k]:
                    out[k * n_dim + idim] = struct.unpack_from(
                        fmt, r.data, r.pos)[0]
                    r.pos += sz
        return
    dtu = _dt_used(dt, bits67)
    offset = _read_var(r, dtu)
    if compr == 3:  # constant offset
        for ii in range(i0, i1):
            for jj in range(j0, j1):
                k = ii * n_cols + jj
                if mask[k]:
                    out[k * n_dim + idim] = offset
        return
    max_elems = (i1 - i0) * (j1 - j0)
    vals = _bitstuffer2_decode(r, max_elems, version)
    vi = 0
    all_valid = len(vals) == max_elems
    for ii in range(i0, i1):
        for jj in range(j0, j1):
            k = ii * n_cols + jj
            if all_valid:
                z = offset + float(vals[vi]) * inv_scale
                vi += 1
                out[k * n_dim + idim] = min(z, z_max)
            elif mask[k]:
                z = offset + float(vals[vi]) * inv_scale
                vi += 1
                out[k * n_dim + idim] = min(z, z_max)


def decode_lerc(data: bytes, pw: int | None = None,
                ph: int | None = None) -> np.ndarray:
    """Decode a LERC blob (Lerc2 or CntZImage V1) -> (h, w) array."""
    if data[:6] == b"Lerc2 ":
        arr = _decode_lerc2(data)
    elif data[:9] == b"CntZImage":
        arr = _decode_lerc1(data)
    else:
        raise ValueError("not a LERC blob")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return arr


# ---------------------------------------------------------------------------
# LERC V1 (CntZImage version 11 — frmts/mrf/LERCV1/Lerc1Image.cpp)

_STIB67 = [4, 2, 1, 0]


def _lerc1_rle_mask(r: _Reader, num_bytes: int, total: int) -> np.ndarray:
    """BitMaskV1::RLEdecompress: little-endian short counts, negative
    = repeat next byte, -32768 terminator; bits MSB-first."""
    out = bytearray()
    sz = (total + 7) // 8
    end = r.pos + num_bytes
    while len(out) < sz and r.pos < end:
        cnt = struct.unpack_from("<h", r.data, r.pos)[0]
        r.pos += 2
        if cnt == -32768:
            break
        if cnt < 0:
            b = r.u8()
            out += bytes([b]) * (-cnt)
        else:
            out += r.bytes(cnt)
    r.pos = end
    bits = np.unpackbits(np.frombuffer(
        bytes(out[:sz]).ljust(sz, b"\x00"), np.uint8))
    return bits[:total].astype(bool)


def _lerc1_blockread(r: _Reader, max_elems: int) -> np.ndarray:
    num_bits = r.u8()
    n = _STIB67[num_bits >> 6]
    num_bits &= 63
    num_elements = int.from_bytes(r.bytes(n), "little")
    if num_bits == 0:
        return np.zeros(num_elements, np.uint32)
    num_bytes = (num_elements * num_bits + 7) // 8
    payload = r.bytes(num_bytes)
    out = np.empty(num_elements, np.uint32)
    bits = 0
    acc = 0
    pos = 0
    remaining = num_bytes
    for i in range(num_elements):
        if bits >= num_bits:
            out[i] = acc >> (32 - num_bits)
            acc = (acc << num_bits) & 0xFFFFFFFF
            bits -= num_bits
            continue
        val = 0
        if bits:
            val = acc >> (32 - bits)
            val <<= (num_bits - bits)
        nb = min(remaining, 4)
        chunk = payload[pos:pos + nb]
        pos += nb
        remaining -= nb
        if nb == 4:
            acc = struct.unpack("<I", chunk)[0]
        else:
            # few bytes at the HIGH end of the accumulator
            acc = int.from_bytes(b"\x00" * (4 - nb) + chunk[::-1], "big")
        bits += 32 - num_bits
        val |= acc >> bits
        out[i] = val
        acc = (acc << (32 - bits)) & 0xFFFFFFFF
    return out


def _lerc1_read_flt(r: _Reader, n: int) -> float:
    if n == 4:
        v = struct.unpack_from("<f", r.data, r.pos)[0]
    elif n == 2:
        v = float(struct.unpack_from("<h", r.data, r.pos)[0])
    else:
        v = float(struct.unpack_from("<b", r.data, r.pos)[0])
    r.pos += n
    return float(v)


def _decode_lerc1(data: bytes) -> np.ndarray:
    r = _Reader(data, len(b"CntZImage "))
    version = r.i32()
    ctype = r.i32()
    height = r.i32()
    width = r.i32()
    max_z_error = r.f64()
    if version != 11 or ctype != 8:
        raise ValueError("not a CntZImage v11 blob")
    total = width * height

    # --- count (mask) part: no tiling allowed
    ntv = r.i32()
    nth = r.i32()
    num_bytes = r.i32()
    max_val = struct.unpack_from("<f", r.data, r.pos)[0]
    r.pos += 4
    if num_bytes == 0:
        mask = np.full(total, max_val != 0.0, bool)
        r.pos += num_bytes
    else:
        start = r.pos
        mask = _lerc1_rle_mask(r, num_bytes, total)
        r.pos = start + num_bytes

    # --- z part (tiled)
    ntv = r.i32()
    nth = r.i32()
    num_bytes = r.i32()
    max_val = struct.unpack_from("<f", r.data, r.pos)[0]
    r.pos += 4
    z = np.zeros(total, np.float32)
    if ntv == 0 and nth == 0:
        if num_bytes == 0:
            z[mask] = max_val
        else:
            vals = np.frombuffer(r.bytes(num_bytes), "<f4")
            z[mask] = vals[:int(mask.sum())]
    else:
        tile_h = height // ntv
        tile_w = width // nth
        q = max_z_error * 2
        r0 = 0
        while r0 < height:
            r1 = min(height, r0 + tile_h)
            c0 = 0
            while c0 < width:
                c1 = min(width, c0 + tile_w)
                _lerc1_read_ztile(r, z, mask, width, r0, r1, c0, c1,
                                  q, max_val)
                c0 = c1 if tile_w <= 0 else c0 + tile_w
            r0 = r0 + tile_h if tile_h > 0 else r1
    z[~mask] = 0
    return z.reshape(height, width)


def _lerc1_read_ztile(r, z, mask, width, r0, r1, c0, c1, q, maxz):
    compr = r.u8()
    n = _STIB67[compr >> 6]
    compr &= 63
    if compr == 2:  # all zero
        for row in range(r0, r1):
            z[row * width + c0:row * width + c1] = 0.0
        return
    if compr == 0:  # raw floats for valid pixels
        for row in range(r0, r1):
            for col in range(c0, c1):
                k = row * width + col
                if mask[k]:
                    z[k] = struct.unpack_from("<f", r.data, r.pos)[0]
                    r.pos += 4
        return
    minval = _lerc1_read_flt(r, n)
    if compr == 3:  # constant min val regardless of mask
        for row in range(r0, r1):
            z[row * width + c0:row * width + c1] = minval
        return
    vals = _lerc1_blockread(r, (r1 - r0) * (c1 - c0))
    i = 0
    for row in range(r0, r1):
        for col in range(c0, c1):
            k = row * width + col
            if mask[k]:
                z[k] = min(maxz, minval + q * float(vals[i]))
                i += 1
