"""WebP lossless (VP8L) codec — pure Python/numpy, no codec libs.

The decoder implements the complete public WebP Lossless Bitstream
Specification (RFC 9649): all four transforms (predictor, color,
subtract-green, color-indexing with sub-8-bit pixel bundling), the
color cache, LZ77 backward references with the 2-D distance map, and
per-tile meta-Huffman groups.  The encoder emits a spec-valid subset:
optional subtract-green / uniform-predictor / uniform-color /
color-indexing transforms and per-channel canonical Huffman codes over
literals (no LZ77) — enough for byte-exact lossless round-trips.

The reference's WebP driver (frmts/webp/webpdataset.cpp) and its TIFF
COMPRESS=WEBP path delegate to libwebp; this module re-derives the
bitstream from the public spec instead.  The conformance target is
autotest/gcore/tiff_write.py:8401: CreateCopy with COMPRESS=WEBP +
WEBP_LOSSLESS=true then reopen must produce band checksums
[21212, 21053, 21349] for rgbsmall.tif (mirrored in
tests/test_webp.py).  Lossy VP8 payloads raise NotImplementedError.
"""

from __future__ import annotations

import heapq
import struct
from collections import Counter

import numpy as np

# ---------------------------------------------------------------- bit IO


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("d", "byte", "buf", "cnt")

    def __init__(self, data: bytes):
        self.d = data
        self.byte = 0
        self.buf = 0
        self.cnt = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self.cnt < nbits:
            b = self.d[self.byte] if self.byte < len(self.d) else 0
            self.buf |= b << self.cnt
            self.cnt += 8
            self.byte += 1
        v = self.buf & ((1 << nbits) - 1)
        self.buf >>= nbits
        self.cnt -= nbits
        return v


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, value: int, nbits: int) -> None:
        self.buf |= (value & ((1 << nbits) - 1)) << self.cnt
        self.cnt += nbits
        while self.cnt >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.cnt -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Write a canonical Huffman code MSB-first (tree-walk order)."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.cnt:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.cnt = 0
        return bytes(self.out)


# ------------------------------------------------------------- huffman

# Order in which code-length code lengths are stored (spec §6.2.2).
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


def _build_tree(lengths):
    """Canonical Huffman tree from code lengths.

    Leaves are ints; inner nodes 2-lists.  A single used symbol becomes
    a bare-int tree read with zero bits (spec: single-symbol codes).
    """
    syms = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    if not syms:
        raise ValueError("empty huffman code")
    if len(syms) == 1:
        return syms[0][1]
    root = [None, None]
    code = 0
    prev_len = 0
    for l, s in syms:
        code <<= (l - prev_len)
        prev_len = l
        node = root
        for i in range(l - 1, 0, -1):
            bit = (code >> i) & 1
            nxt = node[bit]
            if nxt is None:
                nxt = [None, None]
                node[bit] = nxt
            node = nxt
        node[code & 1] = s
        code += 1
    return root


def _read_sym(br: _BitReader, tree):
    if isinstance(tree, int):
        return tree
    node = tree
    while True:
        node = node[br.read(1)]
        if isinstance(node, int):
            return node
        if node is None:
            raise ValueError("invalid VP8L huffman stream")


def _read_code(br: _BitReader, alphabet_size: int):
    """Read one Huffman code definition -> decode tree."""
    if br.read(1):                       # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if num_symbols == 1:
            return s0
        s1 = br.read(8)
        return [s0, s1]                  # code 0 -> first symbol read
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = _build_tree(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):                       # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev = 8                             # spec DEFAULT_CODE_LENGTH
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        cl = _read_sym(br, cl_tree)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _build_tree(lengths)


def _huff_lengths(freqs: dict[int, int], alphabet_size: int,
                  maxlen: int) -> list[int]:
    """Huffman code lengths (<= maxlen, Kraft-complete) per symbol."""
    items = sorted(freqs.items())
    if not items:
        raise ValueError("empty histogram")
    lengths = [0] * alphabet_size
    if len(items) == 1:
        lengths[items[0][0]] = 1
        return lengths
    heap = [(f, s, s) for s, f in items]   # (weight, tiebreak, node)
    heapq.heapify(heap)
    parent: dict = {}
    nxt = alphabet_size
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        parent[n1] = nxt
        parent[n2] = nxt
        heapq.heappush(heap, (f1 + f2, nxt, nxt))
        nxt += 1
    for s, _ in items:
        d = 0
        n = s
        while n in parent:
            n = parent[n]
            d += 1
        lengths[s] = min(d, maxlen)
    # Kraft repair after clamping (zlib-style): lengthen rare symbols
    # until the code fits, then re-shorten frequent ones to complete it.
    kraft = sum(1 / (1 << l) for l in lengths if l)
    if kraft > 1:
        for s, _ in sorted(items, key=lambda kv: kv[1]):
            while kraft > 1 and lengths[s] < maxlen:
                kraft -= 1 / (1 << (lengths[s] + 1))
                lengths[s] += 1
            if kraft <= 1:
                break
    changed = True
    while kraft < 1 and changed:
        changed = False
        for s, _ in sorted(items, key=lambda kv: -kv[1]):
            l = lengths[s]
            if l > 1 and kraft + 1 / (1 << l) <= 1:
                kraft += 1 / (1 << l)
                lengths[s] = l - 1
                changed = True
    return lengths


def _canonical(lengths) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, len), matching _build_tree's assignment."""
    syms = sorted((l, s) for s, l in enumerate(lengths) if l)
    codes: dict[int, tuple[int, int]] = {}
    if len(syms) == 1:
        codes[syms[0][1]] = (0, 0)
        return codes
    code = 0
    prev_len = 0
    for l, s in syms:
        code <<= (l - prev_len)
        prev_len = l
        codes[s] = (code, l)
        code += 1
    return codes


def _emit_code(bw: _BitWriter, freqs: dict[int, int],
               alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Write one Huffman code definition; return symbol->(code,len)."""
    nz = sorted(freqs)
    if len(nz) == 1 and nz[0] <= 255:
        bw.write(1, 1)                   # simple
        bw.write(0, 1)                   # 1 symbol
        s = nz[0]
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return {s: (0, 0)}
    if len(nz) == 2 and nz[1] <= 255:
        bw.write(1, 1)                   # simple
        bw.write(1, 1)                   # 2 symbols
        bw.write(1, 1)                   # 8-bit first symbol
        bw.write(nz[0], 8)
        bw.write(nz[1], 8)
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    bw.write(0, 1)                       # full code
    lengths = _huff_lengths(freqs, alphabet_size, 15)
    # RLE the length sequence: 17/18 for zero runs, literals otherwise
    rle: list[tuple[int, int, int]] = []
    i = 0
    while i < alphabet_size:
        if lengths[i] == 0:
            j = i
            while j < alphabet_size and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 3:
                chunk = min(run, 138)
                if chunk < 11:
                    rle.append((17, chunk - 3, 3))
                else:
                    rle.append((18, chunk - 11, 7))
                run -= chunk
            for _ in range(run):
                rle.append((0, 0, 0))
            i = j
        else:
            rle.append((lengths[i], 0, 0))
            i += 1
    cl_freq = Counter(sym for sym, _, _ in rle)
    cl_lengths = _huff_lengths(dict(cl_freq), 19, 7)
    num_cl = max(4, 1 + max(i for i, o in enumerate(_CL_ORDER)
                            if cl_lengths[o]))
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)                       # no explicit max_symbol
    cl_codes = _canonical(cl_lengths)
    for sym, ev, ec in rle:
        c, l = cl_codes[sym]
        bw.write_code(c, l)
        if ec:
            bw.write(ev, ec)
    return _canonical(lengths)


# ------------------------------------------------------ pixel helpers

# 2-D LZ77 distance map (spec §5.2.2): plane code -> packed
# (yoffset << 4) | (xoffset + 8), ordered by increasing distance.
_PLANE = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70,
)


def _plane_to_dist(code: int, w: int) -> int:
    if code > 120:
        return code - 120
    c = _PLANE[code - 1]
    d = (c >> 4) * w + (8 - (c & 0xF))
    return d if d >= 1 else 1


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _avg2(a: int, b: int) -> int:
    return (a & b) + (((a ^ b) & 0xFEFEFEFE) >> 1)


def _addpix(a: int, b: int) -> int:
    return ((((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
            | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF))


def _subpix(a: int, b: int) -> int:
    return ((((a | 0x01000100) - (b & 0x00FF00FF)) & 0x00FF00FF)
            | ((((a >> 8) | 0x01000100) - ((b >> 8) & 0x00FF00FF))
               & 0x00FF00FF) << 8)


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_full(c0: int, c1: int, c2: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = _clip255(((c0 >> sh) & 0xFF) + ((c1 >> sh) & 0xFF)
                     - ((c2 >> sh) & 0xFF))
        out |= v << sh
    return out


def _clamp_half(c0: int, c1: int, c2: int) -> int:
    ave = _avg2(c0, c1)
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        b = (c2 >> sh) & 0xFF
        d = a - b
        # C truncating division by 2
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clip255(a + half) << sh
    return out


def _select(t: int, l: int, tl: int) -> int:
    s = 0
    for sh in (0, 8, 16, 24):
        a = (t >> sh) & 0xFF
        b = (l >> sh) & 0xFF
        c = (tl >> sh) & 0xFF
        s += abs(b - c) - abs(a - c)
    return t if s <= 0 else l


def _predict(mode: int, pix: list[int], pos: int, x: int, y: int,
             w: int) -> int:
    """Predictor value for pixel pos; neighbors already reconstructed.

    Edge rules per spec: (0,0) -> opaque black, row 0 -> Left,
    column 0 -> Top; top-right of the last column wraps to the first
    pixel of the current row (the libwebp flat-buffer quirk the spec
    codifies) — the flat index pos-w+1 lands there naturally.
    """
    if y == 0:
        return 0xFF000000 if x == 0 else pix[pos - 1]
    if x == 0:
        return pix[pos - w]
    L = pix[pos - 1]
    T = pix[pos - w]
    TL = pix[pos - w - 1]
    TR = pix[pos - w + 1]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(T, L, TL)
    if mode == 12:
        return _clamp_full(L, T, TL)
    if mode == 13:
        return _clamp_half(L, T, TL)
    raise ValueError(f"predictor mode {mode}")


def _delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    return (t.astype(np.int8).astype(np.int32)
            * c.astype(np.int8).astype(np.int32)) >> 5


# -------------------------------------------------------------- decode


def _decode_image_stream(br: _BitReader, w: int, h: int,
                         level0: bool) -> np.ndarray:
    """Decode one entropy-coded image -> uint32 ARGB array (row-major).

    level0 additionally reads and inverts the transform chain."""
    transforms = []
    cur_w = w
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype in (0, 1):          # PREDICTOR / COLOR
                bits = br.read(3) + 2
                tw = _sub_size(cur_w, bits)
                th = _sub_size(h, bits)
                tdata = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, bits, tdata, cur_w))
            elif ttype == 2:             # SUBTRACT_GREEN
                transforms.append((2, 0, None, cur_w))
            else:                        # COLOR_INDEXING
                n = br.read(8) + 1
                pal = _decode_image_stream(br, n, 1, False)
                # palette entries are stored delta-coded per channel
                u8 = pal.view(np.uint8).reshape(-1, 4).astype(np.uint32)
                pal = (np.cumsum(u8, axis=0, dtype=np.uint32) & 0xFF) \
                    .astype(np.uint8).reshape(-1).view(np.uint32).copy()
                pbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 \
                    else 0
                transforms.append((3, pbits, pal, cur_w))
                if pbits:
                    cur_w = _sub_size(cur_w, pbits)

    cache_bits = br.read(4) if br.read(1) else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0

    meta_idx = None
    hbits = hw = 0
    ngroups = 1
    if level0 and br.read(1):            # meta-huffman image
        hbits = br.read(3) + 2
        hw = _sub_size(cur_w, hbits)
        hh = _sub_size(h, hbits)
        himg = _decode_image_stream(br, hw, hh, False)
        meta_idx = ((himg >> 8) & 0xFFFF).astype(np.int64)
        ngroups = int(meta_idx.max()) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(ngroups):
        groups.append((_read_code(br, green_alpha), _read_code(br, 256),
                       _read_code(br, 256), _read_code(br, 256),
                       _read_code(br, 40)))

    npix = cur_w * h
    pix = [0] * npix
    pos = 0
    x = 0
    y = 0
    g_t, r_t, b_t, a_t, d_t = groups[0]
    use_meta = meta_idx is not None
    while pos < npix:
        if use_meta:
            g_t, r_t, b_t, a_t, d_t = groups[
                meta_idx[(y >> hbits) * hw + (x >> hbits)]]
        s = _read_sym(br, g_t)
        if s < 256:
            red = _read_sym(br, r_t)
            blue = _read_sym(br, b_t)
            alpha = _read_sym(br, a_t)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = p
            if cache is not None:
                cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> cshift] = p
            pos += 1
            x += 1
            if x == cur_w:
                x = 0
                y += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist = _plane_to_dist(_prefix_value(_read_sym(br, d_t), br),
                                  cur_w)
            if dist > pos or pos + length > npix:
                raise ValueError("VP8L backref out of range")
            for _ in range(length):
                p = pix[pos - dist]
                pix[pos] = p
                if cache is not None:
                    cache[(0x1E35A7BD * p & 0xFFFFFFFF) >> cshift] = p
                pos += 1
                x += 1
                if x == cur_w:
                    x = 0
                    y += 1
        else:
            p = cache[s - 280]
            pix[pos] = p
            pos += 1
            x += 1
            if x == cur_w:
                x = 0
                y += 1

    if not level0:
        return np.array(pix, np.uint32)

    # apply inverse transforms in reverse read order
    for ttype, bits, tdata, orig_w in reversed(transforms):
        if ttype == 2:                   # add green to red / blue
            arr = np.array(pix, np.uint32) if isinstance(pix, list) \
                else pix
            g = (arr >> 8) & 0xFF
            r = ((arr >> 16) + g) & 0xFF
            b = (arr + g) & 0xFF
            pix = (arr & 0xFF00FF00) | (r << 16) | b
        elif ttype == 1:                 # color transform inverse
            arr = np.array(pix, np.uint32) if isinstance(pix, list) \
                else pix
            tw = _sub_size(orig_w, bits)
            yi = (np.arange(h) >> bits)[:, None]
            xi = (np.arange(orig_w) >> bits)[None, :]
            m = tdata[(yi * tw + xi).ravel()]
            g = (arr >> 8) & 0xFF
            red = (arr >> 16) & 0xFF
            new_r = (red + _delta(m & 0xFF, g)) & 0xFF
            new_b = (arr + _delta((m >> 8) & 0xFF, g)
                     + _delta((m >> 16) & 0xFF, new_r)) & 0xFF
            pix = ((arr & 0xFF00FF00) | (new_r.astype(np.uint32) << 16)
                   | new_b.astype(np.uint32))
        elif ttype == 0:                 # predictor inverse (sequential)
            lst = list(pix) if not isinstance(pix, list) else pix
            tw = _sub_size(orig_w, bits)
            tmodes = ((tdata >> 8) & 0xFF).tolist()
            wloc = orig_w
            p2 = 0
            for yy in range(h):
                trow = (yy >> bits) * tw
                for xx in range(wloc):
                    mode = tmodes[trow + (xx >> bits)]
                    pred = _predict(mode, lst, p2, xx, yy, wloc)
                    lst[p2] = _addpix(lst[p2], pred)
                    p2 += 1
            pix = lst
        else:                            # color indexing inverse
            arr = np.array(pix, np.uint32) if isinstance(pix, list) \
                else pix
            pal = tdata
            n = len(pal)
            if bits:
                pw = _sub_size(orig_w, bits)
                sw = 8 >> bits
                xs = np.arange(orig_w)
                g = (arr.reshape(h, pw) >> 8) & 0xFF
                packed = g[:, xs >> bits]
                shift = (xs & ((1 << bits) - 1)) * sw
                idx = (packed >> shift[None, :]) & ((1 << sw) - 1)
            else:
                idx = (arr.reshape(h, cur_w) >> 8) & 0xFF
            safe = np.where(idx < n, idx, 0)
            out = pal[safe.ravel().astype(np.int64)]
            out[idx.ravel() >= n] = 0
            pix = out
    arr = np.array(pix, np.uint32) if isinstance(pix, list) else pix
    return arr


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                           # alpha_is_used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    argb = _decode_image_stream(br, w, h, True).reshape(h, w)
    out = np.empty((h, w, 4), np.uint8)
    out[:, :, 0] = (argb >> 16) & 0xFF
    out[:, :, 1] = (argb >> 8) & 0xFF
    out[:, :, 2] = argb & 0xFF
    out[:, :, 3] = (argb >> 24) & 0xFF
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF WebP container -> (h, w, 4) uint8 RGBA (lossless only)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP (DCT codec out of scope; lossless VP8L "
                "is decoded natively — reference frmts/webp)")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L/VP8 chunk")


# -------------------------------------------------------------- encode


def _emit_pixels(bw: _BitWriter, chans: tuple, codes: tuple) -> None:
    gc, rc, bc, ac = codes
    g, r, b, a = chans
    for i in range(len(g)):
        c, l = gc[g[i]]
        if l:
            bw.write_code(c, l)
        c, l = rc[r[i]]
        if l:
            bw.write_code(c, l)
        c, l = bc[b[i]]
        if l:
            bw.write_code(c, l)
        c, l = ac[a[i]]
        if l:
            bw.write_code(c, l)


def _write_entropy_image(bw: _BitWriter, r, g, b, a) -> None:
    """Write one entropy-coded subimage (no cache, no meta, literals)."""
    bw.write(0, 1)                       # no color cache
    gc = _emit_code(bw, Counter(g.tolist()), 256 + 24)
    rc = _emit_code(bw, Counter(r.tolist()), 256)
    bc = _emit_code(bw, Counter(b.tolist()), 256)
    ac = _emit_code(bw, Counter(a.tolist()), 256)
    _emit_code(bw, {0: 1}, 40)           # unused distance code
    _emit_pixels(bw, (g.tolist(), r.tolist(), b.tolist(), a.tolist()),
                 (gc, rc, bc, ac))


def encode_vp8l(img: np.ndarray, subtract_green: bool = True,
                predictor_mode: int | None = None,
                color_mult: tuple[int, int, int] | None = None,
                palette: bool = False) -> bytes:
    """(h, w, 3|4) uint8 -> VP8L chunk payload (lossless).

    Literal+Huffman coding; the transform kwargs exist so tests can
    exercise every decoder transform path (uniform predictor tile,
    uniform color-transform element, palettization with bundling)."""
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    h, w, nch = img.shape
    if h > 16384 or w > 16384:
        raise ValueError("VP8L dimension limit is 16384")
    r = img[:, :, 0].astype(np.uint32).ravel()
    g = img[:, :, 1].astype(np.uint32).ravel()
    b = img[:, :, 2].astype(np.uint32).ravel()
    a = (img[:, :, 3].astype(np.uint32).ravel() if nch == 4
         else np.full(h * w, 255, np.uint32))
    has_alpha = bool((a != 255).any())

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)                       # version

    cur_w = w
    if palette:
        argb = (a << 24) | (r << 16) | (g << 8) | b
        pal = np.unique(argb)
        n = len(pal)
        if n > 256:
            raise ValueError("palette encode needs <= 256 colors")
        idx = np.searchsorted(pal, argb).astype(np.uint32)
        bw.write(1, 1)
        bw.write(3, 2)                   # COLOR_INDEXING
        bw.write(n - 1, 8)
        # palette rows are delta-coded per channel
        pu8 = pal.view(np.uint8).reshape(-1, 4).astype(np.int32)
        d = np.empty_like(pu8)
        d[0] = pu8[0]
        d[1:] = (pu8[1:] - pu8[:-1]) & 0xFF
        d = d.astype(np.uint8).reshape(-1).view(np.uint32)
        _write_entropy_image(bw, (d >> 16) & 0xFF, (d >> 8) & 0xFF,
                             d & 0xFF, (d >> 24) & 0xFF)
        pbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if pbits:
            sw = 8 >> pbits
            pw = _sub_size(w, pbits)
            packed = np.zeros((h, pw), np.uint32)
            im = idx.reshape(h, w)
            for k in range(1 << pbits):
                cols = np.arange(k, w, 1 << pbits)
                packed[:, :len(cols)] |= im[:, cols] << (k * sw)
            idx = packed.ravel()
            cur_w = pw
        r = np.zeros_like(idx)
        g = idx
        b = np.zeros_like(idx)
        a = np.full_like(idx, 255)
        bw.write(0, 1)                   # end of transforms
    elif predictor_mode is not None:
        bits = 9                         # one 512px tile covers tests
        if w > 512 or h > 512:
            raise ValueError("predictor_mode test encoder: <=512px")
        bw.write(1, 1)
        bw.write(0, 2)                   # PREDICTOR
        bw.write(bits - 2, 3)
        tm = np.array([0xFF000000 | (predictor_mode << 8)], np.uint32)
        _write_entropy_image(bw, (tm >> 16) & 0xFF, (tm >> 8) & 0xFF,
                             tm & 0xFF, (tm >> 24) & 0xFF)
        bw.write(0, 1)                   # end of transforms
        argb = ((a << 24) | (r << 16) | (g << 8) | b).tolist()
        res = [0] * len(argb)
        pos = 0
        for yy in range(h):
            for xx in range(w):
                pred = _predict(predictor_mode, argb, pos, xx, yy, w)
                res[pos] = _subpix(argb[pos], pred)
                pos += 1
        res = np.array(res, np.uint32)
        r = (res >> 16) & 0xFF
        g = (res >> 8) & 0xFF
        b = res & 0xFF
        a = (res >> 24) & 0xFF
    elif color_mult is not None:
        g2r, g2b, r2b = color_mult
        bits = 9
        if w > 512 or h > 512:
            raise ValueError("color_mult test encoder: <=512px")
        bw.write(1, 1)
        bw.write(1, 2)                   # COLOR
        bw.write(bits - 2, 3)
        tm = np.array([0xFF000000 | ((r2b & 0xFF) << 16)
                       | ((g2b & 0xFF) << 8) | (g2r & 0xFF)], np.uint32)
        _write_entropy_image(bw, (tm >> 16) & 0xFF, (tm >> 8) & 0xFF,
                             tm & 0xFF, (tm >> 24) & 0xFF)
        bw.write(0, 1)
        m_g2r = np.full_like(g, g2r & 0xFF)
        m_g2b = np.full_like(g, g2b & 0xFF)
        m_r2b = np.full_like(g, r2b & 0xFF)
        b = (b - _delta(m_g2b, g) - _delta(m_r2b, r)) & 0xFF
        r = (r - _delta(m_g2r, g)) & 0xFF
    elif subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                   # SUBTRACT_GREEN
        bw.write(0, 1)                   # end of transforms
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    else:
        bw.write(0, 1)                   # no transforms

    bw.write(0, 1)                       # no color cache
    bw.write(0, 1)                       # no meta-huffman
    green_alpha = 256 + 24
    gc = _emit_code(bw, Counter(g.tolist()), green_alpha)
    rc = _emit_code(bw, Counter(r.tolist()), 256)
    bc = _emit_code(bw, Counter(b.tolist()), 256)
    ac = _emit_code(bw, Counter(a.tolist()), 256)
    _emit_code(bw, {0: 1}, 40)           # distance code (never used)
    _emit_pixels(bw, (g.tolist(), r.tolist(), b.tolist(), a.tolist()),
                 (gc, rc, bc, ac))
    _ = cur_w
    return bw.bytes()


def encode_webp_lossless(img: np.ndarray, **kw) -> bytes:
    """(h, w, 3|4) uint8 -> complete RIFF WebP file (lossless VP8L)."""
    payload = encode_vp8l(img, **kw)
    pad = b"\x00" if len(payload) & 1 else b""
    return (b"RIFF" + struct.pack("<I", 12 + len(payload) + len(pad))
            + b"WEBPVP8L" + struct.pack("<I", len(payload))
            + payload + pad)
