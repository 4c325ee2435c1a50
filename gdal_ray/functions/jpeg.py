"""Pure-numpy baseline JPEG (JFIF) codec.

Replaces the JQ5 quantize+zlib stand-in for the corpus "jpeg" rows
with real JFIF bytes (VERDICT r2 directive #3). Semantics follow ITU
T.81 baseline sequential DCT with Huffman coding, matching what the
reference's vendored libjpeg implements (frmts/jpeg/libjpeg/jdhuff.c
baseline Huffman decode, jidctint.c IDCT, jcparam.c quality->quant
scaling, jfdctflt.c FDCT); this is an independent implementation from
the public spec, not a translation.

Encoder: quality-scaled Annex K quantization tables, Annex K standard
Huffman tables, YCbCr 4:4:4 (or single-component grayscale), float
DCT-II vectorized over all blocks, per-block Huffman emission.

Decoder: marker parse (SOI/APP/DQT/SOF0/DHT/SOS/DRI), entropy decode
via a 65536-entry code lookup over precomputed 16-bit bit-windows
(the whole scan's windows are built vectorized up front, so the
serial symbol loop is a few Python int ops per symbol), then
vectorized dequant + IDCT + color convert across every block at once.
Supports 1- and 3-component baseline scans, 4:4:4 and 4:2:0/4:2:2
sampling, restart intervals. Progressive/arithmetic/12-bit raise.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order: ZIGZAG[k] = raster index of k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU T.81 Annex K.1 quantization tables (in zigzag order here: stored
# raster; converted at use)
QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
QCHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)

# Annex K.3 standard Huffman tables: (BITS counts per length 1..16,
# HUFFVAL symbol list)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II matrix (T.81 A.3.3)
_k = np.arange(8)
DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
DCT_M[0, :] = 0.5 / np.sqrt(2)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling (jcparam.c semantics)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QLUM, QCHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits, values):
    """(code, length) per symbol from the BITS/HUFFVAL spec lists."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad to byte with 1s (T.81 F.1.2.3)
        self.acc = 0
        self.n = 0


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """DCT-II over (n, 8, 8) level-shifted samples, vectorized."""
    return np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D plane to 8x8 multiples (edge replicate) and split into
    raster-ordered blocks."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    return blocks, H // 8, W // 8


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) of a coefficient per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = v if v > 0 else -v
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_scan(comp_qcoef: list[np.ndarray], comp_tables: list[int],
                 restart_interval: int = 0) -> bytes:
    """Huffman-encode quantized zigzag coefficients (4:4:4 interleave:
    one block per component per MCU; RSTn every ``restart_interval``
    MCUs with DC predictor reset when nonzero)."""
    dc_codes = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    ac_codes = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHROM)]
    w = _BitWriter()
    nblocks = comp_qcoef[0].shape[0]
    pred = [0] * len(comp_qcoef)
    for bi in range(nblocks):
        if restart_interval and bi and bi % restart_interval == 0:
            w.flush()
            w.buf += bytes([0xFF, 0xD0 + ((bi // restart_interval - 1) & 7)])
            pred = [0] * len(comp_qcoef)
        for ci, zz in enumerate(comp_qcoef):
            tbl = comp_tables[ci]
            dcc, acc_ = dc_codes[tbl], ac_codes[tbl]
            row = zz[bi]
            diff = int(row[0]) - pred[ci]
            pred[ci] = int(row[0])
            size, bits = _magnitude(diff)
            c, ln = dcc[size]
            w.put(c, ln)
            if size:
                w.put(bits, size)
            nz = np.nonzero(row[1:])[0]
            prev = 0
            for idx in nz.tolist():
                run = idx - prev
                prev = idx + 1
                while run >= 16:
                    c, ln = acc_[0xF0]  # ZRL
                    w.put(c, ln)
                    run -= 16
                size, bits = _magnitude(int(row[1 + idx]))
                c, ln = acc_[(run << 4) | size]
                w.put(c, ln)
                w.put(bits, size)
            if prev != 63:
                c, ln = acc_[0x00]  # EOB
                w.put(c, ln)
    w.flush()
    return bytes(w.buf)


def _huff_arrays(spec) -> tuple[np.ndarray, np.ndarray]:
    """(code[256], length[256]) int64 arrays indexed by symbol."""
    code = np.zeros(256, np.int64)
    length = np.zeros(256, np.int64)
    for sym, (c, ln) in _canonical_codes(*spec).items():
        code[sym] = c
        length[sym] = ln
    return code, length


_DC_ARR = [_huff_arrays(DC_LUM), _huff_arrays(DC_CHROM)]
_AC_ARR = [_huff_arrays(AC_LUM), _huff_arrays(AC_CHROM)]


def _bit_length(a: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (frexp exponent; exact for
    |a| < 2^53, far above any baseline-JPEG coefficient)."""
    _, e = np.frexp(np.abs(a).astype(np.float64))
    return e.astype(np.int64)


def _encode_scan_fast(comp_qcoef: list[np.ndarray], comp_tables: list[int],
                      restart_interval: int = 0) -> bytes:
    """Vectorized Huffman scan encoder — bit-identical to the serial
    `_encode_scan` (4:4:4 interleave, one block per component per MCU).

    Strategy: build (value, nbits) event arrays per component (DC diff,
    ZRL, AC coefficient, EOB), order them globally by a (block, comp,
    zigzag-rank) key, then bit-pack the whole stream with numpy
    (per-restart-segment byte alignment with 1-padding), stuff 0xFF
    bytes and splice RSTn markers — all without a per-symbol loop.
    """
    ncomp = len(comp_qcoef)
    nblocks = comp_qcoef[0].shape[0]
    ri = int(restart_interval)
    stride = ncomp * 66
    keys_all, vals_all, nbits_all = [], [], []
    blk = np.arange(nblocks, dtype=np.int64)
    for ci, zz in enumerate(comp_qcoef):
        t = comp_tables[ci]
        dc_code, dc_len = _DC_ARR[t]
        ac_code, ac_len = _AC_ARR[t]
        zz = np.asarray(zz, np.int64)
        # --- DC: diff vs predecessor, predictor reset at segment starts
        dc = zz[:, 0]
        prev = np.empty_like(dc)
        prev[0] = 0
        prev[1:] = dc[:-1]
        if ri:
            prev[blk % ri == 0] = 0
        diff = dc - prev
        size = _bit_length(diff)
        bitsv = np.where(diff >= 0, diff,
                         diff + np.left_shift(np.int64(1), size) - 1)
        keys_all.append(blk * stride + ci * 66)
        vals_all.append((dc_code[size] << size) | np.where(size > 0, bitsv, 0))
        nbits_all.append(dc_len[size] + size)
        # --- AC coefficients (zigzag positions 1..63)
        rows, cols = np.nonzero(zz[:, 1:])
        rows = rows.astype(np.int64)
        kpos = cols.astype(np.int64) + 1
        prevk = np.empty_like(kpos)
        prevk[1:] = kpos[:-1]
        if len(kpos):
            prevk[0] = 0
        newrow = np.ones(len(rows), bool)
        newrow[1:] = rows[1:] != rows[:-1]
        prevk[newrow] = 0
        run = kpos - prevk - 1
        nzrl, rrem = run // 16, run % 16
        v = zz[rows, kpos]
        size = _bit_length(v)
        bitsv = np.where(v >= 0, v, v + np.left_shift(np.int64(1), size) - 1)
        sym = (rrem << 4) | size
        keys_all.append(rows * stride + ci * 66 + kpos + 1)
        vals_all.append((ac_code[sym] << size) | bitsv)
        nbits_all.append(ac_len[sym] + size)
        # --- ZRL fills for zero-runs >= 16, ranked just before their coef
        zr = np.nonzero(nzrl)[0]
        if len(zr):
            reps = nzrl[zr]
            total = int(reps.sum())
            start = np.cumsum(reps) - reps
            zi = np.arange(total) - np.repeat(start, reps)
            kz = np.repeat(kpos[zr] - rrem[zr], reps) - 16 * (np.repeat(reps, reps) - zi)
            keys_all.append(np.repeat(rows[zr], reps) * stride + ci * 66 + kz + 1)
            vals_all.append(np.full(total, ac_code[0xF0], np.int64))
            nbits_all.append(np.full(total, ac_len[0xF0], np.int64))
        # --- EOB where the block's last coded coefficient isn't k=63
        lastk = np.zeros(nblocks, np.int64)
        lastk[rows] = kpos  # rows ascending: final write per block wins
        eob = np.nonzero(lastk != 63)[0].astype(np.int64)
        keys_all.append(eob * stride + ci * 66 + 65)
        vals_all.append(np.full(len(eob), ac_code[0], np.int64))
        nbits_all.append(np.full(len(eob), ac_len[0], np.int64))

    keys = np.concatenate(keys_all)
    vals = np.concatenate(vals_all)
    nbits = np.concatenate(nbits_all)
    order = np.argsort(keys, kind="stable")
    vals, nbits, keys = vals[order], nbits[order], keys[order]

    # --- per-segment byte-aligned bit offsets
    segid = (keys // stride) // ri if ri else np.zeros(len(keys), np.int64)
    seg_change = np.empty(len(keys), bool)
    seg_change[0] = True
    seg_change[1:] = segid[1:] != segid[:-1]
    seg_starts = np.nonzero(seg_change)[0]
    nseg = len(seg_starts)
    seg_nbits = np.add.reduceat(nbits, seg_starts)
    seg_nbytes = (seg_nbits + 7) // 8
    seg_bit_base = np.concatenate([[0], np.cumsum(seg_nbytes * 8)[:-1]])
    cw = np.cumsum(nbits) - nbits  # unpadded global cumsum
    ev_seg = np.repeat(np.arange(nseg),
                       np.diff(np.concatenate([seg_starts, [len(keys)]])))
    off = (cw - cw[seg_starts][ev_seg]) + seg_bit_base[ev_seg]

    # --- scatter symbol bits into a 1-padded bit array, pack to bytes
    total_bits = int((seg_nbytes * 8).sum())
    bitarr = np.ones(total_bits, np.uint8)  # pad bits are 1s
    nb_total = int(nbits.sum())
    ev_of_bit = np.repeat(np.arange(len(keys)), nbits)
    within = np.arange(nb_total) - np.repeat(cw, nbits)
    bitarr[np.repeat(off, nbits) + within] = (
        (vals[ev_of_bit] >> (nbits[ev_of_bit] - 1 - within)) & 1)
    raw = np.packbits(bitarr)

    # --- stuff 0xFF bytes and splice RSTn markers, fully vectorized
    byte_seg = np.repeat(np.arange(nseg), seg_nbytes)
    is_ff = raw == 0xFF
    stuff_before = np.cumsum(is_ff) - is_ff  # stuffed zeros before byte j
    outpos = np.arange(len(raw)) + stuff_before + 2 * byte_seg
    out = np.zeros(len(raw) + int(is_ff.sum()) + 2 * (nseg - 1), np.uint8)
    out[outpos] = raw
    # stuffed 0x00 lands right after each 0xFF (next byte is >= 2 ahead)
    # markers: 2 bytes before each segment s >= 1
    if nseg > 1:
        seg_out_start = outpos[np.cumsum(seg_nbytes)[:-1]]
        out[seg_out_start - 2] = 0xFF
        out[seg_out_start - 1] = 0xD0 + (np.arange(nseg - 1) & 7)
    return out.tobytes()


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(table[ZIGZAG].astype(np.uint8))
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(pixels: np.ndarray, quality: int = 92,
                quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
                restart_interval: int | str = 0) -> bytes:
    """Baseline JFIF bytes for (h, w) grayscale or (h, w, 3) RGB uint8
    (4:4:4). Tables: quality-scaled Annex K, or explicit raster-order
    (lum, chrom) arrays via ``quant_tables`` (e.g. flat tables for
    white-noise-heavy content, where Annex K's low-frequency bias
    wastes rate)."""
    if pixels.dtype != np.uint8:
        raise ValueError("baseline JPEG is 8-bit")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if quant_tables is not None:
        qlum = np.asarray(quant_tables[0], np.int64)
        qchrom = np.asarray(quant_tables[1], np.int64)
    else:
        qlum, qchrom = _quality_tables(quality)
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        r, g, b = (pixels[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [y, cb, cr]
    if restart_interval == "auto":
        # target ~1024 restart segments: each segment is an independent
        # decode lane for the vectorized lockstep decoder (pixels are
        # unchanged — restarts only alter entropy packaging)
        nmcu = -(-h // 8) * -(-w // 8)
        restart_interval = max(1, -(-nmcu // 4096))
    qtabs = [qlum] + [qchrom] * (len(planes) - 1)
    comp_zz = []
    for plane, qt in zip(planes, qtabs):
        blocks, _, _ = _to_blocks(plane - 128.0)
        coef = _fdct_blocks(blocks).reshape(-1, 64)
        qc = np.round(coef / qt[None, :]).astype(np.int64)
        comp_zz.append(qc[:, ZIGZAG])

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")  # APP0
    out += _dqt_segment(0, qlum)
    if not gray:
        out += _dqt_segment(1, qchrom)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROM) + _dht_segment(1, 1, AC_CHROM)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos  # SOS
    out += _encode_scan_fast(comp_zz, [0] + [1] * (ncomp - 1), restart_interval)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


_LUT_CACHE: dict = {}


def _build_lut(bits, values) -> np.ndarray:
    """65536-entry lookup: 16-bit window -> (length << 8) | symbol.
    0 marks an invalid/unseen code (lengths are always >= 1).
    Cached by table content (corpus images share the Annex K tables)."""
    key = (tuple(bits), tuple(values))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut = np.zeros(65536, np.int32)
    codes = _canonical_codes(bits, values)
    for sym, (code, length) in codes.items():
        base = code << (16 - length)
        lut[base: base + (1 << (16 - length))] = (length << 8) | sym
    if len(_LUT_CACHE) < 64:
        _LUT_CACHE[key] = lut
    return lut


def _extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _Component:
    __slots__ = ("cid", "hsamp", "vsamp", "tq", "td", "ta", "blocks_w",
                 "blocks_h", "coefs", "nb")


def _parse_jpeg(data: bytes) -> dict:
    """Parse JFIF markers up to SOS; returns everything the entropy
    decoder needs (shared by single and batched decode)."""
    buf = np.frombuffer(data, np.uint8)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, list[int]] = {}
    ac_luts: dict[int, list[int]] = {}
    comps: list[_Component] = []
    h = w = 0
    restart_interval = 0
    adobe_transform = None  # APP14: 0=RGB passthrough, 1=YCbCr
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(seg[i + 1:i + 65], np.uint8).astype(np.int64)
                qtabs[tq] = tab[UNZIGZAG]  # store raster order
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                (ac_luts if tc else dc_luts)[th] = _build_lut(bits, values)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            for ci in range(nc):
                c = _Component()
                c.cid = seg[6 + 3 * ci]
                samp = seg[7 + 3 * ci]
                c.hsamp, c.vsamp = samp >> 4, samp & 15
                c.tq = seg[8 + 3 * ci]
                comps.append(c)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[-1]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            order = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in comps if c.cid == cs)
                comp.td, comp.ta = tdta >> 4, tdta & 15
                order.append(comp)
            # RGB color space: Adobe transform=0, or 'R','G','B'
            # component ids (libjpeg jdcolor semantics)
            rgb_direct = (adobe_transform == 0
                          or [c.cid for c in comps] == [82, 71, 66])
            pos += seglen
            return dict(buf=buf, pos=pos, order=order, comps=comps,
                        qtabs=qtabs, dc_luts=dc_luts, ac_luts=ac_luts,
                        h=h, w=w, restart_interval=restart_interval,
                        rgb_direct=rgb_direct)
        pos += seglen
    raise ValueError("no SOS marker found")


def decode_jpeg(data: bytes, scale_denom: int = 1) -> np.ndarray:
    """Decode baseline JFIF bytes to (h, w) or (h, w, 3) uint8.

    ``scale_denom`` in {1, 2, 4, 8} reproduces libjpeg's DCT-scaled
    decode (jdmaster.c + jidctred.c): output is ceil(dim/denom) and
    bit-exact with cinfo.scale_num/scale_denom = 1/denom.
    Progressive (SOF2) and lossless (SOF3) streams dispatch to their
    dedicated decoders (scale_denom applies to baseline only)."""
    try:
        parsed = _parse_jpeg(data)
    except NotImplementedError:
        sof = _sniff_sof(data)
        if sof == 0xC2 and scale_denom == 1:
            return decode_jpeg_progressive(data)
        if sof == 0xC3 and scale_denom == 1:
            return decode_jpeg_lossless(data)
        raise
    return _decode_entropy(**parsed, scale_denom=scale_denom)


def _sniff_sof(data: bytes) -> int | None:
    pos = 2
    n = len(data)
    while pos < n - 3:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        if m == 0xDA:
            return None
        pos += 2 + struct.unpack(">H", data[pos + 2:pos + 4])[0]
    return None


def decode_jpeg_tiff(stream: bytes, tables: bytes | None = None,
                     color: str = "auto") -> np.ndarray:
    """Decode one JPEG-in-TIFF strip/tile (Compression=7, TIFF
    TechNote2): ``tables`` is the JPEGTables tag payload (an
    abbreviated tables-only stream SOI+DQT/DHT+EOI) whose tables
    preload before the strip's own markers; ``color`` overrides the
    JFIF/Adobe colorspace heuristic from the TIFF PhotometricInterp
    tag — 'rgb' stacks the decoded planes directly (photometric=2,
    any component count), 'ycbcr' forces the YCbCr->RGB transform
    (photometric=6), 'auto' keeps the JFIF heuristics."""
    if tables and len(tables) > 4 and tables[:2] == b"\xff\xd8":
        body = tables[:-2] if tables[-2:] == b"\xff\xd9" else tables
        stream = body + stream[2:]
    parsed = _parse_jpeg(stream)
    if color == "rgb":
        parsed["rgb_direct"] = True
    elif color == "ycbcr":
        parsed["rgb_direct"] = False
    return _decode_entropy(**parsed)


def _decode_entropy(buf, pos, order, comps, qtabs, dc_luts, ac_luts,
                    h, w, restart_interval, rgb_direct=False,
                    scale_denom=1):
    hmax = max(c.hsamp for c in comps)
    vmax = max(c.vsamp for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    for c in comps:
        c.blocks_w = mcux * c.hsamp
        c.blocks_h = mcuy * c.vsamp
        c.nb = c.blocks_w * c.blocks_h
        c.coefs = np.zeros((c.nb, 64), np.int32)

    # entropy segment: everything up to the next non-RST marker;
    # unstuff 0xFF00 and note restart-marker bit positions
    tail = buf[pos:]
    ff = tail == 0xFF
    nxt = np.zeros_like(ff)
    nxt[:-1] = ff[:-1]
    markers = np.nonzero(ff[:-1] & (tail[1:] != 0x00))[0]
    end = len(tail)
    seg_bounds = []  # (start, end) byte ranges between restarts
    seg_start = 0
    for mpos in markers.tolist():
        mk = int(tail[mpos + 1])
        if 0xD0 <= mk <= 0xD7:
            seg_bounds.append((seg_start, mpos))
            seg_start = mpos + 2
            continue
        end = mpos
        break
    seg_bounds.append((seg_start, end))

    if restart_interval and len(seg_bounds) >= 4:
        _decode_lockstep(tail, seg_bounds, order, comps, dc_luts, ac_luts,
                         restart_interval, nmcu, mcux)
        return _idct_planes(comps, qtabs, h, w, hmax, vmax, rgb_direct,
                            scale_denom)

    # per-MCU block decode order, with everything the hot loop needs
    # prebound per entry: base = my*A + mx*B + C
    comp_pos = {id(c): comps.index(c) for c in comps}
    scat_idx: list[list[int]] = [[] for _ in comps]
    scat_val: list[list[int]] = [[] for _ in comps]
    mcu_layout = []
    for ci, c in enumerate(order):
        for by in range(c.vsamp):
            for bx in range(c.hsamp):
                A = c.vsamp * c.blocks_w * 64
                B = c.hsamp * 64
                C = by * c.blocks_w * 64 + bx * 64
                cp = comp_pos[id(c)]
                mcu_layout.append((ci, A, B, C, dc_luts[c.td].tolist(),
                                   ac_luts[c.ta].tolist(), scat_idx[cp], scat_val[cp]))

    zig = ZIGZAG.tolist()  # Python ints: fast list indexing in the loop
    mcu_idx = 0
    for seg_start, seg_end in seg_bounds:
        if mcu_idx >= nmcu:
            break
        seg = tail[seg_start:seg_end]
        # unstuff: drop 0x00 that follows 0xFF
        if len(seg) > 1:
            stuffed = np.zeros(len(seg), bool)
            stuffed[1:] = (seg[:-1] == 0xFF) & (seg[1:] == 0x00)
            seg = seg[~stuffed]
        bits = np.unpackbits(seg)
        nb_ = len(bits)
        # 16-bit sliding windows at every bit offset, vectorized
        ext = np.concatenate([bits, np.ones(16, np.uint8)]).astype(np.uint32)
        win = np.zeros(nb_ + 1, np.uint32)
        for k in range(16):
            win[:nb_ + 1] = (win[:nb_ + 1] << 1) | ext[k:k + nb_ + 1]
        win = win.astype(np.int64).tolist()
        preds = [0] * len(order)
        i = 0
        seg_mcus = (restart_interval if restart_interval else nmcu)
        for _ in range(min(seg_mcus, nmcu - mcu_idx)):
            my, mx = divmod(mcu_idx, mcux)
            for ci, A, B, C, dlut, alut, idxs, vals in mcu_layout:
                base = my * A + mx * B + C
                # DC
                p = dlut[win[i]]
                if p == 0:
                    raise ValueError("bad Huffman code (DC)")
                i += p >> 8
                size = p & 0xFF
                if size:
                    bitsv = win[i] >> (16 - size)
                    i += size
                    preds[ci] += (bitsv if bitsv >= (1 << (size - 1))
                                  else bitsv - (1 << size) + 1)
                idxs.append(base)
                vals.append(preds[ci])
                # AC
                k = 1
                while k < 64:
                    p = alut[win[i]]
                    if p == 0:
                        raise ValueError("bad Huffman code (AC)")
                    i += p >> 8
                    sym = p & 0xFF
                    if sym == 0x00:  # EOB
                        break
                    run = sym >> 4
                    size = sym & 15
                    if size == 0:  # ZRL
                        k += 16
                        continue
                    k += run
                    bitsv = win[i] >> (16 - size)
                    i += size
                    idxs.append(base + zig[k])
                    vals.append(bitsv if bitsv >= (1 << (size - 1))
                                else bitsv - (1 << size) + 1)
                    k += 1
            mcu_idx += 1
    for cpos, c in enumerate(comps):
        if scat_idx[cpos]:
            flat = c.coefs.reshape(-1)
            flat[np.array(scat_idx[cpos], np.int64)] = \
                np.array(scat_val[cpos], np.int64)
    return _idct_planes(comps, qtabs, h, w, hmax, vmax, rgb_direct,
                        scale_denom)


def _decode_lockstep(tail, seg_bounds, order, comps, dc_luts, ac_luts,
                     restart_interval, nmcu, mcux):
    """Single-image wrapper over the multi-image lockstep decoder."""
    _decode_lockstep_multi([dict(
        tail=tail, seg_bounds=seg_bounds, order=order, comps=comps,
        dc_luts=dc_luts, ac_luts=ac_luts,
        ri=int(restart_interval) or nmcu, nmcu=nmcu, mcux=mcux)])


def _decode_lockstep_multi(images: list[dict]) -> None:
    """Entropy-decode restart segments of MANY images simultaneously.

    Each restart segment is an independent bitstream (DC predictors
    reset at RSTn), so segments become numpy *lanes* and a vectorized
    Huffman state machine steps one symbol per active lane per
    iteration — the segment-parallel strategy GPU decoders use.
    Merging the lanes of a whole batch of images into one state
    machine amortizes the fixed per-iteration numpy overhead across
    every image in a map_batches batch: total serial steps = max
    symbols per segment over the batch, not per image.

    Per-lane constants (layout offset, LUT rows, coefficient base
    table, component offset) resolve every per-image difference, so
    images of mixed sizes/tables batch freely. Byte unstuffing is one
    vector pass per image (RST markers stay in place as inter-segment
    padding — the Huffman prefix property guarantees no in-segment
    symbol read consumes them). Writes quantized coefficients into
    each image's ``comps[*].coefs``.
    """
    # ---- global assembly over images
    byte_chunks = []
    lane_bit, lane_layoff, lane_nlay, lane_tbloff, lane_mcu0, lane_end = \
        [], [], [], [], [], []
    glay_A, glay_B, glay_C, glay_cploc, glay_cpglob = [], [], [], [], []
    gdc_row, gac_row = [], []
    base_tables = []
    lut_rows: dict[int, int] = {}   # id(lut array) -> stacked row
    lut_parts: list[np.ndarray] = []
    gcomps: list = []
    byte_off = 0
    tbl_off = 0
    lay_off = 0
    max_ncomp = 1
    max_coef = 0
    pad = np.full(3, 0xFF, np.uint8)

    def lut_row(arr) -> int:
        r = lut_rows.get(id(arr))
        if r is None:
            r = len(lut_parts)
            lut_rows[id(arr)] = r
            lut_parts.append(arr)
        return r

    for im in images:
        comps = im["comps"]
        order = im["order"]
        comp_off = len(gcomps)
        gcomps.extend(comps)
        max_ncomp = max(max_ncomp, len(comps))
        comp_idx = {id(c): i for i, c in enumerate(comps)}
        lA, lB, lC = [], [], []
        for c in order:
            max_coef = max(max_coef, c.nb * 64)
            for by in range(c.vsamp):
                for bx in range(c.hsamp):
                    lA.append(c.vsamp * c.blocks_w * 64)
                    lB.append(c.hsamp * 64)
                    lC.append(by * c.blocks_w * 64 + bx * 64)
                    glay_cploc.append(comp_idx[id(c)])
                    glay_cpglob.append(comp_off + comp_idx[id(c)])
                    gdc_row.append(lut_row(im["dc_luts"][c.td]) * 65536)
                    gac_row.append(lut_row(im["ac_luts"][c.ta]) * 65536)
        nlay = len(lA)
        glay_A.extend(lA)
        glay_B.extend(lB)
        glay_C.extend(lC)
        nmcu = im["nmcu"]
        myv, mxv = np.divmod(np.arange(nmcu, dtype=np.int64),
                             np.int64(im["mcux"]))
        base_tables.append(
            (myv[:, None] * np.array(lA, np.int64)[None, :]
             + mxv[:, None] * np.array(lB, np.int64)[None, :]
             + np.array(lC, np.int64)[None, :]).ravel())

        # one unstuffing pass per image; RST bytes remain as padding
        tail = im["tail"]
        seg_bounds = im["seg_bounds"]
        end_all = seg_bounds[-1][1]
        raw = tail[:end_all]
        stuffed = np.zeros(len(raw), bool)
        if len(raw) > 1:
            stuffed[1:] = (raw[:-1] == 0xFF) & (raw[1:] == 0x00)
        removed = np.cumsum(stuffed) if len(raw) else np.zeros(0, np.int64)
        byte_chunks.append(raw[~stuffed])
        byte_chunks.append(pad)
        ri = im["ri"]
        for li_, (a, _b) in enumerate(seg_bounds):
            m0 = li_ * ri
            if m0 >= nmcu:
                break
            # stuffed[a] is always False (segments begin after a
            # marker byte) so removed[a] counts strictly-before drops
            lane_bit.append((byte_off + a - int(removed[a])) * 8)
            lane_layoff.append(lay_off)
            lane_nlay.append(nlay)
            lane_tbloff.append(tbl_off)
            lane_mcu0.append(m0)
            lane_end.append(min(m0 + ri, nmcu))
        byte_off += len(byte_chunks[-2]) + 3
        tbl_off += nmcu * nlay
        lay_off += nlay

    nlanes = len(lane_bit)
    if not nlanes:
        return
    dt = (np.int32 if (byte_off * 8 < (1 << 31) - 64
                       and max_coef < (1 << 31) - 1
                       and tbl_off < (1 << 31) - 1) else np.int64)
    allb = np.concatenate(byte_chunks).astype(np.int32)
    b24 = (allb[:-2] << 16) | (allb[1:-1] << 8) | allb[2:]
    lay_A = np.array(glay_A, dt)
    lay_B = np.array(glay_B, dt)
    lay_C = np.array(glay_C, dt)
    lay_cp = np.array(glay_cploc, dt)
    lay_cpg = np.array(glay_cpglob, dt)
    dc_row = np.array(gdc_row, np.int32)
    ac_row = np.array(gac_row, np.int32)
    lut = np.concatenate(lut_parts)
    base_table = np.concatenate(base_tables).astype(dt)
    zig96 = np.concatenate([ZIGZAG, np.zeros(32, np.int64)]).astype(dt)

    # ---- compact lane state (filtered in place as lanes finish)
    ii = np.array(lane_bit, dt)                 # bit cursor
    loff = np.array(lane_layoff, dt)
    lnlay = np.array(lane_nlay, dt)
    toff = np.array(lane_tbloff, dt)
    mcu_g = np.array(lane_mcu0, dt)             # image-local MCU id
    end_mcu = np.array(lane_end, dt)
    lli = np.zeros(nlanes, dt)                  # layout position
    kk = np.zeros(nlanes, dt)                   # zigzag index (0 = DC)
    pred = np.zeros((nlanes, max_ncomp), dt)

    out_comp, out_idx, out_val = [], [], []
    while len(ii):
        gl = loff + lli
        isdc = kk == 0
        w16 = (b24[ii >> 3] >> (8 - (ii & 7))) & 0xFFFF
        look = lut[np.where(isdc, dc_row[gl], ac_row[gl]) + w16]
        if not look.all():
            raise ValueError("bad Huffman code")
        sym = look & 0xFF
        ii = ii + (look >> 8)
        size = np.where(isdc, sym, sym & 15)
        run = np.where(isdc, 0, sym >> 4)
        w16 = (b24[ii >> 3] >> (8 - (ii & 7))) & 0xFFFF
        bitsv = w16 >> (16 - size)  # size<=11 always; top bits only
        ii = ii + size
        half = np.left_shift(np.int32(1), np.maximum(size, 1) - 1)
        ext = np.where(size > 0,
                       np.where(bitsv >= half, bitsv, bitsv - 2 * half + 1), 0)
        # DC: accumulate predictor; AC normal: coefficient at kk+run
        cp = lay_cp[gl]
        dcr = np.flatnonzero(isdc)
        pred[dcr, cp[dcr]] += ext[dcr]
        coefpos = np.where(isdc, 0, kk + run)
        base = base_table[toff + mcu_g * lnlay + lli]
        wmask = isdc | (size > 0)
        out_comp.append(lay_cpg[gl][wmask])
        out_idx.append((base + zig96[coefpos])[wmask])
        out_val.append(np.where(isdc, pred[np.arange(len(ii)), cp],
                                ext)[wmask])
        # advance zigzag / block / MCU (EOB: sym==0 -> 64; ZRL: +16)
        nk = np.where(isdc, 1,
                      np.where(sym == 0, 64,
                               np.where(sym == 0xF0, kk + 16, kk + run + 1)))
        done = nk >= 64
        kk = np.where(done, 0, nk)
        lli = lli + done
        mcu_done = lli == lnlay
        lli = np.where(mcu_done, 0, lli)
        mcu_g = mcu_g + mcu_done
        alive = mcu_g < end_mcu
        if not alive.all():
            ii = ii[alive]
            kk = kk[alive]
            lli = lli[alive]
            mcu_g = mcu_g[alive]
            end_mcu = end_mcu[alive]
            loff = loff[alive]
            lnlay = lnlay[alive]
            toff = toff[alive]
            pred = pred[alive]
    if out_comp:
        oc = np.concatenate(out_comp)
        oi = np.concatenate(out_idx)
        ov = np.concatenate(out_val)
        for cpos, c in enumerate(gcomps):
            sel = oc == cpos
            if sel.any():
                c.coefs.reshape(-1)[oi[sel]] = ov[sel]


def _scan_segments(buf, pos):
    """(tail, seg_bounds): entropy bytes and the byte ranges between
    restart markers."""
    tail = buf[pos:]
    ff = tail == 0xFF
    markers = np.nonzero(ff[:-1] & (tail[1:] != 0x00))[0]
    end = len(tail)
    seg_bounds = []
    seg_start = 0
    for mpos in markers.tolist():
        mk = int(tail[mpos + 1])
        if 0xD0 <= mk <= 0xD7:
            seg_bounds.append((seg_start, mpos))
            seg_start = mpos + 2
            continue
        end = mpos
        break
    seg_bounds.append((seg_start, end))
    return tail, seg_bounds


def decode_jpeg_batch(datas: list[bytes]) -> list[np.ndarray]:
    """Decode a batch of baseline JFIF images in ONE lockstep state
    machine (see _decode_lockstep_multi). Equivalent to
    [decode_jpeg(d) for d in datas], much faster for many small or
    restart-segmented images."""
    outs: list = [None] * len(datas)
    lock = []
    for i, data in enumerate(datas):
        p = _parse_jpeg(data)
        comps = p["comps"]
        hmax = max(c.hsamp for c in comps)
        vmax = max(c.vsamp for c in comps)
        mcux = -(-p["w"] // (8 * hmax))
        mcuy = -(-p["h"] // (8 * vmax))
        nmcu = mcux * mcuy
        nlay = sum(c.hsamp * c.vsamp for c in p["order"])
        if nmcu * nlay > (1 << 25):
            outs[i] = _decode_entropy(**p)   # enormous raster: solo
            continue
        for c in comps:
            c.blocks_w = mcux * c.hsamp
            c.blocks_h = mcuy * c.vsamp
            c.nb = c.blocks_w * c.blocks_h
            c.coefs = np.zeros((c.nb, 64), np.int32)
        tail, seg_bounds = _scan_segments(p["buf"], p["pos"])
        lock.append((i, p, hmax, vmax, dict(
            tail=tail, seg_bounds=seg_bounds, order=p["order"],
            comps=comps, dc_luts=p["dc_luts"], ac_luts=p["ac_luts"],
            ri=p["restart_interval"] or nmcu, nmcu=nmcu, mcux=mcux)))
    # cap the merged lane count per state-machine run. Two cliffs
    # measured on this host: far beyond the cap each per-statement
    # temporary crosses glibc's mmap threshold and every numpy temp
    # becomes an mmap/munmap + page-fault round trip (30-100x
    # slower); nearer in, the ~30 live temporaries stop fitting L2.
    # 8192 lanes (32 KiB int32 temps) measured fastest across
    # small-image and 4096-segment 512x512 workloads.
    MAX_LANES = 8192
    chunk: list = []
    lanes = 0
    for entry in lock:
        n = len(entry[4]["seg_bounds"])
        if chunk and lanes + n > MAX_LANES:
            _decode_lockstep_multi([im for *_x, im in chunk])
            chunk, lanes = [], 0
        chunk.append(entry)
        lanes += n
    if chunk:
        _decode_lockstep_multi([im for *_x, im in chunk])
    for i, p, hmax, vmax, _im in lock:
        outs[i] = _idct_planes(p["comps"], p["qtabs"], p["h"], p["w"],
                               hmax, vmax, p["rgb_direct"])
    return outs


def _islow_butterfly(d0, d1, d2, d3, d4, d5, d6, d7):
    """Pre-DESCALE outputs of one 1-D pass of the Loeffler-Ligtenberg-
    Moshovitz integer IDCT with libjpeg's jidctint.c fixed-point plan
    (CONST_BITS=13) — the even/odd butterfly with the published FIX()
    multipliers. Every step is an exact integer linear combination of
    the inputs, which is what lets _ISLOW_C below exist."""
    z1 = (d2 + d6) * 4433                 # FIX_0_541196100
    t2 = z1 - d6 * 15137                  # -FIX_1_847759065
    t3 = z1 + d2 * 6270                   # FIX_0_765366865
    t0 = (d0 + d4) * 8192                 # << CONST_BITS
    t1 = (d0 - d4) * 8192
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    z1 = d7 + d1
    z2 = d5 + d3
    z3 = d7 + d3
    z4 = d5 + d1
    z5 = (z3 + z4) * 9633                 # FIX_1_175875602
    o0 = d7 * 2446                        # FIX_0_298631336
    o1 = d5 * 16819                       # FIX_2_053119869
    o2 = d3 * 25172                       # FIX_3_072711026
    o3 = d1 * 12299                       # FIX_1_501321110
    z1 = z1 * -7373                       # -FIX_0_899976223
    z2 = z2 * -20995                      # -FIX_2_562915447
    z3 = z3 * -16069 + z5                 # -FIX_1_961570560
    z4 = z4 * -3196 + z5                  # -FIX_0_390180644
    o0 += z1 + z3
    o1 += z2 + z4
    o2 += z2 + z3
    o3 += z1 + z4
    return (t10 + o3, t11 + o2, t12 + o1, t13 + o0,
            t13 - o0, t12 - o1, t11 - o2, t10 - o3)


# the butterfly is linear with a single final DESCALE, so one pass is
# exactly `(C @ d + round) >> bits`; derive the integer matrix by
# feeding the identity through the butterfly
_ISLOW_C = np.stack(_islow_butterfly(*np.eye(8, dtype=np.int64)))


_ISLOW_CF = _ISLOW_C.astype(np.float64)


def _idct_islow(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """jpeg_idct_islow for (N, 64) coefficient blocks -> (N, 8, 8)
    uint8 samples, bit-exact with libjpeg (jidctint.c: pass 1 over
    columns DESCALEd by CONST_BITS-PASS1_BITS=11, pass 2 over rows by
    CONST_BITS+PASS1_BITS+3=18, then +128 centering with clamp).

    Runs in float64 through BLAS: |dequantized| < 2^20 and |C| < 2^15,
    so every 8-term product-sum is < 2^44 — exact in float64 — and
    floor((x + 2^(b-1)) / 2^b) is exactly the arithmetic-shift
    DESCALE."""
    d = (coefs.astype(np.float64) *
         quant.astype(np.float64)[None, :]).reshape(-1, 8, 8)
    n = d.shape[0]
    # pass 1 (columns): ws = C @ block, run as ONE dgemm over all
    # blocks: rows (n, j) x features m
    a = np.ascontiguousarray(d.transpose(0, 2, 1)).reshape(-1, 8)
    ws = np.floor((a @ _ISLOW_CF.T + 1024.0) * (1.0 / 2048.0))
    ws = ws.reshape(n, 8, 8).transpose(0, 2, 1)  # back to [n, k, j]
    # pass 2 (rows): out = block @ C^T, contraction already on axis -1
    sp = np.floor((ws.reshape(-1, 8) @ _ISLOW_CF.T + 131072.0)
                  * (1.0 / 262144.0)).reshape(n, 8, 8)
    sp += 128.0
    np.clip(sp, 0, 255, out=sp)
    return sp.astype(np.uint8)


def _red4_butterfly(d0, d1, d2, d3, d4, d5, d6, d7):
    """Pre-DESCALE 8-to-4 1-D pass of libjpeg's reduced IDCT
    (jidctred.c jpeg_idct_4x4): each output is the average of two
    adjacent full-IDCT outputs, folded into one linear stage with the
    published CONST_BITS=13 multipliers. d4 is unused by design."""
    del d4
    tmp0 = d0 * 16384                     # << CONST_BITS+1
    tmp2 = d2 * 15137 - d6 * 6270         # FIX_1_847759065 / 0_765366865
    tmp10, tmp12 = tmp0 + tmp2, tmp0 - tmp2
    o0 = (d7 * -1730 + d5 * 11893         # FIX_0_211164243 / 1_451774981
          + d3 * -17799 + d1 * 8697)      # FIX_2_172734803 / 1_061594337
    o2 = (d7 * -4176 + d5 * -4926         # FIX_0_509795579 / 0_601344887
          + d3 * 7373 + d1 * 20995)       # FIX_0_899976223 / 2_562915447
    return (tmp10 + o2, tmp12 + o0, tmp12 - o0, tmp10 - o2)


def _red2_butterfly(d0, d1, d2, d3, d4, d5, d6, d7):
    """Pre-DESCALE 8-to-2 pass (jidctred.c jpeg_idct_2x2); only
    inputs 0,1,3,5,7 participate."""
    del d2, d4, d6
    tmp10 = d0 * 32768                    # << CONST_BITS+2
    tmp0 = (d7 * -5906 + d5 * 6967        # FIX_0_720959822 / 0_850430095
            + d3 * -10426 + d1 * 29692)   # FIX_1_272758580 / 3_624509785
    return (tmp10 + tmp0, tmp10 - tmp0)


_RED4_C = np.stack(_red4_butterfly(*np.eye(8, dtype=np.int64))) \
    .astype(np.float64)
_RED2_C = np.stack(_red2_butterfly(*np.eye(8, dtype=np.int64))) \
    .astype(np.float64)


def _idct_reduced(coefs: np.ndarray, quant: np.ndarray,
                  ssize: int) -> np.ndarray:
    """jpeg_idct_4x4 / 2x2 / 1x1 for (N, 64) blocks -> (N, s, s)
    uint8, bit-exact with jidctred.c (pass-1 DESCALE
    CONST_BITS-PASS1_BITS+k, pass-2 CONST_BITS+PASS1_BITS+3+k for
    k = log2(8/ssize); the AC-zero shortcuts in the C code are exact
    special cases of the general linear pass, so one matrix per pass
    reproduces them). Same float64-exactness argument as
    _idct_islow."""
    d = (coefs.astype(np.float64)
         * quant.astype(np.float64)[None, :]).reshape(-1, 8, 8)
    n = d.shape[0]
    if ssize == 1:
        sp = np.floor((d[:, 0, 0] + 4.0) * 0.125)[:, None, None] + 128.0
        np.clip(sp, 0, 255, out=sp)
        return sp.astype(np.uint8)
    C, b1, b2 = ((_RED4_C, 12, 19) if ssize == 4 else (_RED2_C, 13, 20))
    a = np.ascontiguousarray(d.transpose(0, 2, 1)).reshape(-1, 8)
    ws = np.floor((a @ C.T + float(1 << (b1 - 1))) * (1.0 / (1 << b1)))
    ws = ws.reshape(n, 8, ssize).transpose(0, 2, 1)   # (n, row, 8)
    sp = np.floor((ws.reshape(-1, 8) @ C.T + float(1 << (b2 - 1)))
                  * (1.0 / (1 << b2))).reshape(n, ssize, ssize)
    sp += 128.0
    np.clip(sp, 0, 255, out=sp)
    return sp.astype(np.uint8)


def _fancy_upsample(plane: np.ndarray, hf: int, vf: int) -> np.ndarray:
    """libjpeg 'fancy' (triangle-filter) chroma upsampling, bit-exact
    with jdsample.c h2v1_fancy_upsample / h2v2_fancy_upsample; other
    factors fall back to pixel replication."""
    p = plane.astype(np.int32)
    if vf == 2:
        up = np.empty((2 * p.shape[0], p.shape[1]), np.int32)
        prev = np.vstack([p[:1], p[:-1]])
        nxt = np.vstack([p[1:], p[-1:]])
        up[0::2] = 3 * p + prev   # column sums (x16 scale handled below)
        up[1::2] = 3 * p + nxt
        p, bias_scale = up, 4     # values are 4x; horizontal >> 4
    else:
        bias_scale = 2 if vf == 1 else None
    if vf not in (1, 2) or hf not in (1, 2):
        rep = np.repeat(np.repeat(plane, vf, axis=0), hf, axis=1)
        return rep
    if hf == 1:
        if vf == 2:  # v-only: jdsample uses replication for h1v2
            return np.repeat(plane, 2, axis=0)
        return plane
    w = p.shape[1]
    out = np.empty((p.shape[0], 2 * w), np.int32)
    left = np.hstack([p[:, :1], p[:, :-1]])
    right = np.hstack([p[:, 1:], p[:, -1:]])
    if vf == 2:  # h2v2: (3*colsum + neighbor + 8|7) >> 4
        out[:, 0::2] = (3 * p + left + 8) >> 4
        out[:, 1::2] = (3 * p + right + 7) >> 4
        out[:, 0] = (4 * p[:, 0] + 8) >> 4
        out[:, -1] = (4 * p[:, -1] + 7) >> 4
    else:        # h2v1: (3*s + neighbor + 1|2) >> 2
        out[:, 0::2] = (3 * p + left + 1) >> 2
        out[:, 1::2] = (3 * p + right + 2) >> 2
        out[:, 0] = p[:, 0]
        out[:, -1] = p[:, -1]
    return out.astype(np.uint8) if bias_scale else out


# fixed-point YCbCr->RGB per libjpeg jdcolor.c (SCALEBITS=16):
# FIX(1.40200)=91881 FIX(1.77200)=116130 FIX(0.34414)=22554
# FIX(0.71414)=46802; Cr/Cb tables indexed by the raw sample value
_X128 = np.arange(256, dtype=np.int64) - 128
_CR_R_TAB = ((91881 * _X128 + (1 << 15)) >> 16).astype(np.int32)
_CB_B_TAB = ((116130 * _X128 + (1 << 15)) >> 16).astype(np.int32)
_CR_G_TAB = (-46802 * _X128 + (1 << 15)).astype(np.int64)
_CB_G_TAB = (-22554 * _X128).astype(np.int64)


def _idct_planes(comps, qtabs, h, w, hmax, vmax, rgb_direct,
                 scale_denom=1):
    # dequant + libjpeg-exact integer IDCT per component.  For
    # scale_denom in {2,4,8} this follows jdmaster.c: the global
    # DCT_scaled_size is 8/scale_denom, but each lower-sampled
    # component doubles its own scaled size while that keeps its
    # plane no larger than the luma plane — so 4:2:0 at 1/2 decodes
    # luma via the 4x4 reduced IDCT and chroma at full 8x8, and the
    # planes line up with no upsampling step.
    minsz = 8 // scale_denom
    oh, ow = -(-h // scale_denom), -(-w // scale_denom)
    planes = []
    for c in comps:
        ssize = minsz
        while ssize < 8 and c.hsamp * ssize * 2 <= hmax * minsz \
                and c.vsamp * ssize * 2 <= vmax * minsz:
            ssize *= 2
        if ssize == 8:
            sp = _idct_islow(c.coefs, qtabs[c.tq])
        else:
            sp = _idct_reduced(c.coefs, qtabs[c.tq], ssize)
        plane = sp.reshape(c.blocks_h, c.blocks_w, ssize, ssize) \
            .transpose(0, 2, 1, 3) \
            .reshape(c.blocks_h * ssize, c.blocks_w * ssize)
        # component downsampled size at its own scaled resolution
        ch = -(-(h * c.vsamp * ssize) // (vmax * 8))
        cw = -(-(w * c.hsamp * ssize) // (hmax * 8))
        hf = (hmax * minsz) // (c.hsamp * ssize)
        vf = (vmax * minsz) // (c.vsamp * ssize)
        if hf != 1 or vf != 1:
            # crop to the downsampled image size first (jdsample
            # operates on downsampled_width), then triangle-upsample
            plane = _fancy_upsample(plane[:ch, :cw], hf, vf)
        planes.append(plane[:oh, :ow])

    if len(planes) == 1:
        return planes[0]
    if rgb_direct:
        return np.stack(planes, axis=2)
    y = planes[0].astype(np.int32)
    cb, cr = planes[1], planes[2]
    rgb = np.empty(y.shape + (3,), np.int32)
    rgb[..., 0] = y + _CR_R_TAB[cr]
    rgb[..., 1] = y + ((_CB_G_TAB[cb] + _CR_G_TAB[cr]) >> 16).astype(np.int32)
    rgb[..., 2] = y + _CB_B_TAB[cb]
    np.clip(rgb, 0, 255, out=rgb)
    return rgb.astype(np.uint8)


# ------------------------------------------------------------- lossless JPEG
class _LLBits:
    """MSB-first bit reader over the entropy-coded segment (0xFF00
    stuffing removed; marker-terminated)."""

    __slots__ = ("tail", "bp", "buf", "cnt", "m")

    def __init__(self, tail: bytes):
        self.tail = tail
        self.bp = 0
        self.buf = 0
        self.cnt = 0
        self.m = len(tail)

    def _fill(self):
        while self.cnt <= 48 and self.bp < self.m:
            b = self.tail[self.bp]
            if b == 0xFF:
                nxt = self.tail[self.bp + 1] if self.bp + 1 < self.m else 0
                if nxt == 0x00:
                    self.bp += 2
                else:
                    # restart or terminating marker: pad with zeros
                    self.bp = self.m
                    break
            else:
                self.bp += 1
            self.buf = ((self.buf << 8) | b) & ((1 << 56) - 1)
            self.cnt += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        if self.cnt < k:
            self.buf <<= (k - self.cnt)
            self.cnt = k
        v = (self.buf >> (self.cnt - k)) & ((1 << k) - 1)
        self.cnt -= k
        return v

    def huff(self, lut: np.ndarray) -> int:
        self._fill()
        if self.cnt >= 16:
            window = (self.buf >> (self.cnt - 16)) & 0xFFFF
        else:
            window = (self.buf << (16 - self.cnt)) & 0xFFFF
        e = int(lut[window])
        ln = e >> 8
        if ln == 0:
            raise ValueError("bad lossless Huffman code")
        if self.cnt < ln:
            self.buf <<= (ln - self.cnt)
            self.cnt = ln
        self.cnt -= ln
        return e & 0xFF


def decode_jpeg_lossless(data: bytes) -> np.ndarray:
    """Lossless JPEG (SOF3, ITU T.81 Annex H) — Huffman-coded
    prediction residuals, no DCT.  The scan's Ss field selects the
    predictor (1..7), Al the point transform; the first sample
    predicts 1<<(P-1-Pt) and row starts predict from Rb
    (libjpeg-turbo 2.2 semantics; the reference's byte_lossless.jpg
    pins checksum 4672 — note GDAL itself REJECTS the 16-bit
    uint16_lossless.jpg, which this decoder reads).  Non-subsampled
    single/multi component scans; SSSS=16 means +32768."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    dc_luts: dict[int, np.ndarray] = {}
    ncomp_sof = 0
    h = w = prec = 0
    order = []
    predictor = 1
    pt = 0
    ri = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                if tc == 0:
                    dc_luts[th] = _build_lut(bits,
                                             list(seg[i + 17:i + 17 + nv]))
                i += 17 + nv
        elif marker == 0xC3:
            prec, h, w, ncomp_sof = struct.unpack(">BHHB", seg[:6])
        elif marker == 0xDD:  # DRI
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            for si in range(ns):
                order.append((seg[1 + 2 * si], seg[2 + 2 * si] >> 4))
            predictor = seg[1 + 2 * ns]
            pt = seg[3 + 2 * ns] & 15
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("no SOS marker found")
    if prec == 0:
        raise ValueError("lossless JPEG: missing SOF3")
    ncomp = len(order)
    # split the entropy stream at RST markers (T.81 H.2.1: a restart
    # interval restarts the entropy coder AND the predictor); stuffed
    # 0xFF00 pairs are skipped here and unstuffed inside _LLBits.
    tail = data[pos:]
    m = len(tail)
    segs: list[bytes] = []
    i = i0 = 0
    while i < m - 1:
        if tail[i] != 0xFF:
            i += 1
        elif tail[i + 1] == 0x00:
            i += 2
        elif 0xD0 <= tail[i + 1] <= 0xD7:
            segs.append(tail[i0:i])
            i += 2
            i0 = i
        elif tail[i + 1] == 0xD9:
            break
        else:
            i += 1
    segs.append(tail[i0:])
    br = _LLBits(segs[0])
    seg_idx = 0
    mcus_in_interval = 0
    restart_y = restart_x = 0  # scan start is the first "restart"
    luts = [dc_luts[td] for _, td in order]
    out = np.zeros((h, w, ncomp), np.int64)
    default_pred = 1 << (prec - 1 - pt)
    for y in range(h):
        for x in range(w):
            if ri and mcus_in_interval == ri:
                seg_idx += 1
                br = _LLBits(segs[seg_idx]
                             if seg_idx < len(segs) else b"")
                mcus_in_interval = 0
                restart_y, restart_x = y, x
            mcus_in_interval += 1
            for ci in range(ncomp):
                ssss = br.huff(luts[ci])
                if ssss == 0:
                    diff = 0
                elif ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(br.bits(ssss), ssss)
                if y == restart_y:
                    # first line of a restart interval (H.1.1): the
                    # interval's first sample predicts the default,
                    # the rest of that line uses Ra (1-D predictor)
                    if x == restart_x:
                        pred = default_pred
                    else:
                        pred = int(out[y, x - 1, ci])
                elif x == 0:
                    pred = int(out[y - 1, 0, ci])
                else:
                    ra = int(out[y, x - 1, ci])
                    rb = int(out[y - 1, x, ci])
                    rc = int(out[y - 1, x - 1, ci])
                    pred = {1: ra, 2: rb, 3: rc,
                            4: ra + rb - rc,
                            5: ra + ((rb - rc) >> 1),
                            6: rb + ((ra - rc) >> 1),
                            7: (ra + rb) >> 1}[predictor]
                out[y, x, ci] = (pred + diff) & 0xFFFF
    out &= (1 << prec) - 1
    out <<= pt
    dt = np.uint8 if prec <= 8 else np.uint16
    res = out.astype(dt)
    return res[:, :, 0] if ncomp == 1 else res


# ----------------------------------------------------------- progressive JPEG
def decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2, spectral selection + successive
    approximation) per ITU T.81 Annex G / libjpeg jdphuff.c: DC
    first/refine and AC first/refine scans accumulate into the
    coefficient planes, then the shared dequant+IDCT+upsample+color
    pipeline finishes.  Scans loop until EOI; DHT may be redefined
    between scans; restart intervals reset predictors and EOB runs.
    (Plain-Python scan loop — the vectorized path stays baseline's.)"""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, np.ndarray] = {}
    ac_luts: dict[int, np.ndarray] = {}
    comps: list[_Component] = []
    h = w = 0
    restart_interval = 0
    adobe_transform = None
    n = len(data)
    hmax = vmax = 1
    mcux = mcuy = 0
    eobrun = 0

    def comp_dims(c):
        # non-interleaved scan block dims (libjpeg downsampled size)
        cw = -(-w * c.hsamp // hmax)
        ch_ = -(-h * c.vsamp // vmax)
        return -(-cw // 8), -(-ch_ // 8)

    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.frombuffer(seg[i + 1:i + 65],
                                    np.uint8).astype(np.int64)
                qtabs[tq] = tab[UNZIGZAG]
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                (ac_luts if tc else dc_luts)[th] = _build_lut(bits, values)
                i += 17 + nv
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("12-bit progressive JPEG")
            for ci in range(nc):
                c = _Component()
                c.cid = seg[6 + 3 * ci]
                samp = seg[7 + 3 * ci]
                c.hsamp, c.vsamp = samp >> 4, samp & 15
                c.tq = seg[8 + 3 * ci]
                comps.append(c)
            hmax = max(c.hsamp for c in comps)
            vmax = max(c.vsamp for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c.blocks_w = mcux * c.hsamp
                c.blocks_h = mcuy * c.vsamp
                c.nb = c.blocks_w * c.blocks_h
                c.coefs = np.zeros((c.nb, 64), np.int32)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":
            adobe_transform = seg[-1]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                c = next(c for c in comps if c.cid == cs)
                c.td, c.ta = tdta >> 4, tdta & 15
                scan_comps.append(c)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            pos += seglen
            # find entropy segment end (next marker that is not RST/FF00)
            br = _LLBits(b"")
            end = pos
            while end < n - 1:
                if data[end] == 0xFF and data[end + 1] != 0x00 and \
                        not (0xD0 <= data[end + 1] <= 0xD7):
                    break
                end += 1
            tail = data[pos:end]
            pos = end
            eobrun = 0
            zig = ZIGZAG.tolist()

            # split at restart markers
            segs = []
            s0 = 0
            i2 = 0
            m2 = len(tail)
            while i2 < m2 - 1:
                if tail[i2] == 0xFF and 0xD0 <= tail[i2 + 1] <= 0xD7:
                    segs.append(tail[s0:i2])
                    s0 = i2 + 2
                    i2 += 2
                else:
                    i2 += 1
            segs.append(tail[s0:])

            if ns > 1:
                # interleaved (DC scans): MCU order
                nmcu = mcux * mcuy
                mcu_idx = 0
                for segb in segs:
                    br = _LLBits(segb)
                    preds = {id(c): 0 for c in scan_comps}
                    lim = min(nmcu - mcu_idx,
                              restart_interval or nmcu)
                    for _ in range(lim):
                        my, mx = divmod(mcu_idx, mcux)
                        for c in scan_comps:
                            for by in range(c.vsamp):
                                for bx in range(c.hsamp):
                                    bi = ((my * c.vsamp + by) * c.blocks_w
                                          + mx * c.hsamp + bx)
                                    if ah == 0:
                                        ssss = br.huff(dc_luts[c.td])
                                        d = (_extend(br.bits(ssss), ssss)
                                             if ssss else 0)
                                        preds[id(c)] += d
                                        c.coefs[bi, 0] = \
                                            preds[id(c)] << al
                                    else:
                                        if br.bits(1):
                                            c.coefs[bi, 0] |= (1 << al)
                        mcu_idx += 1
            else:
                c = scan_comps[0]
                bw, bh = comp_dims(c)
                nblocks = bw * bh
                bidx = 0
                for segb in segs:
                    br = _LLBits(segb)
                    pred = 0
                    eobrun = 0
                    lim = min(nblocks - bidx,
                              restart_interval or nblocks)
                    for _ in range(lim):
                        byy, bxx = divmod(bidx, bw)
                        bi = byy * c.blocks_w + bxx
                        co = c.coefs[bi]
                        if ss == 0:     # DC scan
                            if ah == 0:
                                ssss = br.huff(dc_luts[c.td])
                                d = (_extend(br.bits(ssss), ssss)
                                     if ssss else 0)
                                pred += d
                                co[0] = pred << al
                            else:
                                if br.bits(1):
                                    co[0] |= (1 << al)
                        elif ah == 0:   # AC first
                            if eobrun > 0:
                                eobrun -= 1
                            else:
                                k = ss
                                while k <= se:
                                    sym = br.huff(ac_luts[c.ta])
                                    r, s_ = sym >> 4, sym & 15
                                    if s_ == 0:
                                        if r < 15:
                                            eobrun = (1 << r) - 1
                                            if r:
                                                eobrun += br.bits(r)
                                            break
                                        k += 16
                                        continue
                                    k += r
                                    co[zig[k]] = _extend(
                                        br.bits(s_), s_) << al
                                    k += 1
                        else:   # AC refine (jdphuff.c
                                # decode_mcu_AC_refine, exact flow)
                            p1 = 1 << al
                            m1 = -1 << al
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    sym = br.huff(ac_luts[c.ta])
                                    r, s_ = sym >> 4, sym & 15
                                    sval = 0
                                    if s_:
                                        sval = p1 if br.bits(1) else m1
                                    else:
                                        if r != 15:
                                            eobrun = 1 << r
                                            if r:
                                                eobrun += br.bits(r)
                                            break
                                    while True:   # do-while k <= se
                                        z = zig[k]
                                        if co[z] != 0:
                                            if br.bits(1) and \
                                                    (co[z] & p1) == 0:
                                                co[z] += (p1 if co[z] >= 0
                                                          else m1)
                                        else:
                                            r -= 1
                                            if r < 0:
                                                break
                                        k += 1
                                        if k > se:
                                            break
                                    if sval and k <= se:
                                        co[zig[k]] = sval
                                    k += 1
                            if eobrun > 0:
                                while k <= se:
                                    z = zig[k]
                                    if co[z] != 0:
                                        if br.bits(1) and \
                                                (co[z] & p1) == 0:
                                            co[z] += (p1 if co[z] >= 0
                                                      else m1)
                                    k += 1
                                eobrun -= 1
                        bidx += 1
            continue
        pos += seglen

    if not comps:
        raise ValueError("progressive JPEG: no SOF2")
    rgb_direct = (adobe_transform == 0
                  or [c.cid for c in comps] == [82, 71, 66])
    return _idct_planes(comps, qtabs, h, w, hmax, vmax, rgb_direct, 1)
