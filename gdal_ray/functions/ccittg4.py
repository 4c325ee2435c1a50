"""CCITT Group 4 (ITU-T T.6 / TIFF CCITTFAX4) codec, pure Python.

The 2-D MMR scheme used by TIFF Compression=4 and the CALS type-1
raster format: each row is coded against the previous (reference) row
with pass / horizontal / vertical modes; horizontal runs use the ITU-T
T.4 white/black terminating + make-up code tables (public standard
tables). Decoder and encoder; bit order is MSB-first (TIFF FillOrder
1, the only order the reference's fixtures use).

Output convention matches libtiff's PHOTOMETRIC_MINISWHITE handling at
the caller: the decoder returns 1 for BLACK runs and 0 for white
(i.e. raw T.6 colors); callers map to pixel values.
"""
from __future__ import annotations

import numpy as np

# ITU-T T.4 table 2: white run codes (run -> (bits, nbits))
_WHITE = {
    0: ("00110101", 8), 1: ("000111", 6), 2: ("0111", 4),
    3: ("1000", 4), 4: ("1011", 4), 5: ("1100", 4), 6: ("1110", 4),
    7: ("1111", 4), 8: ("10011", 5), 9: ("10100", 5),
    10: ("00111", 5), 11: ("01000", 5), 12: ("001000", 6),
    13: ("000011", 6), 14: ("110100", 6), 15: ("110101", 6),
    16: ("101010", 6), 17: ("101011", 6), 18: ("0100111", 7),
    19: ("0001100", 7), 20: ("0001000", 7), 21: ("0010111", 7),
    22: ("0000011", 7), 23: ("0000100", 7), 24: ("0101000", 7),
    25: ("0101011", 7), 26: ("0010011", 7), 27: ("0100100", 7),
    28: ("0011000", 7), 29: ("00000010", 8), 30: ("00000011", 8),
    31: ("00011010", 8), 32: ("00011011", 8), 33: ("00010010", 8),
    34: ("00010011", 8), 35: ("00010100", 8), 36: ("00010101", 8),
    37: ("00010110", 8), 38: ("00010111", 8), 39: ("00101000", 8),
    40: ("00101001", 8), 41: ("00101010", 8), 42: ("00101011", 8),
    43: ("00101100", 8), 44: ("00101101", 8), 45: ("00000100", 8),
    46: ("00000101", 8), 47: ("00001010", 8), 48: ("00001011", 8),
    49: ("01010010", 8), 50: ("01010011", 8), 51: ("01010100", 8),
    52: ("01010101", 8), 53: ("00100100", 8), 54: ("00100101", 8),
    55: ("01011000", 8), 56: ("01011001", 8), 57: ("01011010", 8),
    58: ("01011011", 8), 59: ("01001010", 8), 60: ("01001011", 8),
    61: ("00110010", 8), 62: ("00110011", 8), 63: ("00110100", 8),
    64: ("11011", 5), 128: ("10010", 5), 192: ("010111", 6),
    256: ("0110111", 7), 320: ("00110110", 8), 384: ("00110111", 8),
    448: ("01100100", 8), 512: ("01100101", 8), 576: ("01101000", 8),
    640: ("01100111", 8), 704: ("011001100", 9), 768: ("011001101", 9),
    832: ("011010010", 9), 896: ("011010011", 9),
    960: ("011010100", 9), 1024: ("011010101", 9),
    1088: ("011010110", 9), 1152: ("011010111", 9),
    1216: ("011011000", 9), 1280: ("011011001", 9),
    1344: ("011011010", 9), 1408: ("011011011", 9),
    1472: ("010011000", 9), 1536: ("010011001", 9),
    1600: ("010011010", 9), 1664: ("011000", 6),
    1728: ("010011011", 9),
}

# ITU-T T.4 table 3: black run codes
_BLACK = {
    0: ("0000110111", 10), 1: ("010", 3), 2: ("11", 2), 3: ("10", 2),
    4: ("011", 3), 5: ("0011", 4), 6: ("0010", 4), 7: ("00011", 5),
    8: ("000101", 6), 9: ("000100", 6), 10: ("0000100", 7),
    11: ("0000101", 7), 12: ("0000111", 7), 13: ("00000100", 8),
    14: ("00000111", 8), 15: ("000011000", 9), 16: ("0000010111", 10),
    17: ("0000011000", 10), 18: ("0000001000", 10),
    19: ("00001100111", 11), 20: ("00001101000", 11),
    21: ("00001101100", 11), 22: ("00000110111", 11),
    23: ("00000101000", 11), 24: ("00000010111", 11),
    25: ("00000011000", 11), 26: ("000011001010", 12),
    27: ("000011001011", 12), 28: ("000011001100", 12),
    29: ("000011001101", 12), 30: ("000001101000", 12),
    31: ("000001101001", 12), 32: ("000001101010", 12),
    33: ("000001101011", 12), 34: ("000011010010", 12),
    35: ("000011010011", 12), 36: ("000011010100", 12),
    37: ("000011010101", 12), 38: ("000011010110", 12),
    39: ("000011010111", 12), 40: ("000001101100", 12),
    41: ("000001101101", 12), 42: ("000011011010", 12),
    43: ("000011011011", 12), 44: ("000001010100", 12),
    45: ("000001010101", 12), 46: ("000001010110", 12),
    47: ("000001010111", 12), 48: ("000001100100", 12),
    49: ("000001100101", 12), 50: ("000001010010", 12),
    51: ("000001010011", 12), 52: ("000000100100", 12),
    53: ("000000110111", 12), 54: ("000000111000", 12),
    55: ("000000100111", 12), 56: ("000000101000", 12),
    57: ("000001011000", 12), 58: ("000001011001", 12),
    59: ("000000101011", 12), 60: ("000000101100", 12),
    61: ("000001011010", 12), 62: ("000001100110", 12),
    63: ("000001100111", 12),
    64: ("0000001111", 10), 128: ("000011001000", 12),
    192: ("000011001001", 12), 256: ("000001011011", 12),
    320: ("000000110011", 12), 384: ("000000110100", 12),
    448: ("000000110101", 12), 512: ("0000001101100", 13),
    576: ("0000001101101", 13), 640: ("0000001001010", 13),
    704: ("0000001001011", 13), 768: ("0000001001100", 13),
    832: ("0000001001101", 13), 896: ("0000001110010", 13),
    960: ("0000001110011", 13), 1024: ("0000001110100", 13),
    1088: ("0000001110101", 13), 1152: ("0000001110110", 13),
    1216: ("0000001110111", 13), 1280: ("0000001010010", 13),
    1344: ("0000001010011", 13), 1408: ("0000001010100", 13),
    1472: ("0000001010101", 13), 1536: ("0000001011010", 13),
    1600: ("0000001011011", 13), 1664: ("0000001100100", 13),
    1728: ("0000001100101", 13),
}

# shared extended make-up codes (T.4 table 3a)
_EXT = {
    1792: ("00000001000", 11), 1856: ("00000001100", 11),
    1920: ("00000001101", 11), 1984: ("000000010010", 12),
    2048: ("000000010011", 12), 2112: ("000000010100", 12),
    2176: ("000000010101", 12), 2240: ("000000010110", 12),
    2304: ("000000010111", 12), 2368: ("000000011100", 12),
    2432: ("000000011101", 12), 2496: ("000000011110", 12),
    2560: ("000000011111", 12),
}


def _decode_table(table: dict) -> dict:
    """(nbits, code_int) -> run value, merged with the shared
    extended make-ups."""
    out = {}
    for run, (bits, n) in {**table, **_EXT}.items():
        out[(n, int(bits, 2))] = run
    return out


_WHITE_DEC = _decode_table(_WHITE)
_BLACK_DEC = _decode_table(_BLACK)
_MAX_CODE_LEN = 14


class _BitReader:
    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0
        self.n = len(self.bits)

    def peek(self, k: int) -> int:
        end = min(self.pos + k, self.n)
        v = 0
        for b in self.bits[self.pos:end]:
            v = (v << 1) | int(b)
        v <<= k - (end - self.pos)
        return v

    def read_run(self, white: bool) -> int:
        """Total run length (make-ups + terminating)."""
        table = _WHITE_DEC if white else _BLACK_DEC
        total = 0
        while True:
            run = None
            code = 0
            for n in range(1, _MAX_CODE_LEN + 1):
                if self.pos + n > self.n:
                    raise ValueError("G4: truncated run code")
                code = (code << 1) | int(self.bits[self.pos + n - 1])
                run = table.get((n, code))
                if run is not None:
                    self.pos += n
                    break
            if run is None:
                raise ValueError("G4: bad run code")
            total += run
            if run < 64:  # terminating code ends the run
                return total
            if run >= 1792:
                # extended make-ups are colour-agnostic; a terminating
                # code still follows
                continue


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 decode -> uint8 array (1 = black run, 0 = white)."""
    br = _BitReader(data)
    out = np.zeros((height, width), np.uint8)
    # reference line: changing element positions; initially an
    # imaginary all-white line
    ref = [width, width]
    for y in range(height):
        cur: list[int] = []
        a0 = -1
        color = 0  # 0 = white
        while a0 < width:
            # locate b1: first change on ref line right of a0 with
            # opposite colour to a0's colour
            b1 = width
            i = 0
            while i < len(ref) and ref[i] <= a0:
                i += 1
            # changing elements alternate colours starting white->black
            # ref[i] has colour index i%2 (0 = white->black transition)
            while i < len(ref) and (i % 2) != color:
                i += 1
            if i < len(ref):
                b1 = ref[i]
            b2 = ref[i + 1] if i + 1 < len(ref) else width

            if br.pos >= br.n:
                raise ValueError("G4: truncated stream")
            # mode decode
            if br.bits[br.pos]:  # 1 -> V0
                br.pos += 1
                a1 = b1
                cur.append(a1)
                a0 = a1
                color ^= 1
            else:
                code7 = br.peek(7)
                if code7 >> 4 == 0b001:  # H mode: 001
                    br.pos += 3
                    r1 = br.read_run(color == 0)
                    r2 = br.read_run(color != 0)
                    base = a0 if a0 > 0 else 0
                    a1 = base + r1
                    a2 = a1 + r2
                    cur.append(a1)
                    cur.append(a2)
                    a0 = a2
                elif code7 >> 3 == 0b0001:  # pass: 0001
                    br.pos += 4
                    a0 = b2
                elif code7 >> 4 == 0b011:  # VR1
                    br.pos += 3
                    a1 = b1 + 1
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                elif code7 >> 4 == 0b010:  # VL1
                    br.pos += 3
                    a1 = b1 - 1
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                elif code7 >> 1 == 0b000011:  # VR2
                    br.pos += 6
                    a1 = b1 + 2
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                elif code7 >> 1 == 0b000010:  # VL2
                    br.pos += 6
                    a1 = b1 - 2
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                elif code7 == 0b0000011:  # VR3
                    br.pos += 7
                    a1 = b1 + 3
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                elif code7 == 0b0000010:  # VL3
                    br.pos += 7
                    a1 = b1 - 3
                    cur.append(a1)
                    a0 = a1
                    color ^= 1
                else:
                    # EOFB or garbage: stop decoding
                    return out
        # paint the row from the changing elements
        prev = 0
        paint = 0
        for k, x in enumerate(cur):
            x = max(0, min(x, width))
            if paint:
                out[y, prev:x] = 1
            prev = x
            paint ^= 1
        if paint and prev < width:
            out[y, prev:width] = 1
        ref = [min(max(x, 0), width) for x in cur if 0 <= x] + \
            [width, width]
    return out


class _BitWriter:
    __slots__ = ("chunks", "acc", "nacc")

    def __init__(self):
        self.chunks = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, bits: str):
        for b in bits:
            self.acc = (self.acc << 1) | (b == "1")
            self.nacc += 1
            if self.nacc == 8:
                self.chunks.append(self.acc)
                self.acc = 0
                self.nacc = 0

    def done(self) -> bytes:
        if self.nacc:
            self.chunks.append(self.acc << (8 - self.nacc))
            self.acc = 0
            self.nacc = 0
        return bytes(self.chunks)


def _put_run(w: _BitWriter, run: int, white: bool):
    table = _WHITE if white else _BLACK
    while run >= 2624:
        w.put(_EXT[2560][0])
        run -= 2560
    if run >= 64:
        makeup = min(run - run % 64, 1728) if run < 1792 else \
            (run // 64) * 64
        if makeup >= 1792:
            w.put(_EXT[makeup][0])
        else:
            w.put(table[makeup][0])
        run -= makeup
    w.put(table[run][0])


def _changes(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    return (d + 1).tolist()


def encode_g4(img: np.ndarray) -> bytes:
    """T.6 encode of a 0/1 array (1 = black), MSB-first, EOFB
    terminated."""
    h, width = img.shape
    w = _BitWriter()
    ref: list[int] = [width, width]
    for y in range(h):
        row = img[y]
        cur = _changes(row) + ([0] if False else [])
        if row[0]:  # line starts black: imaginary change at 0
            cur = [0] + cur
        cur_full = cur + [width, width]
        a0 = -1
        color = 0
        ci = 0
        while a0 < width:
            a1 = cur_full[ci] if ci < len(cur_full) else width
            # b1/b2 from ref line
            i = 0
            while i < len(ref) and ref[i] <= a0:
                i += 1
            while i < len(ref) and (i % 2) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else width
            b2 = ref[i + 1] if i + 1 < len(ref) else width
            if b2 < a1:  # pass mode
                w.put("0001")
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:  # vertical mode
                w.put({0: "1", 1: "011", 2: "000011", 3: "0000011",
                       -1: "010", -2: "000010", -3: "0000010"}[d])
                a0 = a1
                ci += 1
                color ^= 1
            else:  # horizontal mode
                a2 = cur_full[ci + 1] if ci + 1 < len(cur_full) else \
                    width
                w.put("001")
                base = a0 if a0 > 0 else 0
                _put_run(w, a1 - base, color == 0)
                _put_run(w, a2 - a1, color != 0)
                a0 = a2
                ci += 2
        ref = [x for x in cur_full[:len(cur_full) - 2]] + [width, width]
    w.put("000000000001" * 2)  # EOFB
    return w.done()
