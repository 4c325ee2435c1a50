"""RIK (Swedish Lantmäteriet map) raster driver.

Re-derivation of frmts/rik/rikdataset.cpp:

- three header flavors: "RIK3" (string-prefixed projection + north/
  west as length-prefixed strings, binary scale/mpp/block geometry),
  RIK1 (old header with fSouth < 4000000: offset bounds +4002995 etc.
  and an extra iMPPDen word), RIK2 (fSouth >= 4000000, explicit
  iVertBlocks).  Strings are u16le-length-prefixed; doubles/words
  little-endian; iMPPNum is a float32 (rikdataset.cpp RIKHeader);
- bits/pixel must be 8; options 0x00/0x40 uncompressed, 0x01/0x41
  RLE, 0x0B LZW, 0x0D ZLIB (rikdataset.cpp:976-986);
- palette: 256 RGB byte triplets (read into B,G,R slots,
  rikdataset.cpp:1005-1012);
- a u32le per-block offset table (plus a size word per block for
  RIK3); block byte length = next non-zero offset (or file size)
  minus own offset; zero offset = all-zero block;
- RLE blocks: (count, color) byte pairs emitting count+1 pixels
  top-down; ZLIB blocks: zlib stream of the block pixels stored
  bottom-up (the reader flips, rikdataset.cpp:540-556); LZW blocks:
  GIF-style LSB-first codes with 8 bit pixels + 9..13 bit codes, the
  stream restarting at the code-bits-aligned position fileAlign on
  clear and on code-width change (GetNextLZWCode,
  rikdataset.cpp:166-216), pixels emitted bottom-up with the line
  break aligned up to 4 (OutputPixel, rikdataset.cpp:221-246);
- geotransform west-mpp/2, north+mpp/2 at mpp resolution
  (rikdataset.cpp:1209-1215); CRS is fixed RT90 2.5 gon V
  (EPSG:3021).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_OPT_UNCOMP = (0x00, 0x40)
_OPT_RLE = (0x01, 0x41)
_OPT_LZW = 0x0B
_OPT_ZLIB = 0x0D


def _rik_string(data: bytes, pos: int) -> tuple[str, int]:
    n = struct.unpack_from("<H", data, pos)[0]
    s = data[pos + 2:pos + 2 + n].decode("latin-1")
    return s, pos + 2 + n


def _lzw_decode(block: bytes, width: int, height: int) -> np.ndarray:
    """GetNextLZWCode + OutputPixel transcription."""
    if len(block) < 5:
        raise ValueError("RIK LZW: not enough bytes")
    has_clear = bool(block[4] & 0x80)
    max_bits = block[4] & 0x1F
    if max_bits > 13:
        raise ValueError("RIK LZW: invalid LZW_MAX_BITS")
    CLEAR = 1 << 8
    CODES = 1 << max_bits
    NO_CODE = CODES + 1
    last_added = CLEAR if has_clear else CLEAR - 1
    code_bits = 9
    prefix = [0] * 8192
    character = [0] * 8192
    for i in range(CLEAR):
        character[i] = i
    for i in range(CODES):
        prefix[i] = NO_CODE

    out = np.zeros(width * height, np.uint8)
    line_break = (width + 3) & ~3
    image_line = height - 1
    image_pos = 0
    file_pos = 5
    file_align = 5
    bits_taken = 0

    def next_code():
        nonlocal file_pos, file_align, bits_taken
        if file_pos == file_align:
            file_align += code_bits
        ret = 0
        left = code_bits
        while left > 0:
            if file_pos >= len(block):
                return -1
            tmp = block[file_pos] >> bits_taken
            if left < 8:
                tmp &= (1 << left) - 1
            ret |= tmp << (code_bits - left)
            left -= 8 - bits_taken
            bits_taken = 0
            if left < 0:
                bits_taken = 8 + left
            if bits_taken == 0:
                file_pos += 1
        return ret

    def output(px):
        nonlocal image_line, image_pos
        if image_pos < width and image_line >= 0:
            out[image_pos + image_line * width] = px
        image_pos += 1
        if image_pos == line_break:
            image_pos = 0
            image_line -= 1

    code = next_code()
    if code < 0:
        raise ValueError("RIK LZW: not enough bytes")
    output(code)
    last_output = code & 0xFF
    while (image_line >= 0 and (image_line or image_pos < width)
           and file_pos < len(block)):
        last_code = code
        code = next_code()
        if code < 0:
            raise ValueError("RIK LZW: not enough bytes")
        if has_clear and code == CLEAR:
            for i in range(CLEAR, CODES):
                prefix[i] = NO_CODE
            last_added = CLEAR
            code_bits = 9
            file_pos = file_align
            bits_taken = 0
            code = next_code()
            if code < 0:
                raise ValueError("RIK LZW: not enough bytes")
            if code > last_added:
                raise ValueError("RIK LZW: clear error")
            output(code)
            last_output = code & 0xFF
            continue
        stack = []
        decode = code
        if code == last_added + 1:
            stack.append(last_output)
            decode = last_code
        elif code > last_added + 1:
            raise ValueError("RIK LZW: too high code")
        i = 0
        while i < CODES and CLEAR <= decode < NO_CODE:
            i += 1
            stack.append(character[decode])
            decode = prefix[decode]
        if i >= CODES or decode >= NO_CODE:
            raise ValueError("RIK LZW: decode error")
        stack.append(decode & 0xFF)
        last_output = stack[-1]   # top of stack = first output pixel
        for px in reversed(stack):
            output(px)
        if last_code != NO_CODE and last_added != CODES - 1:
            last_added += 1
            if last_added >= 8192:
                raise ValueError("RIK LZW: decode error")
            prefix[last_added] = last_code
            character[last_added] = last_output
        if last_added == (1 << code_bits) - 1 and code_bits != max_bits:
            code_bits += 1
            file_pos = file_align
            bits_taken = 0
    return out.reshape(height, width)


def read_rik(data: bytes) -> dict:
    pos = 0
    rik3 = data[:4] == b"RIK3"
    if rik3:
        pos = 4
    name, pos = _rik_string(data, pos)
    if rik3:
        _proj, pos = _rik_string(data, pos)
        _unk, pos = _rik_string(data, pos)
        s_north, pos = _rik_string(data, pos)
        s_west, pos = _rik_string(data, pos)
        north, west = float(s_north), float(s_west)
        (scale,) = struct.unpack_from("<I", data, pos); pos += 4
        (mpp,) = struct.unpack_from("<f", data, pos); pos += 4
        bw, bh, hor, vert = struct.unpack_from("<4I", data, pos); pos += 16
        if mpp == 0:
            raise ValueError("RIK3: zero meters-per-pixel")
        bpp = data[pos]; pos += 1
        _unknown = data[pos]; pos += 1
        options = data[pos]; pos += 1
        south = north - vert * bh * mpp
        east = west + hor * bw * mpp
    else:
        if not name or len(name) == 0:
            raise ValueError("RIK: empty map name")
        (_unk,) = struct.unpack_from("<H", data, pos); pos += 2
        south, west, north, east = struct.unpack_from("<4d", data, pos)
        pos += 32
        (scale,) = struct.unpack_from("<I", data, pos); pos += 4
        (mppnum,) = struct.unpack_from("<f", data, pos); pos += 4
        if not np.isfinite([south, west, north, east]).all() or mppnum == 0:
            raise ValueError("RIK: bad header bounds")
        offset_bounds = south < 4000000
        mppden = 1
        if offset_bounds:   # RIK1
            south += 4002995; north += 5004000
            west += 201000; east += 302005
            (mppden,) = struct.unpack_from("<I", data, pos); pos += 4
            if mppden == 0:
                raise ValueError("RIK1: zero MPP denominator")
        mpp = mppnum / mppden
        bw, bh, hor = struct.unpack_from("<3I", data, pos); pos += 12
        if not (10 <= bw <= 2000 and 10 <= bh <= 2000):
            raise ValueError("RIK: implausible block size")
        vert = 0
        if not offset_bounds:
            (vert,) = struct.unpack_from("<I", data, pos); pos += 4
        if offset_bounds or not vert:
            vert = int(np.ceil((north - south) / (bh * mpp)))
        bpp = data[pos]; pos += 1
        if bpp != 8:
            raise ValueError("RIK: unsupported bits per pixel")
        options = data[pos]; pos += 1
        if options not in (0x00, 0x40, 0x01, 0x41, 0x0B, 0x0D):
            raise ValueError("RIK: unknown map options")
    palette = np.frombuffer(data, np.uint8, 768, pos).reshape(256, 3)
    pos += 768

    blocks = hor * vert
    if options == 0x00 and not rik3:
        # no offset table: consecutive raw blocks follow the palette
        offsets = [pos + i * bw * bh for i in range(blocks)]
    else:
        offsets = []
        for _ in range(blocks):
            (o,) = struct.unpack_from("<I", data, pos); pos += 4
            offsets.append(o)
            if rik3:
                pos += 4   # per-block size word
    file_size = len(data)

    px = np.zeros((vert * bh, hor * bw), np.uint8)
    for bi, off in enumerate(offsets):
        if not off:
            continue
        size = file_size
        for nxt in offsets[bi + 1:]:
            if nxt:
                size = nxt
                break
        size -= off
        bx, by = bi % hor, bi // hor
        block = data[off:off + size]
        if options in _OPT_UNCOMP:
            tile = np.frombuffer(block, np.uint8,
                                 bw * bh).reshape(bh, bw)
        elif options in _OPT_RLE:
            tile = np.zeros(bw * bh, np.uint8)
            fp = ip = 0
            while fp + 1 < len(block) and ip < bw * bh:
                count, color = block[fp], block[fp + 1]
                fp += 2
                n = min(count + 1, bw * bh - ip)
                tile[ip:ip + n] = color
                ip += n
            tile = tile.reshape(bh, bw)
        elif options == _OPT_ZLIB:
            raw = zlib.decompress(block, bufsize=bw * bh)
            tile = np.frombuffer(raw, np.uint8,
                                 bw * bh).reshape(bh, bw)[::-1]
        else:
            tile = _lzw_decode(block, bw, bh)
        px[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = tile

    gt = (west - mpp / 2.0, mpp, 0.0, north + mpp / 2.0, 0.0, -mpp)
    return {"pixels": px, "gt": gt, "epsg": 3021, "driver": "RIK",
            "palette": palette, "metadata": {"NAME": name,
                                             "SCALE": int(scale),
                                             "MPP": float(mpp),
                                             "OPTIONS": int(options)}}


def write_rik(px: np.ndarray, west: float = 1400000.0,
              north: float = 6500000.0, mpp: float = 1.0,
              block: tuple[int, int] = (16, 16),
              options: int = 0x0D,
              palette: np.ndarray | None = None) -> bytes:
    """RIK2-header writer (tests; fSouth >= 4000000 layout)."""
    h, w = px.shape
    bw, bh = block
    hor, vert = -(-w // bw), -(-h // bh)
    full = np.zeros((vert * bh, hor * bw), np.uint8)
    full[:h, :w] = px
    south = north - vert * bh * mpp
    east = west + hor * bw * mpp
    name = b"synthetic"
    out = bytearray()
    out += struct.pack("<H", len(name)) + name
    out += struct.pack("<H", 0)
    out += struct.pack("<4d", south, west, north, east)
    out += struct.pack("<I", 10000)
    out += struct.pack("<f", mpp)
    out += struct.pack("<3I", bw, bh, hor)
    out += struct.pack("<I", vert)
    out += bytes([8, options])
    if palette is None:
        palette = np.stack([np.arange(256)] * 3, 1).astype(np.uint8)
    out += palette.astype(np.uint8).tobytes()
    tiles = []
    for by in range(vert):
        for bx in range(hor):
            tile = full[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw]
            if options in _OPT_UNCOMP:
                tiles.append(tile.tobytes())
            elif options in _OPT_RLE:
                flat = tile.reshape(-1)
                enc = bytearray()
                i = 0
                while i < len(flat):
                    run = 1
                    while (run < 256 and i + run < len(flat)
                           and flat[i + run] == flat[i]):
                        run += 1
                    enc += bytes([run - 1, flat[i]])
                    i += run
                tiles.append(bytes(enc))
            elif options == _OPT_ZLIB:
                tiles.append(zlib.compress(tile[::-1].tobytes()))
            else:
                raise NotImplementedError(
                    "RIK writer: LZW encoding not implemented (the "
                    "decoder is exercised with hand-built streams)")
    if options == 0x00:
        for t in tiles:
            out += t
        return bytes(out)
    table_pos = len(out)
    out += b"\x00" * 4 * (hor * vert)
    offs = []
    for t in tiles:
        offs.append(len(out))
        out += t
    for i, o in enumerate(offs):
        struct.pack_into("<I", out, table_pos + 4 * i, o)
    return bytes(out)
