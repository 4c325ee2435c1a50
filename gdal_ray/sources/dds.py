"""DirectDraw Surface (DDS) reader (reference frmts/dds; the DDS
header layout is Microsoft's published spec).

Header: "DDS " magic + 124-byte DDS_HEADER (height/width/pitch,
DDSPF pixel format: either RGB(A) bit masks for uncompressed
surfaces or a FourCC).  Implemented: uncompressed mask-based
surfaces (channel order recovered from the masks) and the BC1/BC2/
BC3 (DXT1/3/5) block decoders — 4x4 blocks with RGB565 endpoint
interpolation and the 4-bit / interpolated-alpha planes."""

from __future__ import annotations

import struct

import numpy as np


def _mask_shift(mask: int) -> tuple[int, int]:
    if mask == 0:
        return 0, 0
    shift = 0
    while not (mask >> shift) & 1:
        shift += 1
    bits = 0
    while (mask >> (shift + bits)) & 1:
        bits += 1
    return shift, bits


def _decode_dxt_color(block: bytes):
    c0, c1 = struct.unpack_from("<HH", block, 0)
    idx = struct.unpack_from("<I", block, 4)[0]

    def rgb(c):
        r = (c >> 11) & 31
        g = (c >> 5) & 63
        b = c & 31
        return np.array([r * 255 // 31, g * 255 // 63, b * 255 // 31],
                        np.int32)

    p = [rgb(c0), rgb(c1)]
    if c0 > c1:
        p.append((2 * p[0] + p[1]) // 3)
        p.append((p[0] + 2 * p[1]) // 3)
        alpha_idx3 = False
    else:
        p.append((p[0] + p[1]) // 2)
        p.append(np.zeros(3, np.int32))
        alpha_idx3 = True
    out = np.zeros((4, 4, 4), np.uint8)
    out[:, :, 3] = 255
    for i in range(16):
        sel = (idx >> (2 * i)) & 3
        y, x = divmod(i, 4)
        out[y, x, :3] = p[sel]
        if alpha_idx3 and sel == 3:
            out[y, x, 3] = 0
    return out


def read_dds(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"DDS ":
        raise ValueError("not a DDS file")
    height = struct.unpack_from("<I", data, 12)[0]
    width = struct.unpack_from("<I", data, 16)[0]
    pf_flags = struct.unpack_from("<I", data, 80)[0]
    fourcc = data[84:88]
    rgb_bits = struct.unpack_from("<I", data, 88)[0]
    masks = struct.unpack_from("<4I", data, 92)
    payload = data[128:]

    if pf_flags & 0x4 and fourcc in (b"DXT1", b"DXT3", b"DXT5"):
        bw = -(-width // 4)
        bh = -(-height // 4)
        bsize = 8 if fourcc == b"DXT1" else 16
        out = np.zeros((bh * 4, bw * 4, 4), np.uint8)
        pos = 0
        for by in range(bh):
            for bx in range(bw):
                block = payload[pos:pos + bsize]
                pos += bsize
                if fourcc == b"DXT1":
                    tile = _decode_dxt_color(block)
                else:
                    tile = _decode_dxt_color(block[8:])
                    if fourcc == b"DXT3":
                        abits = struct.unpack_from("<Q", block, 0)[0]
                        for i in range(16):
                            a4 = (abits >> (4 * i)) & 15
                            tile[i // 4, i % 4, 3] = a4 * 17
                    else:  # DXT5 interpolated alpha
                        a0, a1 = block[0], block[1]
                        bits = int.from_bytes(block[2:8], "little")
                        pal = [a0, a1]
                        if a0 > a1:
                            pal += [((6 - k) * a0 + (k + 1) * a1) // 7
                                    for k in range(6)]
                        else:
                            pal += [((4 - k) * a0 + (k + 1) * a1) // 5
                                    for k in range(4)] + [0, 255]
                        for i in range(16):
                            sel = (bits >> (3 * i)) & 7
                            tile[i // 4, i % 4, 3] = pal[sel]
                out[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4] = tile
        return out[:height, :width]

    # uncompressed mask-based
    bpp = rgb_bits // 8
    raw = np.frombuffer(payload, np.uint8,
                        width * height * bpp).reshape(height, width, bpp)
    vals = np.zeros((height, width), np.uint32)
    for b in range(bpp):
        vals |= raw[:, :, b].astype(np.uint32) << (8 * b)
    nch = 4 if masks[3] else 3
    out = np.zeros((height, width, nch), np.uint8)
    for ch, mask in enumerate(masks[:nch]):
        if mask == 0:
            continue
        shift, bits = _mask_shift(mask)
        v = (vals & np.uint32(mask)) >> np.uint32(shift)
        if bits < 8:
            v = (v * 255) // ((1 << bits) - 1)
        out[:, :, ch] = v.astype(np.uint8)
    return out
