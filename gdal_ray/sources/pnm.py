"""PNM (Netpbm) raster driver (reference frmts/raw/pnmdataset.cpp):
P2/P3 ASCII and P5/P6 binary grayscale/RGB, 8- and 16-bit (maxval >
255 means big-endian 16-bit samples per the spec). Comments (#) are
allowed between header tokens."""

from __future__ import annotations

import numpy as np


def _tokens(data: bytes, need: int) -> tuple[list[int], int]:
    """First ``need`` header integers after the magic, skipping
    comments -> (values, offset just past the single whitespace that
    terminates the last one)."""
    vals: list[int] = []
    i = 2
    n = len(data)
    while len(vals) < need and i < n:
        c = data[i:i + 1]
        if c == b"#":
            j = data.find(b"\n", i)
            i = j + 1 if j >= 0 else n
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j:j + 1].isspace():
                j += 1
            vals.append(int(data[i:j]))
            i = j + 1 if len(vals) == need else j
    return vals, i


def decode_pnm(data: bytes) -> np.ndarray:
    if data[:1] != b"P" or data[1:2] not in b"23456":
        raise ValueError("not a PNM file")
    kind = data[1:2]
    nb = 3 if kind in (b"3", b"6") else 1
    (w, h, maxval), off = _tokens(data, 3)
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    if kind in (b"5", b"6"):
        px = np.frombuffer(data, dt, count=h * w * nb, offset=off)
    else:
        px = np.array(data[off:].split()[:h * w * nb],
                      dtype=dt.newbyteorder("="))
    px = px.astype(dt.newbyteorder("="))
    return px.reshape(h, w, nb)[:, :, 0] if nb == 1 else \
        px.reshape(h, w, nb)


def encode_pnm(px: np.ndarray, ascii_: bool = False) -> bytes:
    px = np.ascontiguousarray(px)
    nb = 1 if px.ndim == 2 else px.shape[2]
    if nb not in (1, 3):
        raise ValueError("PNM holds 1 or 3 bands")
    maxval = 65535 if px.dtype.itemsize == 2 else 255
    h, w = px.shape[:2]
    magic = {(1, False): b"P5", (3, False): b"P6",
             (1, True): b"P2", (3, True): b"P3"}[(nb, ascii_)]
    hdr = magic + f"\n{w} {h}\n{maxval}\n".encode()
    if ascii_:
        flat = px.reshape(-1)
        return hdr + b"\n".join(
            b" ".join(str(int(v)).encode() for v in flat[i:i + 16])
            for i in range(0, len(flat), 16)) + b"\n"
    dt = ">u2" if maxval == 65535 else "u1"
    return hdr + px.astype(dt).tobytes()
