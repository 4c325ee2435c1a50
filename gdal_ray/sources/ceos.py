"""CEOS SAR imagery reader (reference frmts/ceos/ceosopen.c +
ceosdataset.cpp).

A CEOS file is a chain of 12-byte-headed records (record number,
type, length — big endian unless the first two bytes are non-zero).
The image file-descriptor record carries ASCII ints: record count at
180(6), image record length at 186(6), bits/pixel 216(4), bands
232(4), lines 236(8), pixels 248(8), prefix/suffix bytes 276/288(4).
Band b's line i starts at ``fdr_len + i*(bands*rec_len) +
b*rec_len + 12 + prefix`` — band-interleaved-by-line."""

from __future__ import annotations

import struct

import numpy as np


def read_ceos(path: str):
    with open(path, "rb") as f:
        data = f.read()
    little = data[0] != 0 or data[1] != 0
    end = "<" if little else ">"
    rec_len = struct.unpack_from(end + "I", data, 8)[0]
    if not (12 <= rec_len <= 200000):
        end = ">" if end == "<" else "<"
        rec_len = struct.unpack_from(end + "I", data, 8)[0]
    # the record buffer includes its own 12-byte header (ceosopen.c:102)
    pach = data[:rec_len]

    def scan_int(off, length):
        return int(pach[off:off + length].decode("ascii", "replace")
                   .strip() or 0)

    n_rec_length = scan_int(186, 6)
    bits = scan_int(216, 4)
    nbands = scan_int(232, 4)
    nlines = scan_int(236, 8)
    npixels = scan_int(248, 8)
    prefix = scan_int(276, 4)
    line_offset = nbands * n_rec_length
    itemsize = bits // 8
    dtype = {1: np.uint8, 2: np.uint16}[itemsize]

    bands = []
    for b in range(nbands):
        start = rec_len + b * n_rec_length + 12 + prefix
        band = np.zeros((nlines, npixels), dtype)
        for i in range(nlines):
            off = start + i * line_offset
            if off + npixels * itemsize > len(data):
                break  # truncated fixtures zero-fill, like RawRasterBand
            band[i] = np.frombuffer(data, dtype, npixels, off)
        bands.append(band)
    px = bands[0] if nbands == 1 else np.stack(bands, axis=2)
    return px, {"bands": nbands, "lines": nlines, "pixels": npixels,
                "bits": bits}
