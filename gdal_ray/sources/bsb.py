"""Maptech/NOAA BSB nautical chart reader (reference frmts/bsb/
bsb_read.c). ASCII header (VER/, BSB/ or NOS/ with RA=width,height,
RGB/ palette entries, continuation lines indented) terminated by
0x1A 0x00, then the bits-per-pixel byte and RLE scanlines: each line
opens with a variable-length 7-bit line marker (1-based, high bit
continues), runs pack the palette index in the top nColorSize bits
and a run count in the rest (0x80-continued), 0x00 terminates the
line. Conformed against the reference's own rgbsmall*.kap checksums
(tests/test_rawmisc.py)."""

from __future__ import annotations

import numpy as np


def sniff_bsb(data: bytes) -> bool:
    head = data[:1024]
    return (b"BSB/" in head or b"NOS/" in head) and b"RA=" in head


def read_bsb(data: bytes):
    """-> (pixels (h, w) uint8 palette indices, palette (n, 3), info)."""
    end = data.find(b"\x1a")
    if end < 0 or not sniff_bsb(data):
        raise ValueError("not a BSB chart")
    text = data[:end].decode("latin-1", "replace")
    # fold continuation lines (leading whitespace)
    lines: list[str] = []
    for raw in text.splitlines():
        if raw[:1].isspace() and lines:
            lines[-1] += "," + raw.strip()
        else:
            lines.append(raw.strip())
    w = h = None
    palette = {}
    info: dict[str, str] = {}
    for line in lines:
        if line.startswith(("BSB/", "NOS/")):
            m = dict(kv.split("=", 1) for kv in line[4:].split(",")
                     if "=" in kv)
            if "RA" in m:
                # RA=w,h got split; re-find in the raw line
                idx = line.find("RA=")
                parts = line[idx + 3:].split(",")
                w, h = int(parts[0]), int(parts[1])
            info.update(m)
        elif line.startswith("RGB/"):
            parts = line[4:].split(",")
            palette[int(parts[0])] = (int(parts[1]), int(parts[2]),
                                      int(parts[3]))
        elif "/" in line:
            info.setdefault(line.split("/", 1)[0], line.split("/", 1)[1])
    if w is None:
        raise ValueError("BSB: no RA= dimensions")

    pos = end
    # skip to the 0x1A 0x00 sequence end
    while pos + 1 < len(data) and not (data[pos] == 0x1A
                                       and data[pos + 1] == 0x00):
        pos += 1
    pos += 2
    color_size = data[pos]
    pos += 1
    if 0x31 <= color_size <= 0x38:
        color_size -= 0x30
    if not (0 < color_size <= 7):
        raise ValueError(f"BSB: bad bits-per-pixel {color_size}")
    value_shift = 7 - color_size
    value_mask = ((1 << color_size) - 1) << value_shift
    count_mask = (1 << (7 - color_size)) - 1

    px = np.zeros((h, w), np.uint8)
    n = len(data)

    # trailing index table: last 4 BE bytes point at h BE u32 offsets
    line_offsets = None
    if n >= 8:
        tbl = int.from_bytes(data[n - 4:n], "big")
        if tbl > pos and tbl + 4 * h <= n - 4 + 4 and \
                (n - 4 - tbl) // 4 in (h, h + 1):
            line_offsets = [int.from_bytes(data[tbl + 4 * i:
                                                tbl + 4 * i + 4], "big")
                            for i in range(h)]

    def read_marker(p, skip_zeros):
        """-> (marker, new_pos) or (None, p) past EOF."""
        marker = 0
        while p < n:
            b = data[p]
            p += 1
            if skip_zeros and marker == 0 and b == 0:
                continue
            marker = marker * 128 + (b & 0x7F)
            if not (b & 0x80):
                return marker, p
        return None, p

    for row in range(h):
        if line_offsets is not None:
            pos = line_offsets[row]
        marker, pos = read_marker(pos, skip_zeros=row != 0)
        if marker is None:
            break
        ipix = 0
        # a 0 byte ends the line ONLY if the line is full or the bytes
        # after it parse as the next row's marker (bsb_read.c do-while)
        while pos < n:
            b = data[pos]
            pos += 1
            if b == 0:
                if ipix >= w - 1 or row == h - 1:
                    break
                nxt, _ = read_marker(pos, skip_zeros=True)
                if nxt is not None and nxt in (row + 1, row + 2):
                    break
                continue  # spurious terminator inside a short line
            val = (b & value_mask) >> value_shift
            run = b & count_mask
            while b & 0x80 and pos < n:
                b = data[pos]
                pos += 1
                run = run * 128 + (b & 0x7F)
            stop = min(ipix + run + 1, w)
            px[row, ipix:stop] = val
            ipix = stop
        if pos >= n:
            break
    # the reference band shifts nonzero indices down by one (its color
    # table likewise drops entry 0 — bsbdataset.cpp IReadBlock)
    px[px > 0] -= 1
    pal = np.zeros((max(palette) if palette else 1, 3), np.uint8)
    for k, rgb in palette.items():
        if k >= 1:
            pal[k - 1] = rgb
    return px, pal, info
