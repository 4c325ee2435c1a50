"""Terrain heightfield drivers: JDEM, Terragen, Leveller, GXF.

All four are single-band elevation formats the reference ships as
stand-alone frmts drivers; each reader below is a from-scratch numpy
re-derivation of the published layout, conformed against the
reference's own autotest fixtures (tests/test_heightfield.py):

- JDEM (frmts/jdem/jdemdataset.cpp): Japanese DEM, 1011-byte ASCII
  header, one ASCII record per scanline, values in 0.1 m units,
  DMS-packed corner angles, Tokyo datum (EPSG:4301).
- Terragen (frmts/terragen/terragendataset.cpp): "TERRAGENTERRAIN "
  chunked binary, little-endian int16 elevations stored bottom-up;
  band exposes the RAW int16 values with scale = SCAL/65536 *
  heightscale and offset = SCAL * baseheight (read-only semantics).
- Leveller (frmts/leveller/levellerdataset.cpp): "trrn" + version
  byte, [len][descriptor][uint32 datalen][data] tag stream, float32
  row-major heightfield at the hf_data tag.
- GXF (frmts/gxf/gxfopen.c): Geosoft ASCII grid, #-tagged headers,
  whitespace-separated values with a literal dummy token, default
  #SENSE 1 (lower-left origin scanning right -> vertical flip).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# JDEM
# ---------------------------------------------------------------------------

_JDEM_HEADER = 1011


def _jdem_int(buf: bytes, off: int, width: int) -> int:
    s = buf[off:off + width].decode("ascii", "replace").strip()
    try:
        return int(s)
    except ValueError:
        return 0


def _jdem_angle(buf: bytes, off: int) -> float:
    n = _jdem_int(buf, off, 7)
    return n // 10000 + (n // 100) % 100 / 60.0 + n % 100 / 3600.0


def sniff_jdem(data: bytes) -> bool:
    if len(data) < _JDEM_HEADER:
        return False
    for off in (11, 15, 19):
        if data[off:off + 2] not in (b"19", b"20"):
            return False
    ll_lat, ll_lon = _jdem_angle(data, 29), _jdem_angle(data, 36)
    ur_lat, ur_lon = _jdem_angle(data, 43), _jdem_angle(data, 50)
    return (0 <= ll_lat <= ur_lat <= 90) and (0 <= ll_lon <= ur_lon <= 180)


def read_jdem(data: bytes):
    """-> (float32 (h, w), gt). Values are stored decimeters * 0.1."""
    if not sniff_jdem(data):
        raise ValueError("not a JDEM file")
    w = _jdem_int(data, 23, 3)
    h = _jdem_int(data, 26, 3)
    rec = w * 5 + 9 + 2
    px = np.zeros((h, w), np.float32)
    for y in range(h):
        row = data[_JDEM_HEADER + rec * y:_JDEM_HEADER + rec * (y + 1)]
        if row[:6] != data[:6]:
            raise ValueError(f"JDEM scanline {y} corrupt")
        if _jdem_int(row, 6, 3) != y + 1:
            raise ValueError(f"JDEM scanline {y} out of order")
        vals = np.frombuffer(row[9:9 + 5 * w], np.uint8).reshape(w, 5)
        # vectorized atoi over the fixed 5-char fields
        digs = vals - ord("0")
        num = np.zeros(w, np.int64)
        neg = np.zeros(w, bool)
        started = np.zeros(w, bool)
        for k in range(5):
            d = digs[:, k]
            isdig = (d >= 0) & (d <= 9)
            neg |= (~started) & (vals[:, k] == ord("-"))
            num = np.where(isdig, num * 10 + np.where(isdig, d, 0), num)
            started |= isdig
        px[y] = np.where(neg, -num, num).astype(np.float32) * np.float32(0.1)
    ll_lat, ll_lon = _jdem_angle(data, 29), _jdem_angle(data, 36)
    ur_lat, ur_lon = _jdem_angle(data, 43), _jdem_angle(data, 50)
    gt = (ll_lon, (ur_lon - ll_lon) / w, 0.0,
          ur_lat, 0.0, -(ur_lat - ll_lat) / h)
    return px, gt


# ---------------------------------------------------------------------------
# Terragen
# ---------------------------------------------------------------------------

_TERRAGEN_MAGIC = b"TERRAGENTERRAIN "


def sniff_terragen(data: bytes) -> bool:
    return data[:16] == _TERRAGEN_MAGIC


def read_terragen(data: bytes):
    """-> (int16 (h, w), gt, scale, offset). Band carries the raw
    int16 values like the reference's read-only band; physical
    elevation = raw * scale + offset."""
    if not sniff_terragen(data):
        raise ValueError("not a Terragen terrain file")
    pos = 16
    scal = 30.0
    height_scale = base_height = 0
    xpts = ypts = None
    size = None
    data_off = None
    while pos + 4 <= len(data):
        tag = data[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            size = struct.unpack_from("<H", data, pos)[0]
            pos += 4
        elif tag == b"XPTS":
            xpts = struct.unpack_from("<H", data, pos)[0]
            pos += 4
        elif tag == b"YPTS":
            ypts = struct.unpack_from("<H", data, pos)[0]
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", data, pos)[1]
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            height_scale, base_height = struct.unpack_from("<2h", data, pos)
            pos += 4
            data_off = pos
            nx = xpts if xpts is not None else (size + 1 if size else 0)
            ny = ypts if ypts is not None else (size + 1 if size else 0)
            pos += nx * ny * 2
        elif tag == b"EOF ":
            break
        else:
            raise ValueError(f"Terragen: unknown chunk {tag!r}")
    if size is not None:
        xpts = xpts if xpts is not None else size + 1
        ypts = ypts if ypts is not None else size + 1
    if not xpts or not ypts or data_off is None:
        raise ValueError("Terragen: missing SIZE/ALTW chunks")
    raw = np.frombuffer(data, "<i2", xpts * ypts, data_off).reshape(
        ypts, xpts)
    px = raw[::-1].copy()  # bottom-up storage -> north-up
    gt = (0.0, scal, 0.0, 0.0, 0.0, scal)
    return px, gt, scal / 65536.0 * height_scale, scal * base_height


# ---------------------------------------------------------------------------
# Leveller
# ---------------------------------------------------------------------------

def sniff_leveller(data: bytes) -> bool:
    return data[:4] == b"trrn"


def _leveller_tags(data: bytes):
    pos = 5
    while pos < len(data):
        dlen = data[pos]
        if dlen == 0 or dlen > 64 or pos + 1 + dlen + 4 > len(data):
            return
        desc = data[pos + 1:pos + 1 + dlen].decode("ascii", "replace")
        pos += 1 + dlen
        n = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        yield desc, pos, n
        pos += n


def read_leveller(data: bytes):
    """-> (float32 (h, w), scale, offset)."""
    if not sniff_leveller(data):
        raise ValueError("not a Leveller heightfield")
    tags = {}
    for desc, off, n in _leveller_tags(data):
        tags[desc] = (off, n)
    if "hf_w" not in tags or "hf_b" not in tags or "hf_data" not in tags:
        raise ValueError("Leveller: missing hf_w/hf_b/hf_data tags")
    w = struct.unpack_from("<i", data, tags["hf_w"][0])[0]
    h = struct.unpack_from("<i", data, tags["hf_b"][0])[0]
    off, n = tags["hf_data"]
    if n != w * h * 4:
        raise ValueError("Leveller: hf_data size mismatch")
    px = np.frombuffer(data, "<f4", w * h, off).reshape(h, w).copy()
    scale, offset = 1.0, 0.0
    if "coordsys_em_scale" in tags:
        scale = struct.unpack_from("<d", data,
                                   tags["coordsys_em_scale"][0])[0]
    if "coordsys_em_base" in tags:
        offset = struct.unpack_from("<d", data,
                                    tags["coordsys_em_base"][0])[0]
    return px, scale, offset


# ---------------------------------------------------------------------------
# GXF
# ---------------------------------------------------------------------------

def sniff_gxf(data: bytes) -> bool:
    head = data[:2048].lstrip()
    return head.startswith(b"#") and (b"#GRID" in data[:65536]
                                      or b"#POIN" in data[:2048])


def read_gxf(text_or_bytes):
    """Uncompressed GXF grid -> (float32 (h, w) north-up, gt | None,
    nodata | None). Compressed (#GTYPE > 0) rasters raise."""
    data = text_or_bytes
    if isinstance(data, bytes):
        data = data.decode("ascii", "replace")
    lines = data.splitlines()
    hdr: dict[str, list[str]] = {}
    grid_start = None
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("#"):
            title = ln.strip().upper()
            if title.startswith("#GRID"):
                grid_start = i + 1
                break
            vals = []
            i += 1
            while i < len(lines) and not lines[i].startswith("#"):
                if lines[i].strip():
                    vals.append(lines[i].strip())
                i += 1
            hdr[title] = vals
            continue
        i += 1
    if grid_start is None:
        raise ValueError("GXF: no #GRID section")

    def first(*names, default=None):
        for nm in names:
            if nm in hdr and hdr[nm]:
                return hdr[nm][0]
        return default

    w = int(first("#POINTS", "#POIN", default="0"))
    h = int(first("#ROWS", default="0"))
    if w <= 0 or h <= 0:
        raise ValueError("GXF: missing #POINTS/#ROWS")
    gtype = int(first("#GTYPE", default="0"))
    dummy_tok = first("#DUMMY")
    # gxfopen.c:215 — without #DUMMY the dummy marker decodes to -1e12
    dummy_val = float(dummy_tok) if dummy_tok else -1e12
    sense = int(first("#SENSE", default="1"))
    if sense not in (1, -2):
        raise NotImplementedError(f"GXF #SENSE {sense} (column-ordered)")
    tr = first("#TRANSFORM", default="1 0").split()
    t_scale, t_off = float(tr[0]), float(tr[1]) if len(tr) > 1 else 0.0

    grid_lines = []
    for ln in lines[grid_start:]:
        if ln.startswith("#"):
            break
        grid_lines.append(ln)

    vals = np.empty(w * h, np.float64)
    if gtype == 0:
        # whitespace-separated ASCII; a raster row may span lines and
        # each new row starts on a fresh line (GXFReadRawScanlineFrom)
        n = 0
        li = 0
        while n < w * h:
            row_end = min(n + w, w * h)
            while n < row_end:
                if li >= len(grid_lines):
                    raise ValueError("GXF: truncated grid data")
                for tok in grid_lines[li].split():
                    if n >= row_end:
                        break
                    vals[n] = dummy_val if tok == dummy_tok \
                        else float(tok)
                    n += 1
                li += 1
    else:
        # base-90 compression: nGType chars per group; '!' = dummy,
        # '"' = repeat (count group, then value group); scaled by
        # #TRANSFORM (gxfopen.c GXFParseBase90)
        def base90(tokbytes: bytes) -> int:
            v = 0
            for c in tokbytes:
                v = v * 90 + (c - 37)
            return v

        n = 0
        li = 0
        buf = b""

        def refill():
            # a line remainder shorter than one group is DISCARDED and
            # the next physical line replaces it (gxfopen.c replaces
            # pszLine, never concatenates)
            nonlocal buf, li
            if li >= len(grid_lines):
                raise ValueError("GXF: truncated grid data")
            buf = grid_lines[li].encode("ascii")
            li += 1

        while n < w * h:
            row_end = min(n + w, w * h)
            buf = b""  # each raster row starts on a fresh line
            while n < row_end:
                if len(buf) < gtype:
                    refill()
                grp, buf = buf[:gtype], buf[gtype:]
                if grp[0:1] == b"!":
                    vals[n] = dummy_val
                    n += 1
                elif grp[0:1] == b'"':
                    if len(buf) < gtype:
                        refill()
                    cnt = base90(buf[:gtype])
                    buf = buf[gtype:]
                    if len(buf) < gtype:
                        refill()
                    vgrp, buf = buf[:gtype], buf[gtype:]
                    v = dummy_val if vgrp[0:1] == b"!" \
                        else base90(vgrp) * t_scale + t_off
                    stop = min(n + cnt, row_end)
                    vals[n:stop] = v
                    n = stop
                else:
                    vals[n] = base90(grp) * t_scale + t_off
                    n += 1
    px = vals.reshape(h, w).astype(np.float32)
    if sense == 1:  # lower-left origin scanning right -> flip
        px = px[::-1].copy()

    gt = None
    xo, yo = first("#XORIGIN"), first("#YORIGIN")
    dx, dy = first("#PTSEPARATION"), first("#RWSEPARATION")
    if xo is not None and yo is not None and dx is not None \
            and dy is not None:
        dxf, dyf = float(dx), float(dy)
        # origin is the lower-left data point (pixel center)
        gt = (float(xo) - dxf / 2.0, dxf, 0.0,
              float(yo) + (h - 0.5) * dyf, 0.0, -dyf)
    return px, gt, dummy_val
