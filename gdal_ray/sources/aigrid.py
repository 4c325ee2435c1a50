"""Arc/Info Binary Grid (AIG) reader — frmts/aigrid/gridlib.c +
aigdataset.cpp semantics.

A coverage is a DIRECTORY: ``hdr.adf`` (big-endian: cell type at 16
(1=int, 2=float), compressed flag at 20 (stored inverted), cell sizes
at 256/264, blocks-per-row/column at 288/292, block W/H at 296/304 —
AIGReadHeader gridlib.c:793), ``dblbnd.adf`` (LLX LLY URX URY
doubles), ``sta.adf`` (min/max/mean[/stddev] doubles; 24-byte variant
has no stddev), ``w001001x.adf`` block index (100-byte header then
(offset, size) int32 pairs in 2-byte words) and ``w001001.adf`` tile
data (multi-tile grids use w%03d001/z%03d%03d basenames,
aigopen.c:216-221).

Tile blocks (AIGReadBlock gridlib.c:564): 2-byte size, then for float
grids raw BE float32; for integer grids a magic byte + min-size +
sign-extended big-endian minimum, then per magic: 0x00 constant,
0x01/0x04/0x08/0x10/0x20 raw 1/4/8/16/32-bit, 0xE0/0xF0/0xFC/0xF8
run-length with 4/2/1-byte values, 0xDF min-runs, 0xD7/0xCF literal
8/16-bit runs, with markers >128 meaning (256-marker) nodata pixels
(AIGProcessBlock gridlib.c:325); integer adds use unsigned rollover.
Zero-size blocks are all-nodata.  0xFF (CCITT-RLE) blocks raise —
none of the reference's grid fixtures use them.

Band typing per aigdataset.cpp:100-111: integer grids with
sta min>=0 max<=254 read as Byte (nodata 255), within int16 as Int16
(nodata -32768), else Int32 (nodata -2147483647); float grids are
Float32 (nodata -3.4028234664e38).  A ``.clr`` colormap beside (or
inside) the coverage is parsed to (index, r, g, b) entries.
"""

from __future__ import annotations

import os
import struct

import numpy as np

ESRI_GRID_NO_DATA = -2147483647
ESRI_GRID_FLOAT_NO_DATA = -340282346638528859811704183484516925440.0


def _find(cover: str, fname: str) -> str | None:
    for cand in (fname, fname.upper()):
        p = os.path.join(cover, cand)
        if os.path.exists(p):
            return p
    return None


def _ru32(a: np.int64) -> int:
    return int(a) & 0xFFFFFFFF


def _roll_add(a: int, b: int) -> int:
    """AIGRolloverSignedAdd: unsigned 32-bit rollover."""
    v = (a + b) & 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def _process_block(cur: bytes, nmin: int, magic: int, npix: int) -> np.ndarray:
    out = np.empty(npix, np.int64)
    n = 0
    pos = 0
    size = len(cur)
    while n < npix and pos < size:
        marker = cur[pos]
        pos += 1
        if magic == 0xE0:
            val = _roll_add(struct.unpack_from(">i", cur, pos)[0], nmin)
            pos += 4
            out[n:n + marker] = val
            n += marker
        elif magic == 0xF0:
            val = _roll_add(cur[pos] * 256 + cur[pos + 1], nmin)
            pos += 2
            out[n:n + marker] = val
            n += marker
        elif magic in (0xFC, 0xF8):
            val = _roll_add(cur[pos], nmin)
            pos += 1
            out[n:n + marker] = val
            n += marker
        elif magic == 0xDF and marker < 128:
            out[n:n + marker] = nmin
            n += marker
        elif magic == 0xD7 and marker < 128:
            for _ in range(marker):
                out[n] = _roll_add(cur[pos], nmin)
                pos += 1
                n += 1
        elif magic == 0xCF and marker < 128:
            for _ in range(marker):
                out[n] = _roll_add(cur[pos] * 256 + cur[pos + 1], nmin)
                pos += 2
                n += 1
        elif marker > 128:
            run = 256 - marker
            out[n:n + run] = ESRI_GRID_NO_DATA
            n += run
        else:
            raise ValueError(f"bad marker {marker} for magic {magic:#x}")
    if n < npix:
        raise ValueError("ran out of data in AIG block")
    return out


def _read_block(data: bytes, offset: int, size: int, bw: int, bh: int,
                cell_type: int, compressed: bool) -> np.ndarray:
    npix = bw * bh
    if size == 0:
        if cell_type == 2:
            return np.full(npix, ESRI_GRID_FLOAT_NO_DATA, np.float64)
        return np.full(npix, ESRI_GRID_NO_DATA, np.int64)
    stored = (data[offset] * 256 + data[offset + 1]) * 2
    if stored != size:
        raise ValueError("AIG block size mismatch")
    cur = data[offset + 2:offset + 2 + size]
    if cell_type == 2:
        return np.frombuffer(cur[:npix * 4], ">f4").astype(np.float64)
    if not compressed:
        arr = np.frombuffer(cur[:npix * 4], ">i4").astype(np.int64)
        return arr
    magic = cur[0]
    minsize = cur[1]
    pos = 2
    if minsize > 4:
        raise ValueError("corrupt minsize")
    if minsize == 4:
        nmin = struct.unpack_from(">i", cur, pos)[0]
    else:
        nmin = 0
        for i in range(minsize):
            nmin = nmin * 256 + cur[pos + i]
        if minsize != 0 and cur[2] > 127:
            nmin -= 1 << (8 * minsize)
    pos += minsize
    body = cur[pos:]
    if magic == 0x08:
        arr = np.frombuffer(body[:npix], np.uint8).astype(np.int64)
    elif magic == 0x04:
        b = np.frombuffer(body[:(npix + 1) // 2], np.uint8)
        arr = np.empty(npix, np.int64)
        # even index -> low nibble first? gridlib: odd i uses high nibble
        hi = (b & 0xF0) >> 4
        lo = b & 0x0F
        pairs = np.empty(2 * len(b), np.int64)
        pairs[0::2] = lo
        pairs[1::2] = hi
        arr = pairs[:npix]
    elif magic == 0x01:
        bits = np.unpackbits(np.frombuffer(body[:(npix + 7) // 8], np.uint8))
        arr = bits[:npix].astype(np.int64)
    elif magic == 0x00:
        arr = np.zeros(npix, np.int64)
    elif magic == 0x10:
        arr = np.frombuffer(body[:npix * 2], ">u2").astype(np.int64)
    elif magic == 0x20:
        arr = np.frombuffer(body[:npix * 4], ">i4").astype(np.int64)
    elif magic == 0xFF:
        raise NotImplementedError(
            "AIG 0xFF (CCITT RLE) blocks not supported (none of the "
            "reference grid fixtures use them)")
    else:
        return _process_block(bytes(body), nmin, magic, npix)
    if nmin:
        u = (arr + nmin) & 0xFFFFFFFF
        arr = np.where(u >= 0x80000000, u - 0x100000000, u)
    return arr


def read_aigrid(cover: str):
    """-> (pixels float64 ndarray with NaN nodata applied later,
    gt, meta).  ``cover`` is the coverage directory or any file in
    it."""
    if os.path.isfile(cover):
        cover = os.path.dirname(cover)
    hdr_p = _find(cover, "hdr.adf")
    if hdr_p is None:
        raise ValueError(f"no hdr.adf under {cover}")
    with open(hdr_p, "rb") as f:
        hdr = f.read(308)
    cell_type = struct.unpack_from(">i", hdr, 16)[0]
    compressed = struct.unpack_from(">i", hdr, 20)[0] == 0
    cellx = struct.unpack_from(">d", hdr, 256)[0]
    celly = struct.unpack_from(">d", hdr, 264)[0]
    blocks_per_row = struct.unpack_from(">i", hdr, 288)[0]
    blocks_per_col = struct.unpack_from(">i", hdr, 292)[0]
    bw = struct.unpack_from(">i", hdr, 296)[0]
    bh = struct.unpack_from(">i", hdr, 304)[0]

    with open(_find(cover, "dblbnd.adf"), "rb") as f:
        llx, lly, urx, ury = struct.unpack(">4d", f.read(32))
    sta = _find(cover, "sta.adf")
    dmin = dmax = 0.0
    if sta:
        with open(sta, "rb") as f:
            raw = f.read(32)
        if len(raw) == 24:
            # 24-byte variant is min/max/mean in LSB order
            # (AIGReadStatistics, gridlib.c nRead==24 branch)
            dmin, dmax = struct.unpack_from("<2d", raw, 0)
        else:
            dmin, dmax = struct.unpack_from(">2d", raw, 0)

    npixels = int((urx - llx + 0.5 * cellx) / cellx)
    nlines = int((ury - lly + 0.5 * celly) / celly)
    tile_xsize = bw * blocks_per_row
    tile_ysize = bh * blocks_per_col
    tiles_per_row = (npixels - 1) // tile_xsize + 1
    tiles_per_col = (nlines - 1) // tile_ysize + 1

    full = np.full((nlines, npixels),
                   ESRI_GRID_FLOAT_NO_DATA if cell_type == 2
                   else ESRI_GRID_NO_DATA, np.float64)

    for ty in range(tiles_per_col):
        for tx in range(tiles_per_row):
            if ty == 0:
                base = "w%03d001" % (tx + 1)
            elif ty == 1:
                base = "w%03d000" % (tx + 1)
            else:
                base = "z%03d%03d" % (tx + 1, ty - 1)
            grid_p = _find(cover, base + ".adf")
            idx_p = _find(cover, base + "x.adf")
            if grid_p is None or idx_p is None:
                continue
            with open(idx_p, "rb") as f:
                idx = f.read()
            length = struct.unpack_from(">I", idx, 24)[0] * 2
            nblocks = (length - 100) // 8
            pairs = np.frombuffer(idx, ">u4", nblocks * 2, 100)
            offsets = pairs[0::2].astype(np.int64) * 2
            sizes = pairs[1::2].astype(np.int64) * 2
            with open(grid_p, "rb") as f:
                data = f.read()
            for bi in range(nblocks):
                by, bx = divmod(bi, blocks_per_row)
                block = _read_block(data, int(offsets[bi]), int(sizes[bi]),
                                    bw, bh, cell_type, compressed)
                y0 = ty * tile_ysize + by * bh
                x0 = tx * tile_xsize + bx * bw
                if y0 >= nlines or x0 >= npixels:
                    continue
                h = min(bh, nlines - y0)
                w = min(bw, npixels - x0)
                full[y0:y0 + h, x0:x0 + w] = \
                    block.reshape(bh, bw)[:h, :w]

    gt = (llx, cellx, 0.0, ury, 0.0, -celly)

    # band typing, aigdataset.cpp:100-111
    if cell_type == 2:
        dtype, nodata = "float32", ESRI_GRID_FLOAT_NO_DATA
        pixels = full.astype(np.float32)
    elif sta and dmin >= 0.0 and dmax <= 254.0:
        dtype, nodata = "uint8", 255
        pixels = np.where(full == ESRI_GRID_NO_DATA, 255, full)
        pixels = pixels.astype(np.uint8)
    elif sta and dmin >= -32767 and dmax <= 32767:
        dtype, nodata = "int16", -32768
        pixels = np.where(full == ESRI_GRID_NO_DATA, -32768, full)
        pixels = pixels.astype(np.int16)
    else:
        dtype, nodata = "int32", ESRI_GRID_NO_DATA
        pixels = full.astype(np.int32)

    # colormap: <cover>/*.clr or sibling <cover>.clr
    clr = None
    for cand in sorted(os.listdir(cover)):
        if cand.lower().endswith(".clr"):
            clr = os.path.join(cover, cand)
            break
    if clr is None:
        for ext in (".clr", ".CLR"):
            p = cover.rstrip("/") + ext
            if os.path.exists(p):
                clr = p
                break
    colormap = None
    if clr:
        colormap = {}
        with open(clr, errors="replace") as f:
            for line in f:
                tok = line.split()
                if len(tok) >= 4 and not line.startswith("#"):
                    try:
                        colormap[int(tok[0])] = (int(tok[1]), int(tok[2]),
                                                 int(tok[3]), 255)
                    except ValueError:
                        pass

    meta = {"dtype": dtype, "nodata": nodata, "min": dmin, "max": dmax,
            "cell_type": cell_type, "colormap": colormap}
    return pixels, gt, meta
