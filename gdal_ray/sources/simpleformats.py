"""Simple raster formats: TGA, ZMap, HF2/HFZ, SIGDEM, NGSGEOID,
NSIDCbin, TIL.

Each follows the matching reference driver's on-disk semantics:
- TGA (frmts/tga/tgadataset.cpp): 18-byte header, color-mapped /
  truecolor / grayscale, RLE packets that cross scanlines, 15/16-bit
  ARGB1555 expanded with the <<3 rule, bottom-up default origin,
  TRUEVISION-XFILE footer extension area (author/comments metadata).
- ZMap (frmts/zmap/zmapdataset.cpp): '@GRID FILE, GRID, n' text grids,
  column-major values (a column per logical row group), 1e30 default
  nodata, pixel-is-area georef.
- HF2/HFZ (frmts/hf2/hf2dataset.cpp): 28-byte 'HF2\\0' header +
  extension blocks (georef-extents), bottom-up tiles, per-tile
  float32 scale/offset, per-row word-size + first int32 + deltas;
  .hfz/.hf2.gz are gzip wrapped.
- SIGDEM (frmts/sigdem/sigdemdataset.{h,cpp}): 132-byte big-endian
  header, int32 BE cells bottom-up, value = offZ + v/scaleZ,
  NO_DATA = INT32_MIN -> -9999.
- NGSGEOID (frmts/ngsgeoid/ngsgeoiddataset.cpp): 44-byte header
  (SLAT/WLON/DLAT/DLON/NLAT/NLON/IKIND, little- or big-endian by the
  IKIND==1 probe), float32 rows south-first.
- NSIDCbin (frmts/raw/nsidcbindataset.cpp): 300-byte ASCII-fielded
  header, uint8 grid.
- TIL (frmts/til/tildataset.cpp): DigitalGlobe .TIL tile index over
  TIFF tiles with UL/LR offsets.
"""
from __future__ import annotations

import gzip
import re
import struct

import numpy as np

# ------------------------------------------------------------------ TGA


def read_tga(data: bytes) -> dict:
    idlen = data[0]
    cmap_type = data[1]
    image_type = data[2]
    cmap_origin, cmap_len = struct.unpack("<HH", data[3:7])
    cmap_bits = data[7]
    w, h = struct.unpack("<HH", data[12:16])
    depth = data[16]
    desc = data[17]
    rle = image_type >= 9
    base_type = image_type - 8 if rle else image_type
    pos = 18
    image_id = data[pos:pos + idlen].split(b"\x00")[0].decode(
        "ascii", "replace") if idlen else None
    pos += idlen
    palette = None
    if cmap_type == 1:
        nbytes = (cmap_bits + 7) // 8
        raw = data[pos:pos + cmap_len * nbytes]
        pos += cmap_len * nbytes
        if cmap_bits == 24:
            arr = np.frombuffer(raw, np.uint8).reshape(cmap_len, 3)
            palette = np.stack([arr[:, 2], arr[:, 1], arr[:, 0]],
                               axis=1)
        elif cmap_bits in (15, 16):
            v = np.frombuffer(raw, "<u2").astype(np.int32)
            palette = np.stack([((v >> 10) & 31) << 3,
                                ((v >> 5) & 31) << 3,
                                (v & 31) << 3], axis=1).astype(np.uint8)
        elif cmap_bits == 32:
            arr = np.frombuffer(raw, np.uint8).reshape(cmap_len, 4)
            palette = np.stack([arr[:, 2], arr[:, 1], arr[:, 0]],
                               axis=1)
    psize = (depth + 7) // 8
    npix = w * h
    if rle:
        raw = bytearray()
        p = pos
        while len(raw) < npix * psize and p < len(data):
            hdr = data[p]
            p += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet
                raw += data[p:p + psize] * count
                p += psize
            else:
                raw += data[p:p + count * psize]
                p += count * psize
        raw = bytes(raw[:npix * psize])
    else:
        raw = data[pos:pos + npix * psize]
    if depth == 8:
        img = np.frombuffer(raw, np.uint8, count=npix).reshape(h, w)
        bands = img[:, :, None]
    elif depth in (15, 16):
        v = np.frombuffer(raw, "<u2", count=npix).reshape(h, w) \
            .astype(np.int32)
        # tgadataset.cpp:371: band = ((v >> 5*(3-band)) & 31) << 3
        bands = np.stack([(((v >> 10) & 31) << 3),
                          (((v >> 5) & 31) << 3),
                          ((v & 31) << 3)], axis=2).astype(np.uint8)
    elif depth == 24:
        a = np.frombuffer(raw, np.uint8, count=npix * 3) \
            .reshape(h, w, 3)
        bands = a[:, :, ::-1]  # BGR -> RGB
    elif depth == 32:
        a = np.frombuffer(raw, np.uint8, count=npix * 4) \
            .reshape(h, w, 4)
        bands = np.stack([a[:, :, 2], a[:, :, 1], a[:, :, 0],
                          a[:, :, 3]], axis=2)
    else:
        raise ValueError(f"TGA depth {depth} unsupported")
    if not (desc & 0x20):  # bottom-up origin (default)
        bands = bands[::-1]
    if desc & 0x10:  # right-to-left
        bands = bands[:, ::-1]
    out = {"pixels": bands[:, :, 0] if bands.shape[2] == 1 else bands,
           "driver": "TGA"}
    if image_id:
        out["image_id"] = image_id
    if base_type == 1 and palette is not None:
        out["palette"] = palette
    # alpha channel bits in descriptor decide band-4 interpretation
    if depth == 32:
        out["alpha"] = bool(desc & 0x0F)
    # TRUEVISION-XFILE footer -> extension area metadata
    if data[-18:-1] == b"TRUEVISION-XFILE." or \
            data[-26 + 8:-26 + 8 + 17] == b"TRUEVISION-XFILE.":
        ext_off = struct.unpack("<I", data[-26:-22])[0]
        if ext_off and ext_off + 495 <= len(data):
            ext = data[ext_off:ext_off + 495]
            author = ext[2:2 + 41].split(b"\x00")[0].decode(
                "ascii", "replace").rstrip()
            comments = []
            for i in range(4):
                c = ext[43 + 81 * i:43 + 81 * (i + 1)] \
                    .split(b"\x00")[0].decode("ascii", "replace")
                if c:
                    comments.append(c)
            if author:
                out["author"] = author
            if comments:
                out["comments"] = "\n".join(comments)
    return out


# ----------------------------------------------------------------- ZMap
def read_zmap(text: str) -> tuple[np.ndarray, tuple, float]:
    lines = [ln for ln in text.splitlines()]
    i = 0
    while i < len(lines) and not lines[i].startswith("@"):
        i += 1
    hdr1 = lines[i]
    parts = hdr1.split(",")
    values_per_line = int(parts[2])
    h2 = lines[i + 1].split(",")
    nodata = float(h2[1]) if h2[1].strip() else 1e30
    h3 = lines[i + 2].split(",")
    nrows, ncols = int(h3[0]), int(h3[1])
    xmin, xmax = float(h3[2]), float(h3[3])
    ymin, ymax = float(h3[4]), float(h3[5])
    i += 3
    while i < len(lines) and not lines[i].startswith("@"):
        i += 1
    i += 1
    vals = []
    for ln in lines[i:]:
        if ln.startswith(("!", "+")):
            continue
        vals.extend(float(v) for v in ln.split())
    arr = np.array(vals[:nrows * ncols], np.float64)
    # column-major: file stores each column top->bottom
    grid = arr.reshape(ncols, nrows).T
    gt = (xmin, (xmax - xmin) / ncols, 0.0,
          ymax, 0.0, -(ymax - ymin) / nrows)
    return grid, gt, nodata


def write_zmap(grid: np.ndarray, gt, nodata: float = 1e30) -> str:
    h, w = grid.shape
    out = ["!", "! Created by gdal_ray.", "!",
           "@GRID FILE, GRID, 4"]
    out.append("%10d,%20.7f,%10s,%10d,%10d" % (20, nodata, "", 7, 1))
    out.append("%10d,%10d,%14.7f,%14.7f,%14.7f,%14.7f" % (
        h, w, gt[0], gt[0] + gt[1] * w, gt[3] + gt[5] * h, gt[3]))
    out.append("0.0, 0.0, 0.0")
    out.append("@")
    vals = []
    for i in range(w):
        col = grid[:, i]
        line = []
        for v in col:
            line.append("%20.7f" % v)
            if len(line) == 4:
                vals.append("".join(line))
                line = []
        if line:
            vals.append("".join(line))
    return "\n".join(out + vals) + "\n"


# ------------------------------------------------------------- HF2/HFZ
def read_hf2(data: bytes) -> tuple[np.ndarray, tuple | None]:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if data[:6] != b"HF2\x00\x00\x00":
        raise ValueError("not an HF2 file")
    w, h = struct.unpack("<ii", data[6:14])
    tile = struct.unpack("<H", data[14:16])[0]
    # fVertPres at 16, fHorizScale at 20
    ext_len = struct.unpack("<I", data[24:28])[0]
    pos = 28
    gt = None
    end_ext = pos + ext_len
    while pos + 24 <= end_ext:
        name = data[pos + 4:pos + 20].split(b"\x00")[0]
        bsize = struct.unpack("<I", data[pos + 20:pos + 24])[0]
        body = pos + 24
        if name == b"georef-extents" and bsize == 34:
            minx, maxx, miny, maxy = struct.unpack(
                "<dddd", data[body + 2:body + 34])
            gt = (minx, (maxx - minx) / w, 0.0, maxy, 0.0,
                  -(maxy - miny) / h)
        pos = body + bsize
    pos = end_ext
    nxt = (w + tile - 1) // tile
    nyt = (h + tile - 1) // tile
    out = np.zeros((h, w), np.float32)
    for ty in range(nyt):  # bottom-up tile rows
        th = min(tile, h - ty * tile)
        for tx in range(nxt):
            tw = min(tile, w - tx * tile)
            scale, off = struct.unpack("<ff", data[pos:pos + 8])
            pos += 8
            for j in range(th):
                ws = data[pos]
                pos += 1
                first = struct.unpack("<i", data[pos:pos + 4])[0]
                pos += 4
                n = tw - 1
                if ws == 1:
                    diffs = np.frombuffer(data, np.int8, n, pos)
                elif ws == 2:
                    diffs = np.frombuffer(data, "<i2", n, pos)
                else:
                    diffs = np.frombuffer(data, "<i4", n, pos)
                pos += ws * n
                ints = np.empty(tw, np.int64)
                ints[0] = first
                if n:
                    ints[1:] = first + np.cumsum(
                        diffs.astype(np.int64))
                row = (ints * float(scale) + off).astype(np.float32)
                # j-th row of the tile, counted from the bottom
                yy = h - 1 - (ty * tile + j)
                out[yy, tx * tile:tx * tile + tw] = row
    return out, gt


def write_hf2(grid: np.ndarray, gt=None, precision: float = 0.01,
              tile: int = 256, gzipped: bool = False) -> bytes:
    h, w = grid.shape
    parts = [b"HF2\x00", struct.pack("<H", 0),
             struct.pack("<ii", w, h), struct.pack("<H", tile),
             struct.pack("<f", precision), struct.pack("<f", 1.0)]
    ext = b""
    if gt is not None:
        body = struct.pack("<H", 0) + struct.pack(
            "<dddd", gt[0], gt[0] + gt[1] * w, gt[3] + gt[5] * h,
            gt[3])
        ext = (struct.pack("<i", 0) + b"georef-extents".ljust(16, b"\x00")
               + struct.pack("<I", len(body)) + body)
    parts.append(struct.pack("<I", len(ext)))
    parts.append(ext)
    nxt = (w + tile - 1) // tile
    nyt = (h + tile - 1) // tile
    for ty in range(nyt):
        th = min(tile, h - ty * tile)
        for tx in range(nxt):
            tw = min(tile, w - tx * tile)
            block = np.empty((th, tw), np.float64)
            for j in range(th):
                yy = h - 1 - (ty * tile + j)
                block[j] = grid[yy, tx * tile:tx * tile + tw]
            off = float(block.min()) if block.size else 0.0
            scale = precision if precision > 0 else 0.01
            ints = np.rint((block - off) / scale).astype(np.int64)
            parts.append(struct.pack("<ff", scale, off))
            for j in range(th):
                row = ints[j]
                diffs = np.diff(row)
                if diffs.size and (diffs.max() > 32767
                                   or diffs.min() < -32768):
                    ws, dt = 4, "<i4"
                elif diffs.size and (diffs.max() > 127
                                     or diffs.min() < -128):
                    ws, dt = 2, "<i2"
                else:
                    ws, dt = 1, "i1"
                parts.append(bytes([ws]))
                parts.append(struct.pack("<i", int(row[0])))
                parts.append(diffs.astype(dt).tobytes())
    raw = b"".join(parts)
    return gzip.compress(raw) if gzipped else raw


# ---------------------------------------------------------------- SIGDEM
_SIGDEM_NODATA = -0x80000000


def read_sigdem(data: bytes) -> dict:
    if data[:6] != b"SIGDEM":
        raise ValueError("not a SIGDEM file")
    (version, csid, offx, sx, offy, sy, offz, sz, minx, miny, minz,
     maxx, maxy, maxz, ncols, nrows, xdim, ydim) = struct.unpack(
        ">hi12d2i2d", data[6:132])
    cells = np.frombuffer(data, ">i4", nrows * ncols, 132) \
        .reshape(nrows, ncols)
    vals = np.where(cells == _SIGDEM_NODATA, -9999.0,
                    offz + cells / (sz if sz else 1.0))
    vals = vals[::-1]  # rows are bottom-up
    gt = (minx, xdim, 0.0, maxy, 0.0, -ydim)
    return {"pixels": vals, "gt": gt, "epsg": csid or None,
            "nodata": -9999.0, "driver": "SIGDEM"}


def write_sigdem(grid: np.ndarray, gt, epsg: int = 0,
                 scale_z: float = 1000.0) -> bytes:
    h, w = grid.shape
    minx, maxy = gt[0], gt[3]
    maxx = gt[0] + gt[1] * w
    miny = gt[3] + gt[5] * h
    valid = grid[grid != -9999.0]
    minz = float(valid.min()) if valid.size else 0.0
    maxz = float(valid.max()) if valid.size else 0.0
    hdr = b"SIGDEM" + struct.pack(
        ">hi12d2i2d", 1, epsg, 0.0, 1000.0, 0.0, 1000.0, 0.0, scale_z,
        minx, miny, minz, maxx, maxy, maxz, w, h, gt[1], -gt[5])
    cells = np.where(grid == -9999.0, _SIGDEM_NODATA,
                     np.rint(grid * scale_z)).astype(">i4")
    return hdr + cells[::-1].tobytes()


# --------------------------------------------------------------- NGSGEOID
def read_ngsgeoid(data: bytes) -> tuple[np.ndarray, tuple]:
    ikind_le = struct.unpack("<i", data[40:44])[0]
    order = "<" if ikind_le == 1 else ">"
    if order == ">" and struct.unpack(">i", data[40:44])[0] != 1:
        raise ValueError("not an NGSGEOID .bin file")
    slat, wlon, dlat, dlon = struct.unpack(order + "dddd", data[:32])
    nlat, nlon = struct.unpack(order + "ii", data[32:40])
    n = nlat * nlon
    avail = (len(data) - 44) // 4
    vals = np.frombuffer(data, order + "f4", min(n, avail), 44)
    full = np.full(n, np.nan, np.float32)
    full[:len(vals)] = vals
    grid = full.reshape(nlat, nlon)[::-1]  # south row first -> flip
    gt = (wlon - dlon / 2, dlon, 0.0,
          slat + nlat * dlat - dlat / 2, 0.0, -dlat)
    return grid, gt


# --------------------------------------------------------------- NSIDCbin
def read_nsidcbin(data: bytes) -> dict:
    hdr = data[:300]
    try:
        cols = int(hdr[6:12].replace(b"\x00", b" "))
        rows = int(hdr[12:18].replace(b"\x00", b" "))
    except ValueError:
        raise ValueError("not an NSIDC .bin file")
    px = np.frombuffer(data, np.uint8, rows * cols, 300) \
        .reshape(rows, cols)
    return {"pixels": px, "driver": "NSIDCbin",
            "header": hdr.decode("latin-1", "replace")}


# ------------------------------------------------------------------- CPG
def read_cpg_sirc(hdr_text: str, img: bytes) -> dict:
    """Convair PolGASP SIRC (frmts/raw/cpgdataset.cpp
    SIRC_QSLCRasterBand): 10 signed bytes per sample -> 4 complex
    scattering-matrix bands, scale = sqrt((b1/254+1.5)*2^b0)/127."""
    kv = {}
    for ln in hdr_text.splitlines():
        parts = ln.split()
        if len(parts) >= 2:
            kv[parts[0]] = parts[1]
    h = int(kv.get("number_lines", 0))
    w = int(kv.get("number_samples", 0))
    if not h or not w:
        raise ValueError("CPG: missing number_lines/number_samples")
    raw = np.frombuffer(img, np.int8, count=h * w * 10) \
        .reshape(h, w, 10).astype(np.float64)
    scale = np.sqrt((raw[:, :, 1] / 254 + 1.5)
                    * np.power(2.0, raw[:, :, 0])) / 127.0
    bands = {}
    for bi, name in enumerate(("SHH", "SHV", "SVH", "SVV")):
        re_ = raw[:, :, 2 + 2 * bi] * scale
        im = raw[:, :, 3 + 2 * bi] * scale
        bands[name] = (re_ + 1j * im).astype(np.complex64)
    return {"bands": bands, "shape": (h, w), "driver": "CPG"}


# ------------------------------------------------------------------ DOQ1
def _doq_field(data: bytes, off: int, n: int) -> float:
    txt = data[off:off + n].split(b"\x00")[0] \
        .decode("ascii", "replace").replace("D", "E") \
        .replace("d", "E").strip()
    try:
        return float(txt) if txt else 0.0
    except ValueError:
        return 0.0


def read_doq1(data: bytes) -> dict:
    """USGS DOQ (old format): ASCII numeric fields at fixed offsets
    (frmts/raw/doq1dataset.cpp:210-373), 4 header lines then BIP
    bytes."""
    w = int(_doq_field(data, 150, 6))
    h = int(_doq_field(data, 144, 6))
    band_types = int(_doq_field(data, 156, 3))
    if w <= 0 or h <= 0:
        raise ValueError("not a DOQ1 file")
    nbpp = 3 if band_types == 5 else 1
    nline = nbpp * w
    skip = 4 * nline
    n_avail = max(0, (len(data) - skip) // nline)
    px = np.zeros((h, w, nbpp), np.uint8)
    if n_avail:
        rows = np.frombuffer(data, np.uint8,
                             min(h, n_avail) * nline, skip)
        px[:min(h, n_avail)] = rows.reshape(-1, w, nbpp)
    rec2 = data[nline:2 * nline] if len(data) >= 2 * nline else b""
    gt = None
    if len(rec2) >= 336:
        ulx = _doq_field(rec2, 288, 24)
        uly = _doq_field(rec2, 312, 24)
        psx = _doq_field(rec2, 59, 12)
        psy = _doq_field(rec2, 71, 12)
        gt = (ulx, psx, 0.0, uly, 0.0, -psy)
    epsg = None
    if int(_doq_field(data, 195, 3)) == 1:
        zone = int(_doq_field(data, 198, 6))
        if 0 < zone <= 60:
            epsg = 26900 + zone if int(_doq_field(data, 167, 2)) == 4 \
                else 32600 + zone
    return {"pixels": px[:, :, 0] if nbpp == 1 else px, "gt": gt,
            "epsg": epsg, "driver": "DOQ1"}


# ------------------------------------------------------------------- TIL
def read_til(text: str, base_dir: str) -> tuple[np.ndarray, tuple | None]:
    import os

    from .tiff import decode_tiff

    kv = dict(re.findall(r"(\S+)\s*=\s*\"?([^\";\n]+)\"?;?", text))
    ntiles = int(kv.get("numTiles", "0"))
    if ntiles <= 0:
        raise ValueError("TIL: missing numTiles")
    tiles = []
    maxc = maxr = 0
    for i in range(1, ntiles + 1):
        fname = kv[f"TILE_{i}.filename"].strip().strip('"')
        ulc = int(kv.get(f"TILE_{i}.ULColOffset", "0"))
        ulr = int(kv.get(f"TILE_{i}.ULRowOffset", "0"))
        with open(os.path.join(base_dir, fname), "rb") as fh:
            px, gt0 = decode_tiff(fh.read())
        tiles.append((ulc, ulr, px, gt0))
        hh, ww = px.shape[:2]
        maxc = max(maxc, ulc + ww)
        maxr = max(maxr, ulr + hh)
    first = tiles[0][2]
    shape = (maxr, maxc) + first.shape[2:]
    out = np.zeros(shape, first.dtype)
    gt = None
    for ulc, ulr, px, gt0 in tiles:
        hh, ww = px.shape[:2]
        out[ulr:ulr + hh, ulc:ulc + ww] = px
        if gt0 is not None and ulc == 0 and ulr == 0:
            gt = gt0
    return out, gt
