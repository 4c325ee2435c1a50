"""Third classic-format batch — all header+raw drivers from the
reference's frmts/raw family, re-derived in numpy and conformed
against the reference's own fixture checksums
(tests/test_rawmore.py):

- RRASTER (rrasterdataset.cpp): R `raster` package .grd ini + .gri
  payload, INT/FLT/LOG datatypes, BIL/BIP/BSQ band order.
- GTX (gtxdataset.cpp): NOAA vertical-datum shift — big-endian header
  (ll lat, ll lon, dlat, dlon doubles; rows, cols ints), float32 rows
  stored south-up, half-pixel corner shift, lon wrapped into ±180.
- NTv2 (ntv2dataset.cpp): datum-shift .gsb — 11x16-byte overview +
  sub-grid headers, positive-WEST longitudes negated, 4 float32 values
  per node stored south-up and east-to-west (both axes reversed).
- SNODAS (snodasdataset.cpp): NOHRSC .hdr + big-endian int16 .dat.
- MFF (mffdataset.cpp): .hdr key=value + per-band files typed by
  extension letter or the `type` override, optional tiled layout.
- PAux (pauxdataset.cpp): PCI .aux ChanDefinition raw windows with
  per-channel offsets/strides and Swapped byte order.
- GSC Geogrid (gscdataset.cpp): Fortran record-framed float32 rows.
- GenBin (genbindataset.cpp): Generic Binary .hdr (BANDS/ROWS/COLS).
- ISCE (iscedataset.cpp): .xml property file + raw payload.
- ROI_PAC (roipacdataset.cpp): .rsc sidecar, dtype by extension
  (.dem int16, .slc/.int complex float, .unw 2-band BIL float).
- LCP (lcpdataset.cpp): FARSITE landscape — 7316-byte header, 5-10
  Int16 bands pixel-interleaved, bounds doubles at offset 4172.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np


# ------------------------------------------------------------------ RRASTER

def read_rraster(path: str):
    """path is the .grd header; payload is the sibling .gri."""
    with open(path, "r", encoding="latin-1") as fh:
        txt = fh.read()
    kv = {}
    for line in txt.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().lower()] = v.strip()
    h = int(kv["nrows"])
    w = int(kv["ncols"])
    nb = int(kv.get("nbands", "1"))
    order = {"little": "<", "big": ">"}[kv.get("byteorder", "little")]
    dt = {"INT1U": "u1", "INT1S": "i1", "INT2S": "i2", "INT2U": "u2",
          "INT4S": "i4", "INT4U": "u4", "FLT4S": "f4", "FLT8S": "f8",
          "LOG1S": "u1"}[kv.get("datatype", "FLT4S").upper()]
    dt = np.dtype(order + dt if dt not in ("u1", "i1") else dt)
    bandorder = kv.get("bandorder", "BIL").upper()
    gri = os.path.splitext(path)[0] + ".gri"
    with open(gri, "rb") as fh:
        buf = fh.read(w * h * nb * dt.itemsize)
    buf = buf + b"\x00" * (w * h * nb * dt.itemsize - len(buf))
    vals = np.frombuffer(buf, dt)
    if bandorder == "BIL":
        px = np.transpose(vals.reshape(h, nb, w), (0, 2, 1))
    elif bandorder == "BIP":
        px = vals.reshape(h, w, nb)
    else:  # BSQ
        px = np.transpose(vals.reshape(nb, h, w), (1, 2, 0))
    if nb == 1:
        px = px[:, :, 0]
    xmin, xmax = float(kv["xmin"]), float(kv["xmax"])
    ymin, ymax = float(kv["ymin"]), float(kv["ymax"])
    gt = (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0, -(ymax - ymin) / h)
    nodata = kv.get("nodatavalue")
    info = {"projection": kv.get("projection", "")}
    if nodata and nodata.upper() != "NA":
        info["nodata"] = float(nodata)
    return np.ascontiguousarray(px), gt, info


# ---------------------------------------------------------------------- GTX

def sniff_gtx(path: str) -> bool:
    return path.lower().endswith(".gtx")


def read_gtx(data: bytes):
    ylat, xlon, dlat, dlon = struct.unpack_from(">4d", data, 0)
    h, w = struct.unpack_from(">2i", data, 32)
    n = w * h
    dt = ">f8" if len(data) >= 40 + 8 * n else ">f4"
    buf = data[40:40 + n * (8 if dt == ">f8" else 4)]
    buf = buf + b"\x00" * (n * (8 if dt == ">f8" else 4) - len(buf))
    px = np.frombuffer(buf, dt, n).reshape(h, w)[::-1]  # south-up
    x0 = xlon - dlon * 0.5
    if x0 < -180.0 - dlon:
        x0 += 360.0
    elif x0 > 180.0:
        x0 -= 360.0
    gt = (x0, dlon, 0.0, ylat + dlat * (h - 1) + dlat * 0.5, 0.0, -dlat)
    return np.ascontiguousarray(px), gt, {"nodata": -88.8888}


# --------------------------------------------------------------------- NTv2

def sniff_ntv2(data: bytes) -> bool:
    return data[:8] == b"NUM_OREC"


def read_ntv2(data: bytes, grid: int = 0):
    """-> (pixels (h, w, 4) float32, gt, subgrid names). Values per
    node: lat shift, lon shift, lat error, lon error (arc-seconds);
    grid selects the sub-grid."""
    if not sniff_ntv2(data):
        raise ValueError("not an NTv2 .gsb file")
    le = struct.unpack_from("<i", data, 8)[0] == 11
    e = "<" if le else ">"
    num_file = struct.unpack_from(e + "i", data, 2 * 16 + 8)[0]
    pos = 11 * 16
    names = []
    out = None
    for g in range(num_file):
        hdr = data[pos:pos + 11 * 16]
        names.append(hdr[8:16].decode("latin-1").strip())
        s_lat, n_lat, e_long, w_long, lat_inc, long_inc = (
            struct.unpack_from(e + "d", hdr, 4 * 16 + 8)[0],
            struct.unpack_from(e + "d", hdr, 5 * 16 + 8)[0],
            struct.unpack_from(e + "d", hdr, 6 * 16 + 8)[0],
            struct.unpack_from(e + "d", hdr, 7 * 16 + 8)[0],
            struct.unpack_from(e + "d", hdr, 8 * 16 + 8)[0],
            struct.unpack_from(e + "d", hdr, 9 * 16 + 8)[0])
        count = struct.unpack_from(e + "i", hdr, 10 * 16 + 8)[0]
        dstart = pos + 11 * 16
        if g == grid:
            e_long, w_long = -e_long, -w_long  # positive-west stored
            w = int(np.floor((e_long - w_long) / long_inc + 1.5))
            h = int(np.floor((n_lat - s_lat) / lat_inc + 1.5))
            n = w * h * 4
            buf = data[dstart:dstart + n * 4]
            buf = buf + b"\x00" * (n * 4 - len(buf))
            vals = np.frombuffer(buf, e + "f4", n).reshape(h, w, 4)
            # stored south-up AND east-to-west: flip both axes
            out = (np.ascontiguousarray(vals[::-1, ::-1]),
                   ((w_long - long_inc * 0.5) / 3600.0, long_inc / 3600.0,
                    0.0, (n_lat + lat_inc * 0.5) / 3600.0, 0.0,
                    -lat_inc / 3600.0))
        pos = dstart + count * 16
    if out is None:
        raise ValueError(f"NTv2: no sub-grid #{grid}")
    return out[0], out[1], names


# ------------------------------------------------------------------- SNODAS

def sniff_snodas(data: bytes) -> bool:
    return data[:15] == b"Format version:" and b"NOHRSC" in data[:60]


def read_snodas(path: str):
    with open(path, "r", encoding="latin-1") as fh:
        kv = {}
        for line in fh:
            if ":" in line:
                k, v = line.split(":", 1)
                kv[k.strip().lower()] = v.strip()
    w = int(kv["number of columns"])
    h = int(kv["number of rows"])
    bpp = int(kv.get("data bytes per pixel", "2"))
    if bpp != 2:
        raise NotImplementedError(f"SNODAS {bpp} bytes per pixel")
    dat = os.path.join(os.path.dirname(path), kv["data file pathname"])
    with open(dat, "rb") as fh:
        buf = fh.read(w * h * 2)
    buf = buf + b"\x00" * (w * h * 2 - len(buf))
    px = np.frombuffer(buf, ">i2").reshape(h, w)
    dx = float(kv["x-axis resolution"])
    dy = float(kv["y-axis resolution"])
    x0 = float(kv["minimum x-axis coordinate"])
    y1 = float(kv["maximum y-axis coordinate"])
    gt = (x0, dx, 0.0, y1, 0.0, -dy)
    info = {"nodata": float(kv.get("no data value", "-9999"))}
    return np.ascontiguousarray(px), gt, info


# ---------------------------------------------------------------------- MFF

_MFF_EXT_TYPES = {"b": "u1", "u": "<u2", "r": "<f4"}
_MFF_TYPE_NAMES = {"C*4": "<f4", "R*4": "<f4", "R*8": "<f8", "I*1": "u1",
                   "I*2": "<i2", "I*4": "<i4", "U*2": "<u2", "U*4": "<u4"}


def sniff_mff_hdr(data: bytes) -> bool:
    return b"IMAGE_FILE_FORMAT" in data[:256] and b"MFF" in data[:256]


def read_mff(path: str):
    """path is the .hdr; bands are sibling files with type-letter
    extensions (.b00 byte, .u00 uint16, .r00 float32)."""
    with open(path, "r", encoding="latin-1") as fh:
        kv = {}
        for line in fh:
            if "=" in line:
                k, v = line.split("=", 1)
                kv[k.strip().upper()] = v.strip()
    h = int(kv["IMAGE_LINES"])
    w = int(kv["LINE_SAMPLES"])
    order = ">" if kv.get("BYTE_ORDER", "LSB").upper() == "MSB" else "<"
    refined = kv.get("TYPE")
    tile_r = int(kv.get("TILE_SIZE_ROWS", kv.get("tile_size_rows", 0))
                 or 0)
    tile_c = int(kv.get("TILE_SIZE_COLUMNS",
                        kv.get("tile_size_columns", 0)) or 0)
    stem = os.path.splitext(path)[0]
    d = os.path.dirname(path) or "."
    base = os.path.basename(stem).lower()
    bands = []
    for f in sorted(os.listdir(d)):
        fs, ext = os.path.splitext(f)
        ext = ext[1:].lower()
        if fs.lower() != base or not ext or ext in ("hdr",):
            continue
        if not re.fullmatch(r"[a-z]\d*", ext):
            continue
        if refined and refined in _MFF_TYPE_NAMES:
            dt = np.dtype(_MFF_TYPE_NAMES[refined])
        elif ext[0] in _MFF_EXT_TYPES:
            dt = np.dtype(_MFF_EXT_TYPES[ext[0]])
        else:
            continue
        if dt.itemsize > 1:
            dt = dt.newbyteorder(order)
        with open(os.path.join(d, f), "rb") as fh:
            raw = fh.read()
        if tile_r and tile_c:
            ntx = (w + tile_c - 1) // tile_c
            nty = (h + tile_r - 1) // tile_r
            need = ntx * nty * tile_r * tile_c * dt.itemsize
            raw = raw + b"\x00" * (need - len(raw))
            tiles = np.frombuffer(raw, dt, ntx * nty * tile_r * tile_c)
            tiles = tiles.reshape(nty, ntx, tile_r, tile_c)
            full = np.zeros((h, w), dt)
            for ty in range(nty):
                for tx in range(ntx):
                    ys, xs = ty * tile_r, tx * tile_c
                    ch = min(tile_r, h - ys)
                    cw = min(tile_c, w - xs)
                    full[ys:ys + ch, xs:xs + cw] = tiles[ty, tx, :ch, :cw]
            bands.append(full)
        else:
            need = w * h * dt.itemsize
            raw = raw + b"\x00" * (need - len(raw))
            bands.append(np.frombuffer(raw, dt, w * h).reshape(h, w))
    if not bands:
        raise ValueError(f"{path}: no MFF band files found")
    px = bands[0] if len(bands) == 1 else np.dstack(bands)
    return np.ascontiguousarray(px), None, kv


# --------------------------------------------------------------------- PAux

def sniff_paux(data: bytes) -> bool:
    return data[:15] == b"AuxilaryTarget:"


def read_paux(path: str):
    """path is the raw file or the .aux; channels per ChanDefinition."""
    aux = path if path.lower().endswith(".aux") else path + ".aux"
    if not os.path.exists(aux):
        aux = os.path.splitext(path)[0] + ".aux"
    with open(aux, "r", encoding="latin-1") as fh:
        lines = fh.read().splitlines()
    kv: dict[str, str] = {}
    for line in lines:
        if ":" in line:
            k, v = line.split(":", 1)
            kv[k.strip()] = v.strip()
    w, h, nchan = (int(v) for v in kv["RawDefinition"].split()[:3])
    target = os.path.join(os.path.dirname(aux), kv["AuxilaryTarget"])
    with open(target, "rb") as fh:
        raw = fh.read()
    bands = []
    for c in range(1, nchan + 1):
        toks = kv[f"ChanDefinition-{c}"].split()
        tname, off, pixoff, lineoff = toks[0], int(toks[1]), \
            int(toks[2]), int(toks[3])
        # PAux 'Swapped' means LITTLE-endian (pauxdataset.cpp: on LSB
        # machines Swapped == native), 'Unswapped' means big-endian
        swapped = len(toks) <= 4 or toks[4].lower() == "swapped"
        base = {"8U": "u1", "16U": "u2", "16S": "i2", "32R": "f4"}[tname]
        order = "<" if swapped else ">"
        dt = np.dtype(base if base == "u1" else order + base)
        rows = []
        for y in range(h):
            ro = off + y * lineoff
            row = np.frombuffer(
                raw[ro:ro + pixoff * w] + b"\x00" * max(
                    0, pixoff * w - len(raw[ro:ro + pixoff * w])),
                np.uint8).reshape(w, pixoff)[:, :dt.itemsize]
            rows.append(np.ascontiguousarray(row).reshape(-1).view(dt))
        bands.append(np.stack(rows))
    px = bands[0] if len(bands) == 1 else np.dstack(bands)
    gt = None
    if "UpLeftX" in kv:
        ulx, uly = float(kv["UpLeftX"]), float(kv["UpLeftY"])
        lrx, lry = float(kv["LoRightX"]), float(kv["LoRightY"])
        gt = (ulx, (lrx - ulx) / w, 0.0, uly, 0.0, (lry - uly) / h)
    return np.ascontiguousarray(px), gt, kv


# ---------------------------------------------------------------------- GSC

def sniff_gsc(data: bytes) -> bool:
    if len(data) < 20 or data[12:16] != b"\x02\x00\x00\x00":
        return False
    reclen, npix, nlines = struct.unpack_from("<3i", data, 0)
    return 0 < npix <= 100000 and 0 < nlines <= 100000 and \
        reclen == npix * 4


def read_gsc(data: bytes):
    reclen, w, h = struct.unpack_from("<3i", data, 0)
    rec = reclen + 8  # Fortran record markers
    hdr = struct.unpack_from("<8f", data, rec + 12)
    gt = (hdr[2], hdr[0], 0.0, hdr[5], 0.0, -hdr[1])
    start = rec * 2 + 4
    need = start + rec * h
    buf = data[start:need]
    buf = buf + b"\x00" * (need - start - len(buf))
    rows = np.frombuffer(buf, np.uint8).reshape(h, rec)[:, :w * 4]
    px = np.ascontiguousarray(rows).reshape(-1).view("<f4").reshape(h, w)
    return np.ascontiguousarray(px), gt, {"nodata": -1.0000000150474662e30}


# ------------------------------------------------------------------- GenBin

def sniff_genbin(data: bytes) -> bool:
    head = data[:512]
    return b"BANDS:" in head and b"ROWS:" in head and b"COLS:" in head


_GENBIN_TYPES = {"U8": "u1", "S8": "i1", "U16": ">u2", "S16": ">i2",
                 "U32": ">u4", "S32": ">i4", "F32": ">f4", "F64": ">f8"}


def read_genbin(hdr_path: str):
    with open(hdr_path, "r", encoding="latin-1") as fh:
        kv = {}
        for line in fh:
            if ":" in line:
                k, v = line.split(":", 1)
                kv[k.strip().upper()] = v.strip()
    nb = int(kv["BANDS"])
    h = int(kv["ROWS"])
    w = int(kv["COLS"])
    dt = np.dtype(_GENBIN_TYPES[kv.get("DATATYPE", "U8").upper()])
    stem = os.path.splitext(hdr_path)[0]
    data_path = None
    for ext in (".bil", ".bsq", ".bip", ".raw", ".dat"):
        if os.path.exists(stem + ext):
            data_path = stem + ext
            break
    if data_path is None:
        raise FileNotFoundError(f"{hdr_path}: no GenBin payload file")
    with open(data_path, "rb") as fh:
        raw = fh.read()
    need = w * h * nb * dt.itemsize
    if len(raw) < need:
        # zero-fill truncated payloads without an extra full-size copy
        buf = np.zeros(need, np.uint8)
        buf[:len(raw)] = np.frombuffer(raw, np.uint8)
        vals = buf.view(dt)
    else:
        vals = np.frombuffer(raw, dt, w * h * nb)
    interleave = kv.get("INTERLEAVING", "BSQ").upper()
    if interleave == "BSQ":
        px = np.transpose(vals.reshape(nb, h, w), (1, 2, 0))
    elif interleave == "BIL":
        px = np.transpose(vals.reshape(h, nb, w), (0, 2, 1))
    else:
        px = vals.reshape(h, w, nb)
    if nb == 1:
        px = px[:, :, 0]
    # returned as a view: band/window slices stay copy-free for
    # multi-GB declared extents (the truncated fixture declares 542 MB)
    gt = None
    if "UL_X_COORDINATE" in kv:
        ulx = float(kv["UL_X_COORDINATE"])
        uly = float(kv["UL_Y_COORDINATE"])
        pw = float(kv.get("PIXEL_WIDTH", "1"))
        ph = float(kv.get("PIXEL_HEIGHT", "1"))
        gt = (ulx - pw / 2.0, pw, 0.0, uly + ph / 2.0, 0.0, -ph)
    return px, gt, kv


# --------------------------------------------------------------------- ISCE

def read_isce(path: str):
    """path is the raw payload; properties come from path + '.xml'."""
    xml_path = path + ".xml"
    with open(xml_path, "r", encoding="latin-1") as fh:
        xml = fh.read()
    props = dict(re.findall(
        r'<property name="([^"]+)">\s*<value>([^<]*)</value>', xml))
    w = int(props["WIDTH"])
    h = int(props["LENGTH"])
    nb = int(props.get("NUMBER_BANDS", "1"))
    order = "<" if props.get("BYTE_ORDER", "l").lower().startswith("l") \
        else ">"
    dtype_name = props.get("DATA_TYPE", "FLOAT").upper()
    comp = 2 if dtype_name.startswith("C") else 1
    base = {"BYTE": "u1", "SHORT": "i2", "INT": "i4", "FLOAT": "f4",
            "DOUBLE": "f8", "CFLOAT": "f4", "CDOUBLE": "f8"}[dtype_name]
    dt = np.dtype(base if base == "u1" else order + base)
    scheme = props.get("SCHEME", "BIP").upper()
    with open(path, "rb") as fh:
        raw = fh.read()
    need = w * h * nb * comp * dt.itemsize
    raw = raw + b"\x00" * (need - len(raw))
    vals = np.frombuffer(raw, dt, w * h * nb * comp)
    if scheme == "BIP":
        px = vals.reshape(h, w, nb * comp)
    elif scheme == "BIL":
        px = np.transpose(vals.reshape(h, nb, w * comp), (0, 2, 1))
    else:  # BSQ
        px = np.transpose(vals.reshape(nb, h, w * comp), (1, 2, 0))
    if nb == 1:
        px = px.reshape(h, w * comp)
    return np.ascontiguousarray(px), None, props


# ------------------------------------------------------------------ ROI_PAC

_ROIPAC_EXT = {".raw": ("u1", 1, "BIP"), ".dem": ("<i2", 1, "BIP"),
               ".slc": ("<f4", 2, "BIP"), ".int": ("<f4", 2, "BIP"),
               ".amp": ("<f4", 2, "BIP"),
               ".cor": ("<f4", 2, "BIL"), ".hgt": ("<f4", 2, "BIL"),
               ".unw": ("<f4", 2, "BIL"), ".msk": ("<f4", 2, "BIL"),
               ".flg": ("u1", 1, "BIP")}


def read_roipac(path: str):
    """path is the data file; georef from path + '.rsc'."""
    rsc = path + ".rsc"
    with open(rsc, "r", encoding="latin-1") as fh:
        kv = {}
        for line in fh:
            toks = line.split(None, 1)
            if len(toks) == 2:
                kv[toks[0].upper()] = toks[1].strip()
    w = int(kv["WIDTH"])
    h = int(kv["FILE_LENGTH"])
    ext = os.path.splitext(path)[1].lower()
    if ext not in _ROIPAC_EXT:
        raise NotImplementedError(f"ROI_PAC extension {ext}")
    base, comp, scheme = _ROIPAC_EXT[ext]
    dt = np.dtype(base)
    need = w * h * comp * dt.itemsize
    with open(path, "rb") as fh:
        raw = fh.read(need)
    raw = raw + b"\x00" * (need - len(raw))
    vals = np.frombuffer(raw, dt, w * h * comp)
    if comp == 1:
        px = vals.reshape(h, w)
    elif scheme == "BIP":
        px = vals.reshape(h, w * 2)
    else:  # BIL: two bands per line
        px = np.transpose(vals.reshape(h, 2, w), (0, 2, 1))
    gt = None
    if "X_FIRST" in kv:
        gt = (float(kv["X_FIRST"]), float(kv["X_STEP"]), 0.0,
              float(kv["Y_FIRST"]), 0.0, float(kv["Y_STEP"]))
    info = {"scale": float(kv.get("Z_SCALE", "1")),
            "offset": float(kv.get("Z_OFFSET", "0"))}
    return np.ascontiguousarray(px), gt, info


# ---------------------------------------------------------------------- LCP

LCP_HEADER = 7316


def sniff_lcp(path: str, data: bytes) -> bool:
    if len(data) < 50 or not path.lower().endswith(".lcp"):
        return False
    crown, ground, lat = struct.unpack_from("<3i", data, 0)
    return crown in (20, 21) and ground in (20, 21) and -90 <= lat <= 90


def read_lcp(data: bytes):
    """-> (pixels (h, w, bands) int16, gt, info)."""
    crown, ground = struct.unpack_from("<2i", data, 0)
    have_crown = crown != 20
    have_ground = ground != 20
    nb = 10 if (have_crown and have_ground) else \
        8 if have_crown else 7 if have_ground else 5
    w, h = struct.unpack_from("<2i", data, 4164)
    east, west, north, south = struct.unpack_from("<4d", data, 4172)
    cellx, celly = struct.unpack_from("<2d", data, 4208)
    need = LCP_HEADER + w * h * nb * 2
    buf = data[LCP_HEADER:need]
    buf = buf + b"\x00" * (need - LCP_HEADER - len(buf))
    px = np.frombuffer(buf, "<i2").reshape(h, w, nb)
    gt = (west, cellx, 0.0, north, 0.0, -celly)
    return np.ascontiguousarray(px), gt, {"bands": nb,
                                          "crown_fuels": have_crown,
                                          "ground_fuels": have_ground}
