"""Fourth classic-format batch: PCRaster CSF, ILWIS, NOAA .b geoid,
Erdas Imagine Raw (EIR), Atlantis HKV (MFF2), KRO, and ACE2 — each a
numpy re-derivation of the reference driver conformed against its own
fixture checksums (tests/test_rawmisc.py):

- PCRaster (frmts/pcraster/libcsf): "RUU CROSS SYSTEM MAP FORMAT"
  main header, CSF_RASTER_HEADER at offset 64 (valueScale, cellRepr
  CR_* codes, UL corner, rows/cols/cellsize), cells at offset 256.
- ILWIS (frmts/ilwis): .mpr ini ([MapStore] Data/RowLength/Type) +
  .mp# payload, georef corners from the .grf file.
- NOAA_B (frmts/raw/noaabdataset.cpp): Fortran-framed 44-byte header
  (SW corner, deltas, rows, cols, kind), one framed record per row,
  stored south-up, endianness probed from the frame length.
- EIR (frmts/raw/eirdataset.cpp): IMAGINE_RAW_FILE keyword header +
  PIXEL_FILES payload, BIL/BIP/BSQ, U8..F64.
- MFF2/HKV (frmts/raw/hkvdataset.cpp): attrib key=value directory
  with image_data payload; pixel.size bits, {} option groups with the
  '*' marking the active choice.
- KRO (frmts/raw/krodataset.cpp): "KRO\\x01" + big-endian u32
  width/height/depth/ncomp, pixel-interleaved rows.
- ACE2 (frmts/raw/ace2dataset.cpp): dimensions and geotransform
  derived from the tile filename (30S/9S/3S/_5M), Int16 for
  SOURCE/QUALITY/CONF tiles else Float32.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np

# ------------------------------------------------------------------ PCRaster

_CSF_SIG = b"RUU CROSS SYSTEM MAP FORMAT"
_CSF_CELLREPR = {0x00: "u1", 0x04: "i1", 0x11: "<u2", 0x15: "<i2",
                 0x22: "<u4", 0x26: "<i4", 0x5A: "<f4", 0xDB: "<f8"}
_CSF_MV = {"u1": 255, "i1": -128, "<u2": 65535, "<i2": -32768,
           "<u4": 4294967295, "<i4": -2147483648}


def sniff_pcraster(data: bytes) -> bool:
    return data[:27] == _CSF_SIG


def read_pcraster(data: bytes):
    """-> (pixels, gt, info)."""
    if not sniff_pcraster(data):
        raise ValueError("not a PCRaster CSF map")
    value_scale, cell_repr = struct.unpack_from("<2H", data, 64)
    if cell_repr not in _CSF_CELLREPR:
        raise NotImplementedError(f"CSF cellRepr 0x{cell_repr:x}")
    dt = np.dtype(_CSF_CELLREPR[cell_repr])
    xul, yul = struct.unpack_from("<2d", data, 84)
    h, w = struct.unpack_from("<2I", data, 100)
    cell = struct.unpack_from("<d", data, 108)[0]
    n = w * h
    buf = data[256:256 + n * dt.itemsize]
    buf = buf + b"\x00" * (n * dt.itemsize - len(buf))
    px = np.frombuffer(buf, dt).reshape(h, w)
    gt = (xul, cell, 0.0, yul, 0.0, -cell)
    key = _CSF_CELLREPR[cell_repr]
    info = {"value_scale": value_scale}
    if key in _CSF_MV:
        info["nodata"] = _CSF_MV[key]
    elif dt.kind == "f":
        info["nodata"] = float("nan")
    return np.ascontiguousarray(px), gt, info


# -------------------------------------------------------------------- ILWIS

_ILWIS_TYPES = {"byte": "u1", "int": "<i2", "long": "<i4",
                "real": "<f8", "float": "<f4"}


def _read_ini(path: str) -> dict:
    out: dict[str, dict] = {}
    section = ""
    with open(path, "r", encoding="latin-1") as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("[") and line.endswith("]"):
                section = line[1:-1].lower()
                out.setdefault(section, {})
            elif "=" in line:
                k, v = line.split("=", 1)
                out.setdefault(section, {})[k.strip().lower()] = v.strip()
    return out


def read_ilwis(path: str):
    """path is the .mpr; payload is the sibling .mp#."""
    ini = _read_ini(path)
    store = ini.get("mapstore", {})
    size = ini.get("map", {}).get("size", "0 0").split()
    h, w = int(size[0]), int(size[1])
    tname = store.get("type", "byte").lower()
    if tname not in _ILWIS_TYPES:
        raise NotImplementedError(f"ILWIS MapStore type {tname}")
    dt = np.dtype(_ILWIS_TYPES[tname])
    data_name = store.get("data", os.path.basename(
        os.path.splitext(path)[0]) + ".mp#")
    dpath = os.path.join(os.path.dirname(path), data_name)
    off = int(store.get("startoffset", "0") or 0)
    with open(dpath, "rb") as fh:
        fh.seek(off)
        buf = fh.read(w * h * dt.itemsize)
    buf = buf + b"\x00" * (w * h * dt.itemsize - len(buf))
    px = np.frombuffer(buf, dt).reshape(h, w)
    gt = None
    bounds = ini.get("basemap", {}).get("coordbounds")
    if bounds:
        x0, y0, x1, y1 = (float(v) for v in bounds.split())
        gt = (x0, (x1 - x0) / w, 0.0, y1, 0.0, -(y1 - y0) / h)
    return np.ascontiguousarray(px), gt, ini


# ------------------------------------------------------------------- NOAA_B

def _noaab_endian(data: bytes) -> str | None:
    """Plausibility probe per IdentifyEx (BE tried first)."""
    for e in (">", "<"):
        try:
            sw_lat, sw_lon, dlat, dlon = struct.unpack_from(
                e + "4d", data, 4)
            h, w, kind = struct.unpack_from(e + "3i", data, 36)
        except struct.error:
            return None
        if (abs(sw_lat) <= 90 and abs(sw_lon) <= 360
                and 0 < dlat <= 1 and 0 < dlon <= 1
                and 0 < h and sw_lat + (h - 1) * dlat <= 90
                and 0 < w and (w - 1) * dlon <= 360
                and -1 <= kind <= 2):
            return e
    return None


def sniff_noaab(data: bytes) -> bool:
    return len(data) >= 52 and _noaab_endian(data) is not None


def read_noaab(data: bytes):
    e = _noaab_endian(data)
    if e is None:
        raise ValueError("not a NOAA .b geoid file")
    sw_lat, sw_lon, dlat, dlon = struct.unpack_from(e + "4d", data, 4)
    h, w, kind = struct.unpack_from(e + "3i", data, 36)
    if kind == -1:
        raise NotImplementedError("NOAA .b KIND=-1")
    dt = np.dtype(e + {0: "i4", 1: "f4"}.get(kind, "i2"))
    line = 4 + w * dt.itemsize + 4
    px = np.zeros((h, w), dt)
    for row in range(h):
        off = 52 + (h - 1 - row) * line + 4
        buf = data[off:off + w * dt.itemsize]
        if len(buf) == w * dt.itemsize:
            px[row] = np.frombuffer(buf, dt)
    if sw_lon > 180:
        sw_lon -= 360
    gt = (sw_lon - dlon / 2, dlon, 0.0,
          sw_lat + (h - 1) * dlat + dlat / 2, 0.0, -dlat)
    return np.ascontiguousarray(px), gt, {"kind": kind}


# ---------------------------------------------------------------------- EIR

_EIR_TYPES = {"U1": "u1", "U2": "u1", "U4": "u1", "U8": "u1",
              "S8": "i1", "U16": ">u2", "S16": ">i2", "U32": ">u4",
              "S32": ">i4", "F32": ">f4", "F64": ">f8"}


def sniff_eir(data: bytes) -> bool:
    return data.lstrip()[:16] == b"IMAGINE_RAW_FILE"


def read_eir(path: str):
    kv = {}
    with open(path, "r", encoding="latin-1") as fh:
        for line in fh:
            toks = line.split(None, 1)
            if len(toks) == 2:
                kv[toks[0].upper()] = toks[1].strip()
            elif toks:
                kv.setdefault(toks[0].upper(), "")
    w = int(kv["WIDTH"])
    h = int(kv["HEIGHT"])
    nb = int(kv.get("NUM_LAYERS", "1"))
    dt = np.dtype(_EIR_TYPES[kv.get("DATATYPE", "U8").upper()])
    if kv.get("BYTE_ORDER", "").upper() == "LSB" and dt.itemsize > 1:
        dt = dt.newbyteorder("<")
    fmt = kv.get("FORMAT", "BIL").upper()
    off = int(kv.get("DATA_OFFSET", "0") or 0)
    dpath = os.path.join(os.path.dirname(path), kv["PIXEL_FILES"])
    with open(dpath, "rb") as fh:
        fh.seek(off)
        raw = fh.read(w * h * nb * dt.itemsize)
    raw = raw + b"\x00" * (w * h * nb * dt.itemsize - len(raw))
    vals = np.frombuffer(raw, dt)
    if fmt == "BIL":
        px = np.transpose(vals.reshape(h, nb, w), (0, 2, 1))
    elif fmt == "BIP":
        px = vals.reshape(h, w, nb)
    else:
        px = np.transpose(vals.reshape(nb, h, w), (1, 2, 0))
    if nb == 1:
        px = px[:, :, 0]
    return np.ascontiguousarray(px), None, kv


# --------------------------------------------------------------- MFF2 / HKV

def _hkv_choice(v: str) -> str:
    m = re.search(r"\*(\S+)", v)
    return m.group(1) if m else v.strip()


def read_mff2(dirpath: str):
    """dirpath contains attrib / image_data (+ georef)."""
    attrib = os.path.join(dirpath, "attrib")
    kv = {}
    with open(attrib, "r", encoding="latin-1") as fh:
        for line in fh:
            if "=" in line:
                k, v = line.split("=", 1)
                kv[k.strip().lower()] = v.strip()
    w = int(kv["extent.cols"])
    h = int(kv["extent.rows"])
    nb = int(kv.get("channel.enumeration", "1"))
    bits = int(kv.get("pixel.size", "8"))
    enc = _hkv_choice(kv.get("pixel.encoding", "{ *unsigned }"))
    order = _hkv_choice(kv.get("pixel.order", "{ *lsbf }"))
    field = _hkv_choice(kv.get("pixel.field", "{ *real }"))
    e = "<" if order == "lsbf" else ">"
    comp = 2 if field == "complex" else 1
    size = bits // 8 // comp if comp == 2 else bits // 8
    if enc == "ieee-754":
        base = {4: "f4", 8: "f8"}[size]
    elif enc == "twos-complement":
        base = {1: "i1", 2: "i2", 4: "i4"}[size]
    else:
        base = {1: "u1", 2: "u2", 4: "u4"}[size]
    dt = np.dtype(base if size == 1 else e + base)
    dpath = os.path.join(dirpath, "image_data")
    need = w * h * nb * comp * dt.itemsize
    with open(dpath, "rb") as fh:
        raw = fh.read(need)
    raw = raw + b"\x00" * (need - len(raw))
    vals = np.frombuffer(raw, dt)
    px = vals.reshape(h, w, nb * comp)  # pixel interleaved
    if nb * comp == 1:
        px = px[:, :, 0]
    return np.ascontiguousarray(px), None, kv


# ---------------------------------------------------------------------- KRO

def sniff_kro(data: bytes) -> bool:
    return data[:4] == b"KRO\x01"


def read_kro(data: bytes):
    w, h, depth, ncomp = struct.unpack_from(">4i", data, 4)
    dt = np.dtype({8: "u1", 16: ">u2", 32: ">f4"}[depth])
    need = 20 + w * h * ncomp * dt.itemsize
    buf = data[20:need]
    buf = buf + b"\x00" * (need - 20 - len(buf))
    px = np.frombuffer(buf, dt).reshape(h, w, ncomp)
    if ncomp == 1:
        px = px[:, :, 0]
    return np.ascontiguousarray(px), None, {"depth": depth}


# --------------------------------------------------------------------- ACE2

_ACE2_SIZES = {"_30S": (1800, 1800, 0.5 / 60), "_9S": (6000, 6000,
                                                       9 / 3600),
               "_3S": (18000, 18000, 3 / 3600), "_5M": (180, 180,
                                                        5 / 60)}


def sniff_ace2(path: str) -> bool:
    return path.upper().endswith(".ACE2")


def read_ace2(path: str):
    base = os.path.basename(path)
    dims = None
    for tag, d in _ACE2_SIZES.items():
        if tag in base:
            dims = d
            break
    if dims is None:
        raise ValueError(f"{path}: unknown ACE2 tile resolution")
    w, h, res = dims
    int_tile = any(t in base for t in ("_SOURCE_", "_QUALITY_",
                                       "_CONF_"))
    dt = np.dtype("<i2" if int_tile else "<f4")
    with open(path, "rb") as fh:
        raw = fh.read(w * h * dt.itemsize)
    raw = raw + b"\x00" * (w * h * dt.itemsize - len(raw))
    px = np.frombuffer(raw, dt).reshape(h, w)
    m = re.match(r"(\d+)([NS])(\d+)([EW])", base)
    gt = None
    if m:
        lat = int(m.group(1)) * (1 if m.group(2) == "N" else -1)
        lon = int(m.group(3)) * (1 if m.group(4) == "E" else -1)
        tile_deg = w * res
        gt = (float(lon), res, 0.0, lat + tile_deg, 0.0, -res)
    return np.ascontiguousarray(px), gt, {"int16": int_tile}


# --------------------------------------------------------------------- FAST
# EOSAT FAST Format (frmts/raw/fastdataset.cpp): ASCII administrative
# header + per-band raw files. Corners parse from the "UL/UR/LR/LL ="
# records (eastings >= 1e6 drop the USGS zone*1e6 prefix), the
# geotransform is the least-squares affine over the four corner GCPs
# at pixel centers; band files come from FILENAME records or the
# Euromap IRS PAN/LISS3 last-letter conventions.

def sniff_fast(data: bytes) -> bool:
    head = data[:512]
    return (b"ACQUISITION DATE" in head and b"SATELLITE" in head
            and b"SENSOR" in head)


def _fast_corner(text: str, tag: str):
    m = re.search(tag + r"\s*=\s*([\d.]+)([EW])\s+([\d.]+)([NS])"
                  r"\s+([-\d.]+)\s+([-\d.]+)", text)
    if not m:
        return None
    return float(m.group(5)), float(m.group(6))


def read_fast(path: str):
    """path is the FAST admin header (.FST / IRS-style). Returns
    (pixels (h, w, bands), gt | None, info)."""
    with open(path, "rb") as fh:
        text = fh.read(16384).decode("latin-1", "replace")
    if not sniff_fast(text.encode("latin-1")):
        raise ValueError(f"{path}: not a FAST header")

    def intval(pattern, default=0):
        m = re.search(pattern, text)
        return int(m.group(1)) if m else default

    w = intval(r"PIXELS PER LINE\s*=\s*(\d+)")
    h = intval(r"LINES PER BAND\s*=\s*(\d+)")
    bits = intval(r"OUTPUT BITS PER PIXEL\s*=\s*(\d+)", 8) or \
        intval(r"BITS PER PIXEL\s*=\s*(\d+)", 8)
    zone = intval(r"USGS MAP ZONE\s*=\s*(\d+)")
    sensor = (re.search(r"SENSOR\s*=([^\s]+)", text) or [None, ""])[1]
    if w <= 0 or h <= 0:
        raise ValueError(f"{path}: bad FAST dimensions")
    dt = np.dtype("u1" if bits <= 8 else ">u2")

    d = os.path.dirname(path) or "."
    listing = {f.lower(): f for f in os.listdir(d)}
    band_files = []
    # FILENAME fields are fixed 29-char slots, packed two per line
    for m in re.finditer(r"FILENAME\s*=", text):
        name = text[m.end():m.end() + 29].strip()
        if name and name.lower() in listing:
            band_files.append(os.path.join(d, listing[name.lower()]))
    if not band_files:
        # Euromap IRS conventions: header last letter -> band letters
        base = os.path.basename(path)
        last = base[-1]
        cands = []
        if sensor.upper() == "PAN":
            low = last.lower()
            if "a" <= low <= "j":
                cands = [chr(ord("0") + ord(low) - ord("a"))]
            elif "k" <= low <= "m":
                cands = [chr(ord("n") + ord(low) - ord("k"))]
        elif sensor.upper() == "LISS3":
            rows = ["02345", "6789a", "bcdef", "ghijk", "lmnop",
                    "qrstu", "vwxyz"]
            for r in rows:
                if last.lower() == r[0]:
                    cands = list(r[1:])
                    break
        for c in cands:
            name = (base[:-1] + c).lower()
            if name in listing:
                band_files.append(os.path.join(d, listing[name]))
    if not band_files:
        raise FileNotFoundError(f"{path}: no FAST band files found")

    bands = []
    for bf in band_files:
        with open(bf, "rb") as fh:
            raw = fh.read(w * h * dt.itemsize)
        raw = raw + b"\x00" * (w * h * dt.itemsize - len(raw))
        bands.append(np.frombuffer(raw, dt).reshape(h, w))
    px = bands[0] if len(bands) == 1 else np.dstack(bands)

    gt = None
    corners = [_fast_corner(text, t) for t in ("UL", "UR", "LR", "LL")]
    if all(c is not None for c in corners):
        xs = [c[0] for c in corners]
        ys = [c[1] for c in corners]
        if zone:
            xs = [x - zone * 1000000.0 if x >= 1000000.0 else x
                  for x in xs]
        pix = [(0.5, 0.5), (w - 0.5, 0.5), (w - 0.5, h - 0.5),
               (0.5, h - 0.5)]
        A = np.array([[1.0, p[0], p[1]] for p in pix])
        cx, *_ = np.linalg.lstsq(A, np.array(xs), rcond=None)
        cy, *_ = np.linalg.lstsq(A, np.array(ys), rcond=None)
        gt = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])
    return np.ascontiguousarray(px) if px.ndim == 2 else px, gt, \
        {"sensor": sensor, "bits": bits, "n_bands": len(band_files)}
