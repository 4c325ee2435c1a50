"""ENVI and ESRI EHdr raw-binary raster drivers (reference
frmts/raw/envidataset.cpp and ehdrdataset.cpp): a flat binary payload
described by an ASCII ``.hdr`` sidecar.

ENVI: ``ENVI``-magic header with ``key = value`` lines (values may be
{...} lists spanning lines); data type codes per the ENVI standard;
``interleave`` bsq/bil/bip; ``byte order`` 0=LSB 1=MSB; ``map info``
ties a reference pixel (1-based) to map coordinates with pixel sizes;
``file compression = 1`` means the payload is one gzip stream.

EHdr: ESRI BIL/BIP/BSQ header (NROWS/NCOLS/NBANDS/NBITS/BYTEORDER
I|M, ULXMAP/ULYMAP name the CENTER of the upper-left pixel) plus the
GridFloat/GTOPO30 lowercase form (ncols/nrows/cellsize/xllcorner/
yllcorner/byteorder msbfirst). Type rules follow ehdrdataset.cpp:
NBITS 16 defaults to Int16, NBITS 32 to Int32 unless PIXELTYPE is
FLOAT (or the payload extension is ``.flt``), PIXELTYPE SIGNEDINT/
UNSIGNEDINT overrides.
"""

from __future__ import annotations

import gzip
import re

import numpy as np

# ENVI data type code -> numpy kind (byte order applied at read)
_ENVI_TYPES = {1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8",
               12: "u2", 13: "u4", 14: "i8", 15: "u8"}
_ENVI_CODES = {np.dtype(v).str[1:]: k for k, v in _ENVI_TYPES.items()}


def parse_envi_header(text: str) -> dict:
    if not text.lstrip().upper().startswith("ENVI"):
        raise ValueError("not an ENVI header")
    out: dict[str, str | list] = {}
    # join {...} blocks into one logical value
    body = text.lstrip()[4:]
    pos = 0
    for m in re.finditer(r"^\s*([\w ]+?)\s*=\s*", body, re.M):
        key = m.group(1).strip().lower()
        v0 = m.end()
        if body[v0:v0 + 1] == "{":
            v1 = body.index("}", v0)
            val = [s.strip() for s in body[v0 + 1:v1].split(",")]
            out[key] = val
        else:
            out[key] = body[v0:body.find("\n", v0) if "\n" in body[v0:]
                            else len(body)].strip()
        pos = v0
    return out


def _envi_gt(hdr: dict) -> tuple | None:
    mi = hdr.get("map info")
    if not mi or len(mi) < 7:
        return None
    refx, refy, ulx, uly, xdim, ydim = (float(v) for v in mi[1:7])
    # reference pixel is 1-based and names the pixel's upper-left
    # corner in GDAL's convention (envidataset.cpp map-info read)
    return (ulx - (refx - 1.0) * xdim, xdim, 0.0,
            uly + (refy - 1.0) * ydim, 0.0, -ydim)


def _deinterleave(raw: bytes, dtype: np.dtype, h: int, w: int, nb: int,
                  interleave: str) -> np.ndarray:
    need = h * w * nb * dtype.itemsize
    if len(raw) < need:  # raw readers return zeros past EOF
        raw = bytes(raw) + b"\0" * (need - len(raw))
    a = np.frombuffer(raw, dtype=dtype, count=h * w * nb)
    il = interleave.lower()
    if il == "bsq":
        px = a.reshape(nb, h, w).transpose(1, 2, 0)
    elif il == "bil":
        px = a.reshape(h, nb, w).transpose(0, 2, 1)
    elif il == "bip":
        px = a.reshape(h, w, nb)
    else:
        raise ValueError(f"interleave {interleave}")
    px = np.ascontiguousarray(px).astype(dtype.newbyteorder("="))
    return px[:, :, 0] if nb == 1 else px


def read_envi(hdr_text: str, data: bytes):
    """-> (pixels (h, w[, bands]), gt | None, header dict)."""
    hdr = parse_envi_header(hdr_text)
    h = int(hdr["lines"])
    w = int(hdr["samples"])
    nb = int(hdr.get("bands", 1))
    code = int(hdr["data type"])
    if code not in _ENVI_TYPES:
        raise NotImplementedError(f"ENVI data type {code} (complex)")
    bo = ">" if int(hdr.get("byte order", 0)) == 1 else "<"
    dtype = np.dtype(bo + _ENVI_TYPES[code])
    off = int(hdr.get("header offset", 0))
    payload = data[off:]
    if int(hdr.get("file compression", 0)) == 1:
        payload = gzip.decompress(payload)
    px = _deinterleave(payload, dtype, h, w, nb,
                       hdr.get("interleave", "bsq"))
    return px, _envi_gt(hdr), hdr


def write_envi(px: np.ndarray, gt=None, interleave: str = "bsq",
               compress: bool = False) -> tuple[str, bytes]:
    """-> (hdr_text, payload bytes); little-endian."""
    px = np.ascontiguousarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nb = px.shape
    code = _ENVI_CODES.get(px.dtype.newbyteorder("=").str[1:])
    if code is None:
        raise NotImplementedError(f"ENVI type for {px.dtype}")
    il = interleave.lower()
    if il == "bsq":
        a = px.transpose(2, 0, 1)
    elif il == "bil":
        a = px.transpose(0, 2, 1)
    else:
        a = px
    payload = np.ascontiguousarray(a).astype(
        px.dtype.newbyteorder("<")).tobytes()
    lines = ["ENVI", f"samples = {w}", f"lines   = {h}", f"bands   = {nb}",
             "header offset = 0", "file type = ENVI Standard",
             f"data type = {code}", f"interleave = {il}", "byte order = 0"]
    if compress:
        payload = gzip.compress(payload, 6)
        lines.insert(4, "file compression = 1")
    if gt is not None:
        if gt[2] or gt[4]:
            raise NotImplementedError("ENVI map info is axis-aligned")
        lines.append("map info = {Arbitrary, 1, 1, "
                     f"{gt[0]!r}, {gt[3]!r}, {gt[1]!r}, {-gt[5]!r}}}")
    return "\n".join(lines) + "\n", payload


# ------------------------------------------------------------------ EHdr

def read_ehdr(hdr_text: str, data: bytes, ext: str = ""):
    """-> (pixels, gt | None, nodata | None); ``ext`` is the payload
    file extension ('.flt' forces float32 per ehdrdataset.cpp)."""
    kv: dict[str, str] = {}
    for line in hdr_text.splitlines():
        parts = line.split(None, 1)
        if len(parts) == 2:
            kv[parts[0].strip().lower()] = parts[1].strip()
    if "nrows" not in kv or "ncols" not in kv:
        raise ValueError("not an EHdr header")
    h, w = int(kv["nrows"]), int(kv["ncols"])
    nb = int(kv.get("nbands", 1))
    nbits = int(kv["nbits"]) if "nbits" in kv else -1
    nodata = float(kv["nodata"]) if "nodata" in kv else None
    # pixel-type resolution order per ehdrdataset.cpp: PIXELTYPE tag,
    # then payload-size inference (4 bytes/px => float), then the .flt
    # extension, then the worldclim negative-nodata => signed rule
    pt = {"SIGNEDINT": "S", "UNSIGNEDINT": "U",
          "FLOAT": "F"}.get(kv.get("pixeltype", "").upper(), "N")
    if nbits == -1 and pt == "N":
        nbytes = len(data) // (h * w * nb)
        if 0 < nbytes <= 8 and nbytes != 3:
            nbits = nbytes * 8
        if nbytes == 4:
            pt = "F"
    if pt == "N" and ext.lower() == ".flt":
        pt = "F"
    if pt == "N" and nodata is not None and nodata < 0:
        pt = "S"
    if nbits == 16:
        dt = "i2" if pt == "S" else "u2"
    elif nbits == 32:
        dt = {"S": "i4", "F": "f4"}.get(pt, "u4")
    elif nbits == 64:
        dt = "f8" if pt == "F" else "i8"
    elif 1 <= nbits <= 8:
        dt = "i1" if pt == "S" else "u1"
    elif nbits == -1:
        dt = "f4" if pt == "F" else "u1"
    else:
        raise NotImplementedError(f"EHdr NBITS {nbits}")
    bo_tok = kv.get("byteorder", "I").upper()
    bo = ">" if bo_tok in ("M", "MSBFIRST") else "<"
    dtype = np.dtype(bo + dt)
    skip = int(kv.get("skipbytes", 0))
    px = _deinterleave(data[skip:], dtype, h, w, nb,
                       kv.get("layout", "bil"))
    gt = None
    if "ulxmap" in kv and "ulymap" in kv:
        xd = float(kv.get("xdim", kv.get("cellsize", 1)))
        yd = float(kv.get("ydim", kv.get("cellsize", 1)))
        # ULXMAP/ULYMAP name the CENTER of the upper-left pixel
        gt = (float(kv["ulxmap"]) - xd / 2, xd, 0.0,
              float(kv["ulymap"]) + yd / 2, 0.0, -yd)
    elif "xllcorner" in kv and "cellsize" in kv:
        cs = float(kv["cellsize"])
        gt = (float(kv["xllcorner"]), cs, 0.0,
              float(kv["yllcorner"]) + h * cs, 0.0, -cs)
    return px, gt, nodata


def write_ehdr(px: np.ndarray, gt=None,
               nodata: float | None = None) -> tuple[str, bytes]:
    """BIL layout, little-endian -> (hdr_text, payload bytes)."""
    px = np.ascontiguousarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nb = px.shape
    dt = px.dtype.newbyteorder("=")
    if dt.kind == "f":
        ptype, nbits = "FLOAT", dt.itemsize * 8
    elif dt.kind == "i":
        ptype, nbits = "SIGNEDINT", dt.itemsize * 8
    else:
        ptype, nbits = "UNSIGNEDINT", dt.itemsize * 8
    payload = np.ascontiguousarray(px.transpose(0, 2, 1)).astype(
        dt.newbyteorder("<")).tobytes()
    lines = ["BYTEORDER      I", "LAYOUT         BIL",
             f"NROWS          {h}", f"NCOLS          {w}",
             f"NBANDS         {nb}", f"NBITS          {nbits}",
             f"BANDROWBYTES   {w * dt.itemsize}",
             f"TOTALROWBYTES  {w * nb * dt.itemsize}",
             f"PIXELTYPE      {ptype}"]
    if gt is not None:
        if gt[2] or gt[4]:
            raise NotImplementedError("EHdr is axis-aligned")
        lines += [f"ULXMAP         {gt[0] + gt[1] / 2!r}",
                  f"ULYMAP         {gt[3] + gt[5] / 2!r}",
                  f"XDIM           {gt[1]!r}",
                  f"YDIM           {-gt[5]!r}"]
    if nodata is not None:
        lines.append(f"NODATA         {nodata!r}")
    return "\n".join(lines) + "\n", payload
