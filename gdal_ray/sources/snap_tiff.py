"""SNAP GeoTIFF (Sentinel Application Platform) driver (reference
frmts/snap_tiff/snaptiffdriver.cpp).

A SNAP TIFF is a big-endian classic TIFF: single uncompressed Float32
band in one strip, a dense GeoTIFFTiePoints grid (6 doubles per GCP:
pixel, line, depth, X, Y, Z) that forms a regular geolocation array,
a GeoKeyDirectory holding the EPSG code, and the full DIMAP product
XML in the non-standard ASCII tag 65000 (snaptiffdriver.cpp:19).

The reader mirrors the reference exactly:

* identify: MM classic TIFF, compression none, SampleFormat IEEEFP,
  1 sample @ 32 bits, untiled, 1 strip, RowsPerStrip == height, and
  the PixelScale/TiePoints/GeoKeyDirectory/DIMAP tags present
  (Identify, :92-160).
* geolocation-array validation: grid width/height from
  sqrt(size * count / other_size) rounding, >= 3 lines, first tie
  point at (0.5, 0.5), constant pixel spacing across the first three
  lines (1e-5 relative), spacing * (n-1) == raster size - 1 within
  1e-3 px, constant line spacing (GetGeolocationMetadata, :403-560).
* 4 corner GCPs TL/TR/BL/BR from the first and last tie-point lines.
* EPSG from GeodeticCRSGeoKey (2048) / ProjectedCRSGeoKey (3072)
  short geokeys (ReadSRS, :565-620).
* band metadata from the DIMAP <Spectral_Band_Info> block:
  NO_DATA_VALUE(_USED), SCALING_FACTOR/OFFSET, BAND_NAME,
  PHYSICAL_UNIT (Open, :308-370).

The autotest fixture is a doubly-zipped truncated product; nested
``.zip`` paths are unwrapped like /vsizip/vsizip/ chains.
"""
from __future__ import annotations

import math
import re
import struct

import numpy as np

_TIEPOINTS, _PIXELSCALE, _GEOKEYS, _DIMAP = 33922, 33550, 34735, 65000
_VALUES_PER_GCP = 6


def _load_bytes(path: str) -> bytes:
    """Unwrap nested zip containers (first member each level)."""
    import io
    import zipfile

    data = open(path, "rb").read()
    while data[:2] == b"PK":
        z = zipfile.ZipFile(io.BytesIO(data))
        data = z.read(z.namelist()[0])
    return data


def _scan_ifd(data: bytes):
    """(tag -> (type, count, data offset)) without materializing values."""
    bo = ">" if data[:2] == b"MM" else "<"
    magic, = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError("SNAP_TIFF: classic TIFF expected")
    ifd_off, = struct.unpack(bo + "I", data[4:8])
    n, = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    out = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        t, typ, cnt = struct.unpack(bo + "HHI", data[e:e + 8])
        nbytes = sizes.get(typ, 1) * cnt
        off = (e + 8 if nbytes <= 4
               else struct.unpack(bo + "I", data[e + 8:e + 12])[0])
        out[t] = (typ, cnt, off)
    next_off, = struct.unpack(bo + "I",
                              data[ifd_off + 2 + 12 * n:ifd_off + 6 + 12 * n])
    return bo, out, next_off


def _shorts(data, bo, entry):
    typ, cnt, off = entry
    return np.frombuffer(data, dtype=bo + "u2", count=cnt, offset=off)


def read_snap_tiff(path: str) -> dict:
    """Parse a SNAP TIFF -> metadata + corner GCPs + geolocation grid."""
    data = _load_bytes(path)
    bo, tags, next_off = _scan_ifd(data)
    from .tiff import _read_ifd

    small = {t: v for t, v in _read_ifd(data, bo).items()
             if t != _TIEPOINTS}

    w = small.get(256, [0])[0]
    h = small.get(257, [0])[0]
    comp = small.get(259, [1])[0]
    bits = small.get(258, [0])[0]
    sfmt = small.get(339, [1])[0]
    spp = small.get(277, [1])[0]
    rows_per_strip = small.get(278, [0])[0]
    strip_offsets = small.get(273, [])
    if (bo != ">" or next_off != 0 or comp != 1 or sfmt != 3 or spp != 1
            or bits != 32 or 322 in small or len(strip_offsets) != 1
            or w == 0 or h == 0 or rows_per_strip != h
            or _PIXELSCALE not in tags or _TIEPOINTS not in tags
            or _GEOKEYS not in tags or _DIMAP not in tags):
        raise ValueError("not a SNAP TIFF (snaptiffdriver.cpp Identify)")

    # ---------------- tie points / geolocation array (no full copy)
    typ, cnt, off = tags[_TIEPOINTS]
    if typ != 12 or cnt % _VALUES_PER_GCP:
        raise ValueError("SNAP_TIFF: bad tie point tag")
    n_gcps = cnt // _VALUES_PER_GCP
    gw = int(round(math.sqrt(float(w) * n_gcps / h)))
    gh = int(round(math.sqrt(float(h) * n_gcps / w)))
    if gw * gh != n_gcps or gh < 3:
        raise ValueError("SNAP_TIFF: tie points are not a regular grid")
    per_line = gw * _VALUES_PER_GCP
    head = np.frombuffer(data, dtype=bo + "f8", count=per_line * 3,
                         offset=off).reshape(3, gw, _VALUES_PER_GCP)
    if head[0, 0, 1] != 0.5 and head[0, 0, 0] != 0.5:
        raise ValueError("SNAP_TIFF: tie points do not start at (0.5,0.5)")
    px_step = head[0, 1, 0] - head[0, 0, 0]
    if not px_step >= 1 or abs(px_step * (gw - 1) - (w - 1)) > 1e-3:
        raise ValueError("SNAP_TIFF: irregular pixel spacing")
    d = np.diff(head[:, :, 0], axis=1)
    if np.abs(d - px_step).max() > 1e-5 * abs(px_step):
        raise ValueError("SNAP_TIFF: irregular pixel spacing")
    if (np.diff(head[:, :, 1], axis=1) != 0).any():
        raise ValueError("SNAP_TIFF: line varies within a tie-point row")
    ln_step = head[1, 0, 1] - head[0, 0, 1]
    if not ln_step >= 1 or abs(ln_step * (gh - 1) - (h - 1)) > 1e-3:
        raise ValueError("SNAP_TIFF: irregular line spacing")
    tail = np.frombuffer(data, dtype=bo + "f8", count=per_line,
                         offset=off + (gh - 1) * per_line * 8
                         ).reshape(gw, _VALUES_PER_GCP)

    def gcp(row, i, ident, name):
        return {"id": ident, "info": name, "pixel": row[i, 0],
                "line": row[i, 1], "x": row[i, 3], "y": row[i, 4],
                "z": row[i, 5]}

    gcps = [gcp(head[0], 0, "TL", "Top Left"),
            gcp(head[0], gw - 1, "TR", "Top Right"),
            gcp(tail, 0, "BL", "Bottom Left"),
            gcp(tail, gw - 1, "BR", "Bottom Right")]

    # ---------------- EPSG from geokeys
    epsg = None
    gk = _shorts(data, bo, tags[_GEOKEYS])
    if len(gk) >= 4 and gk[0] == 1 and gk[1] == 1 \
            and gk[3] == len(gk) // 4 - 1:
        for i in range(1, gk[3] + 1):
            key, ktyp, kcnt, kval = gk[4 * i:4 * i + 4]
            if key in (2048, 3072) and ktyp == 0 and kcnt == 1 and kval > 0:
                epsg = int(kval)
                if key == 3072:
                    break

    # ---------------- DIMAP band metadata
    typ, cnt, doff = tags[_DIMAP]
    dimap = data[doff:doff + cnt].rstrip(b"\x00").decode(
        "utf-8", errors="replace")
    out = {"width": int(w), "height": int(h), "dtype": "float32",
           "epsg": epsg, "gcps": gcps,
           "geoloc_width": gw, "geoloc_height": gh,
           "pixel_step": float(px_step), "line_step": float(ln_step),
           "dimap": dimap, "tiepoint_offset": int(off), "bo": bo,
           "strip_offset": int(strip_offsets[0])}
    desc = small.get(270)
    if desc:
        out["image_description"] = desc[0] if isinstance(desc[0], str) \
            else str(desc[0])

    m = re.search(r"<Spectral_Band_Info>.*?</Spectral_Band_Info>", dimap,
                  re.S)
    if m:
        import xml.etree.ElementTree as ET

        band = ET.fromstring(m.group(0))

        def val(tag):
            el = band.find(tag)
            return el.text if el is not None else None

        if (val("NO_DATA_VALUE_USED") or "").upper() in ("TRUE", "YES", "1"):
            out["nodata"] = float(val("NO_DATA_VALUE"))
        if val("SCALING_FACTOR") is not None:
            out["scale"] = float(val("SCALING_FACTOR"))
        if val("SCALING_OFFSET") is not None:
            out["offset"] = float(val("SCALING_OFFSET"))
        if val("BAND_NAME") is not None:
            out["band_name"] = val("BAND_NAME")
        if val("PHYSICAL_UNIT") is not None:
            out["unit"] = val("PHYSICAL_UNIT")
    return out


def snap_geoloc_arrays(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(longitude, latitude) Float64 geolocation-array bands — the
    GEOLOCATION subdataset the reference exposes as two RawRasterBands
    striding the tie-point doubles (snaptiffdriver.cpp:249-266)."""
    data = _load_bytes(path)
    info = read_snap_tiff(path)
    gw, gh = info["geoloc_width"], info["geoloc_height"]
    pts = np.frombuffer(data, dtype=info["bo"] + "f8",
                        count=gw * gh * _VALUES_PER_GCP,
                        offset=info["tiepoint_offset"]
                        ).reshape(gh, gw, _VALUES_PER_GCP)
    return pts[:, :, 3].astype(np.float64), pts[:, :, 4].astype(np.float64)


def snap_read_window(path: str, x0: int, y0: int, nx: int, ny: int
                     ) -> np.ndarray:
    """Main-band window; bytes past a truncated payload read as zeros
    (the autotest fixture is an 'empty_truncated' product)."""
    data = _load_bytes(path)
    info = read_snap_tiff(path)
    w = info["width"]
    out = np.zeros((ny, nx), np.float32)
    for r in range(ny):
        start = info["strip_offset"] + ((y0 + r) * w + x0) * 4
        chunk = data[start:start + nx * 4]
        vals = np.frombuffer(chunk, dtype=info["bo"] + "f4")
        out[r, :len(vals)] = vals
    return out
