"""SAR raster drivers: GFF, COASP, AIRSAR, JAXA PALSAR.

The reference's own autotests for these download their data (no local
fixtures), so wire-format parity is against the driver sources and the
tests synthesize in-format files:

- GFF (frmts/gff/gff_dataset.cpp): "GSATIMG" magic; u16le minor@8 /
  major@10, u32le header-length@12; u32le BPP/FrameCnt/ImageType/
  RowMajor/RgCnt/AzCnt at offset 56; data = raw rows at header-length.
  ImageType 0 -> Byte, 1 -> CInt16 (BPP 4) else CInt32, 2 -> CFloat32;
  complex images store 2x the pixel count in the fastest axis
  (gff_dataset.cpp:274-287).
- COASP (frmts/coasp/coasp_dataset.cpp): space-tokenized .hdr starting
  "time_first_datarec" with number_lines / number_samples; per-channel
  .rc files found by substituting hh/hv/vh/vv in the basename; raw
  big-endian float32 (I,Q) rows; 4 bands -> MATRIX_REPRESENTATION
  SCATTERING.
- AIRSAR (frmts/airsar/airsardataset.cpp): 50-byte header records
  ("key = value", fallback split at last double-space; keys
  space/colon/comma -> underscore, prefixed MH_/PH_/CH_); compressed
  Stokes-matrix lines of 10 signed bytes/pixel decoded per
  airsardataset.cpp:318-334; 6 CFloat32 bands are the symmetrized
  covariance C11/C12/C13/C22/C23/C33 combinations of
  airsardataset.cpp:165-236.
- JAXA PALSAR (frmts/jaxapalsar/jaxapalsardataset.cpp): ALOS CEOS
  volume (VOL-ALPSR*) + IMG-{HH,HV,VH,VV}- + LED- siblings; image
  options descriptor gives bits/sample@216, samples/group@220 (ASCII),
  record length@186, line count@236; level 1.1 = CFloat32 big-endian
  at +412 per record, level 1.5 = UInt16 at +192; level 1.0 rejected
  like the reference.  Faithfully reproduced reference quirks: block y
  is read from record y-1 (jaxapalsardataset.cpp:328-330) and the
  level-1.5 corner-GCP pixel coordinates use the LINE count
  (jaxapalsardataset.cpp:467-480).
"""
from __future__ import annotations

import os
import re
import struct

import numpy as np

from .vsi import vsi_open_bytes

# ------------------------------------------------------------------ GFF
_GFF_TYPES = {0: ("u1", False), 1: (None, True), 2: ("c8", True)}


def read_gff(data: bytes) -> dict:
    if not data[:7].upper().startswith(b"GSATIMG"):
        raise ValueError("not a GFF file (missing GSATIMG)")
    minor, major = struct.unpack("<HH", data[8:12])
    length = struct.unpack("<I", data[12:16])[0]
    (bpp, frame_cnt, image_type, row_major, rg_cnt,
     az_cnt) = struct.unpack("<6I", data[56:80])
    if image_type == 0:
        dt, complex_halving = np.dtype("u1"), 1
    elif image_type == 1:
        dt = np.dtype("<i2") if bpp == 4 else np.dtype("<i4")
        complex_halving = 2
    elif image_type == 2:
        dt, complex_halving = np.dtype("<f4"), 2
    else:
        raise ValueError(f"GFF: unknown image type {image_type}")
    if row_major:
        w, h = rg_cnt // complex_halving, az_cnt
    else:
        w, h = az_cnt // complex_halving, rg_cnt
    if w <= 0 or h <= 0:
        raise ValueError(f"GFF: invalid raster dimensions {w}x{h}")
    n = w * h * complex_halving
    arr = np.frombuffer(data, dt, count=n, offset=length)
    if complex_halving == 2:
        arr = arr.astype(np.float32).reshape(h, w, 2)
        px = (arr[..., 0] + 1j * arr[..., 1]).astype(np.complex64)
    else:
        px = arr.reshape(h, w).copy()
    return {"pixels": px, "gt": None, "epsg": None, "driver": "GFF",
            "version": (major, minor), "frame_count": frame_cnt,
            "row_major": row_major}


def write_gff(px: np.ndarray, image_type: int | None = None) -> bytes:
    px = np.asarray(px)
    h, w = px.shape
    if image_type is None:
        image_type = 2 if np.iscomplexobj(px) else 0
    length = 2048
    head = bytearray(length)
    head[:7] = b"GSATIMG"
    struct.pack_into("<HH", head, 8, 2, 1)      # minor, major
    struct.pack_into("<I", head, 12, length)
    bpp = {0: 1, 1: 4, 2: 8}[image_type]
    mult = 1 if image_type == 0 else 2
    struct.pack_into("<6I", head, 56, bpp, 1, image_type, 1,
                     w * mult, h)
    if image_type == 0:
        body = px.astype("u1").tobytes()
    elif image_type == 1:
        iq = np.empty((h, w, 2), "<i2")
        iq[..., 0] = px.real
        iq[..., 1] = px.imag
        body = iq.tobytes()
    else:
        iq = np.empty((h, w, 2), "<f4")
        iq[..., 0] = px.real
        iq[..., 1] = px.imag
        body = iq.tobytes()
    return bytes(head) + body


# ------------------------------------------------------------------ COASP
def _coasp_kv(text: str) -> dict[str, str]:
    kv = {}
    for line in text.splitlines():
        toks = line.split()
        if len(toks) >= 2:
            kv.setdefault(toks[0], toks[1])
    return kv


def read_coasp(hdr_path: str) -> dict:
    text = vsi_open_bytes(hdr_path).decode("ascii", "replace")
    if not text.startswith("time_first_datarec"):
        raise ValueError("not a COASP header (time_first_datarec)")
    kv = _coasp_kv(text)
    h = int(kv["number_lines"])
    w = int(kv["number_samples"])
    base = os.path.basename(hdr_path)
    stem = os.path.splitext(base)[0]
    m = re.search(r"(hh|hv|vh|vv)", stem)
    if not m:
        raise ValueError("COASP: cannot find channel token in filename")
    d = os.path.dirname(hdr_path)
    bands, poles = [], []
    for chan in ("hh", "hv", "vh", "vv"):
        rc = os.path.join(
            d, stem[:m.start()] + chan + stem[m.end():] + ".rc")
        if not os.path.exists(rc):
            continue
        raw = np.frombuffer(vsi_open_bytes(rc), ">f4",
                            count=h * w * 2).astype(np.float32)
        iq = raw.reshape(h, w, 2)
        bands.append((iq[..., 0] + 1j * iq[..., 1]).astype(np.complex64))
        poles.append(chan)
    if not bands:
        raise ValueError("COASP: unable to find any data")
    md = {"METADATA": kv}
    if len(bands) == 4:
        md["MATRIX_REPRESENTATION"] = "SCATTERING"
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return {"pixels": px, "gt": None, "epsg": None, "driver": "COASP",
            "poles": poles, "metadata": md}


def write_coasp(tmpdir: str, stem_hh: str,
                channels: dict[str, np.ndarray]) -> str:
    """Write a COASP channel set; returns the .hdr path."""
    any_arr = next(iter(channels.values()))
    h, w = any_arr.shape
    hdr = (f"time_first_datarec 0.0\nnumber_lines {h}\n"
           f"number_samples {w}\n")
    hdr += "".join(f"pad_line_{i} 0\n" for i in range(40))  # >=256 bytes
    hdr_path = os.path.join(tmpdir, stem_hh + ".hdr")
    with open(hdr_path, "w") as f:
        f.write(hdr)
    for chan, arr in channels.items():
        stem = stem_hh.replace("hh", chan)
        iq = np.empty((h, w, 2), ">f4")
        iq[..., 0] = arr.real
        iq[..., 1] = arr.imag
        with open(os.path.join(tmpdir, stem + ".rc"), "wb") as f:
            f.write(iq.tobytes())
    return hdr_path


# ------------------------------------------------------------------ AIRSAR
def _airsar_header(data: bytes, off: int, prefix: str,
                   max_lines: int) -> dict[str, str]:
    kv: dict[str, str] = {}
    for i in range(max_lines):
        rec = data[off + 50 * i: off + 50 * (i + 1)]
        if len(rec) < 50:
            break
        line = rec.decode("latin-1")
        if all(c == " " for c in line) or any(
                ord(c) > 127 or ord(c) < 10 for c in line.rstrip("\x00")):
            break
        pivot = line.find("=")
        if pivot == -1:
            for j in range(48, -1, -1):
                if line[j] == " " and line[j + 1] == " ":
                    pivot = j
                    break
        if pivot == -1:
            break
        key = line[:pivot].rstrip()
        val = line[pivot + 1:].lstrip().rstrip()
        key = re.sub(r"[ :,]", "_", key)
        kv[f"{prefix}_{key}"] = val
    return kv


def _airsar_stokes(raw: np.ndarray) -> np.ndarray:
    """(n, 10) signed bytes -> (n, 10) M11..M44 per the reference's
    exact decode (indices: M11,M12,M13,M14,M23,M24,M33,M34,M44,M22)."""
    b = raw.astype(np.float64)
    M = np.empty((len(raw), 10))
    m11 = (b[:, 1] / 254.0 + 1.5) * np.power(2.0, b[:, 0])
    M[:, 0] = m11
    M[:, 1] = b[:, 2] * m11 / 127.0
    M[:, 2] = b[:, 3] * np.abs(b[:, 3]) * m11 / (127 * 127)
    M[:, 3] = b[:, 4] * np.abs(b[:, 4]) * m11 / (127 * 127)
    M[:, 4] = b[:, 5] * np.abs(b[:, 5]) * m11 / (127 * 127)
    M[:, 5] = b[:, 6] * np.abs(b[:, 6]) * m11 / (127 * 127)
    M[:, 6] = b[:, 7] * m11 / 127
    M[:, 7] = b[:, 8] * m11 / 127
    M[:, 8] = b[:, 9] * m11 / 127
    M[:, 9] = M[:, 0] - M[:, 6] - M[:, 8]
    return M


def read_airsar(data: bytes) -> dict:
    head = data[:800].decode("latin-1", "replace")
    if not head.upper().startswith("RECORD LENGTH IN BYTES"):
        raise ValueError("not an AIRSAR file")
    if "COMPRESSED" not in head or "JPL AIRCRAFT" not in head:
        raise ValueError("not a compressed JPL AIRSAR file")
    md = _airsar_header(data, 0, "MH", 20)
    w = int(md["MH_NUMBER_OF_SAMPLES_PER_RECORD"])
    h = int(md["MH_NUMBER_OF_LINES_IN_IMAGE"])
    rec_len = int(md["MH_RECORD_LENGTH_IN_BYTES"])
    data_start = int(md["MH_BYTE_OFFSET_OF_FIRST_DATA_RECORD"])
    ph_off = int(md.get("MH_BYTE_OFFSET_OF_PARAMETER_HEADER", "0"))
    if ph_off:
        md.update(_airsar_header(data, ph_off, "PH", 100))
        md.update(_airsar_header(data, ph_off + rec_len, "CH", 18))
    md["MATRIX_REPRESENTATION"] = "SYMMETRIZED_COVARIANCE"

    raw = np.frombuffer(data, np.int8, count=h * rec_len,
                        offset=data_start).reshape(h, rec_len)
    raw = raw[:, :w * 10].reshape(h * w, 10)
    M = _airsar_stokes(raw).reshape(h, w, 10)
    m11, m12, m13, m14 = M[..., 0], M[..., 1], M[..., 2], M[..., 3]
    m23, m24, m33, m34 = M[..., 4], M[..., 5], M[..., 6], M[..., 7]
    m44, m22 = M[..., 8], M[..., 9]
    s2 = np.sqrt(2.0)
    bands = np.empty((h, w, 6), np.complex64)
    bands[..., 0] = m11 + m22 + 2 * m12                       # C11
    bands[..., 1] = s2 * (m13 + m23) - 1j * s2 * (m24 + m14)  # C12
    bands[..., 2] = 2 * m33 + m22 - m11 - 2j * m34            # C13
    bands[..., 3] = 2 * (m11 - m22)                           # C22
    bands[..., 4] = s2 * (m13 - m23) + 1j * s2 * (m24 - m14)  # C23
    bands[..., 5] = m11 + m22 - 2 * m12                       # C33
    return {"pixels": bands, "gt": None, "epsg": None, "driver": "AirSAR",
            "metadata": md}


def write_airsar(stokes_bytes: np.ndarray) -> bytes:
    """(h, w, 10) int8 compressed Stokes bytes -> AIRSAR file."""
    h, w, _ = stokes_bytes.shape
    rec_len = w * 10

    def rec50(key, val):
        line = f"{key} = {val}"
        return line.ljust(50).encode("ascii")

    headers = [
        rec50("RECORD LENGTH IN BYTES", rec_len),
        rec50("PROCESSOR", "JPL AIRCRAFT SAR (COMPRESSED)"),
        rec50("NUMBER OF SAMPLES PER RECORD", w),
        rec50("NUMBER OF LINES IN IMAGE", h),
        rec50("BYTE OFFSET OF FIRST DATA RECORD", 1000),
    ]
    head = b"".join(headers)
    head += b" " * 50  # all-blank terminator record
    head = head.ljust(1000, b"\x00")
    body = stokes_bytes.astype(np.int8).reshape(h, rec_len).tobytes()
    return head + body


# -------------------------------------------------------------- PALSAR
_PALSAR_IMG_PREFIXES = ("IMG-HH", "IMG-HV", "IMG-VH", "IMG-VV")


def _palsar_band(img: bytes) -> tuple[np.ndarray, dict]:
    bits = int(img[216:220])
    spg = int(img[220:224])
    rec_size = int(img[186:192])
    n_lines = int(img[236:244])
    if bits == 32 and spg == 2:
        level, dat_off = "1.1", 412
    elif bits == 8 and spg == 2:
        raise ValueError(
            "ALOS PALSAR Level 1.0 products are not supported")
    else:
        level, dat_off = "1.5", 192
    denom = (bits // 8) * spg
    w = (rec_size - dat_off) // denom
    out = np.zeros((n_lines, w),
                   np.complex64 if level == "1.1" else np.uint16)
    for y in range(n_lines):
        # reference quirk: block y reads record y-1
        # (jaxapalsardataset.cpp:328); record 0's slot overlaps the
        # descriptor, which reads as zeros here
        off = 720 + (y - 1) * rec_size + dat_off
        if off < 0 or y == 0:
            continue
        raw = img[off:off + w * denom]
        if len(raw) < w * denom:
            break
        if level == "1.1":
            iq = np.frombuffer(raw, ">f4").reshape(w, 2)
            out[y] = iq[:, 0] + 1j * iq[:, 1]
        else:
            out[y] = np.frombuffer(raw, ">u2")
    return out, {"level": level, "width": w, "lines": n_lines,
                 "rec_size": rec_size}


def read_palsar(vol_path: str) -> dict:
    base = os.path.basename(vol_path)
    if len(base) < 9 or not base[4:].upper().startswith("ALPSR"):
        raise ValueError("not an ALOS PALSAR volume file")
    vol = vsi_open_bytes(vol_path)
    if vol[60:62] != b"AL":
        raise ValueError("not an ALOS PALSAR volume (AL signature)")
    suffix = base[3:]          # "-ALPSRxxxx"
    d = os.path.dirname(vol_path)
    bands, poles = [], []
    info = {}
    for pref, pol in zip(_PALSAR_IMG_PREFIXES, ("HH", "HV", "VH", "VV")):
        p = os.path.join(d, pref + suffix)
        if not os.path.exists(p):
            continue
        px, info = _palsar_band(vsi_open_bytes(p))
        bands.append(px)
        poles.append(pol)
    if not bands:
        raise ValueError("PALSAR: no IMG- files found")
    md = {"PRODUCT_LEVEL": info["level"], "SENSOR_BAND": "L",
          "RANGE_LOOKS": "1.0", "AZIMUTH_LOOKS": "1.0"}
    gcps = []
    led = os.path.join(d, "LED" + suffix)
    if info["level"] == "1.5" and os.path.exists(led):
        ld = vsi_open_bytes(led)
        base_off = 720 + 4096

        def ffield(off):
            return float(ld[base_off + off:base_off + off + 16])

        md["PIXEL_SPACING"] = f"{ffield(92):<32.1f}".rstrip()
        md["LINE_SPACING"] = md["PIXEL_SPACING"]
        md["PROJECTION_NAME"] = ld[base_off + 412:base_off + 444] \
            .decode("ascii", "replace").rstrip()
        h = info["lines"]
        corners = [(ffield(1072 + 32 * i), ffield(1088 + 32 * i))
                   for i in range(4)]
        # pixel coords reproduce the reference's line-count quirk
        pix_line = [(0.5, 0.5), (h - 0.5, 0.5),
                    (h - 0.5, h - 0.5), (0.5, h - 0.5)]
        for i, ((lat, lon), (pix, line)) in enumerate(
                zip(corners, pix_line)):
            gcps.append({"id": str(i + 1), "pixel": pix, "line": line,
                         "x": lon, "y": lat, "z": 0.0})
    if len(bands) == 4:
        md["MATRIX_REPRESENTATION"] = "SCATTERING"
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return {"pixels": px, "gt": None, "epsg": None, "driver": "JAXAPALSAR",
            "poles": poles, "metadata": md, "gcps": gcps,
            "gcp_epsg": 4326 if gcps else None}


def write_palsar(tmpdir: str, scene: str,
                 channels: dict[str, np.ndarray],
                 level: str = "1.1") -> str:
    """Synthesize VOL/IMG/LED files; returns the VOL path."""
    any_arr = next(iter(channels.values()))
    h, w = any_arr.shape
    suffix = "-ALPSR" + scene
    vol = bytearray(720)
    vol[60:62] = b"AL"
    vol_path = os.path.join(tmpdir, "VOL" + suffix)
    with open(vol_path, "wb") as f:
        f.write(bytes(vol))
    if level == "1.1":
        denom, dat_off = 8, 412
    else:
        denom, dat_off = 2, 192
    rec_size = dat_off + w * denom
    for pol, arr in channels.items():
        head = bytearray(720)
        head[216:220] = b"  32" if level == "1.1" else b"  16"
        head[220:224] = b"   2" if level == "1.1" else b"   1"
        head[186:192] = f"{rec_size:6d}".encode()
        head[236:244] = f"{h:8d}".encode()
        recs = []
        # reference reads block y from record y-1: store line y's
        # samples in record slot y-1 so the decode round-trips
        for y in range(1, h):
            rec = bytearray(rec_size)
            if level == "1.1":
                iq = np.empty((w, 2), ">f4")
                iq[:, 0] = arr[y].real
                iq[:, 1] = arr[y].imag
                rec[dat_off:] = iq.tobytes()
            else:
                rec[dat_off:] = arr[y].astype(">u2").tobytes()
            recs.append(bytes(rec))
        with open(os.path.join(tmpdir, f"IMG-{pol}" + suffix), "wb") as f:
            f.write(bytes(head) + b"".join(recs))
    led = bytearray(720 + 4096 + 1300)
    led_off = 720 + 4096
    led[led_off + 92:led_off + 108] = b"            12.5"
    led[led_off + 108:led_off + 124] = b"            12.5"
    led[led_off + 412:led_off + 444] = b"UTM-PROJECTION                  "
    for i, (lat, lon) in enumerate([(50.1, 8.1), (50.1, 8.2),
                                    (50.0, 8.2), (50.0, 8.1)]):
        led[led_off + 1072 + 32 * i:led_off + 1088 + 32 * i] = \
            f"{lat:16.7f}".encode()
        led[led_off + 1088 + 32 * i:led_off + 1104 + 32 * i] = \
            f"{lon:16.7f}".encode()
    with open(os.path.join(tmpdir, "LED" + suffix), "wb") as f:
        f.write(bytes(led))
    return vol_path
