"""SAR_CEOS (frmts/ceos2) driver — CEOS SAR products (RADARSAT-1,
ERS, JERS, SIR-C style).

Re-derivation of frmts/ceos2 (ceos.c record chain + ceosrecipe.c
recipe tables + ceossar.c layout + sar_ceosdataset.cpp):

- records: 12-byte header (u32be sequence, 4 subtype bytes, u32be
  length); the imagery-options file descriptor is subtype
  (63,192,18,18) ((50,192,18,18) for some JERS), processed data
  records (50,11,18,20) (ERS alternates (50,11,31,20)/(50,11,31,50));
- image description via the RadarSat recipe's 1-based ASCII fields:
  channels@233/4, lines@237/8, left/right border@245/257, pixels per
  line@249/8, interleave@269/4 (BSQ/BIL), records per line@273/2,
  prefix@277/4, pixel bytes per record@281/8, suffix@289/4, bytes per
  pixel@225/4, data type@429/4 (IU1/UI1, IU2/UI2, CI*2, CI*4/CIS4,
  CI*8, C*8, R*4), descriptor length and record size from the binary
  length words (ceosrecipe.c:74-131);
- the prefix quirk: ImageDataStart += 12 unless it is already 192
  (ceosrecipe.c:375-381) — line data begins at that offset inside
  each record;
- line addressing per CalcCeosSARImageFilePosition (BSQ/BIL channel
  interleaving, ceossar.c:30-70); records missing from patch files
  read as zeros (the reference's autotest fixtures are truncated
  patches opened with errors tolerated);
- GCPs: 5 sampled scanlines x (first, middle, last) pixel from the
  192-byte line prefix — i32be lat at 132+4i, lon at 144+4i, scaled
  1e-6 (ScanForGCPs, sar_ceosdataset.cpp:1532+ prefix>=192 gate);
- sibling leader discovery for RADARSAT-style names (.D -> .L) and
  dat_01/lea_01 sets; leader metadata beyond the record inventory is
  a documented subset.
"""
from __future__ import annotations

import os
import struct

import numpy as np

from .vsi import vsi_open_bytes

IMAGERY_OPT_SUBTYPES = ((63, 192, 18, 18), (50, 192, 18, 18))
PROC_DATA_SUBTYPES = ((50, 11, 18, 20), (50, 11, 31, 20), (50, 11, 31, 50))

_DTYPES = {
    "IU1": ("u1", False), "UI1": ("u1", False),
    "IU2": (">u2", False), "UI2": (">u2", False),
    "CI*2": ("i1", True), "CI*4": (">i2", True), "CIS4": (">i2", True),
    "CI*8": (">i4", True), "C*8": (">f4", True), "R*4": (">f4", False),
}


def _records(data: bytes):
    off = 0
    while off + 12 <= len(data):
        num = struct.unpack(">I", data[off:off + 4])[0]
        sub = tuple(data[off + 4:off + 8])
        ln = struct.unpack(">I", data[off + 8:off + 12])[0]
        if ln < 12:
            break
        yield num, sub, off, ln
        off += ln


def read_sar_ceos(path: str) -> dict:
    data = vsi_open_bytes(path)
    recs = list(_records(data))
    if not recs or recs[0][1] not in IMAGERY_OPT_SUBTYPES:
        raise ValueError("SAR_CEOS: no imagery options descriptor")
    _, _, fdr_off, fdr_len = recs[0]
    fdr = data[fdr_off:fdr_off + fdr_len]

    def a_int(off1, ln):
        s = fdr[off1 - 1:off1 - 1 + ln].decode("latin-1").strip()
        return int(s) if s else 0

    def a_str(off1, ln):
        return fdr[off1 - 1:off1 - 1 + ln].decode("latin-1").strip()

    nchan = a_int(233, 4) or 1
    lines = a_int(237, 8)
    lbp = a_int(245, 4)
    ppl = a_int(249, 8)
    rbp = a_int(257, 4)
    bpp = a_int(225, 4)
    interleave = a_str(269, 4)
    rpl = a_int(273, 2) or 1
    prefix = a_int(277, 4)
    suffix = a_int(289, 4)
    dtype_s = a_str(429, 4)
    if dtype_s not in _DTYPES:
        raise ValueError(f"SAR_CEOS: unhandled data type {dtype_s!r}")
    dt, cplx = _DTYPES[dtype_s]
    dt = np.dtype(dt)
    # record size from the first processed data record's length word
    rec_size = None
    for _, sub, off, ln in recs[1:]:
        if sub in PROC_DATA_SUBTYPES:
            rec_size = ln
            break
    if rec_size is None or lines < 1 or ppl < 1:
        raise ValueError("SAR_CEOS: no processed data records")
    data_start = prefix if prefix == 192 else prefix + 12
    width = ppl
    ncomp = 2 if cplx else 1

    out_dtype = (np.complex64 if cplx
                 else dt.newbyteorder("="))
    bands = np.zeros((lines, width, nchan), out_dtype)

    def line_offset(channel, line):
        # CalcCeosSARImageFilePosition (1-based channel/line)
        if interleave.strip() == "BIL":
            total = (nchan * (line - 1) + (channel - 1)) * rpl
        else:   # BSQ / default
            total = ((channel - 1) * lines + (line - 1)) * rpl
        return fdr_len + total * rec_size

    avail = 0
    for ch in range(1, nchan + 1):
        for ln_i in range(1, lines + 1):
            off = line_offset(ch, ln_i)
            raw = data[off + data_start:
                       off + data_start + width * ncomp * dt.itemsize]
            if len(raw) < width * ncomp * dt.itemsize:
                continue
            arr = np.frombuffer(raw, dt)
            if cplx:
                bands[ln_i - 1, :, ch - 1] = (
                    arr[0::2].astype(np.float32) +
                    1j * arr[1::2].astype(np.float32))
            else:
                bands[ln_i - 1, :, ch - 1] = arr
            avail += 1

    # --------------------------- GCPs from the 192-byte line prefix
    gcps = []
    if data_start >= 192 and lines > 1:
        step = max((lines - 1) // 4, 1)
        for scan in range(0, lines, step):
            if len(gcps) > 15 - 3:
                break
            off = line_offset(1, scan + 1)
            rec = data[off:off + 192]
            if len(rec) < 192:
                break
            words = np.frombuffer(rec, ">i4", 48)
            for i in range(3):
                lat = int(words[132 // 4 + i])
                lon = int(words[144 // 4 + i])
                if lat == 0 and lon == 0:
                    continue
                pix = (0.5 if i == 0 else
                       width / 2.0 if i == 1 else width - 0.5)
                gcps.append({"id": str(len(gcps) + 1), "pixel": pix,
                             "line": scan + 0.5, "x": lon / 1e6,
                             "y": lat / 1e6, "z": 0.0})

    # --------------------------- leader sibling (record inventory)
    md = {"CEOS_DATA_TYPE": dtype_s, "CEOS_INTERLEAVE": interleave,
          "CEOS_PREFIX_BYTES": str(prefix),
          "CEOS_SUFFIX_BYTES": str(suffix),
          "CEOS_LINES_AVAILABLE": str(avail),
          "CEOS_BYTES_PER_PIXEL": str(bpp),
          "CEOS_LEFT_BORDER": str(lbp), "CEOS_RIGHT_BORDER": str(rbp)}
    leader = _find_leader(path)
    if leader:
        lrecs = list(_records(vsi_open_bytes(leader)))
        md["CEOS_LEADER_FILE"] = os.path.basename(leader)
        md["CEOS_LEADER_RECORDS"] = str(len(lrecs))

    px = bands[:, :, 0] if nchan == 1 else bands
    return {"pixels": px, "gt": None, "epsg": None, "driver": "SAR_CEOS",
            "metadata": md, "gcps": gcps,
            "gcp_epsg": 4326 if gcps else None}


def _find_leader(path: str) -> str | None:
    base, ext = os.path.splitext(path)
    if ext in (".D", ".d"):
        cand = base + (".L" if ext == ".D" else ".l")
        if os.path.exists(cand):
            return cand
    name = os.path.basename(path)
    if name.lower().startswith("dat_"):
        cand = os.path.join(os.path.dirname(path),
                            name[:3].replace("dat", "lea") + name[3:])
        for c in (cand, cand.replace("lea", "LEA")):
            if os.path.exists(c):
                return c
    return None


def is_sar_ceos(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            head = f.read(12)
    except OSError:
        return False
    return len(head) == 12 and tuple(head[4:8]) in IMAGERY_OPT_SUBTYPES
