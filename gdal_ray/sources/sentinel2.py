"""Sentinel-2 L1C SAFE product reader (metadata + subdataset surface).

Pure-Python re-derivation of the reference driver's semantics
(frmts/sentinel2/sentinel2dataset.cpp):

- the static band table asBandDesc (sentinel2dataset.cpp:64-78):
  name, native resolution, wavelength (nm), bandwidth (nm), color
  interpretation;
- main-product metadata mapping (SENTINEL2GetUserProductMetadata),
  incl. the FOOTPRINT polygon from EXT_POS_LIST lat/lon pairs and the
  DATATAKE_n_ keys;
- subdataset naming ``SENTINEL2_L1C:path:{10m|20m|60m|PREVIEW}:
  EPSG_nnnnn`` with one entry per (resolution, CRS)
  (SENTINEL2Dataset::OpenL1C);
- subdataset geometry: the union of granule Tile_Geocoding extents at
  the requested resolution, band order = lexicographic zero-padded
  band codes with the B2/B4 swap so RGB comes first
  (sentinel2dataset.cpp:4218-4224);
- per-granule source placements (the reference builds a VRT of
  SimpleSources; this module returns the same placements as dicts).

Granule imagery decodes through the engine's pure-numpy JPEG2000
codec (functions/jp2k.py); subdataset opens mosaic whatever granule
payloads exist on disk (the reference's fake fixtures ship TIFFs or
empty stubs under .jp2 names — tolerated, pixels stays None when
nothing decodes).

Conformance: autotest/gdrivers/sentinel2.py (test_sentinel2_l1c_1/2:
metadata dicts, subdataset names, 10m mosaic geometry 20984x20980,
gt (699960,10,0,5100060,0,-10), band order B4,B3,B2,B8, source
placements at dst (0,0) and (10004,10000)).
"""

from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET

import numpy as np

from .vsi import vsi_open_bytes

# (name, native resolution, wavelength nm, bandwidth nm, color interp)
BAND_DESC = [
    ("B1", 60, 443, 20, "Coastal"),
    ("B2", 10, 490, 65, "Blue"),
    ("B3", 10, 560, 35, "Green"),
    ("B4", 10, 665, 30, "Red"),
    ("B5", 20, 705, 15, "RedEdge"),
    ("B6", 20, 740, 15, "RedEdge"),
    ("B7", 20, 783, 20, "RedEdge"),
    ("B8", 10, 842, 115, "NIR"),
    ("B8A", 20, 865, 20, "NIR"),
    ("B9", 60, 945, 20, "NIR"),
    ("B10", 60, 1375, 30, "OtherIR"),
    ("B11", 20, 1610, 90, "SWIR"),
    ("B12", 20, 2190, 180, "SWIR"),
]
_BY_NAME = {b[0]: b for b in BAND_DESC}


def _strip_ns(root):
    for el in root.iter():
        el.tag = el.tag.split("}")[-1]
    return root


def _xml(path: str):
    return _strip_ns(ET.fromstring(vsi_open_bytes(path)))


def _t(root, xpath, default=None):
    el = root.find(xpath)
    return el.text.strip() if el is not None and el.text else default


def _code(name: str) -> str:
    """B4 -> '04', B8A -> '8A' (zero-padded band code)."""
    s = name[1:]
    return "0" + s if len(s) == 1 else s


def _from_code(code: str) -> str:
    return "B" + code.lstrip("0") if code != "8A" else "B8A"


def sentinel2_metadata(path: str) -> dict:
    """Main-product metadata dict (SENTINEL2GetUserProductMetadata)."""
    root = _xml(path)
    md = {}
    pi = root.find(".//Product_Info")
    if pi is None:
        raise ValueError(f"SENTINEL2: no Product_Info in {path}")
    for k in ("PRODUCT_START_TIME", "PRODUCT_STOP_TIME",
              "PROCESSING_LEVEL", "PRODUCT_TYPE", "PROCESSING_BASELINE",
              "GENERATION_TIME", "PREVIEW_IMAGE_URL", "PREVIEW_GEO_INFO"):
        v = _t(pi, k)
        if v is not None:
            md[k] = v
    for i, dt in enumerate(pi.iter("Datatake")):
        p = f"DATATAKE_{i + 1}_"
        md[p + "ID"] = dt.get("datatakeIdentifier", "")
        for k in ("DATATAKE_TYPE", "DATATAKE_SENSING_START",
                  "SENSING_ORBIT_NUMBER", "SENSING_ORBIT_DIRECTION",
                  "SPACECRAFT_NAME"):
            v = _t(dt, k)
            if v is not None:
                md[p + k] = v
    pic = root.find(".//Product_Image_Characteristics")
    if pic is not None:
        for sv in pic.iter("Special_Values"):
            txt = _t(sv, "SPECIAL_VALUE_TEXT")
            idx = _t(sv, "SPECIAL_VALUE_INDEX")
            if txt and idx is not None:
                md[f"SPECIAL_VALUE_{txt}"] = idx
        v = _t(pic, "QUANTIFICATION_VALUE")
        if v is not None:
            md["QUANTIFICATION_VALUE"] = v
        v = _t(pic, ".//Reflectance_Conversion/U")
        if v is not None:
            md["REFLECTANCE_CONVERSION_U"] = v
        v = _t(pic, "REFERENCE_BAND")
        if v is not None:
            md["REFERENCE_BAND"] = BAND_DESC[int(v)][0]
    pos = _t(root, ".//Global_Footprint/EXT_POS_LIST")
    if pos:
        vals = pos.split()
        pts = [(vals[i + 1], vals[i]) for i in range(0, len(vals) - 1, 2)]
        md["FOOTPRINT"] = "POLYGON((%s))" % ", ".join(
            f"{x} {y}" for x, y in pts)
    v = _t(root, ".//Cloud_Coverage_Assessment")
    if v is not None:
        md["CLOUD_COVERAGE_ASSESSMENT"] = v
    for k in ("DEGRADED_ANC_DATA_PERCENTAGE",
              "DEGRADED_MSI_DATA_PERCENTAGE"):
        v = _t(root, f".//Technical_Quality_Assessment/{k}")
        if v is not None:
            md[k] = v
    qi = root.find(".//Quality_Inspections")
    if qi is not None:
        for k in ("SENSOR_QUALITY_FLAG", "GEOMETRIC_QUALITY_FLAG",
                  "GENERAL_QUALITY_FLAG", "FORMAT_CORRECTNESS_FLAG",
                  "RADIOMETRIC_QUALITY_FLAG"):
            v = _t(qi, k)
            if v is not None:
                md[k] = v
    return md


def _granules(path: str) -> list[dict]:
    """Granule info: id, dir, MTD xml, per-resolution geoposition."""
    root = _xml(path)
    base = os.path.dirname(path) or "."
    out = []
    for g in root.iter("Granules"):
        gid = g.get("granuleIdentifier")
        if not gid:
            continue
        gdir = os.path.join(base, "GRANULE", gid)
        mtd = None
        if os.path.isdir(gdir):
            for f in sorted(os.listdir(gdir)):
                if f.endswith(".xml"):
                    mtd = os.path.join(gdir, f)
                    break
        if mtd is None:
            continue
        groot = _xml(mtd)
        epsg = None
        cs = _t(groot, ".//Tile_Geocoding/HORIZONTAL_CS_CODE")
        if cs and cs.upper().startswith("EPSG:"):
            epsg = int(cs.split(":")[1])
        geo = {}
        tg = groot.find(".//Tile_Geocoding")
        for size in tg.iter("Size"):
            res = int(size.get("resolution"))
            geo.setdefault(res, {})
            geo[res]["nrows"] = int(_t(size, "NROWS"))
            geo[res]["ncols"] = int(_t(size, "NCOLS"))
        for gp in tg.iter("Geoposition"):
            res = int(gp.get("resolution"))
            geo.setdefault(res, {})
            geo[res]["ulx"] = float(_t(gp, "ULX"))
            geo[res]["uly"] = float(_t(gp, "ULY"))
        images = [el.text for el in g.iter("IMAGE_ID")]
        out.append({"id": gid, "dir": gdir, "mtd": mtd, "epsg": epsg,
                    "geo": geo, "images": images})
    if not out:
        raise ValueError(f"SENTINEL2: no granule with metadata in {path}")
    return out


_UTM_NAME = re.compile(r"^32(6|7)(\d\d)$")


def _crs_desc(epsg: int) -> str:
    m = _UTM_NAME.match(str(epsg))
    if m:
        return f"UTM {m.group(2).lstrip('0')}{'N' if m.group(1) == '6' else 'S'}"
    return f"EPSG:{epsg}"


def sentinel2_subdatasets(path: str) -> list[tuple[str, str]]:
    """(name, desc) per (resolution, CRS) + PREVIEW (OpenL1C)."""
    grans = _granules(path)
    epsgs = sorted({g["epsg"] for g in grans})
    subs = []
    for epsg in epsgs:
        for res in (10, 20, 60):
            bands = [b[0] for b in BAND_DESC if b[1] == res]
            desc = (f"Bands {', '.join(bands)} with {res}m resolution, "
                    f"{_crs_desc(epsg)}")
            subs.append((f"SENTINEL2_L1C:{path}:{res}m:EPSG_{epsg}", desc))
        subs.append((f"SENTINEL2_L1C:{path}:PREVIEW:EPSG_{epsg}",
                     f"RGB preview, {_crs_desc(epsg)}"))
    return subs


_SUBDS = re.compile(
    r"^SENTINEL2_L1C:(?P<path>.+\.xml):(?P<res>10m|20m|60m|PREVIEW)"
    r":EPSG_(?P<epsg>\d+)$")


def read_sentinel2_subdataset(name: str) -> dict:
    """Open one L1C subdataset: geometry, bands, per-granule source
    placements.  ``pixels`` is None (JP2 payloads, see module doc)."""
    m = _SUBDS.match(name)
    if not m:
        raise ValueError(f"SENTINEL2: invalid subdataset name {name!r}")
    path, epsg = m.group("path"), int(m.group("epsg"))
    preview = m.group("res") == "PREVIEW"
    res = 320 if preview else int(m.group("res")[:-1])
    grans = [g for g in _granules(path) if g["epsg"] == epsg]
    if not grans:
        raise ValueError(f"SENTINEL2: no granule with EPSG:{epsg}")
    md = sentinel2_metadata(path)
    md.pop("FOOTPRINT", None)
    root = _xml(path)
    irr = {int(el.get("bandId")): el.text.strip()
           for el in root.iter("SOLAR_IRRADIANCE")}
    geo_res = 10 if preview else res
    ulx = min(g["geo"][geo_res]["ulx"] for g in grans)
    uly = max(g["geo"][geo_res]["uly"] for g in grans)
    lrx = max(g["geo"][geo_res]["ulx"] +
              g["geo"][geo_res]["ncols"] * geo_res for g in grans)
    lry = min(g["geo"][geo_res]["uly"] -
              g["geo"][geo_res]["nrows"] * geo_res for g in grans)
    w = int(round((lrx - ulx) / res))
    h = int(round((uly - lry) / res))
    if preview:
        band_names = ["B4", "B3", "B2"]
    else:
        codes = sorted(_code(b[0]) for b in BAND_DESC if b[1] == res)
        if len(codes) >= 3 and codes[:3] == ["02", "03", "04"]:
            codes[0], codes[2] = "04", "02"     # RGB order convenience
        band_names = [_from_code(c) for c in codes]
    bands = []
    for bn in band_names:
        name_, bres, wl, bw, ci = _BY_NAME[bn]
        bid = next(i for i, b in enumerate(BAND_DESC) if b[0] == bn)
        bands.append({
            "BANDNAME": bn, "WAVELENGTH": str(wl),
            "WAVELENGTH_UNIT": "nm", "BANDWIDTH": str(bw),
            "BANDWIDTH_UNIT": "nm", "color_interp": ci,
            "SOLAR_IRRADIANCE": irr.get(bid),
            "SOLAR_IRRADIANCE_UNIT": "W/m2/um",
        })
    sources = []
    for g in grans:
        geo = g["geo"][geo_res]
        dstx = int(round((geo["ulx"] - ulx) / res))
        dsty = int(round((uly - geo["uly"]) / res))
        for bn in band_names:
            if preview:
                img = next((i for i in g["images"] if "_PVI_" in i), None)
                sub = "QI_DATA"
            else:
                img = next((i for i in g["images"]
                            if i.endswith("_" + _code(bn)) or
                            i.endswith("_B" + _code(bn))), None)
                sub = "IMG_DATA"
            if img is None:
                continue
            sources.append({
                "band": bn,
                "file": os.path.join(g["dir"], sub, img + ".jp2"),
                "dst_xoff": dstx, "dst_yoff": dsty,
                "xsize": geo["ncols"], "ysize": geo["nrows"],
            })
            if preview:
                break                       # one RGB PVI per granule
    # mosaic the granule JP2 payloads when they exist on disk (the
    # reference's fake_l1c fixtures ship without imagery; real
    # products decode through functions/jp2k.py)
    pixels = None
    have = [s for s in sources if os.path.exists(s["file"])]
    decoded_any = False
    if have:
        from ..functions.jp2k import decode_jp2

        nb = 3 if preview else len(band_names)
        buf = np.zeros((h, w, nb), np.uint16)
        for s in have:
            try:
                data = open(s["file"], "rb").read()
                if not data:
                    continue
                if data[:4] in (b"II*\x00", b"MM\x00*"):
                    # the reference's fake fixtures ship TIFFs under
                    # .jp2 names; real products are JP2
                    from .tiff import decode_tiff

                    px = decode_tiff(data)[0]
                else:
                    px, _ = decode_jp2(data)
            except (ValueError, NotImplementedError, KeyError,
                    struct.error):
                continue
            decoded_any = True
            x0, y0 = s["dst_xoff"], s["dst_yoff"]
            if preview and px.ndim == 3:
                buf[y0:y0 + px.shape[0], x0:x0 + px.shape[1], :] = px
            else:
                bi = band_names.index(s["band"])
                buf[y0:y0 + px.shape[0], x0:x0 + px.shape[1],
                    bi] = px if px.ndim == 2 else px[:, :, 0]
        if decoded_any:
            pixels = buf[:, :, 0] if nb == 1 else buf
    return {
        "pixels": pixels, "driver": "SENTINEL2",
        "width": w, "height": h, "epsg": epsg,
        "gt": (ulx, float(res), 0.0, uly, 0.0, -float(res)),
        "bands": bands, "sources": sources, "metadata": md,
        "dtype": "uint16", "nbits": 12,
        "special_nodata": md.get("SPECIAL_VALUE_NODATA"),
    }
