"""SPOT DIMAP (v1) raster driver (reference frmts/dimap/
dimapdataset.cpp).

``METADATA.DIM`` is an XML product description: raster dimensions
(NROWS/NCOLS/NBANDS), the payload reference
``<DATA_FILE_PATH href=.../>`` (a TIFF — or, in the autotest
fixture, a VRT standing in for one), flattened metadata from
Production / Processing_Information / Spectral_Band_Info blocks
(e.g. PROCESSING_LEVEL, SPECTRAL_PHYSICAL_BIAS), and georeferencing
as four corner tie points: GCP pixel/line = TIE_POINT_DATA_X/Y - 0.5
(the reference's half-pixel shift), geo X/Y/Z = TIE_POINT_CRS_*.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def read_dimap(path: str):
    """-> (pixels, gcps, meta) where gcps are dicts with
    pixel/line/x/y/z and meta holds the flattened DIM metadata."""
    root = ET.parse(path).getroot()
    d = os.path.dirname(os.path.abspath(path))

    href = None
    for el in root.iter("DATA_FILE_PATH"):
        href = el.get("href")
        break
    pixels = None
    if href:
        p = os.path.join(d, href)
        with open(p, "rb") as f:
            head = f.read(4)
        if head[:2] in (b"II", b"MM"):
            from .tiff import decode_tiff

            with open(p, "rb") as f:
                pixels = decode_tiff(f.read())[0]
        else:
            from .vrt import open_vrt

            pixels = open_vrt(p)["pixels"]
            if pixels.ndim == 3 and pixels.shape[2] == 1:
                pixels = pixels[:, :, 0]

    meta = {}
    for name in ("DATASET_PRODUCER_NAME", "DATASET_PRODUCTION_DATE",
                 "PROCESSING_LEVEL", "SPECTRAL_PROCESSING",
                 "MISSION", "MISSION_INDEX", "IMAGING_DATE"):
        for el in root.iter(name):
            if el.text:
                meta[name] = el.text.strip()
            break
    for band in root.iter("Spectral_Band_Info"):
        for el in band:
            if el.tag in ("PHYSICAL_BIAS", "PHYSICAL_GAIN",
                          "PHYSICAL_UNIT"):
                txt = (el.text or "").strip()
                try:
                    meta["SPECTRAL_" + el.tag] = "%f" % float(txt)
                except ValueError:
                    meta["SPECTRAL_" + el.tag] = txt

    gcps = []
    for tp in root.iter("Tie_Point"):
        vals = {el.tag: float(el.text) for el in tp
                if el.text and el.tag.startswith("TIE_POINT")}
        if "TIE_POINT_DATA_X" in vals:
            gcps.append({
                "pixel": vals["TIE_POINT_DATA_X"] - 0.5,
                "line": vals["TIE_POINT_DATA_Y"] - 0.5,
                "x": vals.get("TIE_POINT_CRS_X", 0.0),
                "y": vals.get("TIE_POINT_CRS_Y", 0.0),
                "z": vals.get("TIE_POINT_CRS_Z", 0.0)})
    return pixels, gcps, meta


def read_dimap2(path: str):
    """DIMAP v2 (PHR/PNEO): DIM_*.XML with Raster_Dimensions
    (NROWS/NCOLS/NBANDS), tiled Data_Files (tile_R/tile_C grid with
    NTILES_SIZE) mosaicked from the referenced TIFFs, and flattened
    metadata from Dataset_Identification / Processing_Information /
    Platform blocks.  ``path`` may be the directory, the VOL_*.XML
    or the DIM_*.XML (reference frmts/dimap dimapdataset.cpp
    DIMAP2 path)."""
    import glob

    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "DIM_*.XML")))
        path = cands[0]
    elif os.path.basename(path).startswith("VOL_"):
        cands = sorted(glob.glob(
            os.path.join(os.path.dirname(path), "DIM_*.XML")))
        path = cands[0]
    root = ET.parse(path).getroot()
    d = os.path.dirname(os.path.abspath(path))

    def ftext(name, default=None):
        for el in root.iter(name):
            if el.text:
                return el.text.strip()
        return default

    nrows = int(ftext("NROWS"))
    ncols = int(ftext("NCOLS"))
    nbands = int(ftext("NBANDS"))
    tile_h = tile_w = None
    for el in root.iter("NTILES_SIZE"):
        tile_h = int(el.get("nrows"))
        tile_w = int(el.get("ncols"))

    from .tiff import decode_tiff

    out = np.zeros((nrows, ncols, nbands), np.uint16)
    for df in root.iter("Data_File"):
        tr = int(df.get("tile_R", "1"))
        tc = int(df.get("tile_C", "1"))
        href = None
        for el in df.iter("DATA_FILE_PATH"):
            href = el.get("href")
        if not href:
            continue
        with open(os.path.join(d, href), "rb") as f:
            px = np.asarray(decode_tiff(f.read())[0])
        if px.ndim == 2:
            px = px[:, :, None]
        y0 = (tr - 1) * (tile_h or px.shape[0])
        x0 = (tc - 1) * (tile_w or px.shape[1])
        hh = min(px.shape[0], nrows - y0)
        ww = min(px.shape[1], ncols - x0)
        out[y0:y0 + hh, x0:x0 + ww] = px[:hh, :ww, :nbands]

    meta = {}
    pairs = [("MISSION", "MISSION"), ("MISSION_INDEX", "MISSION_INDEX"),
             ("IMAGING_DATE", "IMAGING_DATE"),
             ("PROCESSING_LEVEL", "PROCESSING_LEVEL"),
             ("SPECTRAL_PROCESSING", "SPECTRAL_PROCESSING"),
             ("DATASET_PRODUCTION_DATE", "DATASET_PRODUCTION_DATE"),
             ("DATASET_PRODUCER_NAME", "DATASET_PRODUCER_NAME"),
             ("BAND_MODE", "BAND_MODE")]
    for key, tag in pairs:
        v = ftext(tag)
        if v is not None:
            meta[key] = v
    return out, meta
