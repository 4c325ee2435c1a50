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
