"""Sentinel-1 SAFE product reader (reference frmts/safe).

A SAFE product directory holds a ``manifest.safe`` XML (measurement
data-object hrefs, the acquisition footprint as a gml:coordinates
"lat,lon lat,lon ..." list) and per-polarisation measurement TIFFs
decoded with the engine's TIFF codec; each measurement becomes a
band (annotation XMLs carry the GCP grids)."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np


def read_safe(manifest_path: str):
    """-> (bands list of 2-D arrays, band_names, footprint_wkt)."""
    if os.path.isdir(manifest_path):
        manifest_path = os.path.join(manifest_path, "manifest.safe")
    root = ET.parse(manifest_path).getroot()
    base = os.path.dirname(manifest_path)

    hrefs = []
    for el in root.iter():
        if el.tag.endswith("fileLocation"):
            href = el.get("href") or ""
            if href.endswith((".tiff", ".tif")) and "measurement" in href:
                hrefs.append(href.lstrip("./"))
    # the reference orders swath/polarisation bands as listed
    footprint = None
    for el in root.iter():
        if el.tag.endswith("coordinates") and el.text:
            pts = []
            for pair in el.text.split():
                lat, lon = pair.split(",")
                pts.append((float(lon), float(lat)))
            if len(pts) >= 3:
                if pts[0] != pts[-1]:
                    pts.append(pts[0])
                footprint = "POLYGON((%s))" % ",".join(
                    "%.6f %.6f" % p for p in pts)
            break

    from .tiff import decode_tiff

    bands = []
    names = []
    for href in hrefs:
        p = os.path.join(base, href)
        if not os.path.exists(p):
            continue
        with open(p, "rb") as f:
            px = decode_tiff(f.read())[0]
        if px.ndim == 3:
            px = px[:, :, 0]
        m = re.search(r"-(\w{2})-grd-(\w{2})-", os.path.basename(href))
        if m:
            names.append("%s_%s" % (m.group(1).upper(), m.group(2).upper()))
        else:
            names.append(os.path.basename(href))
        bands.append(px)
    return bands, names, footprint
