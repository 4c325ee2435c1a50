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


# ------------------------------------------------------- subdatasets / calib
def _annotations(manifest_path: str):
    """Per-measurement info parsed from the annotation XMLs (the
    manifest's s1Level1ProductSchema objects; the engine resolves them
    by the annotation/ naming convention like the fixtures lay out)."""
    if os.path.isdir(manifest_path):
        manifest_path = os.path.join(manifest_path, "manifest.safe")
    base = os.path.dirname(manifest_path)
    ann_dir = os.path.join(base, "annotation")
    out = []
    if not os.path.isdir(ann_dir):
        return out
    for f in sorted(os.listdir(ann_dir)):
        if not f.endswith(".xml"):
            continue
        try:
            root = ET.parse(os.path.join(ann_dir, f)).getroot()
        except ET.ParseError:
            continue
        hdr = root.find("adsHeader")
        if hdr is None:
            continue
        info = {
            "annotation": os.path.join(ann_dir, f),
            "calibration": os.path.join(ann_dir, "calibration",
                                        "calibration-" + f),
            "measurement": os.path.join(base, "measurement",
                                        f[:-4] + ".tiff"),
            "product_type": hdr.findtext("productType", "UNK"),
            "mode": hdr.findtext("mode", "UNK"),
            "swath": hdr.findtext("swath", "UNK"),
            "polarisation": hdr.findtext("polarisation", "UNK"),
            "image_number": hdr.findtext("imageNumber", "UNK"),
            "samples": int(root.findtext(
                "imageAnnotation/imageInformation/numberOfSamples", "0")),
            "lines": int(root.findtext(
                "imageAnnotation/imageInformation/numberOfLines", "0")),
            "output_pixels": root.findtext(
                "imageAnnotation/imageInformation/outputPixels", ""),
        }
        gcps = []
        for p in root.iter("geolocationGridPoint"):
            gcps.append({
                "id": str(len(gcps) + 1),
                "pixel": float(p.findtext("pixel", "0") or 0),
                "line": float(p.findtext("line", "0") or 0),
                "x": float(p.findtext("longitude", "0") or 0),
                "y": float(p.findtext("latitude", "0") or 0),
                "z": float(p.findtext("height", "0") or 0)})
        info["gcps"] = gcps
        out.append(info)
    return out


def safe_subdatasets(manifest_path: str) -> list[tuple[str, str]]:
    """SENTINEL1_CALIB subdataset list per SAFEDataset::Open: SLC
    products advertise SIGMA0/BETA0/GAMMA INTENSITY + UNCALIB
    COMPLEX/INTENSITY per (swath, polarisation[, image]); GRD products
    UNCALIB AMPLITUDE (+ the calibrated trio); wave-mode (WV) names
    append the image number (safedataset.cpp:1530-1720)."""
    if os.path.isdir(manifest_path):
        manifest_path = os.path.join(manifest_path, "manifest.safe")
    infos = _annotations(manifest_path)
    subs = []
    is_wave = any(i["mode"] == "WV" for i in infos)
    for i in infos:
        slc = i["product_type"] == "SLC"
        name = (f"{i['swath']}_{i['polarisation']}_{i['image_number']}"
                if is_wave else f"{i['swath']}_{i['polarisation']}")
        def add(cal, unit):
            subs.append((f"SENTINEL1_CALIB:{cal}:{manifest_path}:"
                         f"{name}:{unit}",
                         f"Single band with {i['swath']} swath and "
                         f"{i['polarisation']} polarization and {cal} "
                         "calibration"))
        if slc:
            for cal in ("SIGMA0", "BETA0", "GAMMA"):
                add(cal, "INTENSITY")
            add("UNCALIB", "COMPLEX")
            add("UNCALIB", "INTENSITY")
        else:
            add("UNCALIB", "AMPLITUDE")
            for cal in ("SIGMA0", "BETA0", "GAMMA"):
                add(cal, "INTENSITY")
    return subs


def read_safe_calib(spec: str) -> dict:
    """Open a SENTINEL1_CALIB:<CAL>:<manifest>:<SWATH_POL[_IMG]>:<UNIT>
    subdataset.  UNCALIB decodes the measurement (AMPLITUDE = native
    DN / |SLC|, COMPLEX = complex64, INTENSITY = DN^2 / I^2+Q^2);
    SIGMA0/BETA0/GAMMA divide the intensity by the bilinearly
    interpolated calibration-vector LUT^2 (line-grid weights — the
    reference weights lines by azimuth time, identical for the
    uniform grids; safedataset.cpp SAFECalibratedRasterBand).  A
    missing/fake calibration XML (the reference's own WV fixtures)
    opens structurally with pixels=None exactly like the reference,
    whose LUT parse only fails at block-read time."""
    m = re.match(r"^SENTINEL1_CALIB:(UNCALIB|SIGMA0|BETA0|GAMMA):(.*?):"
                 r"([A-Za-z0-9]+_[A-Za-z0-9]+(?:_[0-9]+)?):"
                 r"(AMPLITUDE|COMPLEX|INTENSITY)$", spec)
    if not m:
        raise ValueError(f"Invalid syntax for SENTINEL1_CALIB: {spec!r}")
    cal, manifest_path, name, unit = m.groups()
    if cal != "UNCALIB" and unit != "INTENSITY":
        raise ValueError("calibrated Sentinel-1 subdatasets are "
                         "intensity-only (safedataset.cpp:1189)")
    infos = _annotations(manifest_path)
    is_wave = any(i["mode"] == "WV" for i in infos)
    sel = None
    for i in infos:
        n = (f"{i['swath']}_{i['polarisation']}_{i['image_number']}"
             if is_wave else f"{i['swath']}_{i['polarisation']}")
        if n == name:
            sel = i
            break
    if sel is None:
        raise ValueError(f"SENTINEL1_CALIB: no measurement {name!r}")

    md = {"SWATH": sel["swath"], "POLARIZATION": sel["polarisation"],
          "PRODUCT_TYPE": sel["product_type"], "MODE": sel["mode"]}
    lut = None
    if cal != "UNCALIB":
        tag = {"SIGMA0": "sigmaNought", "BETA0": "betaNought",
               "GAMMA": "gamma"}[cal]
        try:
            croot = ET.parse(sel["calibration"]).getroot()
            vecs = []
            for v in croot.iter("calibrationVector"):
                line = int(v.findtext("line", "0"))
                pix = [int(x) for x in (v.findtext("pixel", "") or
                                        "").split()]
                vals = [float(x) for x in (v.findtext(tag, "") or
                                           "").split()]
                if pix and len(vals) == len(pix):
                    vecs.append((line, pix, vals))
            if len(vecs) >= 2:
                lut = vecs
        except (ET.ParseError, OSError):
            lut = None
        if lut is None:
            # structural open (the reference only fails at read time)
            return {"pixels": None, "gt": None, "epsg": None,
                    "driver": "SAFE", "gcps": sel["gcps"],
                    "gcp_epsg": 4326 if sel["gcps"] else None,
                    "metadata": md,
                    "size": (sel["samples"], sel["lines"])}

    from .tiff import decode_tiff

    px = decode_tiff(open(sel["measurement"], "rb").read())[0]
    is_complex = "Signed" in sel["output_pixels"] and px.ndim == 3
    if px.ndim == 3 and px.shape[2] >= 2:
        cplx = (px[:, :, 0].astype(np.float32) +
                1j * px[:, :, 1].astype(np.float32))
        inten = np.abs(cplx) ** 2
        amp = np.abs(cplx)
    else:
        if px.ndim == 3:
            px = px[:, :, 0]
        cplx = px.astype(np.complex64)
        inten = px.astype(np.float64) ** 2
        amp = px

    if cal == "UNCALIB":
        out = {"AMPLITUDE": amp, "COMPLEX": cplx,
               "INTENSITY": inten.astype(np.float32)}[unit]
    else:
        h, w = inten.shape
        lines = np.array([v[0] for v in lut], float)
        # common pixel grid (vectors share it in real products)
        pix = np.array(lut[0][1], float)
        vals = np.array([np.interp(np.arange(w), v[1], v[2])
                         for v in lut])
        rowf = np.interp(np.arange(h), lines,
                         np.arange(len(lut), dtype=float))
        lo = np.clip(rowf.astype(int), 0, len(lut) - 2)
        mu = rowf - lo
        A = vals[lo] * (1 - mu)[:, None] + vals[lo + 1] * mu[:, None]
        out = (inten / (A * A)).astype(np.float32)
    return {"pixels": out, "gt": None, "epsg": None, "driver": "SAFE",
            "gcps": sel["gcps"], "gcp_epsg": 4326 if sel["gcps"] else None,
            "metadata": md, "size": (sel["samples"], sel["lines"])}
