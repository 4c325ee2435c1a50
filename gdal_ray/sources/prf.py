"""PHOTOMOD PRF/x-dem and NLAPS NDF multi-file rasters.

- PRF (frmts/prf/phprfdataset.cpp): an XML ``.prf`` / ``.x-dem``
  header (``<i n= v=>`` scalars) describing a tile mosaic in a
  sibling directory named after the file stem: tiles
  ``<stem>_<row>_<col>.tif`` (``.demtif`` for x-dem), SizeX/SizeY
  tiles, CountX×CountY grid, RemindX/Y edge sizes.  Tiles are plain
  TIFFs decoded with the engine's TIFF codec.  Georef: gt =
  (A_0, A_1, A_2, B_0 - B_1 - B_2, B_1, B_2) (ParseGeoref,
  phprfdataset.cpp:228-261, PH_GEOREF_SHIFT_Y = 1); DEMs instead use
  XR/YR ranges: gt = (XR_0, (XR_1-XR_0)/(w-1), 0, YR_1, 0,
  (YR_0-YR_1)/(h-1)) with BadZ nodata and unit metres
  (``:573-602``).  ``Pyramid.demtif`` is the overview.

- NDF (frmts/raw/ndfdataset.cpp): ``key=value;`` text header
  (``.H1``-``.H9``), BYTE band files (``BAND%d_FILENAME``), gt from
  the UPPER_LEFT/UPPER_RIGHT/LOWER_LEFT corner eastings/northings
  divided by (n-1) then shifted half a pixel (``:369-394``).  Band
  files shorter than the full scene zero-fill (header-only test
  fixtures)."""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np


def _prf_values(root) -> dict:
    out = {}
    for el in root:
        n = el.get("n")
        if el.tag in ("i", "d", "s") and n:
            out[n] = el.get("v")
        elif el.tag == "x" and n:
            out[n] = {c.get("n"): c.get("v") for c in el}
    return out


def read_prf(path: str):
    """-> (pixels, gt, meta).  meta: nodata/unit/overview for DEMs."""
    root = ET.parse(path).getroot()
    vals = _prf_values(root)
    width = int(vals["Width"])
    height = int(vals["Height"])
    nchan = int(vals.get("QChans", "1"))
    size_x = int(vals["SizeX"])
    size_y = int(vals["SizeY"])
    count_x = int(vals["CountX"])
    count_y = int(vals["CountY"])
    is_dem = path.endswith(".x-dem")
    ext = ".demtif" if is_dem else ".tif"
    stem = os.path.basename(path)
    stem = stem[:-len(".x-dem")] if is_dem else os.path.splitext(stem)[0]
    tiledir = os.path.join(os.path.dirname(path), stem)

    from .tiff import decode_tiff

    chans = vals.get("ChannelsInfo", {})
    bps = int(chans.get("bytes_ps", vals.get("BytesPS", "1")))
    ctype = chans.get("type", "U")
    if ctype == "F":
        dtype = np.float32 if bps == 4 else np.float64
    else:
        dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[bps]
    if nchan == 1:
        full = np.zeros((height, width), dtype)
    else:
        full = np.zeros((height, width, nchan), dtype)

    for r in range(count_y):
        for c in range(count_x):
            name = "%s_%d_%d%s" % (stem, r, c, ext)
            p = os.path.join(tiledir, name)
            if not os.path.exists(p):
                continue
            with open(p, "rb") as f:
                raw = f.read()
            if raw[:2] in (b"II", b"MM"):
                px = decode_tiff(raw)[0]
            else:
                # artificial fixtures store tiles as VRT (sourceless
                # bands render as zeros, matching the reference)
                from .vrt import open_vrt

                px = open_vrt(p)["pixels"]
                if px.ndim == 3 and px.shape[2] == 1:
                    px = px[:, :, 0]
            sub = vals.get("%s_%d_%d" % (stem, r, c), {})
            x0 = int(sub.get("DispX", c * size_x))
            y0 = int(sub.get("DispY", r * size_y))
            h = min(px.shape[0], height - y0)
            w = min(px.shape[1], width - x0)
            full[y0:y0 + h, x0:x0 + w] = px[:h, :w] if px.ndim == full.ndim \
                else px[:h, :w, 0]

    meta = {"dem": is_dem}
    if is_dem and "XR_0" in vals:
        xr0, xr1 = float(vals["XR_0"]), float(vals["XR_1"])
        yr0, yr1 = float(vals["YR_0"]), float(vals["YR_1"])
        gt = (xr0, (xr1 - xr0) / (width - 1), 0.0,
              yr1, 0.0, (yr0 - yr1) / (height - 1))
        meta["unit"] = "m"
        if "BadZ" in vals:
            meta["nodata"] = float(vals["BadZ"])
        pyr = os.path.join(tiledir, "Pyramid.demtif")
        if os.path.exists(pyr):
            meta["overview_path"] = pyr
    elif "GeoRef" in vals:
        g = vals["GeoRef"]
        a0, a1, a2 = float(g["A_0"]), float(g["A_1"]), float(g["A_2"])
        b0, b1, b2 = float(g["B_0"]), float(g["B_1"]), float(g["B_2"])
        # PH_GEOREF_SHIFT_Y = 1.0 (phprfdataset.cpp:257-258)
        gt = (a0, a1, a2, b0 - b1 - b2, b1, b2)
    else:
        gt = None
    return full, gt, meta


def read_ndf(header_path: str):
    """-> (pixels uint8 [h,w] or [h,w,bands], gt, meta)."""
    with open(header_path, errors="replace") as f:
        text = f.read()
    hdr = {}
    for m in re.finditer(r"([A-Z0-9_/+.-]+)=([^;]*);", text):
        hdr[m.group(1)] = m.group(2)
    if hdr.get("PIXEL_FORMAT") != "BYTE" or hdr.get("BITS_PER_PIXEL") != "8":
        raise ValueError("NDF: only BYTE/8 supported (like the reference)")
    nx = int(hdr["PIXELS_PER_LINE"])
    ny = int(hdr["LINES_PER_DATA_FILE"])
    nbands = int(hdr.get("NUMBER_OF_BANDS_IN_VOLUME", "1"))
    d = os.path.dirname(header_path)
    bands = []
    for i in range(1, nbands + 1):
        fname = hdr.get("BAND%d_FILENAME" % i, "")
        base = os.path.basename(fname.replace("\\", "/"))
        p = os.path.join(d, base)
        if not os.path.exists(p):
            # case-adjust like the reference does
            cands = [x for x in os.listdir(d) if x.lower() == base.lower()]
            if cands:
                p = os.path.join(d, cands[0])
        band = np.zeros(nx * ny, np.uint8)
        if os.path.exists(p):
            with open(p, "rb") as f:
                raw = np.frombuffer(f.read(), np.uint8)
            band[:min(len(raw), nx * ny)] = raw[:nx * ny]
        bands.append(band.reshape(ny, nx))
    px = bands[0] if nbands == 1 else np.stack(bands, axis=2)

    def corner(key):
        toks = hdr.get(key, "").split(",")
        return float(toks[2]), float(toks[3])

    gt = None
    if "UPPER_LEFT_CORNER" in hdr:
        ulx, uly = corner("UPPER_LEFT_CORNER")
        urx, ury = corner("UPPER_RIGHT_CORNER")
        llx, lly = corner("LOWER_LEFT_CORNER")
        g1 = (urx - ulx) / (nx - 1)
        g2 = (ury - uly) / (nx - 1)
        g4 = (llx - ulx) / (ny - 1)
        g5 = (lly - uly) / (ny - 1)
        gt = (ulx - g1 * 0.5 - g4 * 0.5, g1, g2,
              uly - g2 * 0.5 - g5 * 0.5, g4, g5)
    meta = {"zone": hdr.get("USGS_MAP_ZONE"),
            "projection": hdr.get("MAP_PROJECTION_NAME"),
            "datum": hdr.get("HORIZONTAL_DATUM")}
    return px, gt, meta
