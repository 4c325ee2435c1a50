"""NASA PDS4 raster driver (reference frmts/pds/pds4dataset.cpp).

A PDS4 product is an XML label (Product_Observational) plus a raw
payload: ``File_Area_Observational`` holds file_name/offset and an
``Array_2D/3D`` with ordered Axis_Array (Band/Line/Sample)
``elements`` and a ``data_type`` (UnsignedByte, SignedByte,
[Un]SignedMSB2/4, IEEE754MSBSingle/Double and the LSB variants).
Georeferencing lives in the cart:Cartography discipline block:
upperleft_corner_x/y and pixel_resolution_x/y with unit attributes
(m or km — the autotest's 1700 label declares the y resolution in
km/pixel), giving gt = (ulx, resx, 0, uly, 0, -resy).  Namespace
versions 1700/1B00/1D00/1G00 differ only in schema URIs — parsing is
local-name based."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

_DTYPES = {
    "UnsignedByte": np.dtype("u1"), "SignedByte": np.dtype("i1"),
    "UnsignedMSB2": np.dtype(">u2"), "SignedMSB2": np.dtype(">i2"),
    "UnsignedMSB4": np.dtype(">u4"), "SignedMSB4": np.dtype(">i4"),
    "UnsignedLSB2": np.dtype("<u2"), "SignedLSB2": np.dtype("<i2"),
    "UnsignedLSB4": np.dtype("<u4"), "SignedLSB4": np.dtype("<i4"),
    "IEEE754MSBSingle": np.dtype(">f4"), "IEEE754MSBDouble": np.dtype(">f8"),
    "IEEE754LSBSingle": np.dtype("<f4"), "IEEE754LSBDouble": np.dtype("<f8"),
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for c in el.iter():
        if _local(c.tag) == name:
            return c
    return None


def _unit_scale(unit: str | None) -> float:
    if unit is None:
        return 1.0
    u = unit.strip().lower()
    if u.startswith("km"):
        return 1000.0
    return 1.0


def read_pds4(path: str):
    """-> (pixels [h,w] or [h,w,bands], gt, meta)."""
    root = ET.parse(path).getroot()
    d = os.path.dirname(os.path.abspath(path))

    fao = _find(root, "File_Area_Observational")
    if fao is None:
        raise ValueError("PDS4: no File_Area_Observational")
    fname = _find(fao, "file_name").text.strip()
    arr = None
    for c in fao.iter():
        if _local(c.tag) in ("Array_2D_Image", "Array_3D_Image",
                             "Array_2D", "Array_3D",
                             "Array_3D_Spectrum"):
            arr = c
            break
    if arr is None:
        raise ValueError("PDS4: no Array element")
    offset = 0
    off_el = _find(arr, "offset")
    if off_el is not None:
        offset = int(off_el.text)
    dtype = _DTYPES[_find(arr, "data_type").text.strip()]
    axes = []
    for ax in arr.iter():
        if _local(ax.tag) == "Axis_Array":
            name = _find(ax, "axis_name").text.strip()
            n = int(_find(ax, "elements").text)
            axes.append((name, n))
    dims = {n: v for n, v in axes}
    nb = dims.get("Band", 1)
    ny = dims["Line"]
    nx = dims["Sample"]
    with open(os.path.join(d, fname), "rb") as f:
        f.seek(offset)
        raw = np.frombuffer(f.read(nb * ny * nx * dtype.itemsize), dtype)
    order = [n for n, _ in axes]
    shape = [dims[n] for n in order]
    cube = raw.reshape(shape)
    # normalize to (Line, Sample[, Band])
    perm = [order.index("Line"), order.index("Sample")]
    if "Band" in order:
        perm.append(order.index("Band"))
    cube = np.transpose(cube, perm)
    if "Band" in order and nb == 1:
        cube = cube[:, :, 0]

    gt = None
    ulx_el = _find(root, "upperleft_corner_x")
    if ulx_el is not None:
        ulx = float(ulx_el.text) * _unit_scale(ulx_el.get("unit"))
        uly_el = _find(root, "upperleft_corner_y")
        uly = float(uly_el.text) * _unit_scale(uly_el.get("unit"))
        rx_el = _find(root, "pixel_resolution_x")
        rx = float(rx_el.text) * _unit_scale(rx_el.get("unit"))
        ry_el = _find(root, "pixel_resolution_y")
        ry = float(ry_el.text) * _unit_scale(ry_el.get("unit"))
        gt = (ulx, rx, 0.0, uly, 0.0, -ry)

    meta = {}
    proj = _find(root, "map_projection_name")
    if proj is not None and proj.text:
        meta["projection"] = proj.text.strip()
    cm = _find(root, "longitude_of_central_meridian")
    if cm is not None:
        meta["central_meridian"] = float(cm.text)
    tgt = _find(root, "Target_Identification")
    if tgt is not None:
        nm = _find(tgt, "name")
        if nm is not None and nm.text:
            meta["target"] = nm.text.strip()
    return cube, gt, meta
