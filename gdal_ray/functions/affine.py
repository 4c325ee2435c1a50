"""6-coefficient geotransform (GDAL's pixel<->world affine map).

Semantics match ``GDALGeoTransform`` (reference gcore/gdal_priv.h:529):

    X = gt[0] + px * gt[1] + ln * gt[2]
    Y = gt[3] + px * gt[4] + ln * gt[5]

(reference gcore/gdal_priv.h:618-640; inverse gcore/gdal_priv.h:653 /
``GDALInvGeoTransform``). ``px``/``ln`` are pixel/line coordinates;
integer pixel (0,0) maps its *top-left corner* — sample pixel centers
at px+0.5, ln+0.5, exactly as gdalwarp does.

All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

GeoTransform = tuple[float, float, float, float, float, float]


def apply_gt(gt, px, ln):
    """pixel/line -> world (X, Y). Vectorized."""
    px = np.asarray(px, dtype=np.float64)
    ln = np.asarray(ln, dtype=np.float64)
    x = gt[0] + px * gt[1] + ln * gt[2]
    y = gt[3] + px * gt[4] + ln * gt[5]
    return x, y


def invert_gt(gt) -> GeoTransform:
    """Invert a geotransform (GDALInvGeoTransform semantics).

    Raises ValueError on a singular transform.
    """
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if abs(det) < 1e-15:
        raise ValueError("singular geotransform")
    inv_det = 1.0 / det
    # inverse of [[gt1, gt2],[gt4, gt5]] and translated origin
    i1 = gt[5] * inv_det
    i2 = -gt[2] * inv_det
    i4 = -gt[4] * inv_det
    i5 = gt[1] * inv_det
    i0 = -(i1 * gt[0] + i2 * gt[3])
    i3 = -(i4 * gt[0] + i5 * gt[3])
    return (i0, i1, i2, i3, i4, i5)


def world_to_pixel(gt, x, y):
    """world (X, Y) -> fractional pixel/line via the inverse transform."""
    inv = invert_gt(gt)
    return apply_gt(inv, x, y)


def bounds_of(gt, w: int, h: int):
    """(xmin, ymin, xmax, ymax) of a w x h raster under gt (any rotation)."""
    px = np.array([0, w, 0, w], dtype=np.float64)
    ln = np.array([0, 0, h, h], dtype=np.float64)
    x, y = apply_gt(gt, px, ln)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def compose_north_up(ulx: float, uly: float, xres: float, yres: float) -> GeoTransform:
    """North-up geotransform (no rotation); yres is positive, stored negative."""
    return (ulx, xres, 0.0, uly, 0.0, -yres)
