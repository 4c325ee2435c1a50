"""Resampling kernels (warp + overview reductions), vectorized numpy.

Reference semantics: alg/gdalwarper.h:35-67 (algorithm set),
alg/gdalwarpkernel.cpp:83-135 (kernel radius + filter functions:
bilinear 2x2, cubic 4x4 Catmull-Rom with A=-0.5), gcore/overview.cpp
(decimated 2x reductions: nearest/average/rms/mode). Coordinates are
*pixel-center based*: source coordinate ``p`` means distance in pixels
from the raster's top-left corner, so the center of pixel ``i`` is at
``p = i + 0.5`` (matching GDALGeoTransform half-pixel sampling).

``sample_*`` take fractional source coordinates (any shape) and a
(h, w) or (h, w, bands) array; out-of-range coordinates yield
``nodata`` (validity mask semantics of GWK, alg/gdalwarper.h:183-189).
"""

from __future__ import annotations

import numpy as np


def _prep(src: np.ndarray):
    if src.ndim == 2:
        return src[:, :, None], True
    return src, False


def sample_nearest(src: np.ndarray, px, py, nodata=0):
    """Nearest-neighbour: source pixel floor(p) (GWKNearest semantics)."""
    src3, squeeze = _prep(src)
    h, w, _ = src3.shape
    ix = np.floor(np.asarray(px, np.float64)).astype(np.int64)
    iy = np.floor(np.asarray(py, np.float64)).astype(np.int64)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    out = np.full(ix.shape + (src3.shape[2],), nodata, dtype=src3.dtype)
    out[valid] = src3[iy[valid], ix[valid]]
    return (out[..., 0] if squeeze else out), valid


def sample_bilinear(src: np.ndarray, px, py, nodata=0):
    """2x2 bilinear on pixel centers; edge-clamped inside the raster,
    invalid outside (the no-masks fast path of GWKBilinear)."""
    src3, squeeze = _prep(src)
    h, w, nb = src3.shape
    fx = np.asarray(px, np.float64) - 0.5
    fy = np.asarray(py, np.float64) - 0.5
    valid = (np.asarray(px) >= 0) & (np.asarray(px) <= w) & (np.asarray(py) >= 0) & (np.asarray(py) <= h)
    x0 = np.clip(np.floor(fx), 0, w - 1).astype(np.int64)
    y0 = np.clip(np.floor(fy), 0, h - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = np.clip(fx - x0, 0.0, 1.0)[..., None]
    wy = np.clip(fy - y0, 0.0, 1.0)[..., None]
    v = (
        src3[y0, x0].astype(np.float64) * (1 - wx) * (1 - wy)
        + src3[y0, x1].astype(np.float64) * wx * (1 - wy)
        + src3[y1, x0].astype(np.float64) * (1 - wx) * wy
        + src3[y1, x1].astype(np.float64) * wx * wy
    )
    out = _cast_back(v, src3.dtype, nodata, valid)
    return (out[..., 0] if squeeze else out), valid


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Catmull-Rom (A = -0.5) weights for offsets [-1, 0, 1, 2]
    (reference alg/gdalwarpkernel.cpp GWKCubic coefficients)."""
    A = -0.5
    w = np.empty(t.shape + (4,), np.float64)
    for k, off in enumerate((-1.0, 0.0, 1.0, 2.0)):
        d = np.abs(t - off)
        w[..., k] = np.where(
            d <= 1.0,
            (A + 2) * d**3 - (A + 3) * d**2 + 1,
            np.where(d < 2.0, A * d**3 - 5 * A * d**2 + 8 * A * d - 4 * A, 0.0),
        )
    return w


def sample_cubic(src: np.ndarray, px, py, nodata=0):
    """4x4 Catmull-Rom; where the full 4x4 window is not inside the
    raster the kernel falls back to bilinear (reference
    GWKCubicResample4Sample, alg/gdalwarpkernel.cpp:2988-3027); result
    range-clamped to the source dtype (GDALCopyWords clamp)."""
    src3, squeeze = _prep(src)
    h, w, nb = src3.shape
    fx = np.asarray(px, np.float64) - 0.5
    fy = np.asarray(py, np.float64) - 0.5
    valid = (np.asarray(px) >= 0) & (np.asarray(px) <= w) & (np.asarray(py) >= 0) & (np.asarray(py) <= h)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    wx = _cubic_weights(tx)
    wy = _cubic_weights(ty)
    acc = np.zeros(fx.shape + (nb,), np.float64)
    for j in range(4):
        yy = np.clip(y0 + (j - 1), 0, h - 1)
        row = np.zeros_like(acc)
        for i in range(4):
            xx = np.clip(x0 + (i - 1), 0, w - 1)
            row += src3[yy, xx].astype(np.float64) * wx[..., i][..., None]
        acc += row * wy[..., j][..., None]
    border = (x0 - 1 < 0) | (x0 + 2 >= w) | (y0 - 1 < 0) | (y0 + 2 >= h)
    if border.any():
        bl, _ = sample_bilinear(src3.astype(np.float64), px, py, nodata=nodata)
        acc = np.where(border[..., None], bl, acc)
    out = _cast_back(acc, src3.dtype, nodata, valid)
    return (out[..., 0] if squeeze else out), valid


def _bspline_weights(t: np.ndarray) -> np.ndarray:
    """Cubic B-spline weights for offsets [-1, 0, 1, 2] (GWKBSpline,
    reference alg/gdalwarpkernel.cpp CubicSpline filter): smoothing
    kernel, no prefilter — GDAL's GRA_CubicSpline semantics."""
    w = np.empty(t.shape + (4,), np.float64)
    for k, off in enumerate((-1.0, 0.0, 1.0, 2.0)):
        d = np.abs(t - off)
        w[..., k] = np.where(
            d < 1.0, (4.0 - 6.0 * d * d + 3.0 * d**3) / 6.0,
            np.where(d < 2.0, (2.0 - d) ** 3 / 6.0, 0.0))
    return w


def sample_cubicspline(src: np.ndarray, px, py, nodata=0):
    """4x4 cubic B-spline (GRA_CubicSpline). Out-of-raster taps are
    dropped and the result renormalized by the accumulated weight —
    the GWKResample weight-adjustment border rule (reference
    alg/gdalwarpkernel.cpp GWKResample accumulator divisor)."""
    src3, squeeze = _prep(src)
    h, w, nb = src3.shape
    fx = np.asarray(px, np.float64) - 0.5
    fy = np.asarray(py, np.float64) - 0.5
    valid = (np.asarray(px) >= 0) & (np.asarray(px) <= w) & \
            (np.asarray(py) >= 0) & (np.asarray(py) <= h)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = _bspline_weights(fx - x0)
    wy = _bspline_weights(fy - y0)
    acc = np.zeros(fx.shape + (nb,), np.float64)
    norm = np.zeros(fx.shape, np.float64)
    for j in range(4):
        yj = y0 + (j - 1)
        in_y = (yj >= 0) & (yj < h)
        yy = np.clip(yj, 0, h - 1)
        for i in range(4):
            xi = x0 + (i - 1)
            in_x = (xi >= 0) & (xi < w)
            xx = np.clip(xi, 0, w - 1)
            wgt = wx[..., i] * wy[..., j] * (in_x & in_y)
            acc += src3[yy, xx].astype(np.float64) * wgt[..., None]
            norm += wgt
    acc /= np.maximum(norm, 1e-12)[..., None]
    out = _cast_back(acc, src3.dtype, nodata, valid)
    return (out[..., 0] if squeeze else out), valid


def _cast_back(v: np.ndarray, dtype, nodata, valid):
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        v = np.clip(np.floor(v + 0.5), info.min, info.max)
    out = v.astype(dtype)
    out[~valid] = nodata
    return out


def _lanczos_weights(t: np.ndarray) -> np.ndarray:
    """Windowed sinc, radius 3 (GWKLanczosSinc, alg/gdalwarpkernel.cpp
    filter table :101-135): w(x) = sinc(x) * sinc(x/3) for |x| < 3."""
    w = np.empty(t.shape + (6,), np.float64)
    for k, off in enumerate((-2.0, -1.0, 0.0, 1.0, 2.0, 3.0)):
        x = t - off
        w[..., k] = np.where(np.abs(x) < 3.0,
                             np.sinc(x) * np.sinc(x / 3.0), 0.0)
    return w


def sample_lanczos(src: np.ndarray, px, py, nodata=0):
    """6x6 Lanczos; taps edge-clamped, weights normalized by their sum
    (the warp kernel accumulates weight totals the same way)."""
    src3, squeeze = _prep(src)
    h, w, nb = src3.shape
    fx = np.asarray(px, np.float64) - 0.5
    fy = np.asarray(py, np.float64) - 0.5
    valid = (np.asarray(px) >= 0) & (np.asarray(px) <= w) & \
            (np.asarray(py) >= 0) & (np.asarray(py) <= h)
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    wx = _lanczos_weights(tx)
    wy = _lanczos_weights(ty)
    acc = np.zeros(fx.shape + (nb,), np.float64)
    norm = np.zeros(fx.shape, np.float64)
    for j in range(6):
        yy = np.clip(y0 + (j - 2), 0, h - 1)
        roww = wy[..., j]
        for i in range(6):
            xx = np.clip(x0 + (i - 2), 0, w - 1)
            wgt = wx[..., i] * roww
            acc += src3[yy, xx].astype(np.float64) * wgt[..., None]
            norm += wgt
    acc /= np.maximum(norm, 1e-12)[..., None]
    out = _cast_back(acc, src3.dtype, nodata, valid)
    return (out[..., 0] if squeeze else out), valid


_SAMPLERS = {"nearest": sample_nearest, "bilinear": sample_bilinear,
             "cubic": sample_cubic, "cubicspline": sample_cubicspline,
             "lanczos": sample_lanczos}


def sample(src, px, py, method: str = "nearest", nodata=0):
    try:
        fn = _SAMPLERS[method]
    except KeyError:
        raise NotImplementedError(f"resampler {method!r}")
    return fn(src, px, py, nodata=nodata)


# ----------------------------------------------------------- whole-array resize
def resize(src: np.ndarray, out_h: int, out_w: int, method: str = "nearest"):
    """gdal_translate -outsize semantics: sample the destination pixel
    centers through the scale transform (apps/gdal_translate_lib.cpp
    -outsize/-tr builds a scaled VRT window). method='average' does
    box-filtered decimation (GRA_Average footprint semantics)."""
    h = src.shape[0]; w = src.shape[1]
    if method == "average":
        return resize_average(src, out_h, out_w)
    px = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w)
    py = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h)
    gx, gy = np.meshgrid(px, py)
    out, _ = sample(src, gx, gy, method)
    return out


def resize_average(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Average-downsampling: each dst pixel is the area-weighted mean
    of the source pixels its footprint covers (GRA_Average with
    XSCALE/YSCALE footprint, alg/gdalwarper.cpp:1134-1160). Exact for
    arbitrary ratios via prefix sums."""
    src3, squeeze = _prep(src)
    h, w, nb = src3.shape
    # integral image for exact box sums at fractional bounds
    csum = np.zeros((h + 1, w + 1, nb), np.float64)
    np.cumsum(np.cumsum(src3.astype(np.float64), axis=0), axis=1,
              out=csum[1:, 1:])

    def frac_integral(y: np.ndarray, x: np.ndarray) -> np.ndarray:
        """Bilinear interpolation of the integral image at fractional
        (y, x) -> exact integral of the piecewise-constant source."""
        yi = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
        xi = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
        fy = (y - yi)[:, None]
        fx = (x - xi)[None, :]
        c00 = csum[yi][:, xi]
        c01 = csum[yi][:, xi + 1]
        c10 = csum[yi + 1][:, xi]
        c11 = csum[yi + 1][:, xi + 1]
        fy = fy[..., None]
        fx = fx[..., None]
        return (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
                + c10 * fy * (1 - fx) + c11 * fy * fx)

    ys = np.linspace(0.0, h, out_h + 1)
    xs = np.linspace(0.0, w, out_w + 1)
    big = frac_integral(ys, xs)
    sums = big[1:, 1:] - big[:-1, 1:] - big[1:, :-1] + big[:-1, :-1]
    area = (h / out_h) * (w / out_w)
    out = _cast_back(sums / area, src3.dtype, 0,
                     np.ones((out_h, out_w), bool))
    return out[..., 0] if squeeze else out


def interpolate_at_point(src: np.ndarray, gt, x, y, method: str = "bilinear"):
    """GDALInterpolateAtPoint (reference alg/gdal_interpolateatpoint.h):
    sample the raster at world coordinates through the inverse
    geotransform. Returns (values, valid)."""
    from .affine import world_to_pixel

    px, py = world_to_pixel(gt, np.asarray(x, np.float64), np.asarray(y, np.float64))
    return sample(src, px, py, method)


def apply_lut(band: np.ndarray, src_vals: np.ndarray, dst_vals: np.ndarray):
    """VRT LUT source (frmts/vrt/vrtsources.cpp LUT): piecewise-linear
    lookup, clamped at the table ends."""
    b = np.asarray(band, np.float64)
    return np.interp(b, np.asarray(src_vals, np.float64),
                     np.asarray(dst_vals, np.float64))


def reclassify(band: np.ndarray, bounds: np.ndarray, out_vals: np.ndarray,
               default=None):
    """gdal raster reclassify (frmts/vrt/vrtreclassifier.h interval
    mapping): value in [bounds[i], bounds[i+1]) -> out_vals[i]."""
    b = np.asarray(band, np.float64)
    idx = np.searchsorted(np.asarray(bounds, np.float64), b, side="right") - 1
    ok = (idx >= 0) & (idx < len(out_vals))
    out = np.full(b.shape, np.nan if default is None else default, np.float64)
    out[ok] = np.asarray(out_vals, np.float64)[idx[ok]]
    return out


# ----------------------------------------------------------- 2x reductions
def reduce2x2(src: np.ndarray, method: str = "average") -> np.ndarray:
    """One overview level: 2x2 block reduction (reference
    gcore/overview.cpp; 'average' is the tile-overview default,
    apps/gdalalg_raster_tile.cpp:2083). Odd trailing row/col handled by
    edge duplication."""
    src3, squeeze = _prep(src)
    h, w, nb = src3.shape
    if h % 2 or w % 2:
        src3 = np.pad(src3, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        h, w = src3.shape[:2]
    q = src3.reshape(h // 2, 2, w // 2, 2, nb)
    if method == "average":
        v = q.astype(np.float64).mean(axis=(1, 3))
        out = _cast_back(v, src3.dtype, 0, np.ones(v.shape[:-1], bool))
    elif method == "nearest":
        out = q[:, 0, :, 0]
    elif method == "rms":
        v = np.sqrt((q.astype(np.float64) ** 2).mean(axis=(1, 3)))
        out = _cast_back(v, src3.dtype, 0, np.ones(v.shape[:-1], bool))
    elif method == "max":
        out = q.max(axis=(1, 3))
    elif method == "min":
        out = q.min(axis=(1, 3))
    elif method == "mode":
        # group the 2x2 block values together: (blocks, 4, nb)
        flat = q.transpose(0, 2, 1, 3, 4).reshape(-1, 4, nb)
        s = np.sort(flat, axis=1)
        # most frequent of 4 sorted values; ties -> smallest (stable)
        out = np.empty((s.shape[0], nb), dtype=src3.dtype)
        for b in range(nb):
            for r in range(s.shape[0]):
                vals, counts = np.unique(s[r, :, b], return_counts=True)
                out[r, b] = vals[np.argmax(counts)]
        out = out.reshape(h // 2, w // 2, nb)
    else:
        raise NotImplementedError(f"reduction {method!r}")
    return out[..., 0] if squeeze else out


def apply_vertical_shift_grid(src, src_gt, grid, grid_gt,
                              inverse=False, src_unit_to_meter=1.0,
                              dst_unit_to_meter=1.0,
                              resampling="bilinear",
                              out_dtype=None):
    """GDALApplyVerticalShiftGrid (alg/gdalapplyverticalshiftgrid
    .cpp): resample the shift grid onto the source georef (bilinear
    default) and emit ``(src*srcUnit ± grid) / dstUnit`` — minus when
    inverse (``:253-260``); the result keeps the source grid, clipped
    to the output data type."""
    src = np.asarray(src, np.float64)
    grid = np.asarray(grid, np.float64)
    h, w = src.shape
    ys, xs = np.mgrid[0:h, 0:w]
    # pixel centers -> world -> grid pixels
    X = src_gt[0] + (xs + 0.5) * src_gt[1] + (ys + 0.5) * src_gt[2]
    Y = src_gt[3] + (xs + 0.5) * src_gt[4] + (ys + 0.5) * src_gt[5]
    det = grid_gt[1] * grid_gt[5] - grid_gt[2] * grid_gt[4]
    gx = ((X - grid_gt[0]) * grid_gt[5] - (Y - grid_gt[3]) * grid_gt[2]) / det
    gy = ((Y - grid_gt[3]) * grid_gt[1] - (X - grid_gt[0]) * grid_gt[4]) / det
    gvals, _valid = sample(grid.astype(np.float64), gx.ravel(), gy.ravel(),
                           method=resampling, nodata=0)
    gvals = np.asarray(gvals, np.float64).reshape(h, w)
    if inverse:
        out = (src * src_unit_to_meter - gvals) / dst_unit_to_meter
    else:
        out = (src * src_unit_to_meter + gvals) / dst_unit_to_meter
    if out_dtype is not None:
        info = np.iinfo(out_dtype) if np.issubdtype(out_dtype, np.integer) \
            else None
        if info is not None:
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(out_dtype)
    return out
