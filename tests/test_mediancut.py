"""GDALComputeMedianCutPCT + GDALDitherRGB2PCT conformance
(reference autotest/alg/dither.py::test_dither_1: exact 8-color table
of rgbsmall.tif and dither checksum 8803)."""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.mediancut import (build_color_cube, dither_rgb2pct,
                                          median_cut_pct, rgb_histogram_5bit)

RGBSMALL = "/root/reference/autotest/gcore/data/rgbsmall.tif"

REF_CT = [(36, 48, 32), (92, 120, 20), (88, 96, 20), (92, 132, 56),
          (0, 0, 0), (96, 152, 24), (60, 112, 32), (164, 164, 108)]


@pytest.fixture(scope="module")
def rgbsmall():
    from gdal_ray.sources.tiff import decode_tiff

    px, _ = decode_tiff(open(RGBSMALL, "rb").read())
    return px


@pytest.mark.skipif(not os.path.exists(RGBSMALL), reason="reference absent")
def test_median_cut_rgbsmall_exact_table(rgbsmall):
    hist = rgb_histogram_5bit(rgbsmall[:, :, 0], rgbsmall[:, :, 1],
                              rgbsmall[:, :, 2])
    pal = median_cut_pct(hist, 8)
    assert [tuple(p) for p in pal.tolist()] == REF_CT


@pytest.mark.skipif(not os.path.exists(RGBSMALL), reason="reference absent")
def test_dither_rgbsmall_checksum_8803(rgbsmall):
    hist = rgb_histogram_5bit(rgbsmall[:, :, 0], rgbsmall[:, :, 1],
                              rgbsmall[:, :, 2])
    pal = median_cut_pct(hist, 8)
    idx = dither_rgb2pct(rgbsmall, pal)
    assert checksum_image(idx) == 8803


def test_histogram_partials_merge(rgbsmall):
    # per-batch partial histograms sum to the global one (the
    # distributed combiner contract)
    top, bot = rgbsmall[:25], rgbsmall[25:]
    h1 = rgb_histogram_5bit(top[:, :, 0], top[:, :, 1], top[:, :, 2])
    h2 = rgb_histogram_5bit(bot[:, :, 0], bot[:, :, 1], bot[:, :, 2])
    full = rgb_histogram_5bit(rgbsmall[:, :, 0], rgbsmall[:, :, 1],
                              rgbsmall[:, :, 2])
    assert ((h1 + h2) == full).all()
    assert (median_cut_pct(h1 + h2, 8) == median_cut_pct(full, 8)).all()


def test_color_cube_l1_first_wins():
    pal = np.array([[10, 10, 10], [12, 10, 10]], np.uint8)
    cube = build_color_cube(pal)
    # cell (1,1,1) -> value (8,8,8): L1 d0 = 6, d1 = 8 -> index 0
    assert cube[1, 1, 1] == 0
    # equidistant cell: value (11,*,*) impossible on the 8-step cube;
    # check tie at cell value 16: d0 = 6+12, d1 = 4+12 -> index 1
    assert cube[2, 1, 1] == 1


def test_single_color_image():
    img = np.full((4, 4, 3), 200, np.uint8)
    hist = rgb_histogram_5bit(img[:, :, 0], img[:, :, 1], img[:, :, 2])
    pal = median_cut_pct(hist, 8)
    assert len(pal) == 1          # no splittable extent -> one box
    idx = dither_rgb2pct(img, pal)
    assert (idx == 0).all()
