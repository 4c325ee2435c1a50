"""nearblack goldens: the reference's own expected checksums
(autotest/utilities/test_nearblack_lib.py) on its own fixtures,
decoded through our TIFF reader and checksummed with our
GDALChecksumImage re-implementation."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.nearblack import nearblack
from gdal_ray.sources.tiff import decode_tiff

RGBSMALL = "/root/reference/autotest/gdrivers/data/rgbsmall.tif"
WBR = "/root/reference/autotest/utilities/data/whiteblackred.tif"


def _read(path):
    with open(path, "rb") as f:
        px, _ = decode_tiff(f.read())
    return px


def test_nearblack_rgbsmall_golden():
    # test_nearblack_lib_1: maxNonBlack=0, nearDist=15 -> 21106/20736/21309
    px = _read(RGBSMALL)
    out, _ = nearblack(px, max_non_black=0, near_dist=15)
    assert checksum_image(out[:, :, 0]) == 21106
    assert checksum_image(out[:, :, 1]) == 20736
    assert checksum_image(out[:, :, 2]) == 21309


def test_nearblack_rgbsmall_alpha_golden():
    # test_nearblack_lib_2: setAlpha -> band 4 checksum 22002
    px = _read(RGBSMALL)
    out, mask = nearblack(px, max_non_black=0, set_alpha=True)
    assert out.shape[2] == 4
    assert checksum_image(out[:, :, 3]) == 22002
    # the mask band equals the alpha band by construction
    np.testing.assert_array_equal(mask, out[:, :, 3])


def test_nearblack_colors_golden():
    # test_nearblack_lib_7: colors ((0,0,0),(255,255,255)) on
    # whiteblackred.tif -> 1217/0/0
    px = _read(WBR)
    out, _ = nearblack(px, max_non_black=0,
                       colors=((0, 0, 0), (255, 255, 255)))
    assert checksum_image(out[:, :, 0]) == 1217
    assert checksum_image(out[:, :, 1]) == 0
    assert checksum_image(out[:, :, 2]) == 0


def test_nearblack_white_replace_value():
    # single all-255 color -> collar written as 255, not 0
    img = np.full((9, 9, 1), 250, np.uint8)
    img[4, 4] = 30  # interior data far from white
    out, mask = nearblack(img, white=True, max_non_black=0, near_dist=15)
    assert out[0, 0, 0] == 255
    assert out[4, 4, 0] == 30
    assert mask[4, 4] == 255 and mask[0, 0] == 0


def test_nearblack_max_non_black_tolerance():
    # a 2px noise speck inside the collar is crossed when
    # max_non_black >= its width, and stops the scan when smaller
    img = np.zeros((7, 11, 1), np.uint8)
    img[3, 2] = 200   # speck inside the left collar
    img[3, 5:8] = 180  # real data in the middle
    strict, _ = nearblack(img, max_non_black=0, near_dist=15)
    loose, _ = nearblack(img, max_non_black=3, near_dist=15)
    # strict: scan stops at the speck (interior data preserved)
    assert strict[3, 5, 0] == 180
    # loose: the speck is crossed and wiped, data still preserved...
    # except data rows hit by the relaxed vertical scan shrink too
    assert loose[3, 2, 0] == 0


def test_nearblack_all_black():
    img = np.zeros((6, 6, 2), np.uint8)
    out, mask = nearblack(img, max_non_black=0)
    assert (out == 0).all()
    assert (mask == 0).all()
