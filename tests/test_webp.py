"""WebP lossless (VP8L) codec vs the reference's WEBP conformance.

Golden: autotest/gcore/tiff_write.py:8401 — CreateCopy of rgbsmall.tif
with COMPRESS=WEBP + WEBP_LOSSLESS=true, reopen, band checksums must
be [21212, 21053, 21349] (lossless == source checksums).  Lossy VP8
(autotest/gdrivers/data/webp/rgbsmall.webp) is out of scope and must
raise.  The transform paths (predictor modes 0-13, cross-color,
subtract-green, color-indexing incl. 1/2/4-bit bundling) are
round-trip-tested through the test encoder knobs.
"""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.webp import (decode_vp8l, decode_webp,
                                     encode_vp8l, encode_webp_lossless)
from gdal_ray.sources.tiff import decode_tiff, encode_tiff

RGBSMALL = "/root/reference/autotest/gcore/data/rgbsmall.tif"
LOSSY = "/root/reference/autotest/gdrivers/data/webp/rgbsmall.webp"


def _rand(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, shape,
                                                dtype=np.uint8)


def test_roundtrip_rgb_rgba():
    for shape in [(1, 1, 3), (3, 5, 3), (16, 16, 4), (33, 7, 4),
                  (1, 300, 3), (300, 1, 4)]:
        img = _rand(shape)
        out = decode_webp(encode_webp_lossless(img))
        assert out.shape == shape[:2] + (4,)
        assert (out[:, :, :shape[2]] == img).all()
        if shape[2] == 3:
            assert (out[:, :, 3] == 255).all()


def test_roundtrip_gradient_and_flat():
    yy, xx = np.mgrid[0:100, 0:77]
    img = np.dstack([(yy * 3) % 256, (xx * 5) % 256,
                     ((xx + yy) * 2) % 256]).astype(np.uint8)
    assert (decode_webp(encode_webp_lossless(img))[:, :, :3] == img).all()
    flat = np.full((20, 20, 3), 137, np.uint8)
    assert (decode_webp(encode_webp_lossless(flat))[:, :, :3]
            == flat).all()


def test_predictor_transform_all_modes():
    img = _rand((40, 30, 3))
    for mode in range(14):
        out = decode_vp8l(encode_vp8l(img, predictor_mode=mode))
        assert (out[:, :, :3] == img).all(), f"predictor {mode}"


def test_color_transform():
    img = _rand((40, 30, 3), seed=3)
    for cm in [(10, -7, 33), (0, 0, 0), (127, 127, 127),
               (-128, -128, -128)]:
        out = decode_vp8l(encode_vp8l(img, color_mult=cm))
        assert (out[:, :, :3] == img).all(), f"color {cm}"


def test_color_indexing_all_bundle_widths():
    rng = np.random.default_rng(11)
    for ncol in [2, 4, 13, 90, 256]:       # 1/2/4/8-bit index widths
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        img = pal[rng.integers(0, ncol, (21, 37))]
        out = decode_vp8l(encode_vp8l(img, palette=True))
        assert (out[:, :, :3] == img).all(), f"palette {ncol}"


@pytest.mark.skipif(not os.path.exists(RGBSMALL), reason="no fixture")
def test_tiff_webp_lossless_golden():
    """tiff_write.py:8401 semantics: WEBP_LOSSLESS CreateCopy+reopen
    keeps the source checksums [21212, 21053, 21349]."""
    px, gt = decode_tiff(open(RGBSMALL, "rb").read())
    data = encode_tiff(px, gt=gt, compression="webp")
    px2, gt2 = decode_tiff(data)
    cs = [checksum_image(px2[:, :, b]) for b in range(3)]
    assert cs == [21212, 21053, 21349]
    assert gt2 == pytest.approx(gt)
    assert (px2 == px).all()


@pytest.mark.skipif(not os.path.exists(LOSSY), reason="no fixture")
def test_lossy_vp8_raises():
    data = open(LOSSY, "rb").read()
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(data)


def test_mbtiles_webp_blob_path():
    from gdal_ray.sources.mbtiles import _decode_tile

    img = _rand((64, 64, 3), seed=5)
    out = _decode_tile(encode_webp_lossless(img))
    assert (out[:, :, :3] == img).all()


def test_codecs_sniff_webp():
    from gdal_ray.functions.codecs import decode_image, encode_image

    img = _rand((12, 9, 4), seed=9)
    blob = encode_image(img, "webp")
    assert (decode_image(blob) == img).all()
