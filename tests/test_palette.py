"""TIFF ColorMap read/write + pct2rgb expansion against the
reference's own paletted fixtures."""

import numpy as np

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.tiff import (decode_tiff, encode_tiff, pct2rgb,
                                   tiff_colormap)

BYTE_PCT = "/root/reference/autotest/utilities/data/byte_pct.tif"
AVG_PAL = "/root/reference/autotest/gcore/data/test_average_palette.tif"


def test_read_reference_palette():
    d = open(BYTE_PCT, "rb").read()
    px, _ = decode_tiff(d)
    ct = tiff_colormap(d)
    assert ct is not None and ct.shape == (256, 3) and ct.dtype == np.uint8
    rgb = pct2rgb(px, ct)
    assert rgb.shape == (20, 20, 3)
    # expansion is a pure LUT: every pixel's color equals its entry
    assert (rgb == ct[px]).all()


def test_average_palette_fixture_has_distinct_entries():
    d = open(AVG_PAL, "rb").read()
    ct = tiff_colormap(d)
    px, _ = decode_tiff(d)
    used = np.unique(px)
    assert len({tuple(ct[i]) for i in used}) == len(used)


def test_palette_roundtrip():
    rng = np.random.default_rng(8)
    idx = rng.integers(0, 16, (13, 17)).astype(np.uint8)
    table = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    blob = encode_tiff(idx, palette=table)
    back, _ = decode_tiff(blob)
    np.testing.assert_array_equal(back, idx)
    ct = tiff_colormap(blob)
    np.testing.assert_array_equal(ct[:16], table)
    np.testing.assert_array_equal(pct2rgb(back, ct), table[idx])


def test_non_palette_returns_none():
    blob = encode_tiff(np.zeros((4, 4), np.uint8))
    assert tiff_colormap(blob) is None
