"""ADRG + CEOS readers vs gdrivers autotest goldens."""

import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.adrg import read_adrg
from gdal_ray.sources.ceos import read_ceos

GD = "/root/reference/autotest/gdrivers/data/"


def test_adrg_small():
    """adrg.py: cs 62833 on band 1, geographic gt."""
    px, gt, meta = read_adrg(GD + "adrg/SMALL_ADRG/ABCDEF01.GEN")
    assert px.shape == (128, 128, 3)
    assert checksum_image(px[:, :, 0]) == 62833
    assert meta["zna"] == 1
    assert gt[0] == pytest.approx(-0.000138888888, abs=1e-9)
    assert gt[1] == pytest.approx(360.0 / meta["arv"])


def test_adrg_polar_zones():
    """adrg.py zna_9/zna_18 gt goldens (azimuthal equidistant)."""
    px, gt, _ = read_adrg(GD + "adrg/SMALL_ADRG_ZNA9/ABCDEF01.GEN")
    exp = (-307675.73602473765, 100.09145391818853, 0.0,
           -179477.5051066006, 0.0, -100.09145391818853)
    for g, e in zip(gt, exp):
        assert abs(g - e) <= 1e-5
    assert checksum_image(px[:, :, 0]) == 62833
    px, gt, _ = read_adrg(GD + "adrg/SMALL_ADRG_ZNA18/ABCDEF01.GEN")
    assert gt[3] == pytest.approx(179477.5051066006, abs=1e-5)


def test_ceos_imagery():
    """ceos.py test_ceos_1: band 4 window (0,0,5932,3) cs 9956."""
    px, meta = read_ceos(GD + "ceos/IMAGERY-75K.L-3")
    assert meta == {"bands": 4, "lines": 5936, "pixels": 5932, "bits": 8}
    assert checksum_image(px[0:3, 0:5932, 3]) == 9956


def test_l1b_little_endian():
    """gdrivers/l1b.py test_l1b_little_endian: band cs 14145, fatal-
    flag mask cs 25115 on the NOAA15 22016-record LE fixture."""
    import os
    import zipfile

    path = "/tmp/gdal_ray_fixtures/hrpt_little_endian.l1b"
    if not os.path.exists(path):
        with zipfile.ZipFile(GD + "l1b/hrpt_little_endian.l1b.zip") as z:
            z.extractall("/tmp/gdal_ray_fixtures")
    from gdal_ray.sources.l1b import read_l1b

    px, mask, meta = read_l1b(path)
    assert meta["little_endian"] and meta["data_type"] == 3
    assert checksum_image(px[:, :, 0]) == 14145
    assert checksum_image(mask) == 25115


def test_dds_uncompressed():
    """gdrivers/dds.py test_dds_no_compression: equals the
    stefan_full_rgba.tif band checksums."""
    from gdal_ray.sources.dds import read_dds
    from gdal_ray.sources.tiff import decode_tiff

    px = read_dds(GD + "dds/stefan_full_rgba_no_compression.dds")
    with open("/root/reference/autotest/gcore/data/stefan_full_rgba.tif",
              "rb") as f:
        ref = decode_tiff(f.read())[0]
    for b in range(4):
        assert checksum_image(px[:, :, b]) == checksum_image(ref[:, :, b])


def test_dds_dxt_decoders():
    """BC1/BC3 block decoders: synthetic solid-color blocks decode to
    the exact endpoint colors."""
    import struct

    import numpy as np

    from gdal_ray.sources.dds import _decode_dxt_color

    # c0 > c1 -> 4-color mode, all indexes 0 -> endpoint 0
    c0 = (31 << 11) | (0 << 5) | 0  # pure red
    c1 = 0
    block = struct.pack("<HHI", c0, c1, 0)
    tile = _decode_dxt_color(block)
    assert (tile[:, :, 0] == 255).all() and (tile[:, :, 1] == 0).all()
    assert (tile[:, :, 3] == 255).all()
