"""MRF reader + LERC decoder vs gdrivers/mrf.py fixtures (all byte
fixtures decode to the byte.tif checksum 4672 with the exact
NAD27/UTM bounding box)."""

import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.mrf import read_mrf

FIX = "/root/reference/autotest/gdrivers/data/mrf/"


@pytest.mark.parametrize("sub", ["none", "deflate", "png", "tif",
                                 "lerc", "lerc_v1"])
def test_mrf_byte_lossless(sub):
    px, gt, meta = read_mrf(FIX + sub + "/byte.mrf")
    assert px.shape == (20, 20)
    assert checksum_image(px) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_mrf_byte_jpeg():
    """JPEG page is lossy; the engine's bit-exact libjpeg-6b decode
    pins 4668 on this fixture."""
    px, gt, meta = read_mrf(FIX + "jpeg/byte.mrf")
    assert checksum_image(px) == 4668


def test_lerc_roundtrip_magic_rejection():
    from gdal_ray.functions.lerc import decode_lerc

    with pytest.raises(ValueError):
        decode_lerc(b"not a lerc blob")
