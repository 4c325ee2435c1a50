"""PNM (Netpbm) driver vs the reference's own fixtures
(autotest/gdrivers/pnm.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.pnm import decode_pnm, encode_pnm

P = "/root/reference/autotest/gdrivers/data/pnm"


def test_byte_pgm_golden():
    # pnm.py test 1: checksum 4672
    with open(f"{P}/byte.pgm", "rb") as fh:
        px = decode_pnm(fh.read())
    assert px.shape == (20, 20) and px.dtype == np.uint8
    assert checksum_image(px) == 4672


def test_rgbsmall_ppm_golden():
    # pnm.py test 3: band 2 checksum 21053
    with open(f"{P}/rgbsmall.ppm", "rb") as fh:
        px = decode_pnm(fh.read())
    assert px.shape == (50, 50, 3)
    assert checksum_image(px[:, :, 1]) == 21053


@pytest.mark.parametrize("ascii_", [False, True])
@pytest.mark.parametrize("shape,dtype", [((7, 9), np.uint8),
                                         ((5, 6, 3), np.uint8),
                                         ((4, 5), np.uint16)])
def test_roundtrip(ascii_, shape, dtype):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, np.iinfo(dtype).max, shape).astype(dtype)
    back = decode_pnm(encode_pnm(arr, ascii_=ascii_))
    assert np.array_equal(back.reshape(arr.shape), arr)
    assert back.dtype == arr.dtype


def test_comments_in_header():
    data = b"P2\n# comment line\n2 2\n# another\n255\n1 2\n3 4\n"
    assert np.array_equal(decode_pnm(data),
                          np.array([[1, 2], [3, 4]], np.uint8))


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import open_raster

    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    p = tmp_path / "t.pgm"
    p.write_bytes(encode_pnm(arr))
    (tmp_path / "t.wld").write_text("2.0\n0\n0\n-2.0\n101.0\n49.0\n")
    r = open_raster(str(p))
    assert r["driver"] == "PNM" and np.array_equal(r["pixels"], arr)
    assert r["gt"] == (100.0, 2.0, 0.0, 50.0, 0.0, -2.0)
