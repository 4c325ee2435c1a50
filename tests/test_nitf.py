"""NITF driver vs the reference's own fixtures
(autotest/gdrivers/nitf.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.nitf import decode_nitf, encode_nitf

D = "/root/reference/autotest/gdrivers/data/nitf"


def test_rgb_golden():
    # nitf.py test_nitf_10: rgb.ntf band 3 checksum 21349
    with open(f"{D}/rgb.ntf", "rb") as fh:
        px, gt, meta = decode_nitf(fh.read())
    assert px.shape == (50, 50, 3)
    assert checksum_image(px[:, :, 2]) == 21349
    assert meta["ic"] == "NC"
    # ICORDS=G gives a geographic geotransform
    assert gt is not None and gt[0] == pytest.approx(-44.8402777778)


@pytest.mark.parametrize("fn", ["i_3034c.ntf", "i_3034f.ntf",
                                "ns3034d.nsf"])
def test_bilevel_goldens(fn):
    # nitf.py test_nitf_22/23/38: 1-bit fixtures, checksum 170
    with open(f"{D}/{fn}", "rb") as fh:
        px, _gt, _meta = decode_nitf(fh.read())
    assert px.shape == (18, 35)
    assert checksum_image(px) == 170


def test_no_image_segment():
    # nitf.py test_nitf_18: U_0006A.NTF has no image segment
    with open(f"{D}/U_0006A.NTF", "rb") as fh:
        data = fh.read()
    with pytest.raises(ValueError):
        decode_nitf(data)


def test_compressed_raises():
    with open(f"{D}/U_1050A.NTF", "rb") as fh:
        data = fh.read()
    with pytest.raises(NotImplementedError):
        decode_nitf(data)


def test_byte_createcopy_golden():
    # nitf.py test_nitf_1: byte.tif -> NITF -> checksum stays 4672
    from gdal_ray.sources.tiff import decode_tiff

    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        band = decode_tiff(fh.read())[0]
    px, _gt, meta = decode_nitf(encode_nitf(band))
    assert np.array_equal(px, band)
    assert checksum_image(px) == 4672
    assert meta["version"] == "NITF02.10"


def test_rgbsmall_createcopy_golden():
    # nitf.py test_nitf_3: rgbsmall.tif -> NITF -> band 3 cs 21349
    from gdal_ray.sources.tiff import decode_tiff

    with open("/root/reference/autotest/gcore/data/rgbsmall.tif",
              "rb") as fh:
        rgb = decode_tiff(fh.read())[0]
    px, _gt, meta = decode_nitf(encode_nitf(rgb))
    assert np.array_equal(px, rgb)
    assert checksum_image(px[:, :, 2]) == 21349
    assert meta["imode"] == "P"


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16,
                                   np.float32])
def test_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(7)
    if dtype == np.float32:
        a = rng.random((13, 17)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, (13, 17)).astype(dtype)
    back, _, _ = decode_nitf(encode_nitf(a))
    assert back.dtype == a.dtype and np.array_equal(back, a)


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import open_raster

    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    p = tmp_path / "x.ntf"
    p.write_bytes(encode_nitf(arr))
    r = open_raster(str(p))
    assert r["driver"] == "NITF"
    assert np.array_equal(np.asarray(r["pixels"]), arr)
