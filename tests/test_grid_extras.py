"""AIGrid, GRASS ASCII, ISG, LOSLAS, PRF, NDF drivers vs the
reference's own autotest expectations (autotest/gdrivers/{aigrid,
grassasciigrid,isg,loslas,prf,ndf}.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.aigrid import read_aigrid
from gdal_ray.sources.asciigrid import (read_grassascii, read_isg,
                                        read_loslas)
from gdal_ray.sources.prf import read_ndf, read_prf

GD = "/root/reference/autotest/gdrivers/data/"


def test_aigrid_abc3x1():
    """aigrid.py tests 1-5: cs 3, gt, Byte + nodata 255, colormap."""
    for cover in ("abc3x1", "ABC3X1UC"):
        px, gt, meta = read_aigrid(GD + "aigrid/" + cover)
        assert checksum_image(px) == 3
        assert gt == (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)
        assert px.dtype == np.uint8 and meta["nodata"] == 255
        assert meta["colormap"][0] == (95, 113, 150, 255)
        assert meta["colormap"][1] == (95, 57, 29, 255)
    # open by any file inside the coverage (test_aigrid_2)
    px2, gt2, _ = read_aigrid(GD + "aigrid/abc3x1/prj.adf")
    assert checksum_image(px2) == 3 and gt2 == gt


def test_aigrid_sta_24bytes():
    px, gt, meta = read_aigrid(GD + "aigrid/aigrid_sta_24bytes/teststa")
    assert meta["min"] == 0.0 and meta["max"] == 2.0
    assert px.min() == 0 and px.max() == 2


def test_grassascii():
    with open(GD + "grassasciigrid/grassascii.txt") as f:
        px, gt, nodata = read_grassascii(f.read())
    assert checksum_image(px) == 212
    assert gt == pytest.approx(
        (-100.0, 62.5, 0.0, 250.0, 0.0, -41.666666666666664))
    assert nodata == -9999.0


def test_isg_basic():
    with open(GD + "isg/test.isg") as f:
        px, gt, nodata, warn = read_isg(f.read())
    assert checksum_image(px) == 159
    assert gt == pytest.approx((120.0, 0.25, 0.0, 41.0, 0.0, -0.25))
    assert not warn


@pytest.mark.parametrize("fname,expected,expect_warn", [
    ("approx_georeferencing_auto_corrected.isg",
     (-76.0098535, 0.016667, 0.0, -20.0087335, 0.0, -0.016667), False),
    ("header_larger_than_1024bytes.isg",
     (12.99375, 0.0125, 0.0, 47.00416666666666, 0.0,
      -0.008333333333333333), False),
    ("header_dms.isg",
     (119.9875, 0.025, 0.0, 50.0083333333, 0.0, -0.01666666666), False),
    ("approx_georeferencing_warning.isg",
     (-76.0083, 0.01666694444444445, 0.0, -20.0083, 0.0,
      -0.016667027027027027), True),
])
def test_isg_georeferencing_variants(fname, expected, expect_warn):
    with open(GD + "isg/" + fname, errors="surrogateescape") as f:
        px, gt, nodata, warn = read_isg(f.read())
    assert gt == pytest.approx(expected, rel=1e-8)
    assert warn == expect_warn


def test_isg_rejected_by_default():
    with open(GD + "isg/approx_georeferencing_rejected_by_default.isg",
              errors="surrogateescape") as f:
        text = f.read()
    with pytest.raises(ValueError):
        read_isg(text)
    px, gt, _, warn = read_isg(text, skip_check=True)
    assert warn


def test_loslas():
    with open(GD + "loslas/wyhpgn.los", "rb") as f:
        px, gt = read_loslas(f.read())
    assert gt == pytest.approx((-111.625, 0.25, 0.0, 45.625, 0.0, -0.25))
    assert checksum_image(px) == 0
    assert px.min() == pytest.approx(-0.027868999168276787)
    assert px.max() == pytest.approx(0.033906999975442886)
    assert px.mean() == pytest.approx(0.009716129862575248)
    assert px.std() == pytest.approx(0.008260044951413324)


def test_prf():
    px, gt, meta = read_prf(GD + "PRF/ph.prf")
    assert checksum_image(px) == 43190
    assert gt == (1.0, 2.0, 3.0, -7.0, 5.0, 6.0)
    assert px.dtype == np.uint16


def test_prf_xdem():
    px, gt, meta = read_prf(GD + "PRF/dem.x-dem")
    assert px.shape == (4663, 4330) and px.dtype == np.float32
    assert meta["unit"] == "m"
    assert meta["nodata"] == -1111111.0
    from gdal_ray.sources.vrt import open_vrt

    ov = open_vrt(meta["overview_path"])["pixels"]
    assert ov.shape[:2] == (1165, 1082)


def test_ndf():
    px, gt, meta = read_ndf(GD + "ndf/LE7134052000500350.H3")
    assert px.shape == (14680, 15620)
    assert checksum_image(px[:1, :]) == 6510
    assert gt == (320325.75, 14.25, 0.0, 1383062.25, 0.0, -14.25)
    assert meta["zone"] == "46" and meta["projection"] == "UTM"


def test_iris():
    """gdrivers/iris.py: fakeiris cs 65532; iristest cs 52872 +
    Mercator geodesic gt within the autotest's 1e-5 rel tolerance."""
    from gdal_ray.sources.iris import read_iris

    px, gt, meta = read_iris(GD + "iris/fakeiris.dat")
    assert checksum_image(px if px.ndim == 2 else px[:, :, 0]) == 65532
    px, gt, meta = read_iris(GD + "iris/iristest.dat")
    assert checksum_image(px if px.ndim == 2 else px[:, :, 0]) == 52872
    assert meta["product"] == "CAPPI" and meta["projection"] == "Mercator"
    exp = [16435.721785269096, 1370.4263720754534, 0.0,
           5289830.4584420761, 0.0, -1357.6498705837876]
    for g, e in zip(gt, exp):
        assert (g == 0.0 if e == 0.0 else abs(g - e) / abs(e) <= 1e-5)
