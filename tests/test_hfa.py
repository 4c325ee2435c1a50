"""HFA (Erdas Imagine) reader vs the reference's own fixtures
(autotest/gcore/hfa_read.py init_list, autotest/gdrivers/hfa.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.hfa import decode_hfa

GCORE = "/root/reference/autotest/gcore/data"
GDRV = "/root/reference/autotest/gdrivers/data/hfa"


@pytest.mark.parametrize("fn,exp,dtype", [
    ("byte.img", 4672, np.uint8),
    ("int16.img", 4672, np.int16),
    ("uint16.img", 4672, np.uint16),
    ("int32.img", 4672, np.int32),
    ("uint32.img", 4672, np.uint32),
    ("float32.img", 4672, np.float32),
    ("float64.img", 4672, np.float64),
    ("utmsmall.img", 50054, np.uint8),
    ("2bit_compressed.img", 11918, np.uint8),
])
def test_hfa_read_goldens(fn, exp, dtype):
    # hfa_read.py init_list
    with open(f"{GCORE}/{fn}", "rb") as fh:
        px, gt, _meta = decode_hfa(fh.read())
    assert px.dtype == dtype
    assert checksum_image(px) == exp
    # all the gcore fixtures share byte.tif's UTM grid
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_hfa_int_read():
    # gdrivers/hfa.py test_hfa_int_read: checksum 6691
    with open(f"{GDRV}/int.img", "rb") as fh:
        px, _gt, _ = decode_hfa(fh.read())
    assert px.dtype == np.int32
    assert checksum_image(px) == 6691


def test_hfa_float_read():
    # gdrivers/hfa.py test_hfa_float_read: checksum 23529 and the
    # pinned pixel value at (100, 100)
    with open(f"{GDRV}/float.img", "rb") as fh:
        px, _gt, _ = decode_hfa(fh.read())
    assert px.dtype == np.float32
    assert checksum_image(px) == 23529
    assert px[100, 100] == pytest.approx(41.021659851074219, abs=0.0001)


def test_hfa_compressed_u8():
    # i8u_c_i.img: RLE-compressed 8-bit (gdrivers/hfa.py test_hfa_8)
    with open(f"{GDRV}/i8u_c_i.img", "rb") as fh:
        px, _gt, _ = decode_hfa(fh.read())
    assert px.shape == (250, 233) and px.dtype == np.uint8


def test_hfa_1bit():
    with open(f"{GDRV}/small1bit.img", "rb") as fh:
        px, _gt, _ = decode_hfa(fh.read())
    assert px.shape == (300, 300)
    assert set(np.unique(px)) <= {0, 1}


def test_spill_golden():
    # gdrivers/hfa.py test_hfa_rde_overviews: spill.img checksum 1631
    with open(f"{GDRV}/spill.img", "rb") as fh:
        data = fh.read()
    with open(f"{GDRV}/spill.ige", "rb") as fh:
        ige = fh.read()
    px, _gt, _ = decode_hfa(data, ige=ige)
    assert checksum_image(px if px.ndim == 2 else px[:, :, 0]) == 1631
    # without the spill bytes the layer is unreadable -> raise
    with pytest.raises(NotImplementedError):
        decode_hfa(data)


def test_open_raster_probe():
    from gdal_ray.sources.raster_open import open_raster

    r = open_raster(f"{GCORE}/byte.img")
    assert r["driver"] == "HFA"
    assert checksum_image(np.asarray(r["pixels"])) == 4672
    assert r["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
