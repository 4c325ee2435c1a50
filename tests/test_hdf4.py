"""HDF4 conformance — expectations are the reference's own
(autotest/gcore/hdf4_read.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.hdf4 import hdf4_datasets, read_hdf4
from gdal_ray.sources.raster_open import open_raster

D = "/root/reference/autotest/gcore/data"


@pytest.mark.parametrize("fname,cs", [
    ("byte_3.hdf", 4672), ("int16_3.hdf", 4672), ("uint16_3.hdf", 4672),
    ("int32_3.hdf", 4672), ("uint32_3.hdf", 4672),
    ("float32_3.hdf", 4672), ("float64_3.hdf", 4672),
    ("utmsmall_3.hdf", 50054),
    ("byte_2.hdf", 4672), ("int16_2.hdf", 4672), ("uint16_2.hdf", 4672),
    ("int32_2.hdf", 4672), ("uint32_2.hdf", 4672),
    ("float32_2.hdf", 4672), ("float64_2.hdf", 4672),
    ("utmsmall_2.hdf", 50054),
])
def test_hdf4_sds_goldens(fname, cs):
    r = open_raster(f"{D}/{fname}")
    assert r["driver"] == "HDF4"
    px = r["pixels"]
    b1 = px if px.ndim == 2 else px[:, :, 0]
    assert checksum_image(b1) == cs


def test_hdf4_gr():
    r = read_hdf4(open(f"{D}/General_RImages.hdf", "rb").read())
    px = r["pixels"]
    assert px.shape == (5, 10, 2)       # RasterCount == 2
    assert checksum_image(px[:, :, 0]) == 361
    assert checksum_image(px[:, :, 1]) == 400
    assert "palette" not in r


def test_hdf4_gr_palette():
    r = read_hdf4(open(f"{D}/Image_with_Palette.hdf", "rb").read())
    assert r["pixels"].ndim == 2        # RasterCount == 1
    assert r["palette"].shape == (256, 3)


def test_hdf4_multiple_sds():
    sets = hdf4_datasets(open(f"{D}/SDS.hdf", "rb").read())
    assert [s["dims"] for s in sets] == [(16,), (5,)]
    assert sets[0]["dtype"] == np.dtype(">f8")


def test_hdf4_unlimited_dim_linked_blocks():
    r = read_hdf4(open(f"{D}/SDSUNLIMITED.hdf", "rb").read())
    assert r["pixels"].shape == (10, 10)
    assert r["pixels"].dtype == np.dtype(">i4")
