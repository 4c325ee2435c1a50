"""gdal_translate conformance against the reference's own expected
checksums (autotest/utilities/test_gdal_translate_lib.py), through the
engine's TIFF reader (incl. planar-separate Deflate rgbsmall.tif) and
resize kernels."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.resample import resize, resize_average
from gdal_ray.sources.tiff import decode_tiff

GCORE = "/root/reference/autotest/gcore/data"


@pytest.fixture(scope="module")
def byte():
    return decode_tiff(open(f"{GCORE}/byte.tif", "rb").read())[0]


def test_bandlist_reorder_checksums():
    """(lib_4: bandList=[3,2,1] -> 21349/21053/21212) — also covers
    PlanarConfiguration=2 separate-plane Deflate strips."""
    rgb, _ = decode_tiff(open(f"{GCORE}/rgbsmall.tif", "rb").read())
    assert checksum_image(rgb[:, :, 2]) == 21349
    assert checksum_image(rgb[:, :, 1]) == 21053
    assert checksum_image(rgb[:, :, 0]) == 21212


def test_outsize_upsample_nearest(byte):
    """(lib_6/lib_7: width=40/height=40 and 200% -> 18784)."""
    assert checksum_image(resize(byte, 40, 40, "nearest")) == 18784


def test_srcwin_and_minimal_sizes(byte):
    """(lib_10: srcWin 1x1 -> 2; width=1/height=1 -> 3)."""
    assert checksum_image(byte[:1, :1]) == 2
    assert checksum_image(resize(byte, 1, 1, "nearest")) == 3


def test_outsize_average(byte):
    """(generate_ovr: resampleAlg=Average to 10x10 -> 1152)."""
    assert checksum_image(resize_average(byte, 10, 10)) == 1152


def test_scale_params_semantics(byte):
    """(lib -scale [0,255,0,65535] -> UInt16 min/max (19018, 65535)):
    linear scale dst = (src-smin)*(dmax-dmin)/(smax-smin)+dmin with
    GDALCopyWords rounding."""
    v = byte.astype(np.float64)
    scaled = (v - 0.0) * (65535.0 - 0.0) / (255.0 - 0.0) + 0.0
    out = np.clip(np.floor(scaled + 0.5), 0, 65535).astype(np.uint16)
    assert (int(out.min()), int(out.max())) == (19018, 65535)
