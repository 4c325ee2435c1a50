"""Conformance against the reference's own fixtures and checksum
oracle: byte.tif has GDALChecksumImage == 4672
(reference autotest/gcore/tiff_read.py:45)."""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.tiff import decode_tiff

DATA = "/root/reference/autotest/gcore/data"


def test_byte_tif_checksum_4672():
    px, gt = decode_tiff(open(os.path.join(DATA, "byte.tif"), "rb").read())
    assert px.shape == (20, 20)
    assert px.dtype == np.uint8
    assert checksum_image(px) == 4672
    # georeference decoded (UTM zone 11, 60 m pixels)
    assert gt is not None
    assert gt[1] == pytest.approx(60.0)
    assert gt[5] == pytest.approx(-60.0)


def test_utmsmall_tif_checksum_50054():
    path = os.path.join(DATA, "utmsmall.tif")
    px, gt = decode_tiff(open(path, "rb").read())
    assert px.shape == (100, 100)
    assert px.dtype == np.uint8
    # the reference's own checksum oracle for utmsmall.tif band 1
    # (autotest/utilities/test_gdalalg_convert.py:32)
    assert checksum_image(px) == 50054
    assert gt is not None and gt[1] == pytest.approx(60.0)


def test_compressed_tiff_raises():
    # rle (PackBits) supported; deflate is not -> NotImplementedError
    path = os.path.join(DATA, "byte_zstd.tif")
    if not os.path.exists(path):
        pytest.skip("fixture absent")
    with pytest.raises(NotImplementedError):
        decode_tiff(open(path, "rb").read())


def test_tiff_ray_source(ray_session):
    from gdal_ray.functions.codecs import decode_image
    from gdal_ray.sources.tiff import read_tiff_dataset

    ds = read_tiff_dataset([os.path.join(DATA, "byte.tif"),
                            os.path.join(DATA, "utmsmall.tif")])
    rows = {}
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            rows[os.path.basename(r["image_id"])] = r
    assert rows["byte.tif"]["w"] == 20
    px = decode_image(rows["byte.tif"]["bytes"])
    band = px[:, :, 0] if px.ndim == 3 else px
    assert checksum_image(band) == 4672
