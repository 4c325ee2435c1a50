"""STACTA / STACIT conformance — every expectation is the reference's
OWN published value (autotest/gdrivers/stacta.py, stacit.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.raster_open import open_raster
from gdal_ray.sources.stac import read_stacit, read_stacta, \
    stacit_subdatasets
from gdal_ray.sources.tiff import decode_tiff

G = "/root/reference/autotest/gdrivers"
D = f"{G}/data"


# --------------------------------------------------------------- STACTA

def test_stacta_basic():
    r = open_raster(f"{D}/stacta/test.json")
    assert r["driver"] == "STACTA"
    assert r["pixels"].shape == (1024, 2048, 3)
    assert r["epsg"] == 4326
    want = (-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125)
    assert r["gt"] == pytest.approx(want, rel=1e-8)
    assert r["nodata"] == 0.0
    assert len(r["overviews"]) == 2
    # full res == the two zoom-2 tiles side by side (the autotest's
    # BuildVRT reference dataset)
    t0, _ = decode_tiff(open(f"{D}/stacta/WorldCRS84Quad/2/0/0.tif",
                             "rb").read())
    t1, _ = decode_tiff(open(f"{D}/stacta/WorldCRS84Quad/2/0/1.tif",
                             "rb").read())
    assert np.array_equal(r["pixels"], np.concatenate([t0, t1], axis=1))
    assert r["overviews"][0].shape == (512, 1024, 3)
    assert r["overviews"][1].shape == (256, 512, 3)


def test_stacta_east_hemisphere():
    r = read_stacta(f"{D}/stacta/test_east_hemisphere.json")
    assert r["pixels"].shape == (1024, 1024, 3)
    want = (0.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125)
    assert r["gt"] == pytest.approx(want, rel=1e-8)
    t1, _ = decode_tiff(open(f"{D}/stacta/WorldCRS84Quad/2/0/1.tif",
                             "rb").read())
    assert np.array_equal(r["pixels"], t1)


# --------------------------------------------------------------- STACIT

def test_stacit_basic():
    r = read_stacit(f"{D}/stacit/test.json", base_dir=G)
    assert r["driver"] == "STACIT"
    assert r["pixels"].shape == (20, 40)
    assert r["epsg"] == 26711
    assert r["gt"] == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), rel=1e-8)
    assert r.get("nodata") is None
    assert checksum_image(r["pixels"]) == 9239


def test_stacit_max_items():
    r = read_stacit(f"{D}/stacit/test.json", base_dir=G, max_items=1)
    assert r["pixels"].shape == (20, 20)
    assert checksum_image(r["pixels"]) == 4672


def test_stacit_multiple_assets():
    p = f"{D}/stacit/test_multiple_assets.json"
    subs = stacit_subdatasets(p, base_dir=G)
    assert [s[0] for s in subs] == [
        f'STACIT:"{p}":collection=my_collection,asset=B01,crs=EPSG_26711',
        f'STACIT:"{p}":collection=my_collection,asset=B01,crs=EPSG_26712',
        f'STACIT:"{p}":collection=my_collection,asset=B02',
        f'STACIT:"{p}":collection=my_collection2,asset=B01',
    ]
    r = read_stacit(subs[0][0], base_dir=G)
    assert r["pixels"].shape == (20, 20)
    assert r["epsg"] == 26711
    assert r["gt"] == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0), rel=1e-8)
    r = read_stacit(subs[1][0], base_dir=G)
    assert r["epsg"] == 26712
    r = read_stacit(subs[2][0], base_dir=G)
    assert r["gt"][0] == pytest.approx(-440720.0)
    r = read_stacit(subs[3][0], base_dir=G)
    assert r["epsg"] == 26713
    with pytest.raises(ValueError):
        read_stacit(f'STACIT:"{p}":collection=i_dont_exist', base_dir=G)
    with pytest.raises(ValueError):
        read_stacit(f'STACIT:"{p}":asset=i_dont_exist', base_dir=G)


def test_stacit_overlapping_sources():
    # most-recent item (byte.tif, 2021-07-25) wins the overlap
    r = read_stacit(f"{D}/stacit/overlapping_sources.json", base_dir=G)
    assert checksum_image(r["pixels"]) == 4672


def test_stacit_overlapping_sources_with_nodata():
    # byte_nodata_0.tif (most recent) over byte.tif, 0 transparent
    r = read_stacit(f"{D}/stacit/overlapping_sources_with_nodata.json",
                    base_dir=G)
    assert r["nodata"] == 0.0
    over, _ = decode_tiff(open(f"{D}/byte_nodata_0.tif", "rb").read())
    under, _ = decode_tiff(open(f"{D}/byte.tif", "rb").read())
    want = np.where(over != 0, over, under)
    assert np.array_equal(r["pixels"], want)


def test_stacit_paging_follows_next_link():
    # page 2 contributes the int16 item at dst xoff 20
    r = read_stacit(f"{D}/stacit/test.json", base_dir=G)
    i16, _ = decode_tiff(open(f"{D}/int16.tif", "rb").read())
    assert np.array_equal(r["pixels"][:, 20:],
                          np.clip(i16, 0, 255).astype(np.uint8))
