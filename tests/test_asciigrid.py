"""AAIGrid / XYZ ASCII raster drivers vs the reference's own fixtures
(autotest/gdrivers/data/aaigrid/*, autotest/gdrivers/aaigrid.py
expected checksums and geotransforms)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.asciigrid import (read_aaigrid, read_xyz,
                                        sniff_aaigrid, write_aaigrid,
                                        write_xyz)

DATA = "/root/reference/autotest/gdrivers/data/aaigrid"


def test_byte_grd_golden():
    # aaigrid.py test_aaigrid_1: checksum 4672 on byte.tif.grd
    txt = open(f"{DATA}/byte.tif.grd").read()
    arr, gt, nodata = read_aaigrid(txt)
    assert arr.shape == (20, 20) and arr.dtype == np.int32
    assert checksum_image(arr) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert nodata is None


def test_pixel_per_line_golden():
    # aaigrid.py test_aaigrid_2: exponent-format header, gt
    # (100000,50,0,650600,0,-50), checksum 1123, float nodata -99999
    arr, gt, nodata = read_aaigrid(open(f"{DATA}/pixel_per_line.asc").read())
    assert gt == (100000.0, 50.0, 0.0, 650600.0, 0.0, -50.0)
    assert checksum_image(arr) == 1123
    assert nodata == -99999
    assert arr.dtype != np.int32  # .E body -> float


def test_nodata_type_from_token():
    # aaigrid.py test_aaigrid_6/6bis: band type follows the nodata
    # literal ('-99999.' -> float, '-99999' -> int)
    arr_f, _, _ = read_aaigrid(open(f"{DATA}/nodata_float.asc").read())
    assert arr_f.dtype == np.float32
    arr_i, _, nd = read_aaigrid(open(f"{DATA}/nodata_int.asc").read())
    assert arr_i.dtype == np.int32 and nd == -99999


def test_nodata_nan():
    arr, _, nodata = read_aaigrid(open(f"{DATA}/nodata_nan.asc").read())
    assert np.isnan(nodata)
    assert np.isnan(arr[0, 0])
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr[1], [1, 2, 3])


def test_pixel_per_line_and_float():
    arr, _, _ = read_aaigrid(open(f"{DATA}/pixel_per_line.asc").read())
    assert arr.size == arr.shape[0] * arr.shape[1]
    arr64, _, _ = read_aaigrid(open(f"{DATA}/float64.asc").read())
    assert arr64.dtype in (np.float32, np.float64)


def test_aaigrid_roundtrip_int_and_float(tmp_path):
    rng = np.random.default_rng(5)
    ints = rng.integers(0, 255, (7, 9)).astype(np.int32)
    gt = (1000.0, 30.0, 0.0, 2000.0, 0.0, -30.0)
    txt = write_aaigrid(ints, gt, nodata=-9999)
    assert sniff_aaigrid(txt.encode())
    back, gt2, nd = read_aaigrid(txt)
    np.testing.assert_array_equal(back, ints)
    assert gt2 == gt and nd == -9999

    floats = (rng.random((4, 5)) * 10).astype(np.float64)
    back, _, _ = read_aaigrid(write_aaigrid(floats, gt,
                                            decimal_precision=8))
    np.testing.assert_allclose(back, floats, atol=1e-7)


def test_aaigrid_xllcenter():
    txt = ("ncols 2\nnrows 2\nxllcenter 10\nyllcenter 20\ncellsize 4\n"
           "1 2\n3 4\n")
    arr, gt, _ = read_aaigrid(txt)
    assert gt == (8.0, 4.0, 0.0, 26.0, 0.0, -4.0)
    np.testing.assert_array_equal(arr, [[1, 2], [3, 4]])


def test_xyz_roundtrip_and_orders():
    rng = np.random.default_rng(9)
    arr = np.round(rng.random((5, 7)) * 50, 3)
    gt = (500.0, 10.0, 0.0, 800.0, 0.0, -10.0)
    txt = write_xyz(arr, gt, precision=3)
    back, gt2 = read_xyz(txt)
    np.testing.assert_allclose(back, arr, atol=1e-9)
    np.testing.assert_allclose(gt2, gt, atol=1e-9)
    # shuffled lines: grid reconstruction is order-independent
    lines = txt.strip().splitlines()
    rng.shuffle(lines)
    back2, _ = read_xyz("\n".join(lines))
    np.testing.assert_allclose(back2, arr, atol=1e-9)
    # header line + comma separators accepted
    back3, _ = read_xyz("X,Y,Z\n" + "\n".join(
        ln.replace(" ", ",") for ln in lines))
    np.testing.assert_allclose(back3, arr, atol=1e-9)


def test_xyz_irregular_raises():
    with pytest.raises(ValueError):
        read_xyz("0 0 1\n1 0 2\n3 0 3\n0 1 1\n1 1 2\n3 1 3\n"
                 "0 3 1\n1 3 2\n3 3 3\n")


def test_open_raster_dispatch(tmp_path):
    from gdal_ray.sources.raster_open import open_raster

    arr = np.arange(12, dtype=np.int32).reshape(3, 4)
    p = tmp_path / "g.asc"
    p.write_text(write_aaigrid(arr, (0, 1, 0, 3, 0, -1)))
    (tmp_path / "g.prj").write_text(
        'GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]]')
    r = open_raster(str(p))
    assert r["driver"] == "AAIGrid" and r["epsg"] == 4326
    np.testing.assert_array_equal(r["pixels"], arr)

    q = tmp_path / "g.xyz"
    q.write_text(write_xyz(arr.astype(float), (0, 1, 0, 3, 0, -1)))
    r2 = open_raster(str(q))
    assert r2["driver"] == "XYZ"
    np.testing.assert_allclose(r2["pixels"], arr)
    np.testing.assert_allclose(r2["gt"], (0, 1, 0, 3, 0, -1))
