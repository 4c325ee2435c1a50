"""Classic netCDF (CDF-1/2/5) driver vs the reference's own fixtures
(autotest/gdrivers/data/netcdf/*, autotest/gdrivers/netcdf.py
expected checksums and geotransforms)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.netcdf import (nc_list_variables, nc_variable,
                                     parse_nc_header, raster_from_nc,
                                     write_nc_classic)

DATA = "/root/reference/autotest/gdrivers/data/netcdf"


def _read(name: str) -> bytes:
    with open(f"{DATA}/{name}", "rb") as fh:
        return fh.read()


def test_byte_nc_golden():
    # netcdf.py test_netcdf_2 family: byte.tif copied to netCDF keeps
    # checksum 4672; NC_BYTE surfaces unsigned by default
    data = _read("byte.nc")
    arr, gt = raster_from_nc(data)
    assert arr.shape == (20, 20) and arr.dtype == np.uint8
    assert checksum_image(arr) == 4672
    assert gt == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_byte_nc3_golden_identical():
    # byte_nc3_golden.nc is the pinned gdal_translate FORMAT=NC output
    a1, gt1 = raster_from_nc(_read("byte.nc"))
    a2, gt2 = raster_from_nc(_read("byte_nc3_golden.nc"))
    assert np.array_equal(a1, a2) and gt1 == gt2


def test_bug636_tas_golden():
    # netcdf.py test_netcdf_1: NETCDF:"bug636.nc":tas -> checksum 31621
    arr, _gt = raster_from_nc(_read("bug636.nc"), "tas")
    assert arr.shape == (64, 128) and arr.dtype == np.float32
    assert checksum_image(arr.astype(np.float64)) == 31621


def test_trmm_2x2_gt_golden():
    # netcdf.py: trmm-2x2.nc geotransform must be exactly this
    _arr, gt = raster_from_nc(_read("trmm-2x2.nc"))
    assert gt == (-80.0, 0.25, 0.0, -19.5, 0.0, -0.25)


def test_cdf1_vs_cdf2_identical():
    # trmm-nc2.nc is the CDF-2 (64-bit offset) encoding of trmm.nc
    d1, d2 = _read("trmm.nc"), _read("trmm-nc2.nc")
    assert parse_nc_header(d1)["version"] == 1
    assert parse_nc_header(d2)["version"] == 2
    a1, gt1 = raster_from_nc(d1)
    a2, gt2 = raster_from_nc(d2)
    assert np.array_equal(a1, a2, equal_nan=True) and gt1 == gt2


def test_record_variable_window():
    # trmm.nc: pcp(time, latitude, longitude), time unlimited numrecs=1
    data = _read("trmm.nc")
    md = nc_variable(data, "pcp")
    assert md.dims == ("time", "latitude", "longitude")
    assert md.shape == (1, 40, 40)
    full = md.read()
    win = md.read((0, 10, 5), (1, 8, 12))
    assert np.array_equal(win, full[:, 10:18, 5:17], equal_nan=True)


def test_char_variable_not_picked():
    # 2d_dim_char_variable.nc holds ONLY a 2-D NC_CHAR variable; the
    # auto-pick must skip char variables and report no raster
    data = _read("2d_dim_char_variable.nc")
    assert nc_list_variables(data) == ["TIME"]
    with pytest.raises(ValueError, match="no raster variable"):
        raster_from_nc(data)


def test_byte_signedness_hint():
    # negative valid_range / _Unsigned=false keep NC_BYTE signed
    from gdal_ray.sources.netcdf import _byte_is_signed
    assert _byte_is_signed({"valid_range": [-128, 127]})
    assert _byte_is_signed({"_Unsigned": "false"})
    assert not _byte_is_signed({"_Unsigned": "true"})
    assert not _byte_is_signed({})


@pytest.mark.parametrize("dtype", ["u1", "i2", "i4", "f4", "f8"])
def test_writer_roundtrip(dtype):
    rng = np.random.default_rng(7)
    arr = (rng.random((13, 17)) * 100).astype(dtype)
    x = np.arange(17, dtype=np.float64) * 2.0 + 100.0
    y = np.arange(13, dtype=np.float64) * 3.0 + 50.0  # ascending: bottom-up
    data = write_nc_classic(
        {"x": (("x",), x), "y": (("y",), y),
         "Band1": (("y", "x"), arr[::-1])},  # south-up storage
        attrs={"Conventions": "CF-1.5"})
    hdr = parse_nc_header(data)
    assert hdr["version"] == 1 and dict(hdr["dims"])["x"] == 17
    back, gt = raster_from_nc(data, "Band1")
    assert np.array_equal(back.astype(arr.dtype), arr)
    # gt: corner-origin, dx=2, dy=-3, top row center at y.max()
    assert gt == pytest.approx((99.0, 2.0, 0.0, 50.0 + 12 * 3 + 1.5, 0.0, -3.0))


def test_writer_window_reads():
    arr = np.arange(20 * 30, dtype=np.float64).reshape(20, 30)
    data = write_nc_classic({"v": (("y", "x"), arr)})
    md = nc_variable(data, "v")
    assert np.array_equal(md.read((3, 7), (5, 11)), arr[3:8, 7:18])


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import open_raster
    p = tmp_path / "t.nc"
    arr = np.arange(36, dtype=np.float32).reshape(6, 6)
    p.write_bytes(write_nc_classic({"v": (("y", "x"), arr)}))
    r = open_raster(str(p))
    assert r["driver"] == "netCDF"
    # no coordinate vars -> default bottom-up flip, no gt
    assert np.array_equal(r["pixels"], arr[::-1]) and r["gt"] is None


def test_scale_offset_attrs():
    data = _read("trmm.nc") if False else None
    arr = np.ones((4, 4), np.int16)
    raw = write_nc_classic({"v": (("y", "x"), arr)})
    # hand-check attrs plumbing via nc_variable on a fixture with
    # scale_factor (GLMELT has none; use writer attrs path)
    md = nc_variable(raw, "v")
    assert md.attrs == {}
