"""COSAR + TSX product drivers over synthesized in-format fixtures
(the reference's own autotests download their data; the wire format
here follows frmts/cosar/cosar_dataset.cpp and
frmts/tsx/tsxdataset.cpp directly)."""
import os
import struct

import numpy as np
import pytest

from gdal_ray.sources.cosar import (is_tsx, read_cosar, read_tsx,
                                    write_cosar)


def _rng():
    return np.random.default_rng(42)


def test_cosar_roundtrip_v1():
    rng = _rng()
    arr = (rng.integers(-2000, 2000, (7, 11)) +
           1j * rng.integers(-2000, 2000, (7, 11))).astype(np.complex64)
    data = write_cosar(arr, version=1)
    rd = read_cosar(data)
    assert rd["driver"] == "COSAR" and rd["version"] == 1
    assert rd["pixels"].shape == (7, 11)
    assert np.array_equal(rd["pixels"], arr)


def test_cosar_validity_mask():
    arr = np.full((4, 8), 100 + 50j, np.complex64)
    rsfv = np.array([1, 3, 2, 1])
    rslv = np.array([8, 6, 8, 4])
    rd = read_cosar(write_cosar(arr, rsfv=rsfv, rslv=rslv))
    px = rd["pixels"]
    # samples outside [RSFV, RSLV] are zeroed (cosar_dataset.cpp:110)
    assert np.all(px[1, :2] == 0) and np.all(px[1, 6:] == 0)
    assert np.all(px[1, 2:6] == 100 + 50j)
    assert np.all(px[3, 4:] == 0)
    assert np.array_equal(rd["rsfv"], rsfv) and np.array_equal(
        rd["rslv"], rslv)


def test_cosar_v2_half_float():
    arr = (np.arange(12).reshape(3, 4) * 0.25 -
           1j * np.arange(12).reshape(3, 4)).astype(np.complex64)
    rd = read_cosar(write_cosar(arr, version=2))
    assert rd["version"] == 2
    assert np.allclose(rd["pixels"], arr, atol=1e-2)


def test_cosar_rejects_garbage():
    with pytest.raises(ValueError):
        read_cosar(b"\x00" * 64)
    # bad RSFV/RSLV
    arr = np.ones((2, 4), np.complex64)
    data = bytearray(write_cosar(arr))
    rtnb = struct.unpack(">I", data[20:24])[0]
    struct.pack_into(">II", data, rtnb * 4, 3, 2)   # rslv < rsfv
    with pytest.raises(ValueError, match="not sane"):
        read_cosar(bytes(data))


def _make_tsx(tmp_path, variant="SSC", with_georef=True, n_pol=2):
    from gdal_ray.sources.cosar import synth_tsx_product

    return synth_tsx_product(tmp_path, variant, with_georef, n_pol)


def test_tsx_product(tmp_path):
    path, arrs = _make_tsx(tmp_path)
    assert is_tsx(path)
    rd = read_tsx(path)
    assert rd["driver"] == "TSX"
    assert rd["poles"] == ["HH", "VV"]
    assert rd["pixels"].shape == (6, 9, 2)
    assert np.array_equal(rd["pixels"][:, :, 0], arrs[0])
    assert np.array_equal(rd["pixels"][:, :, 1], arrs[1])
    md = rd["metadata"]
    assert md["PRODUCT_VARIANT"] == "SSC"
    assert md["ORBIT_DIRECTION"] == "ASCENDING"
    assert md["IMAGE_TYPE"] == "COMPLEX"
    assert md["ROW_SPACING"] == "1.8"
    # georef grid wins: 4 GCPs from GEOREF.xml
    assert len(rd["gcps"]) == 4
    g = rd["gcps"][1]
    assert (g["pixel"], g["line"]) == (8.0, 0.0)
    assert (g["x"], g["y"], g["z"]) == (8.08, 50.0, 120.0)
    assert rd["gcp_epsg"] == 4326


def test_tsx_ssc_corner_gcp_fallback(tmp_path):
    path, _ = _make_tsx(tmp_path, with_georef=False)
    rd = read_tsx(path)
    # sceneCenterCoord + 2 sceneCornerCoord at sceneAverageHeight
    assert len(rd["gcps"]) == 3
    assert all(g["z"] == 118.5 for g in rd["gcps"])
    assert rd["gcps"][0]["pixel"] == 4.0 and rd["gcps"][0]["line"] == 3.0


def test_tsx_scattering_matrix(tmp_path):
    path, _ = _make_tsx(tmp_path, n_pol=4)
    rd = read_tsx(path)
    assert rd["metadata"]["MATRIX_REPRESENTATION"] == "SCATTERING"
    assert rd["pixels"].shape[2] == 4


def test_tsx_via_raster_open(tmp_path):
    from gdal_ray.sources.raster_open import open_raster

    path, arrs = _make_tsx(tmp_path)
    rd = open_raster(path)
    assert rd["driver"] == "TSX"
    # bare .cos through open_raster too
    cos = os.path.join(path, "IMAGEDATA", "IMAGE_HH_SRA_spot_042.cos")
    rc = open_raster(cos)
    assert rc["driver"] == "COSAR"
    assert np.array_equal(rc["pixels"], arrs[0])


def test_tsx_rejects_non_tsx(tmp_path):
    p = tmp_path / "NOT_A_PRODUCT.xml"
    p.write_text("<level1Product/>")
    with pytest.raises(ValueError):
        read_tsx(str(p))
