"""GFF / COASP / AIRSAR / JAXA PALSAR drivers over synthesized
in-format fixtures (the reference autotests download their data)."""
import numpy as np
import pytest

from gdal_ray.sources.sar_formats import (
    _airsar_stokes, read_airsar, read_coasp, read_gff, read_palsar,
    write_airsar, write_coasp, write_gff, write_palsar)


def _rng():
    return np.random.default_rng(7)


# ------------------------------------------------------------------ GFF
def test_gff_byte_roundtrip():
    px = _rng().integers(0, 255, (5, 9)).astype(np.uint8)
    rd = read_gff(write_gff(px))
    assert rd["driver"] == "GFF"
    assert rd["pixels"].dtype == np.uint8
    assert np.array_equal(rd["pixels"], px)


def test_gff_cfloat_roundtrip():
    rng = _rng()
    px = (rng.normal(size=(4, 6)) +
          1j * rng.normal(size=(4, 6))).astype(np.complex64)
    rd = read_gff(write_gff(px))
    # complex GFF lists 2x range count (gff_dataset.cpp:274-287)
    assert rd["pixels"].shape == (4, 6)
    assert np.allclose(rd["pixels"], px)


def test_gff_cint16():
    px = (np.arange(12).reshape(3, 4) -
          1j * np.arange(12).reshape(3, 4)).astype(np.complex64)
    rd = read_gff(write_gff(px, image_type=1))
    assert np.allclose(rd["pixels"], px)


def test_gff_rejects():
    with pytest.raises(ValueError):
        read_gff(b"NOTGSAT" + b"\x00" * 100)


# ---------------------------------------------------------------- COASP
def test_coasp_quad_pol(tmp_path):
    rng = _rng()
    chans = {c: (rng.normal(size=(3, 5)) +
                 1j * rng.normal(size=(3, 5))).astype(np.complex64)
             for c in ("hh", "hv", "vh", "vv")}
    hdr = write_coasp(str(tmp_path), "scene_hh_l1", chans)
    rd = read_coasp(hdr)
    assert rd["driver"] == "COASP"
    assert rd["poles"] == ["hh", "hv", "vh", "vv"]
    assert rd["metadata"]["MATRIX_REPRESENTATION"] == "SCATTERING"
    assert np.allclose(rd["pixels"][:, :, 1], chans["hv"], atol=1e-6)


def test_coasp_single_pol(tmp_path):
    chans = {"hh": np.full((2, 3), 1 - 2j, np.complex64)}
    rd = read_coasp(write_coasp(str(tmp_path), "x_hh_y", chans))
    assert rd["poles"] == ["hh"]
    assert rd["pixels"].shape == (2, 3)
    assert "MATRIX_REPRESENTATION" not in rd["metadata"]


# --------------------------------------------------------------- AIRSAR
def test_airsar_stokes_decode():
    # hand-check one pixel against airsardataset.cpp:324-334
    b = np.array([[2, 100, 50, -30, 10, 5, -8, 60, 7, -20]], np.int8)
    M = _airsar_stokes(b)[0]
    m11 = (100 / 254.0 + 1.5) * 4.0
    assert np.isclose(M[0], m11)
    assert np.isclose(M[1], 50 * m11 / 127.0)
    assert np.isclose(M[2], -30 * 30 * m11 / (127 * 127))
    assert np.isclose(M[6], 60 * m11 / 127)       # M33
    assert np.isclose(M[9], M[0] - M[6] - M[8])   # M22 identity


def test_airsar_bands(tmp_path):
    rng = _rng()
    stokes = rng.integers(-100, 100, (4, 7, 10)).astype(np.int8)
    stokes[..., 0] = np.abs(stokes[..., 0]) % 5   # tame the exponent
    data = write_airsar(stokes)
    rd = read_airsar(data)
    assert rd["driver"] == "AirSAR"
    assert rd["pixels"].shape == (4, 7, 6)
    md = rd["metadata"]
    assert md["MATRIX_REPRESENTATION"] == "SYMMETRIZED_COVARIANCE"
    assert md["MH_NUMBER_OF_SAMPLES_PER_RECORD"] == "7"
    # C11 = M11+M22+2*M12 with zero imaginary part
    M = _airsar_stokes(stokes.reshape(-1, 10)).reshape(4, 7, 10)
    c11 = M[..., 0] + M[..., 9] + 2 * M[..., 1]
    assert np.allclose(rd["pixels"][..., 0].real, c11, rtol=1e-6)
    assert np.all(rd["pixels"][..., 0].imag == 0)
    # C33 = M11+M22-2*M12
    c33 = M[..., 0] + M[..., 9] - 2 * M[..., 1]
    assert np.allclose(rd["pixels"][..., 5].real, c33, rtol=1e-6)


def test_airsar_rejects():
    with pytest.raises(ValueError):
        read_airsar(b"RECORD LENGTH IN BYTES = 70".ljust(800))  # no JPL


# --------------------------------------------------------------- PALSAR
def test_palsar_level11_quad(tmp_path):
    rng = _rng()
    chans = {p: (rng.normal(size=(5, 6)) +
                 1j * rng.normal(size=(5, 6))).astype(np.complex64)
             for p in ("HH", "HV", "VH", "VV")}
    vol = write_palsar(str(tmp_path), "P123456789", chans)
    rd = read_palsar(vol)
    assert rd["driver"] == "JAXAPALSAR"
    assert rd["poles"] == ["HH", "HV", "VH", "VV"]
    assert rd["metadata"]["PRODUCT_LEVEL"] == "1.1"
    assert rd["metadata"]["MATRIX_REPRESENTATION"] == "SCATTERING"
    # line 0 is the reference's record-offset quirk (reads as zeros);
    # all other lines round-trip
    assert np.allclose(rd["pixels"][1:, :, 0], chans["HH"][1:], atol=1e-6)
    assert np.all(rd["pixels"][0, :, 0] == 0)


def test_palsar_level15_gcps(tmp_path):
    rng = _rng()
    chans = {"HH": rng.integers(0, 60000, (6, 4)).astype(np.uint16)}
    vol = write_palsar(str(tmp_path), "P000011111", chans, level="1.5")
    rd = read_palsar(vol)
    assert rd["metadata"]["PRODUCT_LEVEL"] == "1.5"
    assert rd["metadata"]["PROJECTION_NAME"].startswith("UTM")
    assert len(rd["gcps"]) == 4
    assert rd["gcps"][0]["y"] == 50.1 and rd["gcps"][0]["x"] == 8.1
    # the reference's line-count-for-pixel quirk, reproduced
    assert rd["gcps"][1]["pixel"] == 6 - 0.5
    assert np.array_equal(rd["pixels"][1:], chans["HH"][1:])


def test_palsar_rejects_level10(tmp_path):
    import os
    import struct

    d = str(tmp_path)
    vol = os.path.join(d, "VOL-ALPSRP0")
    with open(vol, "wb") as f:
        b = bytearray(720)
        b[60:62] = b"AL"
        f.write(bytes(b))
    head = bytearray(720)
    head[216:220] = b"   8"
    head[220:224] = b"   2"
    head[186:192] = b"   428"
    head[236:244] = b"       2"
    with open(os.path.join(d, "IMG-HH-ALPSRP0"), "wb") as f:
        f.write(bytes(head) + b"\x00" * 1000)
    with pytest.raises(ValueError, match="Level 1.0"):
        read_palsar(vol)


# ------------------------------------------------------- unified open
def test_sar_via_raster_open(tmp_path):
    import os

    from gdal_ray.sources.raster_open import open_raster

    px = _rng().integers(0, 255, (3, 4)).astype(np.uint8)
    p = tmp_path / "img.gff"
    p.write_bytes(write_gff(px))
    assert open_raster(str(p))["driver"] == "GFF"

    stokes = np.ones((2, 3, 10), np.int8)
    p2 = tmp_path / "airsar_scene.dat"
    p2.write_bytes(write_airsar(stokes))
    assert open_raster(str(p2))["driver"] == "AirSAR"

    chans = {"hh": np.zeros((2, 2), np.complex64)}
    hdr = write_coasp(str(tmp_path), "c_hh_x", chans)
    assert open_raster(hdr)["driver"] == "COASP"

    chans11 = {"HH": np.zeros((3, 2), np.complex64)}
    vol = write_palsar(str(tmp_path), "P5", chans11)
    assert open_raster(vol)["driver"] == "JAXAPALSAR"
