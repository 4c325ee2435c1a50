"""MSGN (Meteosat native) reader over synthesized products
(reference autotest data is download-only; parity per frmts/msgn)."""
import numpy as np
import pytest

from gdal_ray.sources.msgn import (_pack10, _unpack10, read_msgn,
                                   write_msgn)


def _rng():
    return np.random.default_rng(5)


def test_pack10_roundtrip():
    v = _rng().integers(0, 1024, 77).astype(np.uint16)
    assert np.array_equal(_unpack10(_pack10(v), 77), v)


def test_visir_roundtrip():
    rng = _rng()
    chans = {1: rng.integers(0, 1023, (6, 16)).astype(np.uint16),
             4: rng.integers(0, 1023, (6, 16)).astype(np.uint16),
             9: rng.integers(0, 1023, (6, 16)).astype(np.uint16)}
    rd = read_msgn(write_msgn(chans))
    assert rd["driver"] == "MSGN"
    assert rd["channels"] == [1, 4, 9]
    assert rd["pixels"].shape == (6, 16, 3)
    for i, ch in enumerate([1, 4, 9]):
        assert np.array_equal(rd["pixels"][:, :, i], chans[ch])
    assert rd["metadata"]["SHAPE"] == "WHOLE_DISK"
    assert rd["metadata"]["Date/Time"] == "20260101/12:30"


def test_rad_mode_calibration():
    rng = _rng()
    chans = {4: rng.integers(0, 1023, (4, 8)).astype(np.uint16)}
    cal = {4: (0.01, -0.5)}
    rd = read_msgn(write_msgn(chans, calibration=cal), mode="RAD")
    assert rd["pixels"].dtype == np.float64
    assert np.allclose(rd["pixels"], chans[4] * 0.01 - 0.5)
    assert rd["metadata"]["ch04_cal"].startswith("-5.0")


def test_rad_mode_skips_non_thermal():
    rng = _rng()
    # channel 4 is thermal (Blackbody LUT), channel 11 is thermal,
    # channel 1 is VIS (kept in RAD per i<=2)
    chans = {1: rng.integers(0, 1023, (3, 8)).astype(np.uint16),
             4: rng.integers(0, 1023, (3, 8)).astype(np.uint16)}
    rd = read_msgn(write_msgn(chans), mode="RAD")
    assert rd["channels"] == [1, 4]


def test_rad_mode_keeps_channel_11():
    # channel 11 (IR13.4) has B=0.9981 in the reference's
    # Blackbody_LUT (msg_reader_core.cpp:52) and must survive the RAD
    # gate; a prior off-by-one read the HRV zero slot and dropped it.
    rng = _rng()
    chans = {4: rng.integers(0, 1023, (3, 8)).astype(np.uint16),
             11: rng.integers(0, 1023, (3, 8)).astype(np.uint16)}
    cal = {4: (0.01, -0.5), 11: (0.02, 1.0)}
    rd = read_msgn(write_msgn(chans, calibration=cal), mode="RAD")
    assert rd["channels"] == [4, 11]
    assert np.allclose(rd["pixels"][:, :, 1], chans[11] * 0.02 + 1.0)


def test_geotransform_and_origin():
    chans = {1: np.zeros((4, 8), np.uint16)}
    rd = read_msgn(write_msgn(chans, line_start=100, col_start=50))
    gt = rd["gt"]
    # msgndataset.cpp:668-683 with 3 km steps
    assert gt[1] == -3000.0 and gt[5] == 3000.0
    assert gt[0] == 3000.0 * (-(3712 / 2.0) + 50 - 1) * -1
    assert rd["metadata"]["Origin"] == "100 50"


def test_line_validity_nodata():
    chans = {1: np.full((3, 8), 7, np.uint16)}
    data = bytearray(write_msgn(chans))
    # find the second line's packet and zero its validity byte
    from gdal_ray.sources.msgn import (GP_PK_HEADER_SIZE, GP_PK_SH1_SIZE,
                                       MAIN_HEADER_SIZE, RADIOMETRIC_OFFSET,
                                       SEC_HEADER_SIZE, SUB_VISIRLINE_SIZE)
    bpl = 10
    pkt = (bpl + GP_PK_SH1_SIZE + SUB_VISIRLINE_SIZE - 1) + \
        GP_PK_HEADER_SIZE + 1
    f_data = MAIN_HEADER_SIZE + SEC_HEADER_SIZE + (
        RADIOMETRIC_OFFSET + GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 1 + 264)
    data[f_data + pkt + GP_PK_HEADER_SIZE + GP_PK_SH1_SIZE + 24] = 0
    rd = read_msgn(bytes(data))
    assert np.all(rd["pixels"][0] == 7)
    assert np.all(rd["pixels"][1] == 0)     # VISIR nodata
    assert np.all(rd["pixels"][2] == 7)


def test_hrv_documented_subset():
    chans = {1: np.zeros((2, 8), np.uint16)}
    with pytest.raises(NotImplementedError):
        read_msgn(write_msgn(chans), mode="HRV")


def test_rejects_non_native():
    with pytest.raises(ValueError):
        read_msgn(b"NOT A NATIVE FILE" + b" " * 4000)
