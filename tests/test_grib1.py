"""GRIB edition-1 reader vs the reference's own fixtures
(autotest/gdrivers/grib.py expectations)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.grib1 import (NODATA, UNDEFINED, _ibm_float,
                                    read_grib1, split_grib_messages)

G = "/root/reference/autotest/gdrivers/data/grib"


def _rd(name):
    with open(f"{G}/{name}", "rb") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def quikscat():
    return read_grib1(_rd("Sample_QuikSCAT.grb"))


def test_quikscat_band4_golden(quikscat):
    # grib.py test_grib_2: band 4 checksum 50714
    bands, gt, metas = quikscat
    assert len(bands) == 4 and bands[3].shape == (74, 66)
    assert checksum_image(bands[3]) == 50714


def test_quikscat_nodata_rules(quikscat):
    # band 1 nodata is 9999 (the test's GetNoDataValue check); band 4
    # spans 9999 so the missing value stays degrib's 9.999e20
    _bands, _gt, metas = quikscat
    assert metas[0]["nodata"] == NODATA
    assert metas[3]["nodata"] == UNDEFINED


def test_quikscat_grid(quikscat):
    bands, gt, metas = quikscat
    assert metas[0]["grid_type"] == 0  # lat/lon
    assert gt[1] == pytest.approx(0.333, abs=1e-9)
    assert gt[5] == pytest.approx(-0.333, abs=1e-9)


def test_bug3246_mixed_sizes_band4_golden():
    # grib.py test_grib_read_different_sizes_messages: checksum 4081
    # with smaller messages placed top-left zero-padded
    bands, gt, metas = read_grib1(_rd("bug3246.grb"))
    assert len(bands) == 12
    assert bands[0].shape == (78, 103)
    assert all(b.shape == (78, 103) for b in bands)
    assert metas[3]["ni"] == 28 and metas[3]["nj"] == 21  # native size
    assert checksum_image(bands[3]) == 4081


def test_ibm_float():
    # IBM/360 single: 0x42 0x64 0x00 0x00 = 16^2 * (0x640000/2^24) = 100
    assert _ibm_float(bytes([0x42, 0x64, 0x00, 0x00]), 0) == 100.0
    assert _ibm_float(bytes([0xC2, 0x64, 0x00, 0x00]), 0) == -100.0
    assert _ibm_float(bytes([0x00, 0x00, 0x00, 0x00]), 0) == 0.0


def test_message_splitting():
    msgs = split_grib_messages(_rd("Sample_QuikSCAT.grb"))
    assert len(msgs) == 4
    assert all(m[:4] == b"GRIB" and m[7] == 1 for m in msgs)


def test_grib2_raises():
    data = b"GRIB" + b"\x00\x00\x30" + b"\x02" + b"\x00" * 40
    with pytest.raises(NotImplementedError, match="edition 2"):
        split_grib_messages(data)


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import open_raster

    p = tmp_path / "q.grb"
    p.write_bytes(_rd("Sample_QuikSCAT.grb"))
    r = open_raster(str(p))
    assert r["driver"] == "GRIB" and r["pixels"].shape == (74, 66, 4)
    assert checksum_image(r["pixels"][:, :, 3]) == 50714
