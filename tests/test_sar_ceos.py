"""SAR_CEOS driver vs the reference's own autotest fixtures
(autotest/gdrivers/data/sar_ceos/ — the only SAR driver with local
reference data; the autotest itself only checks the open succeeds)."""
import os
import zlib

import numpy as np
import pytest

from gdal_ray.sources.sar_ceos import is_sar_ceos, read_sar_ceos

DIR = "/root/reference/autotest/gdrivers/data/sar_ceos"
OTTAWA = os.path.join(DIR, "ottawa_patch.img")
R1 = os.path.join(DIR, "R1_26161_FN1_F164.D")

pytestmark = pytest.mark.skipif(
    not os.path.exists(OTTAWA), reason="reference fixture unavailable")


def test_identify():
    assert is_sar_ceos(OTTAWA)
    assert is_sar_ceos(R1)
    assert not is_sar_ceos("/etc/hostname")


def test_ottawa_patch():
    rd = read_sar_ceos(OTTAWA)
    assert rd["driver"] == "SAR_CEOS"
    px = rd["pixels"]
    # autotest test_sar_ceos_app_1 opens this as 1790x1827 UInt16
    assert px.shape == (1827, 1790)
    assert px.dtype == np.uint16
    md = rd["metadata"]
    assert md["CEOS_DATA_TYPE"] == "IU2"
    assert md["CEOS_PREFIX_BYTES"] == "180"
    # the patch file carries 4 complete scanlines
    assert md["CEOS_LINES_AVAILABLE"] == "4"
    assert int(np.asarray(px, np.float64).sum()) == 60028
    assert zlib.crc32(np.ascontiguousarray(px).tobytes()) == 2388598532


def test_ottawa_prefix_gcps():
    rd = read_sar_ceos(OTTAWA)
    gcps = rd["gcps"]
    # first scanline's first/mid/last prefix GCPs — real Ottawa coords
    assert len(gcps) == 3
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    assert gcps[0] ["y"] == pytest.approx(45.464488)
    assert gcps[0]["x"] == pytest.approx(-75.898831)
    assert gcps[1]["pixel"] == 895.0
    assert gcps[2]["pixel"] == 1790 - 0.5
    assert rd["gcp_epsg"] == 4326


def test_radarsat_r1():
    rd = read_sar_ceos(R1)
    px = rd["pixels"]
    # autotest test_sar_ceos_asf_2: 8192x8192 Byte with .L leader
    assert px.shape == (8192, 8192)
    assert px.dtype == np.uint8
    md = rd["metadata"]
    assert md["CEOS_DATA_TYPE"] == "IU1"
    assert md["CEOS_PREFIX_BYTES"] == "192"
    assert md["CEOS_LEADER_FILE"] == "R1_26161_FN1_F164.L"
    assert md["CEOS_LEADER_RECORDS"] == "10"
    assert md["CEOS_LINES_AVAILABLE"] == "3"
    assert int(np.asarray(px, np.float64).sum()) == 834801
    assert zlib.crc32(np.ascontiguousarray(px).tobytes()) == 2853617683


def test_via_raster_open():
    from gdal_ray.sources.raster_open import open_raster

    rd = open_raster(OTTAWA)
    assert rd["driver"] == "SAR_CEOS"


def test_rejects_garbage(tmp_path):
    p = tmp_path / "x.img"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_sar_ceos(str(p))
