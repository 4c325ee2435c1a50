"""DTED / SRTMHGT / SAGA terrain drivers vs the reference's own
fixtures (autotest/gdrivers/dted.py, srtmhgt.py, saga.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.terrain import (read_dted, read_saga, read_srtmhgt,
                                      srtmhgt_name, write_dted, write_saga,
                                      write_srtmhgt)

DTED0 = "/root/reference/autotest/gdrivers/data/n43.dt0"
SAGA = "/root/reference/autotest/gdrivers/data/saga"


def _cs(px):
    return checksum_image(np.asarray(px, np.float64))


@pytest.fixture(scope="module")
def n43():
    with open(DTED0, "rb") as fh:
        return read_dted(fh.read())


def test_dted_n43_golden(n43):
    # dted.py test_dted_1/2: checksum 49187 + exact geotransform
    px, gt = n43
    assert px.shape == (121, 121) and px.dtype == np.int16
    assert _cs(px) == 49187
    assert gt == pytest.approx((-80.004166666666663, 0.0083333333333333,
                                0, 44.00416666666667, 0,
                                -0.0083333333333333), abs=1e-6)


def test_dted_write_read_roundtrip(n43):
    px, gt = n43
    out = write_dted(px, -80.0, 43.0)
    px2, gt2 = read_dted(out)
    assert np.array_equal(px, px2)
    assert gt2 == pytest.approx(gt, abs=1e-9)


def test_dted_sign_magnitude():
    # negative elevations are SIGN-MAGNITUDE on disk (dted_api.c)
    rng = np.random.default_rng(2)
    elev = rng.integers(-500, 4000, (121, 121), dtype=np.int16)
    out = write_dted(elev, 10.0, 50.0)
    back, _ = read_dted(out)
    assert np.array_equal(back, elev)
    assert (elev < 0).any()


def test_srtmhgt_roundtrip_and_georef(n43):
    # srtmhgt.py builds its fixture from n43.dt0 (1-degree tile);
    # same pixels through SRTMHGT must keep checksum + georef
    px, gt = n43
    data = write_srtmhgt(px)
    px2, gt2 = read_srtmhgt(data, srtmhgt_name(43, -80))
    assert np.array_equal(px, px2)
    assert _cs(px2) == 49187
    assert gt2 == pytest.approx(gt, abs=1e-12)


def test_srtmhgt_name_forms():
    assert srtmhgt_name(43, -80) == "N43W080.hgt"
    assert srtmhgt_name(-1, 3) == "S01E003.hgt"
    with pytest.raises(ValueError):
        read_srtmhgt(b"\0" * 8, "noname.hgt")


def test_saga_golden():
    # saga.py test_saga_1: 4byteFloat checksum 108; header semantics
    with open(f"{SAGA}/4byteFloat.sgrd") as fh:
        hdr = fh.read()
    with open(f"{SAGA}/4byteFloat.sdat", "rb") as fh:
        sdat = fh.read()
    px, gt, nodata = read_saga(hdr, sdat)
    assert px.shape == (10, 10) and px.dtype == np.float32
    assert _cs(px) == 108
    # POSITION_XMIN/ YMIN are cell centers => corner gt
    assert gt == pytest.approx((328.3, 10.0, 0.0, 650.5, 0.0, -10.0))
    assert nodata == -99999.0


def test_saga_writer_roundtrip():
    rng = np.random.default_rng(9)
    px = (rng.random((6, 9)) * 50 - 10).astype(np.float32)
    gt = (100.0, 5.0, 0.0, 400.0, 0.0, -5.0)
    hdr, sdat = write_saga(px, gt)
    back, gt2, nd = read_saga(hdr, sdat)
    assert np.array_equal(back, px)
    assert gt2 == pytest.approx(gt) and nd == -99999.0


def test_open_raster_probe(tmp_path, n43):
    from gdal_ray.sources.raster_open import open_raster

    px, gt = n43
    p = tmp_path / "n43.dt0"
    with open(DTED0, "rb") as fh:
        p.write_bytes(fh.read())
    r = open_raster(str(p))
    assert r["driver"] == "DTED" and r["epsg"] == 4326
    assert np.array_equal(r["pixels"], px)

    hp = tmp_path / "N43W080.hgt"
    hp.write_bytes(write_srtmhgt(px))
    r = open_raster(str(hp))
    assert r["driver"] == "SRTMHGT" and np.array_equal(r["pixels"], px)

    hdr, sdat = write_saga(px.astype(np.float32), gt)
    (tmp_path / "t.sdat").write_bytes(sdat)
    (tmp_path / "t.sgrd").write_text(hdr)
    r = open_raster(str(tmp_path / "t.sdat"))
    assert r["driver"] == "SAGA"
    assert np.array_equal(r["pixels"], px.astype(np.float32))
