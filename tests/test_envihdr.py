"""ENVI + ESRI EHdr raw-binary drivers vs the reference's own
fixtures (autotest/gdrivers/envi.py, ehdr.py expectations)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.envihdr import (parse_envi_header, read_ehdr,
                                      read_envi, write_ehdr, write_envi)

ENVI = "/root/reference/autotest/gdrivers/data/envi"
EHDR = "/root/reference/autotest/gdrivers/data/ehdr"


def _rd(p):
    with open(p, "rb") as fh:
        return fh.read()


def _rt(p):
    with open(p) as fh:
        return fh.read()


def _cs(px):
    return checksum_image(np.asarray(px, np.float64))


def test_envi_aea_golden():
    # envi.py test_envi_1: checksum 14823 + map-info geotransform
    px, gt, hdr = read_envi(_rt(f"{ENVI}/aea.hdr"), _rd(f"{ENVI}/aea.dat"))
    assert px.shape == (3, 434) and px.dtype == np.uint8
    assert _cs(px) == 14823
    assert gt == (-936408.178, 28.5, 0.0, 2423902.344, 0.0, -28.5)
    assert hdr["interleave"] == "bsq"


def test_envi_gzip_compressed():
    # envi.py test_envi_9: file compression = 1 payload is gzip
    a, gta, _ = read_envi(_rt(f"{ENVI}/aea.hdr"), _rd(f"{ENVI}/aea.dat"))
    b, gtb, _ = read_envi(_rt(f"{ENVI}/aea_compressed.hdr"),
                          _rd(f"{ENVI}/aea_compressed.dat"))
    assert np.array_equal(a, b) and gta == gtb


@pytest.mark.parametrize("il", ["bil", "bip", "bsq"])
def test_envi_rgbsmall_interleaves(il):
    # all three interleaves hold the same scene; band-1 checksum 20718
    # is the reference's own expectation (envi.py:424)
    px, gt, _ = read_envi(_rt(f"{ENVI}/envi_rgbsmall_{il}.hdr"),
                          _rd(f"{ENVI}/envi_rgbsmall_{il}.img"))
    assert px.shape == (49, 50, 3)
    assert _cs(px[:, :, 0]) == 20718
    assert gt[0] == pytest.approx(-44.84032)


def test_ehdr_float32_golden():
    # ehdr.py test_ehdr_3: checksum 27, PIXELTYPE FLOAT
    px, _gt, _nd = read_ehdr(_rt(f"{EHDR}/float32.hdr"),
                             _rd(f"{EHDR}/float32.bil"), ".bil")
    assert px.dtype == np.float32 and _cs(px) == 27


def test_ehdr_nbits_inferred_from_size():
    # ehdr.py test_ehdr_10: lowercase GridFloat header with no NBITS;
    # 4 bytes/pixel payload => Float32, checksum 8202
    px, gt, _ = read_ehdr(_rt(f"{EHDR}/ehdr10.hdr"),
                          _rd(f"{EHDR}/ehdr10.bil"), ".bil")
    assert px.dtype == np.float32 and _cs(px) == 8202
    assert gt == (-17973801.662435, 2500.0, 0.0,
                  2041811.701239 + 2 * 2500.0, 0.0, -2500.0)


def test_ehdr_flt_extension():
    # ehdr.py test_ehdr_11: .flt extension forces Float32
    px, _gt, _nd = read_ehdr(_rt(f"{EHDR}/ehdr11.hdr"),
                             _rd(f"{EHDR}/ehdr11.flt"), ".flt")
    assert px.dtype == np.float32 and _cs(px) == 8202


def test_ehdr_worldclim_negative_nodata_signed():
    # ehdr.py test_ehdr_9: NBITS 16 with negative NODATA => Int16
    px, gt, nd = read_ehdr(
        _rt(f"{EHDR}/wc_10m_CCCMA_A2a_2020_tmin_9.hdr"),
        _rd(f"{EHDR}/wc_10m_CCCMA_A2a_2020_tmin_9.bil"), ".bil")
    assert px.dtype == np.int16 and nd == -9999.0
    assert gt[0] == pytest.approx(-180.0) and gt[3] == pytest.approx(90.0)


def test_ehdr_pixeltype_signedint():
    px, _gt, _nd = read_ehdr(_rt(f"{EHDR}/int16_rat.hdr"),
                             _rd(f"{EHDR}/int16_rat.bil"), ".bil")
    assert px.dtype == np.int16


@pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
def test_envi_writer_roundtrip(il):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (9, 13, 3), dtype=np.uint8)
    gt = (10.0, 2.0, 0.0, 50.0, 0.0, -2.0)
    hdr, data = write_envi(arr, gt=gt, interleave=il)
    back, gt2, meta = read_envi(hdr, data)
    assert np.array_equal(back, arr) and gt2 == gt
    assert parse_envi_header(hdr)["interleave"] == il


def test_envi_writer_compressed_roundtrip():
    arr = (np.arange(48, dtype=np.float32) ** 1.5).reshape(6, 8)
    hdr, data = write_envi(arr, compress=True)
    back, _gt, _ = read_envi(hdr, data)
    assert np.array_equal(back, arr)


def test_ehdr_writer_roundtrip():
    arr = (np.arange(77, dtype=np.float32) * 0.5 - 9).reshape(7, 11)
    gt = (10.0, 2.0, 0.0, 50.0, 0.0, -2.0)
    hdr, data = write_ehdr(arr, gt=gt, nodata=-9.0)
    back, gt2, nd = read_ehdr(hdr, data)
    assert np.array_equal(back, arr) and gt2 == gt and nd == -9.0


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import open_raster

    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    hdr, data = write_envi(arr, gt=gt)
    (tmp_path / "a.img").write_bytes(data)
    (tmp_path / "a.hdr").write_text(hdr)
    r = open_raster(str(tmp_path / "a.img"))
    assert r["driver"] == "ENVI" and np.array_equal(r["pixels"], arr)
    assert r["gt"] == gt

    hdr, data = write_ehdr(arr.astype(np.int16), gt=gt)
    (tmp_path / "b.bil").write_bytes(data)
    (tmp_path / "b.hdr").write_text(hdr)
    r = open_raster(str(tmp_path / "b.bil"))
    assert r["driver"] == "EHdr" and np.array_equal(r["pixels"], arr)
