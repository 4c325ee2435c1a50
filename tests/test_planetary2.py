"""Conformance for the second classic-format batch — Surfer grids,
Idrisi RST, CTG, BYN, ISIS3, VICAR, PCIDSK. Every expectation is the
reference's OWN published value (autotest/gdrivers/{gsg,idrisi,ctg,
byn,isis,vicar,pcidsk}.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.raster_open import open_raster

D = "/root/reference/autotest/gdrivers/data"


def _b1(px):
    return px if px.ndim == 2 else px[:, :, 0]


def test_surfer_goldens():
    for f, drv in (("gsg_binary.grd", "GSBG"), ("gsg_7binary.grd",
                                                "GS7BG")):
        r = open_raster(f"{D}/gsg/{f}")
        assert r["driver"] == drv
        assert checksum_image(_b1(r["pixels"])) == 4672
        # both fixtures re-encode byte.tif: exact grid georef
        assert r["gt"] == pytest.approx(
            (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))


def test_surfer_gsag_and_roundtrip():
    from gdal_ray.sources.surfer import read_surfer, write_gsbg

    a = np.arange(35, dtype=np.float32).reshape(5, 7)
    gt = (100.0, 10.0, 0.0, 500.0, 0.0, -10.0)
    b, gt2, _ = read_surfer(write_gsbg(a, gt))
    assert np.array_equal(a, b) and gt2 == gt
    txt = b"DSAA\n7 5\n105 165\n455 495\n0 34\n" + \
        b"\n".join(b" ".join(str(v).encode() for v in row)
                   for row in a[::-1]) + b"\n"
    c, gt3, _ = read_surfer(txt)
    assert np.array_equal(a, c) and gt3 == pytest.approx(gt)


def test_rst_goldens():
    r = open_raster(f"{D}/rst/byte.rst")
    assert r["driver"] == "RST"
    assert checksum_image(_b1(r["pixels"])) == 5044
    r = open_raster(f"{D}/rst/real.rst")
    assert checksum_image(_b1(r["pixels"])) == 5275
    assert r["pixels"].dtype == np.float32


def test_rst_roundtrip(tmp_path):
    from gdal_ray.sources.rawlegacy import read_rst, write_rst

    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (11, 13)).astype(np.uint8)
    p = str(tmp_path / "rt.rst")
    write_rst(p, a, (10.0, 2.0, 0.0, 50.0, 0.0, -2.0))
    b, gt, rdc = read_rst(p)
    assert np.array_equal(a, b)
    assert gt == pytest.approx((10.0, 2.0, 0.0, 50.0, 0.0, -2.0))


def test_ctg_golden():
    r = open_raster(f"{D}/ctg/fake_grid_cell")
    assert r["driver"] == "CTG"
    assert r["pixels"].shape == (558, 789, 6)
    assert checksum_image(r["pixels"][:, :, 0]) == 21
    assert r["epsg"] == 32614


def test_byn_golden():
    r = open_raster(f"{D}/byn/cgg2013ai08_reduced.byn")
    assert r["driver"] == "BYN"
    assert checksum_image(_b1(r["pixels"])) == 64764
    assert r["scale"] == pytest.approx(0.001)


def test_isis3_goldens():
    r = open_raster(f"{D}/isis3/isis3_detached.lbl")
    assert r["driver"] == "ISIS3"
    assert checksum_image(_b1(r["pixels"])) == 9978
    assert r["gt"] == pytest.approx(
        (-4766.9649842452, 10.1025, 0.0, -872623.62882223, 0.0, -10.1025))
    r = open_raster(f"{D}/isis3/isis3_unit_test.cub")  # tiled SignedWord
    assert checksum_image(_b1(r["pixels"])) == 42403
    assert r["offset"] == pytest.approx(8190.1245134999)
    assert r["scale"] == pytest.approx(0.25006486667989)
    assert r["nodata"] == -32768


VICAR_CASES = [
    ("vicar_byte", 129), ("vicar_int16", 129),
    ("vicar_bigendian_int16", 129), ("vicar_int32", 129),
    ("vicar_float32_bsq", 123), ("vicar_float32_bil", 123),
    ("vicar_float32_bip", 123), ("vicar_bigendian_float32", 129),
    ("vicar_float64", 129), ("vicar_cfloat32", 148),
    ("vicar_vax_float32", 129), ("vicar_vax_float64", 129),
    ("vicar_vax_cfloat32", 226),
]


@pytest.mark.parametrize("fname,cs", VICAR_CASES,
                         ids=[c[0] for c in VICAR_CASES])
def test_vicar_read_datatypes(fname, cs):
    # autotest/gdrivers/vicar.py read_datatypes_lists, incl. VAX floats
    r = open_raster(f"{D}/vicar/{fname}.vic")
    assert r["driver"] == "VICAR"
    assert checksum_image(_b1(r["pixels"])) == cs


def test_pcidsk_golden():
    r = open_raster(f"{D}/pcidsk/utm.pix")
    assert r["driver"] == "PCIDSK"
    assert checksum_image(_b1(r["pixels"])) == 39576
    with pytest.raises(NotImplementedError):
        open_raster(f"{D}/pcidsk/tile_v2.pix")
