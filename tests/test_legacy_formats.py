"""Conformance for the round-3 classic-format batch — every
expectation below is the reference's OWN published value
(autotest/gdrivers/{jdem,terragen,leveller,gxf,lan,doq1,doq2,ers,fits,
usgsdem,pds,isis2}.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.raster_open import open_raster

D = "/root/reference/autotest/gdrivers/data"


def _b1(px):
    return px if px.ndim == 2 else px[:, :, 0]


# ---------------------------------------------------------------- heightfield

def test_jdem_golden():
    r = open_raster(f"{D}/jdem/fakejdem.mem")
    assert r["driver"] == "JDEM"
    assert checksum_image(_b1(r["pixels"])) == 15
    assert r["pixels"].dtype == np.float32
    assert r["epsg"] == 4301


def test_terragen_golden():
    r = open_raster(f"{D}/terragen/float32.ter")
    assert r["driver"] == "Terragen"
    assert checksum_image(_b1(r["pixels"])) == 1128
    assert r["pixels"].dtype == np.int16  # raw values + scale/offset


def test_leveller_golden():
    r = open_raster(f"{D}/leveller/ter6test.ter")
    assert r["driver"] == "Leveller"
    assert checksum_image(_b1(r["pixels"])) == 33441
    assert r["pixels"].dtype == np.float32


def test_gxf_goldens():
    r = open_raster(f"{D}/gxf/small.gxf")
    assert r["driver"] == "GXF"
    assert checksum_image(_b1(r["pixels"])) == 90
    r = open_raster(f"{D}/gxf/small2.gxf")  # base-90 compressed, #GTYPE 3
    assert checksum_image(_b1(r["pixels"])) == 65042
    assert r["pixels"].shape == (8, 10)


# ---------------------------------------------------------------- raw legacy

def test_lan_goldens():
    for f in ("fakelan.lan", "fakelan4bit.lan"):
        r = open_raster(f"{D}/lan/{f}")
        assert r["driver"] == "LAN"
        assert checksum_image(_b1(r["pixels"])) == 10


def test_doq2_golden():
    r = open_raster(f"{D}/doq2/C3607614_truncated.NWS")
    assert r["driver"] == "DOQ2"
    px = r["pixels"]
    # reference test checksums row 0 of each band as a 500x1 raster
    assert [checksum_image(px[:1, :, i]) for i in range(3)] == \
        [4201, 4010, 5820]
    assert r["gt"] == (377054, 1, 0, 4082205, 0, -1)


def test_doq1_fake_rejected():
    # autotest/gdrivers/doq1.py expects the fake fixture to fail
    from gdal_ray.sources.rawlegacy import sniff_doq1

    with open(f"{D}/doq1/fakedoq1.doq", "rb") as fh:
        assert not sniff_doq1(fh.read())


# ----------------------------------------------------------------------- ERS

def test_ers_srtm_golden():
    r = open_raster(f"{D}/ers/srtm.ers")
    assert r["driver"] == "ERS"
    assert checksum_image(_b1(r["pixels"])) == 64074
    assert r["ers_meta"] == {
        "STATISTICS_MEAN": "-4020.25", "STATISTICS_MINIMUM": "-4315",
        "STATISTICS_MAXIMUM": "-3744", "STATISTICS_MEDIAN": "-4000",
        "nodata": 9999.0, "projection": "GEODETIC", "datum": "WGS84"}


def test_ers_dem_golden():
    r = open_raster(f"{D}/ers/ers_dem.ers")  # HeaderOffset 512, MSB f4
    assert checksum_image(_b1(r["pixels"])) == 56588


def test_ers_int8_and_caseinsensitive():
    r = open_raster(f"{D}/ers/8s.ers")
    assert r["pixels"].dtype == np.int8 and r["pixels"].shape == (10, 10, 3)
    r = open_raster(f"{D}/ers/caseinsensitive.ers")
    assert r["pixels"].shape == (5366, 2662)


# ---------------------------------------------------------------------- FITS

def test_fits_byte_merc_georef():
    r = open_raster(f"{D}/fits/byte_merc.fits")
    assert r["driver"] == "FITS"
    want = (-13095897.481058259, 72.23522015778646, 0.0,
            3991653.2130816197, 0.0, -72.23522015778646)
    assert r["gt"] == pytest.approx(want, abs=1e-3)
    assert r["pixels"].shape == (20, 20)


def test_fits_roundtrip_all_dtypes():
    from gdal_ray.sources.fits import read_fits, write_fits

    rng = np.random.default_rng(7)
    for dt in (np.uint8, np.int16, np.uint16, np.int32,
               np.float32, np.float64):
        a = rng.integers(0, 200, (13, 17)).astype(dt)
        b, _, _ = read_fits(write_fits(a))
        assert np.array_equal(a, b), dt
    a = rng.integers(0, 255, (9, 7, 3)).astype(np.uint8)
    b, _, _ = read_fits(write_fits(a))
    assert np.array_equal(a, b)


def test_fits_multi_hdu():
    from gdal_ray.sources.fits import read_fits

    data = open(f"{D}/fits/image_in_first_and_second_hdu.fits",
                "rb").read()
    assert read_fits(data, hdu=0)[0].shape == (2, 1)
    assert read_fits(data, hdu=1)[0].shape == (3, 1)
    with pytest.raises(ValueError, match="no image HDU"):
        read_fits(open(f"{D}/fits/empty_primary_hdu.fits", "rb").read())


# ------------------------------------------------------------------- USGSDEM

@pytest.mark.parametrize("fname,cs,gt", [
    ("022gdeme_truncated", 1583,
     (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0, -0.00083333)),
    ("114p01_0100_deme_truncated.dem", 53864,
     (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
      -0.000208333)),
    ("39079G6_truncated.dem", 61424,
     (606855.0, 30.0, 0.0, 4414605.0, 0.0, -30.0)),
    ("39109h1_truncated.dem", 39443,
     (660055.0, 10.0, 0.0, 4429465.0, 0.0, -10.0)),
    ("4619old_truncated.dem", 10659,
     (18.99958333, 0.0008333, 0.0, 47.000416667, 0.0, -0.0008333)),
])
def test_usgsdem_goldens(fname, cs, gt):
    r = open_raster(f"{D}/usgsdem/{fname}")
    assert r["driver"] == "USGSDEM"
    assert checksum_image(_b1(r["pixels"])) == cs
    # the reference's own tolerance: (|gt1| + |gt2|) / 100
    eps = (abs(gt[1]) + abs(gt[2])) / 100.0
    assert r["gt"] == pytest.approx(gt, abs=eps)


# ---------------------------------------------------------------- PDS/ISIS2

def test_pds_mc02():
    r = open_raster(f"{D}/pds/mc02_truncated.img")
    assert r["driver"] == "PDS"
    assert checksum_image(_b1(r["pixels"])) == 47151
    want = (-10668384.903788566589355, 926.115274429321289, 0,
            3852176.483988761901855, 0, -926.115274429321289)
    assert r["gt"] == pytest.approx(want, abs=9.26)
    assert r["nodata"] == 0


def test_pds_fl73n003():
    r = open_raster(f"{D}/pds/fl73n003_truncated.img")
    assert checksum_image(_b1(r["pixels"])) == 34962
    want = (587861.55900404998, 75.000002980232239, 0.0,
            -7815243.4746123618, 0.0, -75.000002980232239)
    assert r["gt"] == pytest.approx(want, abs=0.75)
    assert r["nodata"] == 7 and r["scale"] == 0.2 and r["offset"] == -20.2
    r = open_raster(f"{D}/pds/fl73n003_alt_truncated.img")
    assert r["nodata"] == 7  # MISSING_CONSTANT variant (#3939)


def test_pds_detached_and_offsets():
    from gdal_ray.sources.pdslabel import read_pds

    assert checksum_image(_b1(
        open_raster(f"{D}/pds/EN0001426030M_truncated.IMG")["pixels"])) \
        == 1367
    # detached with byte offset (#3177) and LINE_PREFIX_BYTES (#3355)
    assert checksum_image(_b1(read_pds(f"{D}/pds/pds_3177.lbl")[0])) == 3418
    assert checksum_image(_b1(read_pds(f"{D}/pds/pds_3355.lbl")[0])) == 2748
    # FITS-wrapped payload addressed by record pointer
    assert checksum_image(_b1(
        read_pds(f"{D}/pds/map_000_038_truncated.lbl")[0])) == 14019
    # COMPRESSED_FILE delegation to the tif companion
    px, _, info = read_pds(f"{D}/pds/ESP_013951_1955_RED.LBL")
    assert info["delegated"] == "byte.tif"
    assert checksum_image(_b1(px)) == 4672
    # LDEM_4: 1440x2 window checksum from the reference test
    px, _, info = read_pds(f"{D}/pds/LDEM_4.LBL")
    assert checksum_image(_b1(px)[:2, :1440]) == 50938
    assert info["scale"] == 0.5 and info["offset"] == 1737400.0


def test_isis2_golden():
    r = open_raster(f"{D}/isis2/arvidson_original_truncated.cub")
    assert r["driver"] == "ISIS2"
    assert checksum_image(_b1(r["pixels"])) == 382
    assert r["pixels"].dtype == np.dtype(">f4")
    # gt pinned by the reference's autotest/gdrivers/isis2.py expected_gt
    exp = (10157400.403618813, 1200.0000476837158, 0.0,
           -585000.02324581146, 0.0, -1200.0000476837158)
    assert r["gt"] == pytest.approx(exp, rel=1e-12)
