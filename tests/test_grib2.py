"""GRIB2 reader vs the reference's own autotest goldens
(autotest/gdrivers/grib.py expectations; degrib/g2clib semantics)."""
import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.grib2 import UNDEFINED, read_grib2

D = "/root/reference/autotest/gdrivers/data/grib/"


def _read(name):
    with open(D + name, "rb") as f:
        return read_grib2(f.read())


def _cs(name, band=0):
    return checksum_image(_read(name)[band]["values"])


def _gt(name, band=0):
    return _read(name)[band]["gt"]


# ---------------------------------------------------------- checksums
@pytest.mark.parametrize("name,band,want", [
    # grib_2: complex packing + 2nd-order spatial diff, K->C normalize
    ("ds.mint.bin", 1, 46927),
    # template 5.4 IEEE float32/float64
    ("ieee754_single.grb2", 0, 4727),
    ("ieee754_double.grb2", 0, 4727),
    # nbits=0 + decimal scale -> constant field
    ("simple_packing_nbits_zero_decimal_scaled.grb2", 0, 5),
    ("png_nbits_zero_decimal_scaled.grb2", 0, 5),
    # spatial differencing order 1
    ("spatial_differencing_order_1.grb2", 0, 46650),
    # template 4.32 satellite + complex packing (BRTEMP K->C)
    ("twenty-se27w.2017102006.hwrfsat.core.0p02.f000_truncated.grb2",
     0, 48230),
    # PNG-compressed payload through the engine's PNG codec
    ("MRMS_EchoTop_18_00.50_20161015-133230.grib2", 0, 41854),
    # all-zero JPEG2000 field decodes via the nbits==0 constant rule
    ("CMC_rdwps_lake-erie_ICEC_SFC_0_latlon0.05x0.05_2017111800_P000"
     ".grib2", 0, 0),
    # subgrids (two fields in one message) + bitmap-reuse variant
    ("subgrids.grib2", 0, 4672),
    ("subgrids.grib2", 1, 4563),
    ("subgrids_reuse_bitmap.grib2", 0, 4672),
    ("subgrids_reuse_bitmap.grib2", 1, 4563),
    # 0-360 split-and-swap family
    ("gfs.t06z.pgrb2.1p0.grib2", 0, 7514),
    ("gfs.t06z.pgrb2.1p0.partial_across_am.grib2", 0, 5060),
    ("gfs.t06z.pgrb2.1p0.partial_east_of_am.grib2", 0, 698),
    ("gfs.t06z.pgrb2.1p0.partial_west_of_am.grib2", 0, 601),
    ("gfswave-11.t00z.global.0p25.f000.grib2", 0, 52492),
    ("parameter_in_wmo_tables_only.grb2", 0, 4672),
])
def test_grib2_checksums(name, band, want):
    assert _cs(name, band) == want


# ------------------------------------------------------ geotransforms
@pytest.mark.parametrize("name,want", [
    ("transverse_mercator.grb2",
     (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)),
    ("mercator.grb2",
     (-13095853.598139772, 72.237, 0.0, 3991876.4600486886, 0.0,
      -72.237)),
    ("mercator_2sp.grb2",
     (-10931598.94836207, 60.299, 0.0, 3332168.629121481, 0.0,
      -60.299)),
    ("polar_stereographic.grb2",
     (-5621962.072511509, 71.86, 0.0, 2943991.8007649644, 0.0,
      -71.86)),
    ("lambert_conformal_conic.grb2",
     (8974734.737685828, 60.021, 0.0, 6235918.9698001575, 0.0,
      -60.021)),
    ("albers_equal_area.grb2",
     (8974979.714292033, 60.022, 0.0, 6235686.52464211, 0.0,
      -60.022)),
    ("lambert_azimuthal_equal_area.grb2",
     (-59384.01063035424, 60.021, 0.0, 44812.5792223211, 0.0,
      -60.021)),
    ("laea_with_negative_longitudes_issue_7456.grib2",
     (-1158999.9595231502, 2000.0, 0.0, 903000.0029299166, 0.0,
      -2000.0)),
    # buggy-grid heuristic: first point is actually northern-most
    ("MANAL_2023030103_fake_wrong_grid_origin_latitude.grb2",
     (-2442500.0217935005, 5000.0, 0.0, 2042500.0318467868, 0.0,
      -5000.0)),
    ("minx_180.grib2",
     (-180.0625, 0.125, 0.0, 90.0625, 0.0, -0.125)),
    ("gfswave-11.t00z.global.0p25.f000.grib2",
     (-180.125, 0.25, 0.0, 90.125, 0.0, -0.25)),
    ("gfs.t06z.pgrb2.1p0.grib2",
     (-185.0, 10.0, 0.0, 90.125, 0.0, -10.0)),
])
def test_grib2_geotransforms(name, want):
    gt = _gt(name)
    assert max(abs(gt[i] - want[i]) for i in range(6)) <= \
        1e-3 + 1e-6 * max(abs(w) for w in want), gt


def test_grib2_bitmap_nodata():
    """two_bands_with_bitmap: degrib UNDEFINED 9999 for masked cells."""
    bands = _read("two_bands_with_bitmap.grib2")
    assert len(bands) == 2
    for b in bands:
        assert b["meta"]["nodata"] == 9999
        assert checksum_image(b["values"]) == 4672


def test_grib2_missing_management():
    """one_value_and_nodata_points: complex packing missing mgmt ->
    9999 at missing cells, 0.01 at valid ones."""
    b = _read("one_value_and_nodata_points.grb2")[0]
    v = b["values"].ravel()
    assert v[0] == 9999
    assert v[6] == pytest.approx(0.01, rel=1e-4)


def test_grib2_wrong_earth_shape():
    """byte_wrong_earth_shape (#7811) still decodes: cs 4672."""
    assert _cs("byte_wrong_earth_shape.grib2") == 4672


def test_grib2_jpeg2000_honest_fence():
    """DRS 5.40/5.42 with real payloads raise a clear error (no codec
    in this environment); the field is reported with meta.error."""
    b = _read("template_4_15.grb2")[0]
    assert b["values"] is None
    assert "JPEG2000" in b["meta"]["error"]
    b = _read("template_5_42_ccsds_aec.grb2")[0]
    assert b["values"] is None
    assert "CCSDS" in b["meta"]["error"]


def test_grib2_truncated_georef():
    """rotated_pole.grb2.begin: grid + rotated-pole params readable
    from the truncated header (autotest reads it via /vsisparse)."""
    b = _read("rotated_pole.grb2.begin")[0]
    assert (b["meta"]["nx"], b["meta"]["ny"]) == (1102, 1076)
    want = (-62.6222310049955, 0.09000000999091741, 0.0,
            48.28500200186046, 0.0, -0.09000000372093023)
    assert b["gt"] == pytest.approx(want, rel=1e-3)
    assert b["proj"]["kind"] == "rotated_latlon"


def test_grib2_mixed_edition_file():
    """broken_combined_grib2_grib1: the ed-2 fields decode; ed-1
    messages are skipped by the ed-2 walker."""
    bands = _read("broken_combined_grib2_grib1.grb2")
    assert len(bands) >= 6
    assert all(b["values"] is not None for b in bands)


def test_grib2_metadata_times():
    """CMC file: GRIB_REF_TIME/VALID_TIME/FORECAST_SECONDS."""
    b = _read("CMC_rdwps_lake-erie_ICEC_SFC_0_latlon0.05x0.05_"
              "2017111800_P000.grib2")[0]
    assert b["meta"]["ref_time"] == 1510963200
    assert b["meta"]["valid_time"] == 1510963200
    assert b["meta"]["forecast_seconds"] == 0


def test_grib2_open_raster_integration():
    """open_raster routes edition 2 through the new reader."""
    from gdal_ray.sources.raster_open import open_raster

    r = open_raster(D + "transverse_mercator.grb2")
    assert r["driver"] == "GRIB"
    assert r["gt"] == pytest.approx(
        (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0))
    r = open_raster(D + "Sample_QuikSCAT.grb")  # edition 1 unchanged
    assert r["driver"] == "GRIB"
