"""Sentinel-2 L1C conformance — expectations from the reference's own
autotest/gdrivers/sentinel2.py (test_sentinel2_l1c_1 / _l1c_2)."""

import pytest

from gdal_ray.sources.sentinel2 import read_sentinel2_subdataset, \
    sentinel2_metadata, sentinel2_subdatasets

XML = ("/root/reference/autotest/gdrivers/data/sentinel2/fake_l1c/"
       "S2A_OPER_PRD_MSIL1C.SAFE/S2A_OPER_MTD_SAFL1C.xml")


def test_l1c_main_metadata():
    assert sentinel2_metadata(XML) == {
        "CLOUD_COVERAGE_ASSESSMENT": "0.0",
        "DATATAKE_1_DATATAKE_SENSING_START": "2015-12-31T23:59:59.999Z",
        "DATATAKE_1_DATATAKE_TYPE": "INS-NOBS",
        "DATATAKE_1_ID": "GS2A_20151231T235959_000123_N01.03",
        "DATATAKE_1_SENSING_ORBIT_DIRECTION": "DESCENDING",
        "DATATAKE_1_SENSING_ORBIT_NUMBER": "22",
        "DATATAKE_1_SPACECRAFT_NAME": "Sentinel-2A",
        "DEGRADED_ANC_DATA_PERCENTAGE": "0",
        "DEGRADED_MSI_DATA_PERCENTAGE": "0",
        "FOOTPRINT": "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))",
        "FORMAT_CORRECTNESS_FLAG": "PASSED",
        "GENERAL_QUALITY_FLAG": "PASSED",
        "GENERATION_TIME": "2015-12-31T23:59:59.999Z",
        "GEOMETRIC_QUALITY_FLAG": "PASSED",
        "PREVIEW_GEO_INFO": "BrowseImageFootprint",
        "PREVIEW_IMAGE_URL": "http://example.com",
        "PROCESSING_BASELINE": "01.03",
        "PROCESSING_LEVEL": "Level-1C",
        "PRODUCT_START_TIME": "2015-12-31T23:59:59.999Z",
        "PRODUCT_STOP_TIME": "2015-12-31T23:59:59.999Z",
        "PRODUCT_TYPE": "S2MSI1C",
        "QUANTIFICATION_VALUE": "1000",
        "RADIOMETRIC_QUALITY_FLAG": "PASSED",
        "REFERENCE_BAND": "B1",
        "REFLECTANCE_CONVERSION_U": "0.97",
        "SENSOR_QUALITY_FLAG": "PASSED",
        "SPECIAL_VALUE_NODATA": "1",
        "SPECIAL_VALUE_SATURATED": "0",
    }


def test_l1c_subdatasets():
    subs = sentinel2_subdatasets(XML)
    assert [s[0] for s in subs] == [
        f"SENTINEL2_L1C:{XML}:10m:EPSG_32632",
        f"SENTINEL2_L1C:{XML}:20m:EPSG_32632",
        f"SENTINEL2_L1C:{XML}:60m:EPSG_32632",
        f"SENTINEL2_L1C:{XML}:PREVIEW:EPSG_32632",
    ]
    assert [s[1] for s in subs] == [
        "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N",
        "Bands B5, B6, B7, B8A, B11, B12 with 20m resolution, UTM 32N",
        "Bands B1, B9, B10 with 60m resolution, UTM 32N",
        "RGB preview, UTM 32N",
    ]
    # every subdataset opens
    for name, _ in subs:
        assert read_sentinel2_subdataset(name)["width"] > 0


def test_l1c_10m_subdataset():
    r = read_sentinel2_subdataset(f"SENTINEL2_L1C:{XML}:10m:EPSG_32632")
    assert (r["width"], r["height"]) == (20984, 20980)
    assert r["gt"] == (699960.0, 10.0, 0.0, 5100060.0, 0.0, -10.0)
    assert r["epsg"] == 32632
    assert [b["BANDNAME"] for b in r["bands"]] == ["B4", "B3", "B2", "B8"]
    b1 = r["bands"][0]
    assert b1 == {
        "BANDNAME": "B4", "BANDWIDTH": "30", "BANDWIDTH_UNIT": "nm",
        "SOLAR_IRRADIANCE": "1500", "SOLAR_IRRADIANCE_UNIT": "W/m2/um",
        "WAVELENGTH": "665", "WAVELENGTH_UNIT": "nm",
        "color_interp": "Red",
    }
    b4 = r["bands"][3]
    assert b4["BANDNAME"] == "B8" and b4["SOLAR_IRRADIANCE"] == "1000"
    assert b4["color_interp"] == "NIR"
    assert r["dtype"] == "uint16" and r["nbits"] == 12
    # source placements of band B8: granule 1 at (0,0), granule 2 at
    # (10004,10000), both 10980x10980 (the autotest's placement_vrt)
    s = [x for x in r["sources"] if x["band"] == "B8"]
    assert len(s) == 2
    assert (s[0]["dst_xoff"], s[0]["dst_yoff"]) == (0, 0)
    assert (s[1]["dst_xoff"], s[1]["dst_yoff"]) == (10004, 10000)
    assert all(x["xsize"] == 10980 and x["ysize"] == 10980 for x in s)
    assert s[0]["file"].endswith(
        "GRANULE/S2A_OPER_MSI_L1C_T32TQR_N01.03/IMG_DATA/"
        "S2A_OPER_MSI_L1C_T32TQR_B08.jp2")
    # no-FOOTPRINT metadata on subdatasets (autotest l1c_2)
    assert "FOOTPRINT" not in r["metadata"]
    assert r["metadata"]["QUANTIFICATION_VALUE"] == "1000"


def test_l1c_invalid_subdataset_names():
    for name in [
        "SENTINEL2_L1C:",
        f"SENTINEL2_L1C:{XML}",
        f"SENTINEL2_L1C:{XML}:",
        f"SENTINEL2_L1C:{XML}:10m",
        f"SENTINEL2_L1C:{XML}:10m:",
        f"SENTINEL2_L1C:{XML}:10m:EPSG_",
        f"SENTINEL2_L1C:{XML}:50m:EPSG_32632",
    ]:
        with pytest.raises(ValueError):
            read_sentinel2_subdataset(name)
    with pytest.raises(Exception):
        read_sentinel2_subdataset("SENTINEL2_L1C:foo.xml:10m:EPSG_32632")
    with pytest.raises(ValueError):
        read_sentinel2_subdataset(f"SENTINEL2_L1C:{XML}:10m:EPSG_32633")
