"""GeoRSS + VDV IDF readers vs reference autotest goldens."""

import pytest

from gdal_ray.sources.georss import read_georss
from gdal_ray.sources.idf import read_idf

FIX = "/root/reference/autotest/ogr/data/"


@pytest.mark.parametrize("fname", ["test_georss_simple.xml",
                                   "test_georss_gml.xml"])
def test_georss_rss(fname):
    """ogr_georss_test_rss goldens (simple + GML encodings)."""
    t = read_georss(FIX + "georss/" + fname)
    rows = t.to_pylist()
    assert rows[0]["wkt"] == "POINT (2 49)"
    assert rows[0]["title"] == "A point"
    assert rows[0]["author"] == "Author"
    assert rows[0]["link"] == "http://gdal.org"
    assert rows[0]["pubDate"] == "2008/12/07 20:13:00+02"
    assert rows[0]["category"] == "First category"
    assert rows[0]["category_domain"] == "first_domain"
    assert rows[0]["category2"] == "Second category"
    assert rows[0]["category2_domain"] == "second_domain"
    assert rows[1]["wkt"].startswith("LINESTRING (2 48,2.1 48.1,2.2 48")
    assert rows[1]["title"] == "A line"
    assert rows[2]["wkt"] == \
        "POLYGON ((2 50,2.1 50.1,2.2 48.1,2.1 46.1,2 50))"
    assert rows[3]["wkt"] == "POLYGON ((2 49,2 49.5,2.2 49.5,2.2 49,2 49))"


def test_idf():
    """ogr_idf_1 goldens."""
    L = read_idf(FIX + "vdv/test.idf")
    n = L["Node"].to_pylist()[0]
    assert n["NODE_ID"] == 1 and n["foo"] == "U"
    assert n["wkt"] == "POINT (2 49)"
    link = L["Link"].to_pylist()[0]
    assert link["wkt"] == "LINESTRING (2 49,2.5 49.5,2.7 49.7,3 50)"
    lc = L["LinkCoordinate"].to_pylist()[0]
    assert lc["wkt"] == "POINT (2.5 49.5)"
    assert L["Other"].to_pylist()[0]["FOO"] == 1


def test_gmt_multilinestring():
    """ogr_gmt.py test_multi goldens."""
    from gdal_ray.sources.gmtvec import read_gmt

    t = read_gmt("/root/reference/autotest/ogr/data/gmt/test_multi.gmt")
    rows = t.to_pylist()
    assert rows[0]["name"] == "feature 1" and rows[0]["id"] == 1
    assert rows[0]["wkt"] == \
        "MULTILINESTRING ((175 -45,176 -45),(180 -45.3,179 -45.4))"
    assert rows[1]["wkt"] == \
        "MULTILINESTRING ((175.1 -45,175.2 -45.1),(180.1 -45.3,180 -45.2))"


def test_gmt_roundtrip_poly():
    """ogr_gmt_2 semantics: poly.shp written to .gmt reads back
    identically (attrs + exact WKTs)."""
    import pyarrow as pa

    from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
    from gdal_ray.sources.gmtvec import read_gmt, write_gmt
    from gdal_ray.sources.shapefile import read_shapefile

    tab = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
    wkts = [geom_to_wkt(wkb_to_geom(b), precision=12).replace(", ", ",")
            for b in tab["geometry"].to_pylist()]
    t2 = pa.table({"AREA": tab["AREA"], "EAS_ID": tab["EAS_ID"],
                   "PRFEDEA": tab["PRFEDEA"], "wkt": pa.array(wkts)})
    write_gmt("/tmp/gdal_ray_fixtures/tpoly.gmt", t2, geom_type="POLYGON")
    back = read_gmt("/tmp/gdal_ray_fixtures/tpoly.gmt")
    assert back["wkt"].to_pylist() == wkts
    assert back["EAS_ID"].to_pylist() == tab["EAS_ID"].to_pylist()
    assert back["AREA"].to_pylist() == tab["AREA"].to_pylist()


def test_fgd_gml():
    """ogr_gml_fgd_read.py: JGD2011 lat/lon axis swap + devDate."""
    from gdal_ray.sources.gml import read_fgd_gml

    L = read_fgd_gml(FIX + "gml_jpfgd/ElevPt.xml")
    r = L["ElevPt"].to_pylist()[0]
    assert r["wkt"] == "POINT (133.123456789 34.123456789)"
    assert r["devDate"] == "2015-01-07"
    L = read_fgd_gml(FIX + "gml_jpfgd/BldA.xml")
    r = L["BldA"].to_pylist()[0]
    assert r["devDate"] == "2017-03-07"
    assert r["wkt"].startswith(
        "POLYGON ((139.718509733734 35.6952171397133,"
        "139.718444177734 35.6953121947133,")
