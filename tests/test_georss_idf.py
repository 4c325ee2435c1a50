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
