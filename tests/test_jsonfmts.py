"""ESRIJSON + TopoJSON readers vs autotest/ogr/{ogr_esrijson,
ogr_topojson}.py goldens."""

import pytest

from gdal_ray.sources.jsonfmts import read_esrijson, read_topojson

EFX = "/root/reference/autotest/ogr/data/esrijson/"
TFX = "/root/reference/autotest/ogr/data/topojson/"

TOPO1_EXPECTED = [
    ("foo", None, "POINT EMPTY"), (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"), (None, None, "POINT (100 1010)"),
    (None, None, "LINESTRING EMPTY"), (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"), (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"), (None, None, "LINESTRING EMPTY"),
    (None, None, "LINESTRING EMPTY"), (None, None, "LINESTRING EMPTY"),
    (None, "0", "LINESTRING EMPTY"), (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"), (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None, "POLYGON ((110 1100,110 1000,100 1000,100 1100,"
     "110 1100),(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"), (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"), (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"), (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON (((110 1100,110 1000,100 1000,100 1100,"
     "110 1100)),((101 1010,109 1010,109 1090,101 1090,101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000),(101 1010,101 1090,109 1090,109 1010,"
     "101 1010))"),
]


def test_topojson_objects_array_full_matrix():
    """test_ogr_topojson_objects_is_array — every row of the
    reference's 35-entry expected table, verbatim."""
    L = read_topojson(TFX + "topojson1.topojson")
    assert L["a_layer"].to_pylist()[0]["wkt"] == \
        "LINESTRING (100 1000,110 1000,110 1100)"
    rows = L["TopoJSON"].to_pylist()
    assert len(rows) == len(TOPO1_EXPECTED)
    for r, e in zip(rows, TOPO1_EXPECTED):
        assert (r["id"], r["name"], r["wkt"]) == e


def test_topojson_objects_dict():
    L = read_topojson(TFX + "topojson2.topojson")
    r = L["a_layer"].to_pylist()[0]
    assert r["id"] == "foo" and r["name"] == "line"
    assert r["wkt"] == "LINESTRING (100 1000,110 1000,110 1100)"
    assert L["TopoJSON"].to_pylist()[0]["wkt"] == \
        "LINESTRING (100 1000,110 1000,110 1100)"


def test_topojson_no_transform():
    L = read_topojson(TFX + "topojson3.topojson")
    assert L["a_layer"].to_pylist()[0]["wkt"] == \
        "LINESTRING (0 0,10 0,0 10,10 0,0 0)"


def test_esrijson_point():
    t = read_esrijson(EFX + "esripoint.json")
    r = t.to_pylist()[0]
    assert r["objectid"] == 1 and r["fooSmallInt"] == 2
    assert r["fooInt"] == 1234567890 and r["fooSingle"] == 1.5
    assert r["fooDouble"] == 3.4 and r["fooString"] == "56"
    assert r["fooDate"] == "2021/12/31 00:00:00+00"
    assert r["wkt"] == "POINT (2 49)"


@pytest.mark.parametrize("name,expected", [
    ("esrilinestring", "LINESTRING (2 49,3 50)"),
    ("esrizlinestring", "LINESTRING Z (2 49 1,3 50 2)"),
    ("esrimultipoint", "MULTIPOINT ((2 49),(3 50))"),
    ("esrizpoint", "POINT Z (2 49 1)"),
    ("esripolygon", "POLYGON ((2 49,2 50,3 50,3 49,2 49),"
     "(2.1 49.1,2.1 49.9,2.9 49.9,2.9 49.1,2.1 49.1),"
     "(-2 49,-2 50,-3 50,-3 49,-2 49))"),
    ("esripolygonempty", "POLYGON EMPTY"),
])
def test_esrijson_geometries(name, expected):
    t = read_esrijson(EFX + name + ".json")
    assert t.to_pylist()[0]["wkt"] == expected


def test_jsonfg_place_crs():
    """ogr_jsonfg.py crs matrix: place in declared CRS wins over the
    4326 fallback geometry."""
    from gdal_ray.sources.jsonfg import read_jsonfg

    FIX = "/root/reference/autotest/ogr/data/jsonfg/"
    for f in ("crs_32631_fc_only", "crs_32631_feat",
              "crs_32631_fc_and_feat"):
        L = read_jsonfg(FIX + f + ".json")
        r = L["features"].to_pylist()[0]
        assert r["epsg"] == 32631
        assert r["wkt"] == "POINT (500000 4500000)"
    # place null -> geometry (4326) used
    L = read_jsonfg(FIX + "crs_32631_fc_place_null.json")
    r = L["features"].to_pylist()[0]
    assert r["epsg"] == 4326


def test_jsonfg_feature_types_split():
    from gdal_ray.sources.jsonfg import read_jsonfg

    L = read_jsonfg("/root/reference/autotest/ogr/data/jsonfg/"
                    "two_feature_types.json")
    assert set(L) == {"type1", "type2"}
    assert L["type1"].num_rows == 2 and L["type2"].num_rows == 1
