"""OpenFileGDB reader vs the reference's own autotest data
(autotest/ogr/ogr_openfilegdb.py + data/filegdb fixtures)."""

import os
import re
import zipfile

import numpy as np
import pytest

from gdal_ray.sources.openfilegdb import (gdb_layer_dataset, gdb_layers,
                                          read_gdb_layer)

FIX = "/root/reference/autotest/ogr/data/filegdb"
FGDB_TMP = "/tmp/gdal_ray_fixtures/fgdb"


@pytest.fixture(scope="module")
def gdb10():
    os.makedirs(FGDB_TMP, exist_ok=True)
    out = os.path.join(FGDB_TMP, "testopenfilegdb.gdb")
    if not os.path.exists(out):
        with zipfile.ZipFile(os.path.join(FIX, "testopenfilegdb.gdb.zip")) as z:
            z.extractall(FGDB_TMP)
    return out


def _unzipped(zname: str, inner: str) -> str:
    out = os.path.join(FGDB_TMP, inner)
    if not os.path.exists(out):
        os.makedirs(FGDB_TMP, exist_ok=True)
        with zipfile.ZipFile(os.path.join(FIX, zname)) as z:
            z.extractall(FGDB_TMP)
    return out


# the reference's datalist (ogr_openfilegdb.py:96-170): layer ->
# expected read-back WKT (4th element when present, else the written
# one, with line->multiline / polygon->multipolygon layer promotion)
DATALIST = [
    ("point", "POINT (1 2)"),
    ("multipoint", "MULTIPOINT (1 2,3 4)"),
    ("linestring", "MULTILINESTRING ((1 2,3 4))"),
    ("multilinestring", "MULTILINESTRING ((1 2,3 4))"),
    ("multilinestring_multipart", "MULTILINESTRING ((1 2,3 4),(5 6,7 8))"),
    ("polygon", "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0)))"),
    ("multipolygon",
     "MULTIPOLYGON (((0 0,0 1,1 1,1 0,0 0),"
     "(0.25 0.25,0.75 0.25,0.75 0.75,0.25 0.75,0.25 0.25)),"
     "((2 0,2 1,3 1,3 0,2 0)))"),
    ("point25D", "POINT Z (1 2 3)"),
    ("multipoint25D", "MULTIPOINT Z (1 2 -10,3 4 -20)"),
    ("linestring25D", "MULTILINESTRING Z ((1 2 -10,3 4 -20))"),
    ("multilinestring25D", "MULTILINESTRING Z ((1 2 -10,3 4 -20))"),
    ("multilinestring25D_multipart",
     "MULTILINESTRING Z ((1 2 -10,3 4 -20),(5 6 -30,7 8 -40))"),
    ("polygon25D", "MULTIPOLYGON Z (((0 0 -10,0 1 -10,1 1 -10,1 0 -10,0 0 -10)))"),
    ("multipolygon25D",
     "MULTIPOLYGON Z (((0 0 -10,0 1 -10,1 1 -10,1 0 -10,0 0 -10)))"),
    ("null_polygon", None),
    ("empty_polygon", None),
    ("empty_multipoint", None),
    # M layers (openfilegdb_datalist_m)
    ("pointm", "POINT M (1 2 3)"),
    ("pointzm", "POINT ZM (1 2 3 4)"),
    ("multipointm", "MULTIPOINT M ((1 2 3),(4 5 6))"),
    ("multipointzm", "MULTIPOINT ZM ((1 2 3 4),(5 6 7 8))"),
    ("linestringm", "MULTILINESTRING M ((1 2 3,4 5 6))"),
    ("linestringzm", "MULTILINESTRING ZM ((1 2 3 4,5 6 7 8))"),
    ("multilinestringm", "MULTILINESTRING M ((1 2 3,4 5 6))"),
    ("multilinestringzm", "MULTILINESTRING ZM ((1 2 3 4,5 6 7 8))"),
    ("polygonm", "MULTIPOLYGON M (((0 0 1,0 1 2,1 1 3,1 0 4,0 0 1)))"),
    ("polygonzm",
     "MULTIPOLYGON ZM (((0 0 1 -1,0 1 2 -2,1 1 3 -3,1 0 4 -4,0 0 1 -1)))"),
    ("multipolygonm", "MULTIPOLYGON M (((0 0 1,0 1 2,1 1 3,1 0 4,0 0 1)))"),
    ("multipolygonzm",
     "MULTIPOLYGON ZM (((0 0 1 -1,0 1 2 -2,1 1 3 -3,1 0 4 -4,0 0 1 -1)))"),
    ("empty_polygonm", None),
]


def _wkt_norm(w):
    """Round every number to 1e-6 (the autotest's geometry comparison
    is tolerance-based, not textual)."""
    if w is None:
        return None
    def rep(m):
        v = round(float(m.group(0)), 6)
        return str(int(v)) if v == int(v) else repr(v)
    return re.sub(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", rep, w).replace(", ", ",")


def test_layer_list(gdb10):
    layers = gdb_layers(gdb10)
    assert len(layers) == 37
    assert "point" in layers and "multipatch" in layers


@pytest.mark.parametrize("name,expected", DATALIST,
                         ids=[d[0] for d in DATALIST])
def test_datalist_geometries(gdb10, name, expected):
    t = read_gdb_layer(gdb10, name)
    assert t.num_rows >= 1
    got = t.to_pylist()[0]["wkt"]
    assert _wkt_norm(got) == _wkt_norm(expected), got


def test_attribute_values(gdb10):
    """ogr_openfilegdb.py:466-478 field golden."""
    r = read_gdb_layer(gdb10, "point").to_pylist()[0]
    assert r["id"] == 1 and r["smallint"] == -13 and r["int"] == 123
    assert r["float"] == 1.5 and r["real"] == 4.56
    assert r["str"] == "foo_é"
    assert r["adate"] == "2013/12/26 12:34:56"
    assert r["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
    assert r["xml"] == "<foo></foo>"
    assert r["binary"] == b"\x00\xff\x7f"
    assert r["binary2"] == b"\x12\x34\x56"
    assert r["nullint"] is None


def test_hole_layer_deleted_feature(gdb10):
    """'hole' had feature 1 deleted and fields added mid-life."""
    t = read_gdb_layer(gdb10, "hole")
    assert t["fid"].to_pylist() == list(range(2, 14))
    strs = t["str"].to_pylist()
    assert strs[0] == "fid2" and strs[-1] == "fid13"
    assert strs[10] is None  # the empty feature at fid 12


def test_big_layer_and_several_polygons(gdb10):
    t = read_gdb_layer(gdb10, "big_layer")
    assert t.num_rows == 341
    real = t["real"].to_pylist()
    assert real == [float(i % 4) for i in range(341)]
    t = read_gdb_layer(gdb10, "several_polygons")
    assert t.num_rows == 9
    w = t.to_pylist()[4]["wkt"]
    assert _wkt_norm(w) == _wkt_norm("MULTIPOLYGON (((2 2,2 3,3 3,3 2,2 2)))")


def test_v9_gdbs():
    for inner in ("testopenfilegdb92.gdb", "testopenfilegdb93.gdb"):
        g = _unzipped(inner + ".zip", inner)
        layers = gdb_layers(g)
        assert "point" in layers and "big_layer" in layers
        t = read_gdb_layer(g, "point")
        assert t.num_rows == 5
        r = t.to_pylist()[0]
        assert r["str"] == "foo_é"
        assert _wkt_norm(r["wkt"]) == _wkt_norm("POINT (1 2)")


def test_sparse_block_map():
    """sparse.gdb exercises the .gdbtablx 1024-block bitmap."""
    g = _unzipped("sparse.gdb.zip", "sparse.gdb")
    t = read_gdb_layer(g, gdb_layers(g)[0])
    fids = t["fid"].to_pylist()
    assert fids[0] == 2
    assert t.num_rows == 12


def test_utf16_strings():
    g = _unzipped("test_utf16.gdb.zip", "test_utf16.gdb")
    t = read_gdb_layer(g, "foo")
    assert t.to_pylist()[0]["str"] == "évenéven"


def test_arcgis_pro_32_types():
    g = os.path.join(FIX, "arcgis_pro_32_types.gdb")
    t = read_gdb_layer(g, "big_int")
    r = t.to_pylist()[0]
    assert r["big"] == 9007199254740991
    assert r["short"] == 32767 and r["long"] == 2147483647
    t = read_gdb_layer(g, "date_types")
    r = t.to_pylist()[0]
    assert r["date"] == "2023/11/29 13:14:15"
    assert r["date_only"] == "2023/11/29"
    assert r["time_only"] == "13:14:15"


def test_polygon_golden_gdb():
    g = "/root/reference/autotest/ogr/data/openfilegdb/polygon_golden.gdb"
    t = read_gdb_layer(g, "OGRGeoJSON")
    r = t.to_pylist()[0]
    assert r["foo"] == "bar"
    assert _wkt_norm(r["wkt"]) == _wkt_norm("MULTIPOLYGON (((0 0,0 1,1 0,0 0)))")


def test_weird_winding_order():
    g = _unzipped("weird_winding_order_fgdb.zip", "roads_clip Drawing.gdb")
    t = read_gdb_layer(g, gdb_layers(g)[0])
    from gdal_ray.functions.wkb import wkb_to_geom
    geom = wkb_to_geom(t.to_pylist()[0]["geometry"])
    # one outer polygon with 17 rings total (1 shell + 16 holes)
    assert geom.poly_ring_counts == [17]


def test_datetime_utc_table():
    g = os.path.join(FIX, "testdatetimeutc.gdb")
    t = read_gdb_layer(g, "surveyPoint")
    assert t.num_rows == 4
    r = t.to_pylist()[0]
    assert r["CreationDate"] == "2020/06/22 07:49:36"
    assert r["globalid"] == "{25A021A0-5E0D-4B9C-A882-BF5161F20447}"


def test_gdb_layer_dataset_sharded(gdb10, ray_session):
    ds = gdb_layer_dataset(gdb10, "big_layer", shards=6)
    assert ds.count() == 341
    rows = sorted(ds.take_all(), key=lambda r: r["fid"])
    assert [r["real"] for r in rows] == [float(i % 4) for i in range(341)]
