"""MapML read/write + GeoJSONSeq RS/bare-geometry semantics vs
reference autotests (ogr_mapml.py, ogr_geojsonseq.py)."""

import pyarrow as pa

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.geojson import read_geojsonseq, write_geojsonseq
from gdal_ray.sources.mapml import read_mapml, write_mapml


def _basic_table():
    return pa.table({
        "fid": pa.array([None, 10, None, None, None, None, None, None],
                        pa.int64()),
        "intfield": pa.array([None, 1] + [None] * 6, pa.int64()),
        "int64field": pa.array([None, 1, 1234567890123, 1, None, None,
                                None, None], pa.int64()),
        "realfield": pa.array([None, 1.0, 1.25, 1.0, None, None, None,
                               None], pa.float64()),
        "stringfield": pa.array([None, "1", "x", "1", None, None, None,
                                 None], pa.string()),
        "datetimefield": pa.array([None, "2020/03/31 12:34:56"] +
                                  [None] * 6, pa.string()),
        "wkt": pa.array([
            None, "POINT (1 2)", "LINESTRING (1 2,3 4)",
            "POLYGON ((0 0,0 1,1 0,0 0),"
            "(0.1 0.1,0.1 0.7,0.7 0.1,0.1 0.1))",
            "MULTIPOINT (0 1,2 3)",
            "MULTILINESTRING ((1 2,3 4),(5 6,7 8))",
            "MULTIPOLYGON (((0 0,0 1,1 0,0 0)),((10 0,10 1,11 0,10 0)))",
            "GEOMETRYCOLLECTION (POINT (1 2),"
            "GEOMETRYCOLLECTION(POINT(3 4)))"], pa.string()),
    })


def test_mapml_basic_roundtrip(tmp_path):
    """test_ogr_mapml_basic: fids, fields, winding-fixed polygons,
    flattened collections."""
    p = str(tmp_path / "out.mapml")
    write_mapml(p, [("test", _basic_table())])
    rows = read_mapml(p)["test"].to_pylist()
    assert [r["fid"] for r in rows][:2] == [1, 10]
    assert rows[1]["intfield"] == 1
    assert rows[1]["datetimefield"] == "2020/03/31 12:34:56"
    assert rows[1]["wkt"] == "POINT (1 2)"
    assert rows[2]["int64field"] == 1234567890123
    assert rows[2]["realfield"] == 1.25
    assert rows[2]["stringfield"] == "x"
    assert rows[2]["wkt"] == "LINESTRING (1 2,3 4)"
    assert rows[3]["wkt"] == ("POLYGON ((0 0,1 0,0 1,0 0),"
                              "(0.1 0.1,0.1 0.7,0.7 0.1,0.1 0.1))")
    assert rows[4]["wkt"] == "MULTIPOINT (0 1,2 3)"
    assert rows[5]["wkt"] == "MULTILINESTRING ((1 2,3 4),(5 6,7 8))"
    assert rows[6]["wkt"] == ("MULTIPOLYGON (((0 0,1 0,0 1,0 0)),"
                              "((10 0,11 0,10 1,10 0)))")
    assert rows[7]["wkt"] == "GEOMETRYCOLLECTION (POINT (1 2),POINT (3 4))"


def test_mapml_multiple_layers(tmp_path):
    p = str(tmp_path / "two.mapml")
    t1 = pa.table({"a": [1, 2]})
    t2 = pa.table({"a": [3]})
    write_mapml(p, [("lyr1", t1), ("lyr2", t2)])
    L = read_mapml(p)
    assert L["lyr1"].num_rows == 2 and L["lyr2"].num_rows == 1


def test_mapml_read_poly():
    """data/mapml/poly.mapml: 10 polygons with AREA/EAS_ID/PRFEDEA."""
    t = read_mapml("/root/reference/autotest/ogr/data/mapml/poly.mapml")[
        "poly"]
    assert t.num_rows == 10
    r = t.to_pylist()[0]
    assert r["AREA"] == 215229.266
    assert r["EAS_ID"] == 168
    # CPLGetValueType("35043411") == CPL_VALUE_INTEGER, so the reference
    # types PRFEDEA as OFTInteger (ogrmapmldataset.cpp:379-389).
    assert r["PRFEDEA"] == 35043411
    assert r["wkt"].startswith("POLYGON ((2.75225922 43.03904529")


def test_geojsonseq_rs_pretty():
    """test_ogr_geojsonseq_read_rs_json_pretty."""
    t = read_geojsonseq(
        "/root/reference/autotest/ogr/data/geojsonseq/test.geojsons")
    rows = t.to_pylist()
    assert [r["foo"] for r in rows] == ["bar", "baz"]
    assert geom_to_wkt(wkb_to_geom(rows[0]["geometry"]),
                       precision=10) == "POINT (1 2)"


def test_geojsonseq_bare_geometries_and_errors():
    """seq_geometries / seq_geometries_with_errors."""
    t = read_geojsonseq('{"type":"Point","coordinates":[2,49]}\n'
                        '    {"type":"Point","coordinates":[3,50]}')
    assert t.num_rows == 2
    t = read_geojsonseq('{"type":"Point","coordinates":[2,49]}\n'
                        '    {"type":"Point","coordinates":[3,50]}\n'
                        '    foo\n    "bar"\n    null\n\n'
                        '    {"type":"Point","coordinates":[3,51]}')
    assert t.num_rows == 3
    wkts = [geom_to_wkt(wkb_to_geom(r["geometry"]), precision=10)
            for r in t.to_pylist()]
    assert wkts == ["POINT (2 49)", "POINT (3 50)", "POINT (3 51)"]


def test_geojsonseq_write_lf_rs(tmp_path):
    """_ogr_geojsonseq_create: first byte is '{' (LF) or 0x1e (RS)."""
    tab = pa.table({"foo": ['bar"d', "baz"],
                    "wkt": ["POINT (1 2)", "POINT (3 4)"]})
    lf = str(tmp_path / "t.geojsonl")
    write_geojsonseq(lf, tab)
    assert open(lf, "rb").read(1) == b"{"
    rs = str(tmp_path / "t.geojsons")
    write_geojsonseq(rs, tab, rs=True)
    assert open(rs, "rb").read(1) == b"\x1e"
    rows = read_geojsonseq(rs).to_pylist()
    assert [r["foo"] for r in rows] == ['bar"d', "baz"]
