"""MapML read/write + GeoJSONSeq RS/bare-geometry semantics vs
reference autotests (ogr_mapml.py, ogr_geojsonseq.py)."""

import pyarrow as pa

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.geojson import read_geojsonseq, write_geojsonseq


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
