"""MapML driver tests (reference autotest/ogr/ogr_mapml.py).

Reader goldens on the reference's own data/mapml/poly.mapml fixture;
writer->reader roundtrips for the full geometry-type matrix, the
polygon ring-orientation rule, nested geometry-collection flattening,
the field type-merge lattice and the FID-id convention — all
expectations transcribed from test_ogr_mapml_basic /
_multiple_layers / _reprojection_to_wgs84.
"""
import os

import pyarrow as pa
import pytest

from gdal_ray.sources.mapml import (
    read_mapml, write_mapml, wkb_to_wkt_mapml,
)
from gdal_ray.functions.wkb import geom_to_wkb, wkt_to_geom

FIX = "/root/reference/autotest/ogr/data/mapml/poly.mapml"


def _wkb(wkt: str) -> bytes:
    return geom_to_wkb(wkt_to_geom(wkt))


@pytest.mark.skipif(not os.path.exists(FIX), reason="no reference fixture")
def test_mapml_read_poly_fixture():
    layers = read_mapml(FIX)
    assert list(layers) == ["poly"]
    t = layers["poly"]
    assert t.num_rows == 10
    # type sniff (CPLGetValueType semantics): AREA real, EAS_ID int,
    # PRFEDEA all-digits -> Integer like the reference reader
    assert t.schema.field("AREA").type == pa.float64()
    assert t.schema.field("EAS_ID").type == pa.int32()
    assert t.schema.field("PRFEDEA").type == pa.int32()
    assert t["fid"].to_pylist()[:3] == [1, 2, 3]
    assert t["AREA"][0].as_py() == 215229.266
    assert t["EAS_ID"][0].as_py() == 168
    assert t["PRFEDEA"][0].as_py() == 35043411
    wkt = wkb_to_wkt_mapml(t["geometry"][0].as_py())
    assert wkt.startswith("POLYGON ((2.75225922 43.03904529")
    # fixture has an empty map-head: no projection meta -> no CRS,
    # like the reference reader (map-extent in body is not consulted)
    assert t.schema.metadata is None


def test_mapml_roundtrip_basic(tmp_path):
    out = str(tmp_path / "out.mapml")
    t = pa.table({
        "fid": pa.array([1, 10, 2, 3, 4, 5, 6, 7], pa.int64()),
        "intfield": pa.array([None, 1, None, None, None, None, None, None],
                             pa.int32()),
        "int64field": pa.array(
            [None, 1, 1234567890123, 1, None, None, None, None], pa.int64()),
        "realfield": pa.array(
            [None, 1.0, 1.25, 1.0, None, None, None, None], pa.float64()),
        "stringfield": pa.array(
            [None, "1", "x", "1", None, None, None, None], pa.string()),
        "datetimefield": pa.array(
            [None, "2020/03/31 12:34:56"] + [None] * 6, pa.string()),
        "geometry": pa.array([
            None,
            _wkb("POINT (1 2)"),
            _wkb("LINESTRING (1 2, 3 4)"),
            _wkb("POLYGON ((0 0, 0 1, 1 0, 0 0), "
                 "(0.1 0.1, 0.1 0.7, 0.7 0.1, 0.1 0.1))"),
            _wkb("MULTIPOINT ((0 1), (2 3))"),
            _wkb("MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))"),
            _wkb("MULTIPOLYGON (((0 0, 0 1, 1 0, 0 0)), "
                 "((10 0, 10 1, 11 0, 10 0)))"),
            None,
        ], pa.binary()),
    })
    write_mapml(out, {"test": t})
    layers = read_mapml(out)
    r = layers["test"]
    assert r.num_rows == 8
    assert r["fid"].to_pylist() == [1, 10, 2, 3, 4, 5, 6, 7]
    # type lattice: int64field saw 1 then 1234567890123 -> int64
    assert r.schema.field("intfield").type == pa.int32()
    assert r.schema.field("int64field").type == pa.int64()
    assert r.schema.field("realfield").type == pa.float64()
    assert r.schema.field("stringfield").type == pa.string()
    assert r["int64field"][2].as_py() == 1234567890123
    assert r["realfield"][2].as_py() == 1.25
    assert r["stringfield"][2].as_py() == "x"
    assert r["datetimefield"][1].as_py() == "2020/03/31 12:34:56"

    wkts = [wkb_to_wkt_mapml(w) if w is not None else None
            for w in r["geometry"].to_pylist()]
    assert wkts[0] is None
    assert wkts[1] == "POINT (1 2)"
    assert wkts[2] == "LINESTRING (1 2, 3 4)"
    # ring orientation rule: CW shell reversed to CCW, CW hole kept
    assert wkts[3] == ("POLYGON ((0 0, 1 0, 0 1, 0 0), "
                       "(0.1 0.1, 0.1 0.7, 0.7 0.1, 0.1 0.1))")
    assert wkts[4] == "MULTIPOINT ((0 1), (2 3))"
    assert wkts[5] == "MULTILINESTRING ((1 2, 3 4), (5 6, 7 8))"
    assert wkts[6] == ("MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), "
                       "((10 0, 11 0, 10 1, 10 0)))")


def test_mapml_geometrycollection_flatten(tmp_path):
    import struct

    out = str(tmp_path / "gc.mapml")
    # GEOMETRYCOLLECTION (POINT (1 2), GEOMETRYCOLLECTION (POINT (3 4)))
    p1 = _wkb("POINT (1 2)")
    p2 = _wkb("POINT (3 4)")
    inner = b"\x01" + struct.pack("<II", 7, 1) + p2
    gc = b"\x01" + struct.pack("<II", 7, 2) + p1 + inner
    t = pa.table({"geometry": pa.array([gc], pa.binary())})
    write_mapml(out, {"lyr": t})
    r = read_mapml(out)["lyr"]
    # nested collection flattened on write (ogrmapmldataset.cpp:1252)
    assert (wkb_to_wkt_mapml(r["geometry"][0].as_py())
            == "GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))")


def test_mapml_multiple_layers(tmp_path):
    out = str(tmp_path / "m.mapml")
    t1 = pa.table({"geometry": pa.array(
        [_wkb("POINT (1 1)"), _wkb("POINT (2 2)")], pa.binary())})
    t2 = pa.table({"geometry": pa.array([_wkb("POINT (3 3)")], pa.binary())})
    write_mapml(out, {"lyr1": t1, "lyr2": t2})
    layers = read_mapml(out)
    assert sorted(layers) == ["lyr1", "lyr2"]
    assert layers["lyr1"].num_rows == 2
    assert layers["lyr2"].num_rows == 1


def test_mapml_reprojection_to_wgs84(tmp_path):
    out = str(tmp_path / "r.mapml")
    t = pa.table({"geometry": pa.array(
        [_wkb("POINT (500000 0)")], pa.binary())})
    write_mapml(out, {"lyr": t}, src_epsg=32631)
    r = read_mapml(out)["lyr"]
    assert wkb_to_wkt_mapml(r["geometry"][0].as_py()) == "POINT (3 0)"
    assert r.schema.metadata[b"mapml_epsg"] == b"4326"


def test_mapml_no_class_default_layer(tmp_path):
    out = str(tmp_path / "out.mapml")
    with open(out, "w") as f:
        f.write('<mapml- xmlns="http://www.w3.org/1999/xhtml"><map-body>'
                "<map-feature><map-geometry><unsupported/></map-geometry>"
                "</map-feature><map-feature/></map-body></mapml->")
    layers = read_mapml(out)
    assert list(layers) == ["out"]
    t = layers["out"]
    assert t.num_rows == 2
    assert t["geometry"].null_count == 2


def test_mapml_errors(tmp_path):
    bad1 = str(tmp_path / "b1.mapml")
    with open(bad1, "w") as f:
        f.write('<mapml- xmlns="http://www.w3.org/1999/xhtml"></mapml->')
    with pytest.raises(ValueError):
        read_mapml(bad1)
    bad2 = str(tmp_path / "b2.mapml")
    with open(bad2, "w") as f:
        f.write('<mapml- xmlns="http://www.w3.org/1999/xhtml">'
                "<map-body></map-body></mapml->")
    with pytest.raises(ValueError):
        read_mapml(bad2)
    with pytest.raises(ValueError):
        write_mapml(str(tmp_path / "x.mapml"), {}, extent_units="unsupported")


def test_mapml_vector_open():
    from gdal_ray.sources.vector_open import open_vector

    if not os.path.exists(FIX):
        pytest.skip("no reference fixture")
    layers = open_vector(FIX)
    assert list(layers) == ["poly"]
    assert layers["poly"].num_rows == 10
