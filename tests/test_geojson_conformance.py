"""GeoJSON reader over the reference's full autotest fixture corpus
(ogr/data/geojson/*) with the ogrgeojsonreader.cpp tolerances: bare
geometry documents, GeometryCollection, null/degenerate geometries,
UTF-8 BOM, string feature ids, mixed-type field promotion, and the
json-c trailing-comma leniency (stac_item.json)."""
import glob
import os
import struct

import pyarrow as pa
import pytest

from gdal_ray.sources.geojson import read_geojson

DIR = "/root/reference/autotest/ogr/data/geojson"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DIR), reason="reference fixtures unavailable")


def test_whole_corpus_parses():
    files = sorted(glob.glob(f"{DIR}/*.json") +
                   glob.glob(f"{DIR}/*.geojson"))
    assert len(files) >= 23
    for p in files:
        t = read_geojson(p)
        assert t.num_rows >= 0


def test_bare_geometry_document():
    t = read_geojson(f"{DIR}/point.geojson")
    assert t.num_rows == 1
    wkb = t["geometry"][0].as_py()
    assert struct.unpack("<BI", wkb[:5]) == (1, 1)
    assert struct.unpack("<dd", wkb[5:21]) == (100.0, 0.0)


def test_geometrycollection_document():
    t = read_geojson(f"{DIR}/geometrycollection.geojson")
    wkb = t["geometry"][0].as_py()
    assert struct.unpack("<BI", wkb[:5])[1] == 7


def test_null_geometry_and_values():
    t = read_geojson(f"{DIR}/nullvalues.geojson")
    assert t.num_rows == 2
    assert t["geometry"].to_pylist() == [b"", b""]
    assert t["int"].to_pylist() == [168, None]
    assert t["double"].to_pylist() == [1.23, None]


def test_degenerate_point_matrix():
    # ogr_geojson_14: every malformed-coordinate combination opens,
    # invalid geometries become NULL
    t = read_geojson(f"{DIR}/ogr_geojson_14.geojson")
    assert t.num_rows > 10
    assert b"" in t["geometry"].to_pylist()


def test_utf8_bom():
    t = read_geojson(f"{DIR}/point_with_utf8bom.json")
    assert t.num_rows == 1


def test_string_id_becomes_field():
    t = read_geojson(f"{DIR}/stac_item.json")   # also: trailing comma
    assert t.num_rows == 1
    assert t["id"][0].as_py() == "my_id"
    assert t["fid"][0].as_py() == 0


def test_null_ids_fall_back_sequential():
    t = read_geojson(f"{DIR}/ids_0_1_null_1_null.json")
    assert t["fid"].to_pylist() == [0, 1, 2, 3, 4]


def test_type_promotion():
    t = read_geojson(f"{DIR}/test_type_promotion.json")
    # mixed-type columns resolve without error; arrays/objects are
    # JSON strings, mixed numerics promote
    assert t.num_rows > 0
    for name in t.column_names:
        assert t[name] is not None
