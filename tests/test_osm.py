"""OSM PBF/XML reader vs the reference's own autotest
(autotest/ogr/ogr_osm.py, data/osm fixtures)."""

import pytest

from gdal_ray.sources.osm import read_osm_layers

FIX = "/root/reference/autotest/ogr/data/osm/"


@pytest.fixture(scope="module")
def layers():
    return read_osm_layers(FIX + "test.pbf")


def test_points(layers):
    t = layers["points"]
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["osm_id"] == "3"
    assert r["name"] == "Some interesting point"
    assert r["other_tags"] == '"foo"=>"bar","bar"=>"baz"'
    assert r["wkt"] == "POINT (3 49.5)"


def test_lines(layers):
    t = layers["lines"]
    assert t.num_rows == 2
    r0, r1 = t.to_pylist()
    assert r0["osm_id"] == "1" and r0["highway"] == "motorway"
    assert r0["z_order"] == 9 and r0["other_tags"] == '"foo"=>"bar"'
    assert r0["wkt"] == "LINESTRING (2 49, 3 50)"
    # way 6: closed but not polygon-like; missing node 900 dropped
    assert r1["osm_id"] == "6"
    assert r1["wkt"] == "LINESTRING (2 49, 3 49, 3 50, 2 50, 2 49)"


def test_multipolygons(layers):
    t = layers["multipolygons"]
    assert t.num_rows == 3
    r0, r1, r2 = t.to_pylist()
    assert r0["osm_id"] == "1" and r0["type"] == "multipolygon"
    assert r0["natural"] == "forest"
    assert r0["wkt"] == ("MULTIPOLYGON (((2 49, 3 49, 3 50, 2 50, 2 49), "
                         "(2.1 49.1, 2.2 49.1, 2.2 49.2, 2.1 49.2, "
                         "2.1 49.1)))")
    # relation 5 has only the type tag -> inherits outer way tags
    assert r1["osm_id"] == "5" and r1["natural"] == "wood"
    # standalone closed way keyed by osm_way_id
    assert r2["osm_way_id"] == "8" and r2["osm_id"] is None
    assert r2["name"] == "standalone_polygon"
    # relation 2 (missing member way 300) skipped entirely


def test_multilinestrings_and_other(layers):
    t = layers["multilinestrings"]
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["osm_id"] == "3" and r["type"] == "route"
    assert r["wkt"] == "MULTILINESTRING ((2 49, 3 50))"
    t = layers["other_relations"]
    r = t.to_pylist()[0]
    assert r["osm_id"] == "4" and r["type"] == "other_type"
    assert r["wkt"] == ("GEOMETRYCOLLECTION (POINT (2 49),"
                        "LINESTRING (2 49, 3 50))")


def test_pbf_variants_identical(layers):
    """dense=false, uncompressed, no-metadata encodings give
    bit-identical layers."""
    for f in ("test_uncompressed_dense_false.pbf",
              "test_uncompressed_dense_true_nometadata.pbf",
              "test.osm"):
        other = read_osm_layers(FIX + f)
        for k in layers:
            assert other[k].equals(layers[k]), (f, k)


def test_base64_real_extract():
    """ogr_osm.py test_ogr_osm_8 goldens on the real-world extract."""
    L = read_osm_layers(FIX + "base-64.osm.pbf")
    pts = L["points"].to_pylist()
    tree = next(r for r in pts if r["osm_id"] == "4294967934")
    assert tree["name"] == "Treetops"
    assert tree["wkt"].startswith("POINT (-61.7964321 17.1498319")
    assert L["lines"].num_rows > 100
    assert L["multipolygons"].num_rows == 60


def test_osm_dataset_sharded(ray_session):
    from gdal_ray.sources.osm import osm_dataset

    ds = osm_dataset(FIX + "base-64.osm.pbf", shards=4)
    rows = ds.take_all()
    assert len(rows) == 14
    names = {r["other_tags"] for r in rows if r["other_tags"]}
    assert any("Treetops" not in (n or "") for n in names)  # tags minus attrs
    ids = {r["osm_id"] for r in rows}
    assert 4294967934 in ids
