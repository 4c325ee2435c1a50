"""GeoJSON / GeoJSONSeq reader+writer (sources/geojson.py).

Roundtrip fidelity vs the canonical vector fixtures, RFC7946 writer
semantics (7-decimal precision, layer bbox), geometry-type coverage,
and the byte-range-sharded GeoJSONSeq Dataset path (shard-boundary
ownership stress: every shard count yields the identical row set).
"""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom, wkt_to_geom
from gdal_ray.sources.geojson import (
    geojson_to_geom,
    geojsonl_dataset,
    geom_to_geojson,
    read_geojson,
    table_to_featurecollection,
    write_geojson,
    write_geojsonl,
)
from gdal_ray.sources.vector import points_table, polygons_table

WKTS = [
    "POINT (3.12345678 -4.5)",
    "LINESTRING (0 0, 1.5 2.5, 3 0)",
    "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT (1 2, 3 4)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)),"
    " ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 6 5.5, 6 6, 5.5 6, 5.5 5.5)))",
]


@pytest.mark.parametrize("wkt", WKTS)
def test_geometry_codec_roundtrip(wkt):
    g = wkt_to_geom(wkt)
    gj = geom_to_geojson(g, precision=9)
    g2 = geojson_to_geom(gj)
    assert g2.kind == g.kind
    assert geom_to_wkt(g2, 6) == geom_to_wkt(g, 6)


def test_precision_seven_default():
    gj = geom_to_geojson(wkt_to_geom("POINT (1.23456789012 2)"))
    assert gj["coordinates"][0] == 1.2345679  # RFC7946 mode default (=7)


def test_z_dropped():
    g = geojson_to_geom({"type": "LineString",
                         "coordinates": [[0, 0, 10], [1, 1, 20]]})
    assert g.rings[0].shape == (2, 2)


@pytest.fixture(scope="module")
def gj_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("geojson") / "zones.geojson")
    write_geojson(p, polygons_table(64), precision=12)
    return p


@pytest.fixture(scope="module")
def gjl_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("geojson") / "pts.geojsonl")
    t = points_table(256).drop_columns(["tags", "t"])  # json-plain fields
    write_geojsonl(p, t, precision=12)
    return p


def test_featurecollection_roundtrip(gj_path):
    src = polygons_table(64)
    out = read_geojson(gj_path)
    assert out.num_rows == 64
    assert out["fid"].to_pylist() == src["fid"].to_pylist()
    for c in ("name", "category", "pop"):
        assert out[c].to_pylist() == src[c].to_pylist()
    np.testing.assert_allclose(out["area_expected"].to_numpy(),
                               src["area_expected"].to_numpy())
    # geometry survives within the writer's precision
    for a, b in zip(out["geometry"].to_pylist()[:8],
                    src["geometry"].to_pylist()[:8]):
        ga, gb = wkb_to_geom(a), wkb_to_geom(b)
        for ra, rb in zip(ga.rings, gb.rings):
            np.testing.assert_allclose(ra, rb, atol=1e-11)
    # bbox pruning columns re-derived on read
    np.testing.assert_allclose(out["bbox_xmin"].to_numpy(),
                               src["bbox_xmin"].to_numpy(), atol=1e-11)


def test_layer_bbox_member(gj_path):
    with open(gj_path) as f:
        doc = json.load(f)
    t = polygons_table(64)
    np.testing.assert_allclose(doc["bbox"], [
        pa.compute.min(t["bbox_xmin"]).as_py(),
        pa.compute.min(t["bbox_ymin"]).as_py(),
        pa.compute.max(t["bbox_xmax"]).as_py(),
        pa.compute.max(t["bbox_ymax"]).as_py()], atol=1e-11)


def test_column_pruning(gj_path):
    out = read_geojson(gj_path, columns=["category"])
    assert set(out.column_names) == {
        "fid", "category",
        "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"}


def test_missing_property_is_null():
    out = read_geojson({"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [0, 0]},
         "properties": {"a": 1}},
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1, 1]},
         "properties": {"b": "x"}},
    ]})
    assert out["a"].to_pylist() == [1, None]
    assert out["b"].to_pylist() == [None, "x"]


def test_rfc7946_feature_shape(gj_path):
    fc = table_to_featurecollection(polygons_table(4))
    f0 = fc["features"][0]
    assert f0["type"] == "Feature" and f0["id"] == 0
    assert set(f0["properties"]) == {"name", "category", "pop", "area_expected"}
    assert "bbox_xmin" not in f0["properties"]  # layer cols not leaked


def _collect(ds) -> pa.Table:
    tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)]
    return pa.concat_tables(tabs, promote_options="default")


def test_geojsonl_sharded_dataset(gjl_path, ray_session):
    """Shard-boundary ownership: every shard count yields the exact
    same 256 rows — no dropped or duplicated boundary records."""
    src = points_table(256).drop_columns(["tags", "t"]).sort_by("fid")
    for n in (1, 2, 3, 7, 16, 64):
        got = _collect(geojsonl_dataset(gjl_path, num_shards=n)).sort_by("fid")
        assert got.num_rows == 256, f"shards={n}"
        assert got["fid"].to_pylist() == src["fid"].to_pylist()
        np.testing.assert_allclose(got["x"].to_numpy(),
                                   src["x"].to_numpy(), atol=1e-11)


def test_geojsonl_column_pruning(gjl_path, ray_session):
    got = _collect(geojsonl_dataset(gjl_path, columns=["z"], num_shards=4))
    assert "geometry" not in got.column_names
    assert "z" in got.column_names and got.num_rows == 256
