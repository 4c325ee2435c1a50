"""GeoPackage reader/writer (sources/gpkg.py).

Roundtrip fidelity vs the engine's canonical vector fixtures, header
conformance cases from the spec (big-endian header, missing envelope,
empty flag), and the sharded Ray Dataset path.
"""

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkb, wkt_to_geom
from gdal_ray.sources.gpkg import (
    GPKG_APPLICATION_ID,
    gpkg_dataset,
    list_layers,
    make_gpkg_blob,
    parse_gpkg_blob,
    read_gpkg_layer,
    write_gpkg,
)
from gdal_ray.sources.vector import points_table, polygons_table


@pytest.fixture(scope="module")
def gpkg_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("gpkg") / "fixture.gpkg")
    write_gpkg(p, {"zones": polygons_table(64), "pts": points_table(256)})
    return p


def test_application_id_and_meta(gpkg_path):
    con = sqlite3.connect(gpkg_path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == GPKG_APPLICATION_ID
    rows = dict(con.execute(
        "SELECT table_name, data_type FROM gpkg_contents").fetchall())
    assert rows == {"zones": "features", "pts": "features"}
    gc = dict(con.execute(
        "SELECT table_name, geometry_type_name FROM gpkg_geometry_columns"
    ).fetchall())
    assert gc == {"zones": "POLYGON", "pts": "POINT"}
    # contents extent matches the fixture's bbox columns
    ext = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
        " WHERE table_name='zones'").fetchone()
    t = polygons_table(64)
    np.testing.assert_allclose(ext, [
        pa.compute.min(t["bbox_xmin"]).as_py(),
        pa.compute.min(t["bbox_ymin"]).as_py(),
        pa.compute.max(t["bbox_xmax"]).as_py(),
        pa.compute.max(t["bbox_ymax"]).as_py()])
    con.close()


def test_roundtrip_polygons(gpkg_path):
    src = polygons_table(64)
    out = read_gpkg_layer(gpkg_path, "zones")
    assert out.num_rows == 64
    assert out["geometry"].to_pylist() == src["geometry"].to_pylist()
    for c in ("name", "category", "pop"):
        assert out[c].to_pylist() == src[c].to_pylist()
    np.testing.assert_allclose(out["area_expected"].to_numpy(),
                               src["area_expected"].to_numpy())
    # bbox columns re-derived from blob envelopes match the originals
    for c in ("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"):
        np.testing.assert_allclose(out[c].to_numpy(), src[c].to_numpy())


def test_roundtrip_points_and_datetime(gpkg_path):
    src = points_table(256)
    out = read_gpkg_layer(gpkg_path, "pts")
    assert out["geometry"].to_pylist() == src["geometry"].to_pylist()
    assert out["t"].to_pylist() == src["t"].to_pylist()  # DATETIME roundtrip
    assert "tags" not in out.column_names  # list column skipped by writer


def test_column_pruning(gpkg_path):
    out = read_gpkg_layer(gpkg_path, "zones", columns=["category"])
    assert set(out.column_names) == {
        "fid", "geometry", "category",
        "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"}


def test_point_blob_has_no_envelope():
    w = geom_to_wkb(wkt_to_geom("POINT (3 4)"))
    blob = make_gpkg_blob(w, srs_id=4326)
    assert len(blob) == 8 + len(w)
    wkb, srs, env = parse_gpkg_blob(blob)
    assert (wkb, srs, env) == (w, 4326, None)


def test_polygon_blob_envelope():
    g = wkt_to_geom("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")
    blob = make_gpkg_blob(geom_to_wkb(g), srs_id=4326)
    _, _, env = parse_gpkg_blob(blob)
    assert env == (0.0, 0.0, 4.0, 3.0)


def test_parse_big_endian_header():
    """Spec allows a big-endian header (flags bit0 = 0); the reference
    parser swaps srs_id and envelope (ogrgeopackageutility.cpp:417)."""
    w = geom_to_wkb(wkt_to_geom("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    flags = (1 << 1)  # big-endian, 2D envelope
    blob = (b"GP\x00" + bytes([flags]) + struct.pack(">i", 4326)
            + struct.pack(">4d", 0, 2, 0, 2) + w)
    wkb, srs, env = parse_gpkg_blob(blob)
    assert (srs, env) == (4326, (0.0, 0.0, 2.0, 2.0))
    assert wkb == w


def test_parse_rejects_bad_magic():
    with pytest.raises(ValueError):
        parse_gpkg_blob(b"XX\x00\x01" + b"\x00" * 10)


def test_list_layers(gpkg_path):
    assert list_layers(gpkg_path) == ["pts", "zones"]


def test_gpkg_dataset_sharded(ray_session, gpkg_path):
    ds = gpkg_dataset(gpkg_path, "zones", num_shards=5)
    got = ds.take_all()
    assert len(got) == 64
    src = polygons_table(64)
    by_fid = {r["fid"]: r for r in got}
    assert sorted(by_fid) == src["fid"].to_pylist()
    for i, fid in enumerate(src["fid"].to_pylist()):
        assert by_fid[fid]["geometry"] == src["geometry"][i].as_py()
        assert by_fid[fid]["category"] == src["category"][i].as_py()
