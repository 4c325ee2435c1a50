"""SQLite / SpatiaLite driver vs the reference's own fixtures
(autotest/ogr/ogr_sqlite.py, data/sqlite/*)."""

import numpy as np
import pytest

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.spatialite import (list_layers, read_sqlite_layer,
                                         spatialite_to_wkb, sqlite_dataset,
                                         wkb_to_spatialite, write_sqlite)

POLY3 = "/root/reference/autotest/ogr/data/sqlite/poly_spatialite.sqlite"
POLY4 = "/root/reference/autotest/ogr/data/sqlite/poly_spatialite4.sqlite"
NULLG = "/root/reference/autotest/ogr/data/sqlite/first_geometry_null.db"


def _shoelace(r):
    x, y = r[:, 0], r[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def test_poly_layer_metadata():
    assert list_layers(POLY3) == [("poly", "GEOMETRY", 32631)]


def test_poly_compressed_geometry_decode():
    # poly_spatialite.sqlite stores COMPRESSED polygons (class
    # 1000003, float32 deltas with full-double first/last vertices);
    # the decoded rings must reproduce the stored area field
    t = read_sqlite_layer(POLY3, "poly")
    assert t.num_rows == 10
    assert sorted(t["eas_id"].to_pylist()) == [158.0, 165.0, 166.0, 168.0,
                                               169.0, 170.0, 171.0, 172.0,
                                               173.0, 179.0]
    areas = np.asarray(t["area"].to_pylist())
    calc = np.array([
        sum(_shoelace(r) * (1 if i == 0 else -1)
            for i, r in enumerate(wkb_to_geom(g).rings))
        for g in t["geometry"].to_pylist()])
    assert np.all(np.abs(calc - areas) / areas < 1e-6)


def test_spatialite3_vs_4_identical():
    a = read_sqlite_layer(POLY3, "poly")
    b = read_sqlite_layer(POLY4, "poly")
    assert a["area"].to_pylist() == b["area"].to_pylist()
    for ga, gb in zip(a["geometry"].to_pylist(), b["geometry"].to_pylist()):
        ra, rb = wkb_to_geom(ga).rings, wkb_to_geom(gb).rings
        assert all(np.allclose(x, y) for x, y in zip(ra, rb))


def test_null_geometry_and_multipolygon():
    # first_geometry_null.db: first row NULL geom, second MULTIPOLYGON
    # with 0x69 entity markers; user 'fid' column must not clash
    t = read_sqlite_layer(NULLG)
    assert t.column_names[0] == "_rowid_"  # table has its own fid col
    assert t["geometry"][0].as_py() is None
    wkt = geom_to_wkt(wkb_to_geom(t["geometry"][1].as_py()))
    assert wkt.startswith("MULTIPOLYGON ((")


def test_blob_roundtrip_multipolygon():
    t = read_sqlite_layer(NULLG)
    mp = t["geometry"][1].as_py()
    back, srid = spatialite_to_wkb(wkb_to_spatialite(mp, 325834))
    assert back == mp and srid == 325834


def test_writer_reader_roundtrip(tmp_path):
    src = read_sqlite_layer(POLY3, "poly")
    p = str(tmp_path / "out.sqlite")
    write_sqlite(p, {"poly": src.drop_columns(["fid"])}, srid=32631)
    assert list_layers(p) == [("poly", "GEOMETRY", 32631)]
    back = read_sqlite_layer(p, "poly")
    assert back["area"].to_pylist() == src["area"].to_pylist()
    assert back["prfedea"].to_pylist() == src["prfedea"].to_pylist()
    for ga, gb in zip(src["geometry"].to_pylist(),
                      back["geometry"].to_pylist()):
        assert np.array_equal(np.vstack(wkb_to_geom(ga).rings),
                              np.vstack(wkb_to_geom(gb).rings))


def test_sharded_dataset(tmp_path, ray_session):
    src = read_sqlite_layer(POLY3, "poly")
    p = str(tmp_path / "out.sqlite")
    write_sqlite(p, {"poly": src.drop_columns(["fid"])})
    ds = sqlite_dataset(p, "poly", shard_rows=3)
    got = ds.to_pandas()
    assert len(got) == 10
    assert sorted(got["eas_id"]) == sorted(src["eas_id"].to_pylist())
