"""ADBC/DuckDB vector driver vs reference autotest/ogr/ogr_adbc.py.

poly.duckdb is the reference's own fixture (the same 10 polygons as
poly.shp); its DuckDB-spatial GEOMETRY blobs must decode to WKB whose
ring vertex sets match the shapefile feature-for-feature."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.adbc import duckdb_geom_to_wkb, read_duckdb

DB = "/root/reference/autotest/ogr/data/duckdb/poly.duckdb"
DB_SI = ("/root/reference/autotest/ogr/data/duckdb/"
         "poly_with_spatial_index.duckdb")
SHP = "/root/reference/autotest/ogr/data/poly.shp"

pytestmark = pytest.mark.skipif(not os.path.exists(DB),
                                reason="no reference fixture")


def test_duckdb_layers_and_schema():
    layers = read_duckdb(DB)
    assert list(layers) == ["poly"]      # one layer per user table
    t = layers["poly"]
    assert t.num_rows == 10              # ogr_adbc: FeatureCount 10
    # DECIMAL(11,3) -> real, BIGINT -> int64, VARCHAR -> string
    assert t.schema.field("AREA").type == pa.float64()
    assert t.schema.field("EAS_ID").type == pa.int64()
    assert t.schema.field("PRFEDEA").type == pa.string()
    assert t.schema.field("geometry").type == pa.binary()
    # the geometry_bbox STRUCT companion is an index, not a field
    assert "geometry_bbox" not in t.column_names
    assert t["AREA"][0].as_py() == pytest.approx(215229.266)
    assert t["EAS_ID"][0].as_py() == 168


def test_duckdb_geometry_matches_shapefile():
    """ogr_adbc.py:328 — geometries read as POLYGON ((...; ring
    vertex sets equal the reference shapefile's."""
    from gdal_ray.sources.shapefile import read_shapefile

    t = read_duckdb(DB)["poly"]
    t2 = read_shapefile(SHP)
    for i in range(10):
        wkb = t["geometry"][i].as_py()
        a = wkb_to_geom(wkb)
        assert geom_to_wkt(a).startswith("POLYGON ((")
        b = wkb_to_geom(t2["geometry"][i].as_py())
        assert len(a.rings) == len(b.rings)
        for ra, rb in zip(a.rings, b.rings):
            assert (set(map(tuple, np.round(ra, 4)))
                    == set(map(tuple, np.round(rb, 4))))


def test_duckdb_extent():
    """ogr_adbc.py:312 extent of the poly layer."""
    t = read_duckdb(DB)["poly"]
    xs, ys = [], []
    for v in t["geometry"].to_pylist():
        g = wkb_to_geom(v)
        x0, y0, x1, y1 = g.bbox()
        xs += [x0, x1]
        ys += [y0, y1]
    assert (min(xs), max(xs), min(ys), max(ys)) == (
        478315.53125, 481645.3125, 4762880.5, 4765610.5)


def test_duckdb_sql_open_option():
    """SQL= open option -> single RESULTSET layer
    (ogradbcdataset.cpp:209; ogr_adbc.py:171-175)."""
    layers = read_duckdb(
        DB, sql="SELECT * FROM poly ORDER BY EAS_ID DESC LIMIT 2")
    assert list(layers) == ["RESULTSET"]
    t = layers["RESULTSET"]
    assert t.num_rows == 2
    assert t["EAS_ID"].to_pylist() == [179, 173]


def test_duckdb_spatial_index_variant():
    layers = read_duckdb(DB_SI)
    assert layers["poly"].num_rows == 10


def test_unified_vector_open():
    from gdal_ray.sources.vector_open import open_vector

    assert open_vector(DB)["poly"].num_rows == 10


def _wrap_multi(gtype: int, bodies: list[bytes]) -> bytes:
    """Build a serialized multi-geometry from child body sections."""
    out = bytearray([gtype, 0, 0, 0, 0, 0, 0, 0])
    out += struct.pack("<I", gtype)
    out += struct.pack("<I", len(bodies))
    while len(out) % 8:
        out += b"\x00"
    for b in bodies:
        while len(out) % 8:
            out += b"\x00"
        out += b
    return bytes(out)


def test_multi_geometry_bodies():
    """Multipolygon assembly from the fixture's real polygon body
    sections (header layout per the module docstring)."""
    import duckdb

    con = duckdb.connect(DB, read_only=True)
    blobs = [r[0] for r in
             con.execute("SELECT geometry FROM poly LIMIT 2").fetchall()]
    con.close()
    bodies = [b[24:] for b in blobs]     # strip 8B header + 16B bbox
    mp = _wrap_multi(5, bodies)
    g = wkb_to_geom(duckdb_geom_to_wkb(mp))
    assert g.name == "MultiPolygon"
    assert g.poly_ring_counts == [1, 1]
    singles = [wkb_to_geom(duckdb_geom_to_wkb(b)) for b in blobs]
    assert np.allclose(g.rings[0], singles[0].rings[0])
    assert np.allclose(g.rings[1], singles[1].rings[0])
