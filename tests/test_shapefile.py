"""Shapefile codec: roundtrips, winding semantics, dBase attributes,
sharded Dataset reads (reference ogr/ogrsf_frmts/shape/)."""
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkb, wkb_to_geom
from gdal_ray.functions.wkb import (LINESTRING, MULTILINESTRING,
                                    MULTIPOLYGON, POINT, POLYGON, Geom)
from gdal_ray.sources.shapefile import read_shapefile, write_shapefile


def _table(wkbs, **attrs):
    n = len(wkbs)
    cols = {"fid": pa.array(np.arange(n, dtype=np.int64) + 1),
            "geometry": pa.array(wkbs, pa.binary())}
    cols.update({k: pa.array(v) for k, v in attrs.items()})
    return pa.table(cols)


def test_point_roundtrip_bitexact(tmp_path):
    rng = np.random.default_rng(3)
    x, y = rng.uniform(-180, 180, 40), rng.uniform(-85, 85, 40)
    wkbs = [geom_to_wkb(Geom(POINT, [np.array([[a, b]])]))
            for a, b in zip(x, y)]
    base = str(tmp_path / "pts")
    write_shapefile(base, _table(
        wkbs, name=[f"p{i}" for i in range(40)],
        count=np.arange(40, dtype=np.int64), frac=x / 7.0))
    got = read_shapefile(base)
    assert got.num_rows == 40
    assert [b.as_py() for b in got["geometry"]] == wkbs  # bit-exact coords
    assert got["name"].to_pylist() == [f"p{i}" for i in range(40)]
    assert got["count"].to_pylist() == list(range(40))
    np.testing.assert_allclose(got["frac"].to_numpy(), x / 7.0, atol=5e-9)
    np.testing.assert_allclose(got["bbox_xmin"].to_numpy(), x)


def test_polygon_with_hole_and_multipolygon(tmp_path):
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], float)
    poly = Geom(POLYGON, [outer, hole], [2])
    far = np.array([[20, 20], [24, 20], [24, 24], [20, 24], [20, 20]], float)
    multi = Geom(MULTIPOLYGON, [outer, hole, far], [2, 1])
    base = str(tmp_path / "poly")
    write_shapefile(base, _table([geom_to_wkb(poly), geom_to_wkb(multi)],
                                 tag=["a", "b"]))
    got = [wkb_to_geom(b.as_py()) for b in read_shapefile(base)["geometry"]]
    assert got[0].kind == POLYGON and len(got[0].rings) == 2
    # shell/hole split survives (winding was normalized on write)
    assert {len(r) for r in got[0].rings} == {5}
    areas = sorted(abs(float(np.sum(
        r[:, 0] * np.roll(r[:, 1], -1) - np.roll(r[:, 0], -1) * r[:, 1]) / 2))
        for r in got[0].rings)
    assert areas == [4.0, 100.0]
    assert got[1].kind == MULTIPOLYGON
    assert got[1].poly_ring_counts == [2, 1]


def test_polyline_multiline_null(tmp_path):
    line = Geom(LINESTRING, [np.array([[0, 0], [5, 5], [9, 2]], float)])
    mline = Geom(MULTILINESTRING, [np.array([[0, 0], [1, 1]], float),
                                   np.array([[3, 3], [4, 4]], float)])
    base = str(tmp_path / "lines")
    write_shapefile(base, _table(
        [geom_to_wkb(line), None, geom_to_wkb(mline)], v=[1.5, 2.5, -3.25]))
    got = read_shapefile(base)
    assert got["geometry"][1].as_py() is None
    assert wkb_to_geom(got["geometry"][0].as_py()).kind == LINESTRING
    assert wkb_to_geom(got["geometry"][2].as_py()).kind == MULTILINESTRING
    assert got["v"].to_pylist() == [1.5, 2.5, -3.25]


def test_mixed_shape_types_rejected(tmp_path):
    pt = Geom(POINT, [np.zeros((1, 2))])
    ln = Geom(LINESTRING, [np.array([[0, 0], [1, 1]], float)])
    with pytest.raises(ValueError, match="mixed shape types"):
        write_shapefile(str(tmp_path / "bad"),
                        _table([geom_to_wkb(pt), geom_to_wkb(ln)]))


def test_record_range_and_sharded_dataset(ray_session, tmp_path):
    from gdal_ray.sources.shapefile import shapefile_dataset
    from gdal_ray.sources.vector import polygons_table

    base = str(tmp_path / "zones")
    tbl = polygons_table(48)
    write_shapefile(base, tbl)
    whole = read_shapefile(base)
    part = read_shapefile(base, rec_range=(10, 20))
    assert part.num_rows == 10
    assert part["geometry"].to_pylist() == \
        whole["geometry"].to_pylist()[10:20]
    ds = shapefile_dataset(base, num_shards=5)
    got = pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    got = got.sort_by("fid")
    assert got["geometry"].to_pylist() == whole["geometry"].to_pylist()
    assert got["category"].to_pylist() == whole["category"].to_pylist()
    # fixture polygons round-trip up to ring winding (the writer
    # normalizes to shapefile convention: outer CW) — same vertex
    # sets, same areas
    for got_b, want_b in zip(whole["geometry"].to_pylist(),
                             tbl["geometry"].to_pylist()):
        g, w = wkb_to_geom(got_b), wkb_to_geom(want_b)
        assert g.kind == w.kind and len(g.rings) == len(w.rings)
        for rg, rw in zip(g.rings, w.rings):
            assert {tuple(p) for p in rg} == {tuple(p) for p in rw}
