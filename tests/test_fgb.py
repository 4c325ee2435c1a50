"""FlatGeobuf reader/writer (sources/fgb.py).

Format conformance (magic, header fields, packed-R-tree layout per
packedrtree.cpp, Hilbert code vs an independent transcription),
roundtrip fidelity vs the canonical vector fixtures, bbox pushdown
through the index vs brute force, and the sharded Ray Dataset path.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkb, wkb_to_geom, wkt_to_geom
from gdal_ray.sources.fgb import (
    MAGIC,
    _hilbert_u32,
    _level_bounds,
    fgb_dataset,
    hilbert_order,
    read_fgb,
    read_fgb_info,
    rtree_size,
    write_fgb,
)
from gdal_ray.sources.vector import points_table, polygons_table


@pytest.fixture(scope="module")
def fgb_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fgb") / "zones.fgb")
    write_fgb(p, polygons_table(64), name="zones")
    return p


def _hilbert_xy2d_slow(order: int, x: int, y: int) -> int:
    """Independent classic iterative Hilbert xy->d (Wikipedia
    formulation) to cross-check the bit-twiddled port."""
    rx = ry = 0
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_independent_implementation():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 16, 64).astype(np.uint32)
    ys = rng.integers(0, 1 << 16, 64).astype(np.uint32)
    fast = _hilbert_u32(xs, ys)
    slow = [_hilbert_xy2d_slow(1 << 16, int(x), int(y))
            for x, y in zip(xs, ys)]
    np.testing.assert_array_equal(fast.astype(np.int64), slow)


def test_level_bounds_matches_reference_shape():
    """generateLevelBounds semantics: e.g. 64 items, node 16 ->
    levels [64, 4, 1], storage root-first => root at [0,1),
    internal [1,5), leaves [5,69)."""
    b = _level_bounds(64, 16)
    assert b == [(5, 69), (1, 5), (0, 1)]
    assert rtree_size(64, 16) == 69 * 40
    # do-while in generateLevelBounds: a single item still gets a
    # root level (the reference's alldatatypes.fgb carries 2 nodes)
    assert _level_bounds(1, 16) == [(1, 2), (0, 1)]


def test_magic_and_header(fgb_path):
    with open(fgb_path, "rb") as f:
        assert f.read(8) == MAGIC
    info = read_fgb_info(fgb_path)
    assert info["name"] == "zones"
    assert info["geometry_type"] == 3  # Polygon
    assert info["features_count"] == 64
    assert info["index_node_size"] == 16
    assert [c for c, _ in info["columns"]] == [
        "name", "category", "pop", "area_expected"]
    t = polygons_table(64)
    np.testing.assert_allclose(info["envelope"], [
        pa.compute.min(t["bbox_xmin"]).as_py(),
        pa.compute.min(t["bbox_ymin"]).as_py(),
        pa.compute.max(t["bbox_xmax"]).as_py(),
        pa.compute.max(t["bbox_ymax"]).as_py()])


def test_roundtrip_hilbert_order(fgb_path):
    """Features come back Hilbert-sorted but bit-exact, including
    multi-ring WKB and all property types."""
    src = polygons_table(64).to_pandas().set_index("name")
    out = read_fgb(fgb_path).to_pandas().set_index("name")
    assert len(out) == 64
    got = out.loc[src.index]
    assert (got["pop"].values == src["pop"].values).all()
    np.testing.assert_allclose(got["area_expected"].values,
                               src["area_expected"].values)
    assert all(got["geometry"][n] == src["geometry"][n] for n in src.index)
    np.testing.assert_allclose(got["bbox_xmin"].values,
                               src["bbox_xmin"].values)


def test_points_and_multipolygon_roundtrip(tmp_path):
    pts = points_table(64).drop_columns(["tags", "t"])
    p = str(tmp_path / "pts.fgb")
    write_fgb(p, pts, name="pts")
    assert read_fgb_info(p)["geometry_type"] == 1
    out = read_fgb(p).to_pandas().set_index("z")
    src = pts.to_pandas().set_index("z")
    assert all(out["geometry"][z] == src["geometry"][z] for z in src.index)

    mp = wkt_to_geom(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)),"
        " ((5 5, 9 5, 9 9, 5 9, 5 5), (6 6, 7 6, 7 7, 6 7, 6 6)))")
    t = pa.table({"fid": pa.array([0], pa.int64()),
                  "geometry": pa.array([geom_to_wkb(mp)], pa.binary()),
                  "tag": pa.array(["a"], pa.string())})
    p2 = str(tmp_path / "mp.fgb")
    write_fgb(p2, t, name="mp", index_node_size=0)
    out2 = read_fgb(p2)
    g = wkb_to_geom(out2["geometry"][0].as_py())
    assert g.kind == 6 and g.poly_ring_counts == [1, 2]
    assert out2["tag"].to_pylist() == ["a"]


def test_null_property_skipped(tmp_path):
    g = geom_to_wkb(wkt_to_geom("POINT (1 2)"))
    t = pa.table({"fid": pa.array([0, 1], pa.int64()),
                  "geometry": pa.array([g, g], pa.binary()),
                  "a": pa.array([7, None], pa.int64()),
                  "s": pa.array([None, "x"], pa.string())})
    p = str(tmp_path / "n.fgb")
    write_fgb(p, t, name="n", index_node_size=0)
    out = read_fgb(p)
    assert out["a"].to_pylist() == [7, None]
    assert out["s"].to_pylist() == [None, "x"]


BB_HOT = (2.25, 48.8, 2.35, 48.92)  # the fixtures' hot cluster


def test_bbox_pushdown_matches_bruteforce(fgb_path):
    t = polygons_table(64)
    bb = BB_HOT
    full = read_fgb(fgb_path)
    m = [(t["bbox_xmin"][i].as_py() <= bb[2]
          and t["bbox_xmax"][i].as_py() >= bb[0]
          and t["bbox_ymin"][i].as_py() <= bb[3]
          and t["bbox_ymax"][i].as_py() >= bb[1]) for i in range(64)]
    sub = read_fgb(fgb_path, bbox=bb)
    assert sub.num_rows == sum(m)
    assert set(sub["name"].to_pylist()) == {
        t["name"][i].as_py() for i in range(64) if m[i]}
    assert full.num_rows == 64


def test_column_pruning(fgb_path):
    out = read_fgb(fgb_path, columns=["category"])
    assert set(out.column_names) == {
        "fid", "category",
        "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"}


def test_hilbert_order_is_descending_curve_index():
    """hilbertSort sorts by DESCENDING hilbert value
    (packedrtree.h:105-108)."""
    bx0 = np.array([0.0, 10.0, 0.0, 10.0])
    by0 = np.array([0.0, 0.0, 10.0, 10.0])
    order = hilbert_order(bx0, by0, bx0 + 1, by0 + 1)
    minx, miny = 0.0, 0.0
    hx = np.floor(65535 * ((bx0 + bx0 + 1) / 2) / 11.0).astype(np.uint32)
    hy = np.floor(65535 * ((by0 + by0 + 1) / 2) / 11.0).astype(np.uint32)
    hv = _hilbert_u32(hx, hy).astype(np.int64)
    assert (np.diff(hv[order]) <= 0).all()


def test_fgb_dataset_sharded(fgb_path, ray_session):
    src = read_fgb(fgb_path)
    for n in (1, 3, 8):
        tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
                else b
                for b in fgb_dataset(fgb_path, num_shards=n)
                .iter_batches(batch_format="pyarrow", batch_size=None)]
        got = pa.concat_tables(tabs, promote_options="default").sort_by("fid")
        assert got.num_rows == 64, f"shards={n}"
        assert got["geometry"].to_pylist() == src["geometry"].to_pylist()


def test_fgb_dataset_bbox(fgb_path, ray_session):
    bb = BB_HOT
    want = read_fgb(fgb_path, bbox=bb)
    assert want.num_rows > 0
    tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in fgb_dataset(fgb_path, bbox=bb, num_shards=3)
            .iter_batches(batch_format="pyarrow", batch_size=None)]
    got = pa.concat_tables(tabs, promote_options="default")
    assert got.num_rows == want.num_rows
    assert set(got["name"].to_pylist()) == set(want["name"].to_pylist())


def test_unindexed_file(tmp_path):
    t = polygons_table(16)
    p = str(tmp_path / "u.fgb")
    write_fgb(p, t, index_node_size=0)
    info = read_fgb_info(p)
    assert info["index_node_size"] == 0 and info["index_size"] == 0
    out = read_fgb(p)  # storage order = input order
    assert out["geometry"].to_pylist() == t["geometry"].to_pylist()


def test_bad_magic_raises(tmp_path):
    p = str(tmp_path / "bad.fgb")
    with open(p, "wb") as f:
        f.write(b"XXXXXXXX" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        read_fgb_info(p)


# ----------------------------------------------- reference fixtures
REFDIR = "/root/reference/autotest/ogr/data/testfgb"


@pytest.mark.skipif(not __import__("os").path.isdir(REFDIR),
                    reason="reference fixtures unavailable")
class TestReferenceFixtures:
    def test_poly(self):
        """ogr_flatgeobuf.py test 2: extent + spatial filter counts."""
        info = read_fgb_info(f"{REFDIR}/poly.fgb")
        assert info["envelope"] == (478315.53125, 4762880.5,
                                    481645.3125, 4765610.5)
        t = read_fgb(f"{REFDIR}/poly.fgb")
        assert t.num_rows == 10
        assert read_fgb(f"{REFDIR}/poly.fgb",
                        bbox=(478315.531250, 4762880.5,
                              481645.3125, 4765610.5)).num_rows == 10
        assert read_fgb(f"{REFDIR}/poly.fgb",
                        bbox=(878315.53, 4762880.5,
                              881645.31, 4765610.5)).num_rows == 0
        # bbox-only filter = the reference's no-GEOS expectation (5)
        assert read_fgb(f"{REFDIR}/poly.fgb",
                        bbox=(479586.0, 4764618.6,
                              479808.2, 4764797.8)).num_rows == 5

    def test_poly_no_index(self):
        """test 2_1: same counts through the sequential-scan path."""
        info = read_fgb_info(f"{REFDIR}/poly_no_index.fgb")
        assert info["index_size"] == 0
        assert read_fgb(f"{REFDIR}/poly_no_index.fgb").num_rows == 10
        assert read_fgb(f"{REFDIR}/poly_no_index.fgb",
                        bbox=(878315.53, 4762880.5,
                              881645.31, 4765610.5)).num_rows == 0

    def test_datatypes(self):
        """test_ogr_flatgeobuf_datatypes goldens."""
        r = read_fgb(f"{REFDIR}/testdatatypes.fgb").to_pylist()[0]
        assert r["int"] == 1
        assert r["int64"] == 1234567890123
        assert r["double"] == 1.25
        assert r["string"] == "my string"
        assert r["datetime"] == "2019/10/15 12:34:56.789+00"

    def test_alldatatypes(self):
        """test_ogr_flatgeobuf_alldatatypes goldens (full ColumnType
        enum incl. the ULong->Real fallback)."""
        r = read_fgb(f"{REFDIR}/alldatatypes.fgb").to_pylist()[0]
        assert r["byte"] == -1 and r["ubyte"] == 255
        assert r["bool"] is True
        assert r["short"] == -1 and r["ushort"] == 65535
        assert r["int"] == -1 and r["uint"] == 4294967295
        assert r["long"] == -1
        assert r["ulong"] == float(2 ** 64 - 1)
        assert r["float"] == 0 and r["double"] == 0
        assert r["string"] == "X" and r["json"] == "X"
        assert r["datetime"] == "2020/02/29 12:34:56+00"
        assert r["binary"] == b"\x58"
