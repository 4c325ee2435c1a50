"""OGR CSV driver tests (ogr/ogrsf_frmts/csv semantics: .csvt types,
WKT / X-Y geometry resolution, sharded Dataset reads, AS_WKT/AS_XY
writer roundtrips)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkb, wkb_to_geom, wkt_to_geom
from gdal_ray.sources.ogrcsv import (csv_dataset, read_csv_layer,
                                     write_csv_layer)


def _poly_table(n=5):
    wkbs = [geom_to_wkb(wkt_to_geom(
        f"POLYGON (({i} 0, {i + 1} 0, {i + 1} 1, {i} 1, {i} 0))"))
        for i in range(n)]
    return pa.table({
        "fid": pa.array(range(n), pa.int64()),
        "name": pa.array([f"zone_{i}" for i in range(n)], pa.string()),
        "score": pa.array([i * 1.5 for i in range(n)], pa.float64()),
        "geometry": pa.array(wkbs, pa.binary()),
    })


def test_wkt_roundtrip_with_csvt(tmp_path):
    t = _poly_table()
    p = str(tmp_path / "zones.csv")
    write_csv_layer(p, t, geometry="AS_WKT", create_csvt=True)
    got = read_csv_layer(p)
    assert got["fid"].type == pa.int64()
    assert got["score"].type == pa.float64()
    assert "geometry" in got.column_names
    for a, b in zip(got["geometry"].to_pylist(), t["geometry"].to_pylist()):
        ga, gb = wkb_to_geom(a), wkb_to_geom(b)
        np.testing.assert_allclose(ga.rings[0], gb.rings[0])
    assert got["name"].to_pylist() == t["name"].to_pylist()


def test_xy_point_roundtrip(tmp_path):
    from gdal_ray.functions.wkb import points_to_wkb

    x = np.array([1.5, -2.25, 30.0])
    y = np.array([4.0, 5.5, -6.125])
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "geometry": pa.array(points_to_wkb(x, y), pa.binary())})
    p = str(tmp_path / "pts.csv")
    write_csv_layer(p, t, geometry="AS_XY", create_csvt=True)
    got = read_csv_layer(p)
    gx, gy = [], []
    for b in got["geometry"].to_pylist():
        g = wkb_to_geom(b)
        gx.append(g.rings[0][0, 0])
        gy.append(g.rings[0][0, 1])
    np.testing.assert_allclose(gx, x)
    np.testing.assert_allclose(gy, y)


def test_lonlat_possible_names_no_csvt(tmp_path):
    p = tmp_path / "ll.csv"
    p.write_text("id,lon,lat,label\n1,10.5,45.25,a\n2,-3.0,7.125,b\n")
    got = read_csv_layer(str(p))
    # autodetect: int64 id, float lon/lat, string label + point geometry
    assert got["id"].type == pa.int64()
    assert got["lon"].type == pa.float64()
    g = wkb_to_geom(got["geometry"].to_pylist()[1])
    np.testing.assert_allclose(g.rings[0][0], [-3.0, 7.125])


def test_semicolon_and_boolean(tmp_path):
    p = tmp_path / "semi.csv"
    p.write_text("a;b;flag\n1;x y,z;1\n2;w;0\n")
    (tmp_path / "semi.csvt").write_text('"Integer","String","Integer(Boolean)"\n')
    got = read_csv_layer(str(p))
    assert got["a"].type == pa.int32()
    assert got["flag"].to_pylist() == [True, False]
    assert got["b"].to_pylist() == ["x y,z", "w"]


def test_width_qualifiers_in_csvt(tmp_path):
    p = tmp_path / "w.csv"
    p.write_text("n,v\n7,1.25\n")
    (tmp_path / "w.csvt").write_text('"Integer(6)","Real(10.2)"\n')
    got = read_csv_layer(str(p))
    assert got["n"].type == pa.int32()
    assert got["v"].type == pa.float64()


def test_sharded_dataset_matches_whole_read(ray_session, tmp_path):
    n = 1000
    rng = np.random.default_rng(11)
    lines = ["id,lon,lat,val"]
    for i in range(n):
        lines.append(f"{i},{rng.uniform(-180, 180):.6f},"
                     f"{rng.uniform(-85, 85):.6f},{rng.integers(0, 99)}")
    p = tmp_path / "big.csv"
    p.write_text("\n".join(lines) + "\n")
    whole = read_csv_layer(str(p))
    ds = csv_dataset(str(p), num_shards=7)
    tabs = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    got = pa.concat_tables(tabs).sort_by("id")
    assert got.num_rows == n
    assert got["id"].to_pylist() == whole.sort_by("id")["id"].to_pylist()
    np.testing.assert_allclose(got["lon"].to_pandas(),
                               whole.sort_by("id")["lon"].to_pandas())
    assert got["geometry"].to_pylist() == \
        whole.sort_by("id")["geometry"].to_pylist()


def test_as_xy_rejects_polygons(tmp_path):
    with pytest.raises(ValueError):
        write_csv_layer(str(tmp_path / "x.csv"), _poly_table(),
                        geometry="AS_XY")


def test_ragged_rows_keep_csvt_types(tmp_path):
    # ogrcsvlayer.cpp ignores extra fields and null-pads short rows
    # WITHOUT discarding declared field types; the string-reparse
    # fallback must cast declared columns back.
    p = str(tmp_path / "ragged.csv")
    with open(p, "w") as f:
        f.write("fid,name,score\n")
        f.write("1,a,2.5\n")
        f.write("2,b\n")                    # short row -> score null
        f.write("3,c,7.5,EXTRA,MORE\n")     # long row -> extras ignored
    with open(str(tmp_path / "ragged.csvt"), "w") as f:
        f.write('"Integer","String","Real"\n')
    got = read_csv_layer(p)
    assert got["fid"].type == pa.int32()
    assert got["score"].type == pa.float64()
    assert got["fid"].to_pylist() == [1, 2, 3]
    assert got["score"].to_pylist() == [2.5, None, 7.5]
    assert got["name"].to_pylist() == ["a", "b", "c"]
