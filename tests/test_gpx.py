"""GPX driver vs the reference's own test.gpx expectations
(autotest/ogr/ogr_gpx.py)."""

import numpy as np
import pytest

from gdal_ray.functions.wkb import Geom, geom_to_wkb, geom_to_wkt, wkb_to_geom
from gdal_ray.sources.gpx import read_gpx, write_gpx

FIX = "/root/reference/autotest/ogr/data/gpx/test.gpx"


@pytest.fixture(scope="module")
def layers():
    with open(FIX, "rb") as fh:
        return read_gpx(fh.read())


def test_five_layers(layers):
    # ogr_gpx_1: GetLayerCount() == 5
    assert set(layers) == {"waypoints", "routes", "route_points",
                           "tracks", "track_points"}


def test_waypoints_fields_and_geoms(layers):
    # ogr_gpx_1 expectations, field by field
    w = layers["waypoints"]
    assert w["ele"].to_pylist() == [2.0, None]
    assert w["name"].to_pylist() == ["waypoint name", None]
    assert w["link1_href"].to_pylist() == ["href", None]
    assert w["link1_text"].to_pylist() == ["text", None]
    assert w["link1_type"].to_pylist() == ["type", None]
    assert w["link2_href"].to_pylist() == ["href2", None]
    wkts = [geom_to_wkt(wkb_to_geom(g)) for g in w["geometry"].to_pylist()]
    assert wkts == ["POINT (1 0)", "POINT (4 3)"]


def test_routes_incl_empty(layers):
    # ogr_gpx_2: LINESTRING (6 5,9 8,12 11) then LINESTRING EMPTY
    r = layers["routes"]
    gs = [wkb_to_geom(g) for g in r["geometry"].to_pylist()]
    assert geom_to_wkt(gs[0]) == "LINESTRING (6 5, 9 8, 12 11)"
    assert sum(len(x) for x in gs[1].rings) == 0


def test_route_points(layers):
    # ogr_gpx_3
    rp = layers["route_points"]
    assert rp["name"].to_pylist() == ["route point name", None, None]
    assert rp["route_fid"].to_pylist() == [0, 0, 0]
    assert rp["route_point_id"].to_pylist() == [0, 1, 2]
    assert geom_to_wkt(wkb_to_geom(rp["geometry"][0].as_py())) == \
        "POINT (6 5)"


def test_tracks_multilinestring(layers):
    # ogr_gpx_4: 2-seg multilinestring then two empties
    t = layers["tracks"]
    gs = [wkb_to_geom(g) for g in t["geometry"].to_pylist()]
    assert geom_to_wkt(gs[0]) == \
        "MULTILINESTRING ((15 14, 18 17), (21 20, 24 23))"
    assert len(gs) == 3
    assert all(sum(len(r) for r in g.rings) == 0 for g in gs[1:])


def test_track_points(layers):
    # ogr_gpx_5
    tp = layers["track_points"]
    assert tp["name"].to_pylist() == ["track point name", None, None, None]
    assert tp["track_seg_id"].to_pylist() == [0, 0, 1, 1]
    assert tp["track_seg_point_id"].to_pylist() == [0, 1, 0, 1]
    assert geom_to_wkt(wkb_to_geom(tp["geometry"][0].as_py())) == \
        "POINT (15 14)"


def test_writer_roundtrip():
    import pyarrow as pa

    wpts = pa.table({
        "geometry": pa.array(
            [geom_to_wkb(Geom(1, [np.array([[x, x + 1.0]])]))
             for x in (1.0, 2.5)], pa.binary()),
        "ele": pa.array([10.0, None]),
        "name": pa.array(["a", "b & c"]),
    })
    trks = pa.table({
        "geometry": pa.array([geom_to_wkb(Geom(5, [
            np.array([[0.0, 0.0], [1.0, 1.0]]),
            np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 4.0]])]))],
            pa.binary()),
        "name": pa.array(["t<1>"]),
    })
    text = write_gpx(waypoints=wpts, tracks=trks)
    back = read_gpx(text.encode())
    w = back["waypoints"]
    assert w["ele"].to_pylist() == [10.0, None]
    assert w["name"].to_pylist() == ["a", "b & c"]
    g = wkb_to_geom(back["tracks"]["geometry"][0].as_py())
    assert [len(r) for r in g.rings] == [2, 3]
    assert back["tracks"]["name"].to_pylist() == ["t<1>"]
    assert back["track_points"].num_rows == 5
