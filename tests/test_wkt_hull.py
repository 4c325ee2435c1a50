"""WKT codec round-trips, convex hull, swq custom functions."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from gdal_ray.functions.geom import convex_hull, geom_area, ring_area
from gdal_ray.functions.wkb import (Geom, MULTIPOLYGON, geom_to_wkb,
                                    geom_to_wkt, rect_polygon, wkb_to_geom,
                                    wkt_to_geom)


def test_wkt_point_roundtrip():
    g = wkt_to_geom("POINT (2.5 -3.75)")
    assert g.kind == 1
    np.testing.assert_allclose(g.rings[0], [[2.5, -3.75]])
    assert geom_to_wkt(g) == "POINT (2.5 -3.75)"


def test_wkt_polygon_with_hole_roundtrip():
    wkt = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
           "(2 2, 4 2, 4 4, 2 4, 2 2))")
    g = wkt_to_geom(wkt)
    assert len(g.rings) == 2
    assert geom_area(g) == pytest.approx(100 - 4)
    g2 = wkt_to_geom(geom_to_wkt(g))
    for a, b in zip(g.rings, g2.rings):
        np.testing.assert_allclose(a, b)


def test_wkt_multipolygon_and_wkb_cross_codec():
    m = Geom(MULTIPOLYGON,
             [rect_polygon(0, 0, 1, 1).rings[0],
              rect_polygon(5, 5, 7, 8).rings[0]], [1, 1])
    wkt = geom_to_wkt(m)
    assert wkt.startswith("MULTIPOLYGON ((")
    g2 = wkt_to_geom(wkt)
    # same geometry through the WKB codec
    g3 = wkb_to_geom(geom_to_wkb(g2))
    assert g3.poly_ring_counts == [1, 1]
    assert geom_area(g3) == pytest.approx(1 + 6)


def test_wkt_linestring_multipoint():
    ls = wkt_to_geom("LINESTRING (0 0, 1 1, 2 0)")
    assert len(ls.rings[0]) == 3
    mp = wkt_to_geom("MULTIPOINT ((1 2), (3 4))")
    np.testing.assert_allclose(mp.rings[0], [[1, 2], [3, 4]])


def test_convex_hull_square_with_interior():
    rng = np.random.default_rng(4)
    inner = rng.uniform(0.2, 0.8, (200, 2))
    corners = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    ring = convex_hull(np.vstack([inner, corners]))
    assert abs(ring_area(ring)) == pytest.approx(1.0)
    assert len(ring) == 5  # 4 corners + closure


def test_convex_hull_collinear():
    pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], float)
    ring = convex_hull(pts)
    # degenerate hull: area 0
    assert abs(ring_area(ring)) == pytest.approx(0.0)


def test_wrapdateline_split():
    from gdal_ray.functions.geom import wrapdateline_ring

    ring = np.array([[170, 0], [190, 0], [190, 10], [170, 10], [170, 0]],
                    np.float64)
    parts = wrapdateline_ring(ring)
    assert len(parts) == 2
    lons = np.concatenate([p[:, 0] for p in parts])
    assert lons.max() <= 180.0 and lons.min() >= -180.0
    # in-range ring passes through untouched
    ok = np.array([[0, 0], [1, 0], [1, 1], [0, 0]], np.float64)
    assert len(wrapdateline_ring(ok)) == 1


def test_make_valid_ring():
    from gdal_ray.functions.geom import make_valid_ring, ring_area

    # duplicate vertex dropped, ring closed, shell oriented CCW
    r = np.array([[0, 0], [0, 0], [4, 0], [4, 3], [0, 3]], float)
    out = make_valid_ring(r)
    assert len(out) == 5
    assert ring_area(out) == pytest.approx(12.0)   # CCW positive
    hole = make_valid_ring(out, shell=False)
    assert ring_area(hole) == pytest.approx(-12.0)  # holes CW
    # fully-collinear ring has no area even after untwisting -> empty
    assert len(make_valid_ring(
        np.array([[0, 0], [1, 1], [2, 2], [3, 3]], float))) == 0
    # bow-tie untwists: the largest wing triangle comes back, CCW
    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2]], float)
    wing = make_valid_ring(bow)
    assert ring_area(wing) == pytest.approx(1.0)


def test_interpolate_lut_reclassify():
    from gdal_ray.functions.resample import (apply_lut, interpolate_at_point,
                                             reclassify)

    z = np.arange(16, dtype=np.float64).reshape(4, 4)
    gt = (100.0, 10.0, 0.0, 200.0, 0.0, -10.0)
    # world point at the center of pixel (1, 2): x=100+15? px=1.5,py=2.5
    v, ok = interpolate_at_point(z, gt, [115.0], [175.0], "nearest")
    assert ok[0] and v[0] == z[2, 1]
    lut = apply_lut(np.array([0.0, 5.0, 10.0]), [0.0, 10.0], [0.0, 100.0])
    np.testing.assert_allclose(lut, [0.0, 50.0, 100.0])
    rc = reclassify(np.array([1.0, 5.0, 9.0]), [0.0, 4.0, 8.0, 12.0],
                    [10.0, 20.0, 30.0])
    np.testing.assert_allclose(rc, [10.0, 20.0, 30.0])


def test_swq_custom_function():
    from gdal_ray.functions.swq import compile_where, register_function

    register_function("DOUBLE_IT", lambda a: pc.multiply(a, 2))
    t = pa.table({"x": pa.array([1, 5, 10])})
    out = t.filter(compile_where("DOUBLE_IT(x) > 9")(t))
    assert out["x"].to_pylist() == [5, 10]
