"""Distributed exact quantiles + layer-algebra overlay kernels."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import Geom, geom_to_wkb, rect_polygon, wkt_to_geom
from gdal_ray.stages.layer_algebra import (clip_ring_to_convex,
                                           intersection_area)


def test_quantile_cont_matches_numpy(ray_session):
    import ray.data

    from gdal_ray.stages.quantile import order_statistics, quantile_cont

    rng = np.random.default_rng(21)
    vals = rng.normal(100, 40, 20001)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    qs = [0.1, 0.25, 0.5, 0.9]
    got = quantile_cont(ds, "v", qs)
    want = np.quantile(vals, qs)  # numpy 'linear' == quantile_cont
    for q, w in zip(qs, want):
        assert got[q] == pytest.approx(w, abs=1e-9)
    s = np.sort(vals)
    os_ = order_statistics(ds, "v", [0, 123, 20000])
    assert os_[0] == pytest.approx(s[0])
    assert os_[123] == pytest.approx(s[123])
    assert os_[20000] == pytest.approx(s[-1])


def test_quantile_many_duplicates(ray_session):
    import ray.data

    from gdal_ray.stages.quantile import quantile_cont

    vals = np.repeat([1.0, 2.0, 3.0], 1000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4)
    got = quantile_cont(ds, "v", [0.5])
    assert got[0.5] == pytest.approx(np.quantile(vals, 0.5))


def test_clip_ring_to_convex_triangle():
    rect = rect_polygon(0, 0, 10, 10).rings[0]
    tri = np.array([[5, -5], [15, 5], [5, 15], [5, -5]], float)
    out = clip_ring_to_convex(rect, tri)
    from gdal_ray.functions.geom import ring_area

    # triangle covers the right part of the square; clipped area known:
    # the half-plane x+y>=... compute via brute-force monte carlo
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, (200000, 2))

    def in_tri(p):
        # barycentric-ish: triangle (5,-5),(15,5),(5,15)
        a, b, c = np.array([5, -5.0]), np.array([15, 5.0]), np.array([5, 15.0])
        def s(p1, p2, p3):
            return (p1[..., 0] - p3[0]) * (p2[1] - p3[1]) - (p2[0] - p3[0]) * (p1[..., 1] - p3[1])
        d1, d2, d3 = s(p, a, b), s(p, b, c), s(p, c, a)
        neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
        pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
        return ~(neg & pos)

    mc = in_tri(pts).mean() * 100.0
    assert abs(abs(ring_area(out)) - mc) < 0.5


def test_intersection_area_rects():
    a = rect_polygon(0, 0, 10, 10)
    b = rect_polygon(5, 5, 20, 20)
    assert intersection_area(a, b) == pytest.approx(25.0)
    # disjoint
    assert intersection_area(a, rect_polygon(20, 20, 30, 30)) == 0.0
    # holes subtract
    holed = Geom(3, [rect_polygon(0, 0, 10, 10).rings[0],
                     rect_polygon(2, 2, 4, 4).rings[0]], [2])
    assert intersection_area(holed, rect_polygon(0, 0, 10, 10)) == pytest.approx(96.0)


def test_intersection_nonconvex_b_general_overlay():
    """Non-convex B now routes through the Greiner-Hormann overlay:
    the arrowhead polygon's area inside the square is its own area
    (it is contained), = 100 - notch triangle (5*10/2... analytic:
    shoelace of the arrowhead itself)."""
    from gdal_ray.functions.geom import ring_area

    a = rect_polygon(0, 0, 10, 10)
    b = wkt_to_geom("POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))")
    expect = abs(ring_area(b.rings[0]))
    assert intersection_area(a, b) == pytest.approx(expect, abs=1e-6)
