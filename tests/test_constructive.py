"""Constructive geometry: buffer / Delaunay / MakeValid / union-
difference overlays (reference ogr/ogr_geometry.h:563-591 GEOS
delegations, reimplemented from the public algorithms)."""

import numpy as np
import pytest

from gdal_ray.functions.constructive import (buffer_area, buffer_point,
                                             delaunay, make_valid_area,
                                             make_valid_ring)
from gdal_ray.functions.geom import ring_area
from gdal_ray.functions.overlay import (polygon_difference, polygon_union,
                                        _point_in_ring, unary_union_area)


def rect(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], np.float64)


def _ngon_circle_area(r, quadsegs=8):
    n = 4 * quadsegs
    return 0.5 * n * r * r * np.sin(2 * np.pi / n)


def test_buffer_point_area():
    ring = buffer_point(3.0, 4.0, 2.0)
    assert abs(ring_area(ring)) == pytest.approx(_ngon_circle_area(2.0),
                                                 rel=1e-9)


def test_buffer_rect_analytic():
    """Buffer of a rectangle: A + P*r + (n-gon circle area); the four
    corner arcs together make one full n-gon disc."""
    r = 0.5
    a = buffer_area(rect(0, 0, 4, 3), r)
    expect = 12.0 + 14.0 * r + _ngon_circle_area(r)
    assert a == pytest.approx(expect, rel=1e-3)


def test_buffer_lshape_grows_monotonically():
    L = np.array([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)], np.float64)
    a1 = buffer_area(L, 0.2)
    a2 = buffer_area(L, 0.4)
    base = abs(ring_area(np.vstack([L, L[:1]])))
    assert base < a1 < a2


def test_union_difference_rects():
    u = polygon_union(rect(0, 0, 2, 2), rect(1, 1, 3, 3))
    assert len(u) == 1
    assert abs(ring_area(u[0])) == pytest.approx(7.0)
    d = polygon_difference(rect(0, 0, 2, 2), rect(1, 1, 3, 3))
    assert sum(abs(ring_area(r)) for r in d) == pytest.approx(3.0)
    # difference that would create a hole raises
    with pytest.raises(NotImplementedError):
        polygon_difference(rect(0, 0, 4, 4), rect(1, 1, 2, 2))


def test_unary_union_inclusion_exclusion():
    rings = [rect(0, 0, 2, 2), rect(1, 0, 3, 2), rect(2, 0, 4, 2)]
    # chain union: [0,4]x[0,2] = 8; overlaps 1 each, no triple overlap
    assert unary_union_area(rings) == pytest.approx(8.0, abs=1e-6)
    rings2 = [rect(0, 0, 2, 2), rect(1, 1, 3, 3), rect(0.5, 0.5, 2.5, 2.5)]
    # independent oracle: dense grid
    n = 300
    xs = np.linspace(-0.25, 3.25, n)
    cell = (3.5 / (n - 1)) ** 2
    cnt = 0
    for y in xs:
        for x in xs:
            if any(_point_in_ring((x, y), r) for r in rings2):
                cnt += 1
    assert unary_union_area(rings2) == pytest.approx(cnt * cell, abs=0.08)


def test_delaunay_square_grid():
    pts = np.array([(x, y) for y in range(4) for x in range(4)], np.float64)
    tris = delaunay(pts)
    # Euler: for n points with h on the hull, triangles = 2n - h - 2
    assert len(tris) == 2 * 16 - 12 - 2
    # empty circumcircle property (the Delaunay invariant)
    for t in tris:
        a, b, c = pts[t]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
              + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
              + (c @ c) * (b[0] - a[0])) / d
        rr = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        for i, p in enumerate(pts):
            if i in t:
                continue
            assert (p[0] - ux) ** 2 + (p[1] - uy) ** 2 >= rr * (1 - 1e-9)


def test_make_valid_bowtie():
    bow = np.array([(0, 0), (2, 2), (2, 0), (0, 2)], np.float64)
    parts = make_valid_ring(bow)
    assert len(parts) == 2
    # two wing triangles (base 2, height 1) of area 1 each; the raw
    # shoelace of the bow-tie is 0 — the repair recovers 2.0
    assert abs(ring_area(np.vstack([bow, bow[:1]]))) == pytest.approx(0.0)
    assert make_valid_area(bow) == pytest.approx(2.0)
    # already-simple ring passes through
    simple = rect(0, 0, 3, 2)
    assert len(make_valid_ring(simple)) == 1
    assert make_valid_area(simple) == pytest.approx(6.0)


def test_swap_xy_matches_reference():
    """test_gdalalg_vector_swap_xy.py: POINT (1 2) -> POINT (2 1);
    rings swap per vertex, polygon structure preserved."""
    from gdal_ray.functions.constructive import swap_xy
    from gdal_ray.functions.wkb import geom_to_wkt, wkt_to_geom

    g = swap_xy(wkt_to_geom("POINT (1 2)"))
    assert geom_to_wkt(g) == "POINT (2 1)"
    p = swap_xy(wkt_to_geom(
        "POLYGON ((0 0,4 0,4 2,0 2,0 0),(1 1,2 1,1 1.5,1 1))"))
    back = swap_xy(p)
    assert geom_to_wkt(back) == geom_to_wkt(wkt_to_geom(
        "POLYGON ((0 0,4 0,4 2,0 2,0 0),(1 1,2 1,1 1.5,1 1))"))
    assert p.rings[0][1].tolist() == [0.0, 4.0]
