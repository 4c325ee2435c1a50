"""Non-convex overlay (Greiner-Hormann) vs analytic and grid-PIP
oracles (reference overlays delegate to GEOS, ogrlayer.cpp:3345+)."""

import numpy as np
import pytest

from gdal_ray.functions.overlay import (polygon_intersection,
                                        polygon_intersection_area,
                                        _point_in_ring)


def rect(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], np.float64)


L_SHAPE = np.array([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)],
                   np.float64)

STAR = np.array([(2, 0), (2.6, 1.4), (4, 1.5), (3, 2.5), (3.3, 4),
                 (2, 3.2), (0.7, 4), (1, 2.5), (0, 1.5), (1.4, 1.4)],
                np.float64)


def grid_area(poly_a, poly_b, n=400, lo=-0.5, hi=4.5):
    """Independent oracle: dense-grid PIP area of A ∩ B."""
    xs = np.linspace(lo, hi, n)
    cell = (hi - lo) / (n - 1)
    count = 0
    for y in xs:
        for x in xs:
            if _point_in_ring((x, y), poly_a) and _point_in_ring((x, y), poly_b):
                count += 1
    return count * cell * cell


def test_convex_rect_cases():
    assert polygon_intersection_area(rect(0, 0, 2, 2), rect(1, 1, 3, 3)) \
        == pytest.approx(1.0)
    assert polygon_intersection_area(rect(0, 0, 2, 2), rect(5, 5, 6, 6)) == 0.0
    # containment both ways
    assert polygon_intersection_area(rect(0, 0, 4, 4), rect(1, 1, 2, 2)) \
        == pytest.approx(1.0)
    assert polygon_intersection_area(rect(1, 1, 2, 2), rect(0, 0, 4, 4)) \
        == pytest.approx(1.0)


def test_l_shape_analytic():
    # L ∩ [2,3]x[0.25,0.75]: inside the L's bottom bar -> full 0.5
    assert polygon_intersection_area(L_SHAPE, rect(2, 0.25, 3, 0.75)) \
        == pytest.approx(0.5)
    # L ∩ [2,3]x[2,3]: the notch — empty
    assert polygon_intersection_area(L_SHAPE, rect(2, 2, 3, 3)) == 0.0
    # L ∩ [0.5,2.5]x[0.5,2.5]: bottom bar strip 2x0.5 + left bar 0.5x1.5
    assert polygon_intersection_area(L_SHAPE, rect(0.5, 0.5, 2.5, 2.5)) \
        == pytest.approx(2.0 * 0.5 + 0.5 * 1.5)
    # non-convex SUBJECT and non-convex CLIP (L vs rotated L)
    l2 = L_SHAPE[:, ::-1].copy()  # mirrored L (swap x/y) — same shape
    a = polygon_intersection_area(L_SHAPE, l2)
    b = polygon_intersection_area(l2, L_SHAPE)
    assert a == pytest.approx(b)


def test_multi_region_result():
    """A U-shaped clip over a bar: two disjoint intersection rings."""
    u_shape = np.array([(0, 0), (4, 0), (4, 3), (3, 3), (3, 1),
                        (1, 1), (1, 3), (0, 3)], np.float64)
    bar = rect(-0.5, 1.5, 4.5, 2.5)
    rings = polygon_intersection(u_shape, bar)
    assert len(rings) == 2
    total = polygon_intersection_area(u_shape, bar)
    assert total == pytest.approx(2 * 1.0)  # two 1x1 columns


def test_star_vs_lshape_grid_oracle():
    exact = polygon_intersection_area(STAR, L_SHAPE)
    approx = grid_area(STAR, L_SHAPE)
    assert exact == pytest.approx(approx, abs=0.05)
    # symmetry
    assert polygon_intersection_area(L_SHAPE, STAR) == pytest.approx(exact)


def test_degenerate_shared_edge_perturbs():
    # shares an edge with the subject: degeneracy path
    a = polygon_intersection_area(rect(0, 0, 2, 2), rect(2, 0, 4, 2))
    assert a == pytest.approx(0.0, abs=1e-6)
    b = polygon_intersection_area(rect(0, 0, 2, 2), rect(1, 0, 3, 2))
    assert b == pytest.approx(2.0, abs=1e-6)


def test_layer_algebra_nonconvex_b():
    """LayerAlgebra no longer raises on non-convex B: intersection
    with an L-shaped B matches the general overlay result."""
    from gdal_ray.functions.wkb import Geom, geom_to_wkb
    from gdal_ray.stages.layer_algebra import LayerAlgebra, intersection_area
    from gdal_ray.functions.wkb import wkb_to_geom

    l_ring = np.vstack([L_SHAPE, L_SHAPE[:1]])
    b = Geom(3, [l_ring], [1])
    a = Geom(3, [np.vstack([rect(0.5, 0.5, 2.5, 2.5),
                            rect(0.5, 0.5, 2.5, 2.5)[:1]])], [1])
    got = intersection_area(a, b)
    assert got == pytest.approx(2.0 * 0.5 + 0.5 * 1.5)


def test_overlay_edge_cases():
    # identical polygons resolve via perturbation to the shared area
    assert polygon_intersection_area(rect(0, 0, 2, 2), rect(0, 0, 2, 2)) \
        == pytest.approx(4.0, abs=1e-6)
    # corner-only touch is empty
    assert polygon_intersection_area(rect(0, 0, 1, 1), rect(1, 1, 2, 2)) == 0.0


def test_sieve_all_small_keeps_values():
    """Every polygon small and no reachable big neighbour: GDAL keeps
    the original values (unmergable chain cycles)."""
    import numpy as np

    from gdal_ray.functions.pixelfuncs import sieve

    g = np.arange(9).reshape(3, 3).astype(np.int32)
    assert np.array_equal(sieve(g, 100, 4), g)
