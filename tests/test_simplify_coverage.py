"""`gdal vector simplify-coverage` conformance (VERDICT r4 #4).

Reference: apps/gdalalg_vector_simplify_coverage.cpp + GEOS
CoverageSimplifier contract; the count/topology assertions mirror
autotest/utilities/test_gdalalg_vector_simplify_coverage.py (feature
count preserved, point count reduced, polygonal-only inputs,
tolerance >= 0).
"""

import os
from collections import Counter

import numpy as np
import pytest

from gdal_ray.functions.geom import geom_area
from gdal_ray.functions.wkb import Geom, geom_to_wkb, wkb_to_geom
from gdal_ray.stages.coverage import (dp_chain, jagged_coverage,
                                      segments_table, simplify_arc,
                                      simplify_coverage_table)

POLY = "/root/reference/autotest/ogr/data/poly.shp"


def _mult(fids, wkbs):
    t = segments_table(np.asarray(fids, np.int64), wkbs)
    return Counter(t["seg"].to_numpy().tolist())


def test_dp_chain_endpoints_and_tolerance():
    pts = np.array([[0.0, 0], [1, 0.4], [2, -0.4], [3, 0], [4, 2],
                    [5, 0]])
    out = dp_chain(pts, 0.5)
    assert (out[0] == pts[0]).all() and (out[-1] == pts[-1]).all()
    assert len(out) < len(pts)
    assert any((out == pts[4]).all(axis=1))  # the 2.0 spike survives


def test_simplify_arc_direction_invariant():
    rng = np.random.default_rng(5)
    pts = np.c_[np.linspace(0, 10, 40), rng.normal(0, 0.4, 40)]
    fwd = simplify_arc(pts, 0.5)
    rev = simplify_arc(pts[::-1], 0.5)
    assert np.array_equal(fwd, rev[::-1])


@pytest.mark.skipif(not os.path.exists(POLY), reason="reference absent")
def test_poly_shp_contract(ray_session):
    """The reference's own autotest assertions on its own fixture:
    feature count preserved, SRS-agnostic geometry count, fewer
    points; plus the topology invariant the coverage guarantees."""
    from gdal_ray.sources.shapefile import read_shapefile

    t = read_shapefile(POLY)
    fids = np.arange(t.num_rows, dtype=np.int64)
    wkbs = [b.as_py() for b in t["geometry"]]
    out = simplify_coverage_table(fids, wkbs, 2.0)
    assert out.num_rows == t.num_rows
    pts_before = sum(len(r) for w in wkbs for r in wkb_to_geom(w).rings)
    assert int(out["n_pts"].to_numpy().sum()) < pts_before
    # every interior (shared) segment of the output is still shared
    wo = [w.as_py() for w in out["geometry"]]
    after = _mult(out["fid"].to_numpy(), wo)
    assert set(Counter(after.values())) <= {1, 2}


def test_jagged_coverage_exact_partition(ray_session):
    """Shared arcs are replaced identically on both sides, so the
    simplified partition still sums to the frame area bit-for-bit
    with preserve_boundary=True."""
    fids, wkbs = jagged_coverage()
    before = Counter(_mult(fids, wkbs).values())
    out = simplify_coverage_table(fids, wkbs, 1.0,
                                  preserve_boundary=True)
    wo = [w.as_py() for w in out["geometry"]]
    areas = [geom_area(wkb_to_geom(w)) for w in wo]
    assert abs(sum(areas) - 9216.0) < 1e-9
    after = Counter(_mult(out["fid"].to_numpy(), wo).values())
    # exterior frame preserved verbatim -> same boundary segment count
    assert after[1] == before[1]
    assert int(out["n_pts"].to_numpy().sum()) < 16 * 97


def test_preserve_boundary_false_simplifies_exterior(ray_session):
    fids, wkbs = jagged_coverage()
    kept = simplify_coverage_table(fids, wkbs, 1.0,
                                   preserve_boundary=True)
    free = simplify_coverage_table(fids, wkbs, 1.0,
                                   preserve_boundary=False)
    assert int(free["n_pts"].to_numpy().sum()) <= \
        int(kept["n_pts"].to_numpy().sum())


def test_non_polygonal_raises(ray_session):
    pt = geom_to_wkb(Geom(1, [np.array([[3.0, 8.0]])]))
    with pytest.raises(Exception,
                       match="can only be performed on polygonal"):
        simplify_coverage_table(np.array([0], np.int64), [pt], 2.0)


def test_bad_tolerance():
    fids, wkbs = jagged_coverage()
    for tol in (-5.0, float("nan")):
        with pytest.raises(ValueError, match="should be >= 0"):
            simplify_coverage_table(fids, wkbs, tol)


def test_multipolygon_feature_keeps_its_parts(ray_session):
    """A MultiPolygon feature must come back as a MultiPolygon with
    its shells grouped per part — not one polygon whose extra shells
    subtract as holes (round-5 review finding)."""
    sq1 = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])
    sq2 = sq1 + 5.0
    mp = geom_to_wkb(Geom(6, [sq1, sq2], poly_ring_counts=[1, 1]))
    out = simplify_coverage_table(np.array([0], np.int64), [mp], 0.1)
    g = wkb_to_geom(out["geometry"][0].as_py())
    assert g.kind == 6
    assert g.poly_ring_counts == [1, 1]
    assert abs(geom_area(g) - 2.0) < 1e-12
