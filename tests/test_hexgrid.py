"""Aperture-7 hexagonal cell index invariants (functions/hexgrid.py —
the north rule's H3-style join key; structure per h3geo.org, ids the
engine's own like the S2 module)."""
import numpy as np
import pytest

from gdal_ray.functions.hexgrid import (cell_center, cell_parent,
                                        cell_res, hex_cell, k_ring)


def _rng():
    return np.random.default_rng(17)


def test_deterministic_and_res_bits():
    lon = np.array([-73.99, 2.35, 139.7])
    lat = np.array([40.73, 48.86, 35.68])
    ids = hex_cell(lon, lat, 9)
    assert np.array_equal(ids, hex_cell(lon, lat, 9))
    assert np.all(cell_res(ids) == 9)
    assert len(np.unique(ids)) == 3


def test_nearby_points_share_cell():
    # points ~10 m apart at res 5 (cell size ~ tens of km)
    base = hex_cell(2.3500, 48.8600, 5)
    near = hex_cell(2.3501, 48.8601, 5)
    assert base == near


def test_center_roundtrip():
    rng = _rng()
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-80, 80, 500)
    for res in (3, 6, 9):
        ids = hex_cell(lon, lat, res)
        clon, clat = cell_center(ids)
        # re-encoding the centre gives the same cell
        assert np.array_equal(hex_cell(clon, clat, res), ids)


def test_aperture7_cell_count_growth():
    rng = _rng()
    lon = rng.uniform(-10, 10, 40000)
    lat = rng.uniform(35, 55, 40000)
    n4 = len(np.unique(hex_cell(lon, lat, 4)))
    n5 = len(np.unique(hex_cell(lon, lat, 5)))
    # aperture 7: one resolution step multiplies cell count ~7x
    # (res 4->5 keeps the sample un-saturated)
    assert 5.0 < n5 / n4 < 9.0


def test_parent_containment():
    rng = _rng()
    lon = rng.uniform(-10, 10, 5000)
    lat = rng.uniform(35, 55, 5000)
    child = hex_cell(lon, lat, 9)
    parent_of_point = hex_cell(lon, lat, 8)
    parent_of_child = cell_parent(child, 8)
    # h3ToParent-style nesting: the child's centre parent matches the
    # point's parent for the vast majority (boundary truncation like
    # H3's own ~7-child approximation)
    agree = np.mean(parent_of_child == parent_of_point)
    assert agree > 0.9


def test_k_ring():
    c = int(hex_cell(2.35, 48.86, 9))
    ring = k_ring(c, 1)
    assert len(ring) == 7 and c in ring
    assert len(k_ring(c, 2)) == 19
    # neighbours are distinct and at the same resolution
    assert len(np.unique(ring)) == 7
    assert np.all(cell_res(ring) == 9)


def test_res_validation():
    with pytest.raises(ValueError):
        hex_cell(0.0, 0.0, 16)
