"""Contour polyline assembly + distributed tile stitching
(reference alg/contour.cpp:331-383 semantics)."""

import numpy as np
import pytest
import ray.data

from gdal_ray.functions.ccl import (assemble_polylines, contour_segment_count,
                                    contour_segments)
from gdal_ray.stages.contour import contour_lines, grid_to_contour_tiles


def _demo_grid(n=48):
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    # two bumps + a slope: produces closed rings and open lines
    g = (np.exp(-((xx - 14) ** 2 + (yy - 16) ** 2) / 60.0) * 10.0
         + np.exp(-((xx - 33) ** 2 + (yy - 30) ** 2) / 90.0) * 8.0
         + xx * 0.05)
    return g


def test_segment_count_matches_segments():
    g = _demo_grid()
    for level in (2.0, 4.0, 6.0):
        segs = contour_segments(g, level)
        assert len(segs) == contour_segment_count(g, level)


def test_assembly_conserves_segments_and_closes_rings():
    g = _demo_grid()
    segs = contour_segments(g, 4.0)
    lines = assemble_polylines(segs)
    # every segment is used exactly once
    assert sum(len(p) - 1 for p, _ in lines) == len(segs)
    # the bumps produce at least one closed ring at this level
    assert any(closed for _, closed in lines)


def test_interpolated_endpoints_on_grid_edges():
    g = _demo_grid()
    segs = contour_segments(g, 4.0)
    # all endpoints within the cell lattice bounds
    assert segs[:, [0, 2]].max() <= g.shape[1] - 1
    assert segs[:, [1, 3]].max() <= g.shape[0] - 1


def test_distributed_stitch_matches_single_tile(ray_session):
    """Tiled + stitched polylines must match the single-tile result
    as a multiset of (level, closed, n_pts, rounded length)."""
    g = _demo_grid()
    levels = np.array([2.0, 4.0, 6.0])

    def summary(ds):
        rows = []
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            for r in b.to_pylist():
                rows.append((r["level"], r["closed"], r["n_pts"],
                             round(r["length"], 6)))
        return sorted(rows)

    one = ray.data.from_arrow(grid_to_contour_tiles(g, tile=64))
    many = ray.data.from_arrow(grid_to_contour_tiles(g, tile=16))
    assert summary(contour_lines(one, levels)) == \
        summary(contour_lines(many, levels))


def test_contour_reference_analytic(ray_session):
    """Replicates autotest/alg/contour.py test_contour_1: the nested
    1/10/20/25 block raster contoured at interval 10 yields exactly
    one closed ring per level {10, 20}, with world envelopes matching
    the reference's expected values within its own half-pixel
    tolerance."""
    size = 160
    p = 1.0 / size
    g = np.full((size, size), 1.0)
    g[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = 10
    s8 = size // 4 + size // 8
    g[s8: s8 + size // 4, s8: s8 + size // 4] = 20
    s16 = s8 + size // 16
    g[s16: s16 + size // 8, s16: s16 + size // 8] = 25

    from gdal_ray.functions.ccl import (assemble_polylines, contour_levels,
                                        contour_segments)

    levels = contour_levels(float(g.min()), float(g.max()), 10.0)
    assert levels.tolist() == [10.0, 20.0]

    gt = (1.0, p, 0.0, 50.0, 0.0, -p)
    expected_env = {10.0: (1.25, 1.75, 49.25, 49.75),
                    20.0: (1.375, 1.625, 49.375, 49.625)}
    for level in levels:
        lines = assemble_polylines(contour_segments(g, float(level)))
        assert len(lines) == 1 and lines[0][1], level  # one closed ring
        pts = lines[0][0]
        wx = gt[0] + (pts[:, 0] + 0.5) * gt[1]
        wy = gt[3] + (pts[:, 1] + 0.5) * gt[5]
        xmin, xmax, ymin, ymax = expected_env[float(level)]
        tol = p / 2 * 1.001
        assert abs(wx.min() - xmin) <= tol and abs(wx.max() - xmax) <= tol
        assert abs(wy.min() - ymin) <= tol and abs(wy.max() - ymax) <= tol

    # the distributed tiled stage reproduces the same ring set
    tiles = ray.data.from_arrow(grid_to_contour_tiles(g, tile=48))
    rows = []
    for b in contour_lines(tiles, levels).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        rows.extend(b.to_pylist())
    assert sorted((r["level"], r["closed"]) for r in rows) == \
        [(10.0, True), (20.0, True)]


def test_contour_degenerate_levels():
    """Level equal to the grid max / min: the >= rule gives a ring
    around the single max cell and nothing at the min."""
    g = np.ones((5, 5))
    g[2, 2] = 2.0
    segs = contour_segments(g, 2.0)
    assert len(segs) == 4
    # a level exactly at an isolated extremum interpolates every
    # crossing to the peak center: degenerate zero-length segments,
    # finite coordinates, no crash (the reference nudges such levels
    # via its interval-iterator fudge; we keep the raw geometry)
    assert np.isfinite(segs).all()
    assert np.allclose(segs, 2.0)
    for pts, _ in assemble_polylines(segs):
        assert np.isfinite(pts).all()
    assert len(contour_segments(g, 1.0)) == 0
