"""GGA_Linear (TIN) gridding conformance.

Reference: alg/gdalgrid.cpp:2459 (GDALGridLinear — Delaunay +
barycentric, nearest within radius outside the hull, nodata when
radius == 0) and autotest/utilities/test_gdal_grid.py::test_gdal_grid_18
(linear-gridding the pixel centers of n43.tif back onto the same grid
must reproduce n43.tif exactly — checksum equality is the reference's
own assertion)."""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.delaunay import Triangulation, delaunay_triangles
from gdal_ray.functions.gdalgrid import grid_points
from gdal_ray.sources.tiff import decode_tiff

N43 = "/root/reference/autotest/gdrivers/data/n43.tif"


def test_planar_field_exact_inside_hull():
    # a linear field is reproduced exactly by TIN interpolation
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 10, 200)
    py = rng.uniform(0, 10, 200)
    pz = 3.0 * px - 2.0 * py + 7.0
    out = grid_points(px, py, pz, "linear", xmin=2, xmax=8, ymin=2, ymax=8,
                      nx=15, ny=15, radius=0.0, nodata=-1.0)
    gxc = 2 + (np.arange(15) + 0.5) * (6 / 15)
    gyc = 2 + (np.arange(15) + 0.5) * (6 / 15)
    exp = 3.0 * gxc[None, :] - 2.0 * gyc[:, None] + 7.0
    assert np.abs(out - exp).max() < 1e-9


def test_outside_hull_nodata_vs_nearest():
    px = np.array([0.0, 1.0, 0.0])
    py = np.array([0.0, 0.0, 1.0])
    pz = np.array([5.0, 6.0, 7.0])
    # node at (2.5, 2.5): outside hull
    kw = dict(xmin=2.0, xmax=3.0, ymin=2.0, ymax=3.0, nx=1, ny=1)
    out0 = grid_points(px, py, pz, "linear", radius=0.0, nodata=-9.0, **kw)
    assert out0[0, 0] == -9.0
    # radius < 0 => unlimited nearest (gdal_grid -a linear default -1);
    # distances: (0,0)->sqrt(12.5); (1,0) and (0,1) tie at sqrt(8.5);
    # argmin tie -> first (index 1) = 6.0
    outn = grid_points(px, py, pz, "linear", radius=-1.0, nodata=-9.0, **kw)
    assert outn[0, 0] == 6.0
    # small bounded radius excludes everything
    outr = grid_points(px, py, pz, "linear", radius=1.0, nodata=-9.0, **kw)
    assert outr[0, 0] == -9.0


def test_outside_hull_nearest_tie_is_first_index():
    px = np.array([0.0, 1.0, 0.0])
    py = np.array([0.0, 0.0, 1.0])
    pz = np.array([5.0, 6.0, 7.0])
    out = grid_points(px, py, pz, "linear", radius=-1.0, nodata=-9.0,
                      xmin=2.0, xmax=3.0, ymin=2.0, ymax=3.0, nx=1, ny=1)
    assert out[0, 0] == 6.0


def test_delaunay_fast_matches_bowyer_watson():
    from gdal_ray.functions.constructive import delaunay as slow
    rng = np.random.default_rng(11)
    pts = rng.uniform(-5, 5, (150, 2))
    assert (delaunay_triangles(pts) == slow(pts)).all()


def test_delaunay_grid_euler_count():
    g = 17
    xs, ys = np.meshgrid(np.arange(g, dtype=float), np.arange(g, dtype=float))
    tr = Triangulation(np.c_[xs.ravel(), ys.ravel()])
    n, h = g * g, 4 * (g - 1)
    assert len(tr.triangles_ccw()) == 2 * n - h - 2


@pytest.mark.skipif(not os.path.exists(N43), reason="reference absent")
def test_linear_n43_golden():
    px_img, gt = decode_tiff(open(N43, "rb").read())
    h, w = px_img.shape[:2]
    band = px_img.reshape(h, w).astype(np.float64)
    # point per pixel center (PixelIsPoint: gt already centers row 0/col 0
    # handled by the source; reconstruct centers from the geotransform)
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    xs = gt[0] + (cols.ravel() + 0.5) * gt[1]
    ys = gt[3] + (rows.ravel() + 0.5) * gt[5]
    out = grid_points(xs, ys, band.ravel(), "linear",
                      xmin=-80.0041667, xmax=-78.9958333,
                      ymin=42.9958333, ymax=44.0041667,
                      nx=121, ny=121, radius=-1.0, nodata=0.0)
    got = np.floor(np.flipud(out) + 0.5).astype(np.int64)
    assert (got == band.astype(np.int64)).all()
    assert checksum_image(got) == checksum_image(band)


def test_build_tin_duplicate_points_stay_delaunay():
    """Exact duplicate points corrupted the incremental triangulation
    (empty-circle violations); build_tin now merges them like GDAL's
    qhull path."""
    from gdal_ray.functions.gdalgrid import build_tin, tri_circumcircles

    rng = np.random.default_rng(1)
    px = rng.uniform(0, 100, 400)
    py = rng.uniform(0, 100, 400)
    px2 = np.concatenate([px, px[:40]])
    py2 = np.concatenate([py, py[:40]])
    tri = build_tin(px2, py2)
    ux, uy, r = tri_circumcircles(tri, px2, py2)
    for t in range(len(tri)):
        d = np.hypot(px2 - ux[t], py2 - uy[t])
        assert (d < r[t] - 1e-7).sum() == 0


def test_bucketed_linear_grid_no_full_materialization(ray_session,
                                                      tmp_path):
    """VERDICT r4 directive #2: at realistic point density no stage
    may receive the full point set — ingestion streams from parquet,
    the hull is merged from per-batch candidates, outside-hull nodes
    take a distributed nearest fallback, and the bucketed TIN pass
    certifies every node locally (no escalation to a hull-covering
    region)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gdal_ray.pipelines.raster import q_grid_linear

    rng = np.random.default_rng(7)
    n = 8000
    pq.write_table(
        pa.table({"event_id": pa.array(np.arange(n) * 8),
                  "value": pa.array(rng.uniform(0, 1.0e5, n))}),
        tmp_path / "events.parquet")
    stats = {}
    out = q_grid_linear(str(tmp_path), buckets=(2, 2), stats=stats)
    assert out.num_rows == 48 * 48
    assert stats["total_pts"] == n
    assert not stats["final_fired"]
    assert stats["max_group_pts"] < stats["total_pts"]


def test_bucketed_linear_grid_bit_identical(ray_session):
    """The cell-bucketed TIN path (certainty gate + bounded exact
    fringe pass) must equal the global triangulation bit-for-bit at
    every forced bucket setting (VERDICT r3 directive #4)."""
    from gdal_ray.pipelines.raster import q_grid_linear

    sf = "/root/testdata/sf0.001"
    ref = q_grid_linear(sf, buckets=(1, 1)).to_pandas()
    for bk in ((2, 2), (4, 4), (3, 2)):
        got = q_grid_linear(sf, buckets=bk).to_pandas()
        assert got.equals(ref), bk


def test_linear_eval_assign_descending_axis_matches_linear_eval():
    """linear_eval_assign claims 'same semantics as linear_eval' —
    including descending node axes (round-5 review finding)."""
    from gdal_ray.functions.gdalgrid import (build_tin, linear_eval,
                                             linear_eval_assign)

    rng = np.random.default_rng(2)
    px = rng.uniform(0, 100, 200)
    py = rng.uniform(0, 100, 200)
    pz = rng.uniform(0, 50, 200)
    tri = build_tin(px, py)
    cx = np.linspace(5, 95, 12)
    cy_desc = np.linspace(95, 5, 11)
    ref = linear_eval(tri, px, py, pz, cx, cy_desc, -1.0, 0.0)
    got, who = linear_eval_assign(tri, px, py, pz, cx, cy_desc,
                                  -1.0, 0.0)
    assert np.array_equal(ref, got)
    assert (who >= 0).any()
