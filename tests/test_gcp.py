"""GCP polynomial + TPS transformers (functions/gcp.py) and their
GenImgProj integration (VERDICT r2 directive #7).

Invariants mirror the reference's contracts:
- order-1 fit over affine-consistent GCPs recovers the affine exactly
  (gdal_crs.cpp CRS_georef order 1 = 6-parameter affine);
- order-2 fit is exact on quadratically-distorted GCPs;
- TPS interpolates exactly at every GCP (thinplatespline.cpp solve);
- auto order pick: >= 6 GCPs -> order 2 else 1 (gdal_crs.cpp:203);
- warp of a GCP-referenced scene matches the exact-affine render to
  maxdiff <= 1 (the reference autotest comparator bar) when the GCPs
  are drawn from that affine;
- ApproxGridTransform over the GCP chain stays under gdalwarp's
  0.125 px error threshold.
"""

import numpy as np
import pytest

from gdal_ray.functions.affine import apply_gt
from gdal_ray.functions.gcp import (
    GCPPolyTransform,
    TPSTransform,
    georef_from_gcps,
)
from gdal_ray.stages.warp import (
    ApproxGridTransform,
    GenImgProjTransform,
    warp_image_to_tiles,
)

GT = (500_000.0, 10.0, 1.5, 4_200_000.0, 2.0, -10.0)  # rotated affine


def _affine_gcps(n=12, w=200, h=150, seed=7):
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, w, n)
    ln = rng.uniform(0, h, n)
    gx, gy = apply_gt(GT, px, ln)
    return px, ln, gx, gy


def test_order1_recovers_affine():
    px, ln, gx, gy = _affine_gcps()
    t = GCPPolyTransform(px, ln, gx, gy, order=1)
    qx = np.linspace(-50, 250, 40)
    qy = np.linspace(-30, 180, 40)
    fx, fy = t.pixel_to_geo(qx, qy)
    ex, ey = apply_gt(GT, qx, qy)
    np.testing.assert_allclose(fx, ex, rtol=0, atol=1e-6)
    np.testing.assert_allclose(fy, ey, rtol=0, atol=1e-6)
    # inverse closes the loop
    bx, by = t.geo_to_pixel(fx, fy)
    np.testing.assert_allclose(bx, qx, atol=1e-6)
    np.testing.assert_allclose(by, qy, atol=1e-6)


def test_order2_exact_on_quadratic():
    rng = np.random.default_rng(11)
    px = rng.uniform(0, 100, 20)
    ln = rng.uniform(0, 100, 20)
    gx = 1000 + 2 * px + 0.5 * ln + 0.01 * px * px - 0.002 * px * ln
    gy = 2000 - 1.5 * px + 3 * ln + 0.004 * ln * ln
    t = GCPPolyTransform(px, ln, gx, gy, order=2)
    fx, fy = t.pixel_to_geo(px, ln)
    np.testing.assert_allclose(fx, gx, atol=1e-8)
    np.testing.assert_allclose(fy, gy, atol=1e-8)
    assert t.rms_residual(px, ln, gx, gy) < 1e-8


def test_order3_beats_order2_on_cubic():
    rng = np.random.default_rng(13)
    px = rng.uniform(0, 100, 30)
    ln = rng.uniform(0, 100, 30)
    gx = px + 1e-4 * px**3
    gy = ln + 1e-4 * ln**2 * px
    r2 = GCPPolyTransform(px, ln, gx, gy, 2).rms_residual(px, ln, gx, gy)
    r3 = GCPPolyTransform(px, ln, gx, gy, 3).rms_residual(px, ln, gx, gy)
    assert r3 < 1e-8 < r2


def test_min_gcp_counts():
    px, ln, gx, gy = _affine_gcps(n=5)
    GCPPolyTransform(px, ln, gx, gy, 1)
    with pytest.raises(ValueError):
        GCPPolyTransform(px, ln, gx, gy, 2)
    with pytest.raises(ValueError):
        GCPPolyTransform(px[:2], ln[:2], gx[:2], gy[:2], 1)


def test_auto_order_rule():
    px, ln, gx, gy = _affine_gcps(n=5)
    assert georef_from_gcps(px, ln, gx, gy).order == 1
    px, ln, gx, gy = _affine_gcps(n=6)
    assert georef_from_gcps(px, ln, gx, gy).order == 2
    assert isinstance(georef_from_gcps(px, ln, gx, gy, tps=True),
                      TPSTransform)


def test_tps_exact_at_gcps():
    rng = np.random.default_rng(17)
    px = rng.uniform(0, 100, 15)
    ln = rng.uniform(0, 100, 15)
    # smooth non-polynomial distortion
    gx = 10 * px + 30 * np.sin(px / 20)
    gy = 10 * ln + 25 * np.cos(ln / 15)
    t = TPSTransform(px, ln, gx, gy)
    fx, fy = t.pixel_to_geo(px, ln)
    np.testing.assert_allclose(fx, gx, atol=1e-6)
    np.testing.assert_allclose(fy, gy, atol=1e-6)


def test_tps_affine_reproduction():
    """TPS over affine-consistent GCPs must reproduce the affine
    everywhere (the kernel weights vanish)."""
    px, ln, gx, gy = _affine_gcps(n=10)
    t = TPSTransform(px, ln, gx, gy)
    qx = np.linspace(0, 200, 25)
    qy = np.linspace(0, 150, 25)
    fx, fy = t.pixel_to_geo(qx, qy)
    ex, ey = apply_gt(GT, qx, qy)
    np.testing.assert_allclose(fx, ex, atol=1e-5)
    np.testing.assert_allclose(fy, ey, atol=1e-5)


GT_UTM = (500_000.0, 30.0, 0.0, 4_200_000.0, 0.0, -30.0)


def _scene(seed=23, w=96, h=96):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (h, w, 3)).astype(np.uint8), w, h)


def test_warp_gcp_matches_affine_render():
    pixels, w, h = _scene()
    rng = np.random.default_rng(29)
    px = rng.uniform(0, w, 16)
    ln = rng.uniform(0, h, 16)
    gx, gy = apply_gt(GT_UTM, px, ln)
    georef = georef_from_gcps(px, ln, gx, gy, order=1)

    base = warp_image_to_tiles(pixels, GT_UTM, 32618, "affine")
    via_gcp = warp_image_to_tiles(pixels, None, 32618, "gcp",
                                  src_georef=georef)
    assert len(base) == len(via_gcp) > 0
    for a, b in zip(base, via_gcp):
        assert (a["tile_key"], a["x0"], a["y0"]) == (b["tile_key"], b["x0"], b["y0"])
        pa_ = np.frombuffer(a["pixels"], np.uint8)
        pb_ = np.frombuffer(b["pixels"], np.uint8)
        assert int(np.abs(pa_.astype(np.int16) - pb_.astype(np.int16)).max()) <= 1


def test_warp_tps_scene_runs():
    pixels, w, h = _scene(seed=31)
    gxg, gyg = np.meshgrid(np.linspace(0, w, 5), np.linspace(0, h, 5))
    px, ln = gxg.ravel(), gyg.ravel()
    gx, gy = apply_gt(GT_UTM, px, ln)
    # gentle smooth warp on top of the affine
    gx = gx + 3.0 * np.sin(px / 30)
    gy = gy + 3.0 * np.cos(ln / 25)
    georef = georef_from_gcps(px, ln, gx, gy, tps=True)
    frags = warp_image_to_tiles(pixels, None, 32618, "tps",
                                src_georef=georef)
    assert len(frags) > 0
    assert sum(f["n_valid"] for f in frags) > 0.5 * w * h


def test_approx_grid_under_threshold_on_gcp_chain():
    rng = np.random.default_rng(37)
    px = rng.uniform(0, 256, 12)
    ln = rng.uniform(0, 256, 12)
    gx, gy = apply_gt(GT_UTM, px, ln)
    gx += 2.0 * np.sin(px / 40)
    gy += 2.0 * np.cos(ln / 40)
    georef = georef_from_gcps(px, ln, gx, gy, order=2)
    dst_gt = (-8_230_000.0, 40.0, 0.0, 4_970_000.0, 0.0, -40.0)
    exact = GenImgProjTransform(None, 32618, dst_gt, 3857,
                                src_georef=georef)
    approx = ApproxGridTransform(exact, 256, 256, grid=8)
    qx, qy = np.meshgrid(np.linspace(0, 256, 33), np.linspace(0, 256, 33))
    ex, ey = exact(qx, qy)
    ax, ay = approx(qx, qy)
    err = np.hypot(ax - ex, ay - ey)
    assert float(err.max()) < 0.125
