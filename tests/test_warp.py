"""Warp stage goldens (mirrors autotest/alg/warp.py strategy:
independent-oracle comparison + error-contract checks)."""

import numpy as np
import pytest

from gdal_ray.functions.codecs import decode_image, psnr
from gdal_ray.functions.tiles import tile_bounds, tile_geotransform
from gdal_ray.sources.images import georef, image_pixels
from gdal_ray.stages.warp import (ApproxGridTransform, GenImgProjTransform,
                                  auto_zoom, src_bounds_3857,
                                  warp_image_to_tiles)


def test_approx_transform_error_below_gdal_threshold():
    """ApproxGridTransform must stay within gdalwarp's default 0.125 px
    error threshold vs the exact chain (UTM -> 3857 tile case)."""
    gt, epsg = georef(2)  # EPSG:32631
    z = 19
    # a tile over the image footprint
    xmin, ymin, xmax, ymax = src_bounds_3857(gt, epsg, 256, 256)
    from gdal_ray.functions.tiles import mercator_to_tile

    tx, ty = mercator_to_tile((xmin + xmax) / 2, (ymin + ymax) / 2, z)
    dst_gt = tile_geotransform(int(tx), int(ty), z)
    exact = GenImgProjTransform(gt, epsg, dst_gt, 3857)
    approx = ApproxGridTransform(exact, 256, 256, grid=8)
    rng = np.random.default_rng(0)
    dpx = rng.uniform(0, 256, 4000)
    dpy = rng.uniform(0, 256, 4000)
    ex, ey = exact(dpx, dpy)
    ax, ay = approx(dpx, dpy)
    err = np.hypot(ax - ex, ay - ey)
    assert err.max() < 0.125


def test_warp_identity_3857_nearest_exact():
    """A source already on the dst grid (EPSG:3857, tile-aligned)
    warps through nearest with zero pixel change."""
    z = 19
    tx, ty = 265544, 180363
    gt = tile_geotransform(tx, ty, z)
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (256, 256, 3), np.uint8)
    frags = warp_image_to_tiles(src, gt, 3857, "imgX", z, resampling="nearest")
    ours = [f for f in frags if f["tx"] == tx and f["ty"] == ty]
    assert len(ours) == 1
    f = ours[0]
    out = decode_image(f["pixels"])
    sub = out[: f["fh"], : f["fw"]]
    assert f["x0"] == 0 and f["y0"] == 0
    np.testing.assert_array_equal(
        sub[: 256 - f["y0"], : 256 - f["x0"]],
        src[f["y0"]: f["y0"] + f["fh"], f["x0"]: f["x0"] + f["fw"]],
    )


def test_warp_approx_matches_exact_transform_psnr():
    """Approx-transform warp vs exact-transform warp: >= 40 dB (the
    per-row PSNR invariant) — in practice nearly identical."""
    idx = 3  # 512x512 jpeg-ish image
    px = image_pixels(idx)
    gt, epsg = georef(idx)
    a = warp_image_to_tiles(px, gt, epsg, "imgA", None, resampling="bilinear")
    b = warp_image_to_tiles(px, gt, epsg, "imgA", None, resampling="bilinear",
                            exact_transform=True)
    assert len(a) == len(b) and len(a) > 0
    for fa, fb in zip(sorted(a, key=lambda f: f["tile_key"]),
                      sorted(b, key=lambda f: f["tile_key"])):
        assert fa["tile_key"] == fb["tile_key"]
        pa_ = decode_image(fa["pixels"]).astype(np.float64)
        pb_ = decode_image(fb["pixels"]).astype(np.float64)
        assert psnr(pa_, pb_) >= 40.0


def test_warp_constant_image_stays_constant():
    px = np.full((100, 100, 3), 137, np.uint8)
    gt, epsg = georef(1)  # 4326
    frags = warp_image_to_tiles(px, gt, epsg, "imgC", None, resampling="bilinear")
    assert frags
    total_valid = 0
    for f in frags:
        out = decode_image(f["pixels"])
        mask = np.unpackbits(np.frombuffer(f["mask"], np.uint8),
                             count=f["fh"] * f["fw"]).reshape(f["fh"], f["fw"]).astype(bool)
        assert (out[mask] == 137).all()
        total_valid += f["n_valid"]
    # warped footprint should have roughly the source pixel count
    # (resolution-matched zoom => comparable area)
    assert total_valid > 100 * 100 * 0.3


def test_warp_coverage_matches_footprint_area():
    """Total valid dst pixels ~ source area x (src_res/dst_res)^2."""
    idx = 2
    px = image_pixels(idx)  # 256x256 UTM
    gt, epsg = georef(idx)
    frags = warp_image_to_tiles(px, gt, epsg, "imgF", None)
    xmin, ymin, xmax, ymax = src_bounds_3857(gt, epsg, 256, 256)
    z = frags[0]["z"]
    from gdal_ray.functions.crs import WEB_MERCATOR_EXTENT

    res = 2 * WEB_MERCATOR_EXTENT / (1 << z) / 256
    expect = (xmax - xmin) * (ymax - ymin) / (res * res)
    got = sum(f["n_valid"] for f in frags)
    assert 0.8 * expect < got < 1.2 * expect


def test_auto_zoom_quarter_meter():
    # 0.25 m at equator -> z 19 (3857 res at z19 ~ 0.298 m)
    assert auto_zoom(0.25) == 19
    assert auto_zoom(156543.03392804097) == 0


def test_fragment_subrect_within_tile():
    for idx in (0, 1, 5, 6):
        px = image_pixels(idx)
        gt, epsg = georef(idx)
        for f in warp_image_to_tiles(px, gt, epsg, f"img{idx}", None):
            assert 0 <= f["x0"] and f["x0"] + f["fw"] <= 256
            assert 0 <= f["y0"] and f["y0"] + f["fh"] <= 256
            assert f["n_valid"] <= f["fw"] * f["fh"]
