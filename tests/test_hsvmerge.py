"""HSV color-merge conformance (reference
autotest/utilities/test_gdalalg_raster_color_merge.py: merging with
gray == max(r,g,b) must reproduce the input exactly over the color
lattice; alpha bands pass through)."""

import numpy as np

from gdal_ray.functions.hsvmerge import color_merge, hsv_to_rgb, rgb_to_hs


def _lattice(N: int):
    vals = np.array([255 if i == N - 1 else i * (256 // N)
                     for i in range(N)], np.uint8)
    r, g, b = np.meshgrid(vals, vals, vals, indexing="ij")
    return np.stack([r.ravel(), g.ravel(), b.ravel()], -1).reshape(1, -1, 3)


def test_round_trip_full_lattice_n64():
    rgb = _lattice(64)
    gray = np.maximum(np.maximum(rgb[..., 0], rgb[..., 1]), rgb[..., 2])
    assert (color_merge(rgb, gray) == rgb).all()


def test_alpha_passthrough():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    out = color_merge(rgba, gray)
    assert (out[..., 3] == rgba[..., 3]).all()


def test_gray_replaces_value():
    rgb = np.array([[[200, 100, 50]]], np.uint8)
    out = color_merge(rgb, np.array([[120]], np.uint8))
    # V of output == gray; hue/saturation preserved
    assert out[..., :3].max() == 120
    h0, s0 = rgb_to_hs(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    h1, s1 = rgb_to_hs(out[..., 0], out[..., 1], out[..., 2])
    assert abs(float(h0 - h1)) < 0.01 and abs(float(s0 - s1)) < 0.01


def test_achromatic_hue_convention():
    # r == g == b -> span 0 -> h = 4/6 by the maxc==b branch; the
    # merged pixel is gray at the new value
    h, s = rgb_to_hs(np.array([7]), np.array([7]), np.array([7]))
    assert float(s) == 0.0 and abs(float(h) - 4.0 / 6.0) < 1e-7
    r, g, b = hsv_to_rgb(h, s, np.array([99], np.uint8))
    assert (int(r), int(g), int(b)) == (99, 99, 99)
