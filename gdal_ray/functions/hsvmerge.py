"""HSV color-merge (gdal raster color-merge): replace the V channel
of an RGB raster with a grayscale band — the classic hillshade
coloring operation.

Reference: apps/gdalalg_raster_color_merge.cpp:134 (rgb_to_hs),
:216 (hsv_to_rgb), :362 (patch_value_line). Float32 arithmetic and
the +0.5f truncating byte casts are replicated so the reference's own
round-trip conformance holds: merging with gray == max(r, g, b)
reproduces the input bit-for-bit over the whole color lattice
(autotest test_gdalalg_raster_color_merge_check_rgb_hsb_conversion).
"""

from __future__ import annotations

import numpy as np


def rgb_to_hs(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    """Hue and saturation in [0, 1] (float32), value dropped."""
    r = np.asarray(r, np.int64)
    g = np.asarray(g, np.int64)
    b = np.asarray(b, np.int64)
    minc = np.minimum(np.minimum(r, g), b)
    maxc = np.maximum(np.maximum(r, g), b)
    span = (maxc - minc).astype(np.float32)
    s = span / np.maximum(1, maxc).astype(np.float32)
    denom = np.where(span == 0, np.float32(1.0), np.float32(6.0) * span)
    h_b = np.float32(4.0 / 6.0) + (r - g).astype(np.float32) / denom
    h_g = np.float32(2.0 / 6.0) + (b - r).astype(np.float32) / denom
    tmp = (g - b).astype(np.float32) / denom
    h_r = np.where(tmp < 0, tmp + np.float32(1.0), tmp)
    # branch order: maxc == b first, then maxc == g, else red
    h = np.where(maxc == b, h_b, np.where(maxc == g, h_g, h_r))
    return h.astype(np.float32), s.astype(np.float32)


def hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray):
    """h, s float32 in [0,1]; v uint8. Returns (r, g, b) uint8 with the
    reference's truncating +0.5f casts and choose_among tables."""
    h = np.asarray(h, np.float32)
    s = np.asarray(s, np.float32)
    vf = np.asarray(v).astype(np.float32)
    i = (np.float32(6.0) * h).astype(np.int32)
    f = np.float32(6.0) * h - i.astype(np.float32)
    one = np.float32(1.0)
    half = np.float32(0.5)
    p = (vf * (one - s) + half).astype(np.uint8)
    q = (vf * (one - s * f) + half).astype(np.uint8)
    t = (vf * (one - s * (one - f)) + half).astype(np.uint8)
    vb = np.asarray(v, np.uint8)
    i = np.clip(i, 0, 5)
    r = np.choose(i, [vb, q, p, p, t, vb])
    g = np.choose(i, [t, vb, vb, q, p, p])
    b = np.choose(i, [p, p, t, vb, vb, q])
    return r, g, b


def color_merge(rgb: np.ndarray, gray: np.ndarray) -> np.ndarray:
    """(h, w, >=3) uint8 + (h, w) uint8 -> merged uint8 image; bands
    beyond the first three (alpha) pass through unchanged."""
    out = np.array(rgb, copy=True)
    h, s = rgb_to_hs(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    r, g, b = hsv_to_rgb(h, s, np.asarray(gray, np.uint8))
    out[..., 0] = r
    out[..., 1] = g
    out[..., 2] = b
    return out
