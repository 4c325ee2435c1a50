"""Lanczos sampler + average (box) downsampling oracles."""

import numpy as np
import pytest

from gdal_ray.functions.resample import (reduce2x2, resize, resize_average,
                                         sample, sample_lanczos)


def test_lanczos_identity_at_pixel_centers():
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, (16, 16), np.uint8)
    gx, gy = np.meshgrid(np.arange(16) + 0.5, np.arange(16) + 0.5)
    out, ok = sample_lanczos(src, gx, gy)
    assert ok.all()
    np.testing.assert_array_equal(out, src)


def test_lanczos_constant_preserved():
    src = np.full((20, 20), 111, np.uint8)
    rng = np.random.default_rng(1)
    px = rng.uniform(1, 19, 500)
    py = rng.uniform(1, 19, 500)
    out, ok = sample(src, px, py, "lanczos")
    assert (out[ok] == 111).all()


def test_lanczos_matches_direct_formula():
    rng = np.random.default_rng(5)
    src = rng.uniform(0, 255, (32, 32)).astype(np.float64)
    px, py = np.array([13.3]), np.array([17.8])
    out, _ = sample(src, px, py, "lanczos")
    fx, fy = px[0] - 0.5, py[0] - 0.5
    x0, y0 = int(np.floor(fx)), int(np.floor(fy))
    acc = wsum = 0.0
    for j in range(6):
        for i in range(6):
            dx = fx - (x0 + i - 2)
            dy = fy - (y0 + j - 2)
            w = (np.sinc(dx) * np.sinc(dx / 3) if abs(dx) < 3 else 0.0) \
                * (np.sinc(dy) * np.sinc(dy / 3) if abs(dy) < 3 else 0.0)
            acc += w * src[y0 + j - 2, x0 + i - 2]
            wsum += w
    assert out[0] == pytest.approx(acc / wsum)


def test_average_2x_equals_reduce2x2():
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, (32, 32, 3), np.uint8)
    a = resize_average(src, 16, 16)
    b = reduce2x2(src, "average")
    np.testing.assert_array_equal(a, b)


def test_average_fractional_ratio_preserves_mean():
    rng = np.random.default_rng(4)
    src = rng.uniform(0, 1000, (30, 42))
    out = resize_average(src, 7, 11)
    assert out.mean() == pytest.approx(src.mean(), rel=1e-9)
    const = np.full((13, 9), 3.25)
    np.testing.assert_allclose(resize_average(const, 5, 4), 3.25)


def test_resize_dispatch_average():
    src = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = resize(src, 2, 2, "average")
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])
