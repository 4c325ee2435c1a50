"""Viewshed goldens transcribed from the reference's own unit tests
(/root/reference/autotest/cpp/test_viewshed.cpp) — expected arrays are
the reference's literal fixtures, not recomputed."""

import numpy as np
import pytest

from gdal_ray.functions.viewshed import (cumulative_scale,
                                         cumulative_viewshed, viewshed)

V = dict(visible_val=127.0, invisible_val=0.0, curve_coeff=0.0)


def test_all_visible():
    # test_viewshed.cpp TEST(Viewshed, all_visible)
    dem = np.array([[1, 2, 3], [4, 5, 6], [3, 2, 1]], float)
    out, _, _ = viewshed(dem, 1, 1, **V)
    assert (out == 127).all()


def test_simple_height_normal_dem_ground():
    # test_viewshed.cpp TEST(Viewshed, simple_height)
    dem = np.array([
        [-1, 0, 1, 0, -1],
        [-1, 2, 0, 4, -1],
        [-1, 1, 0, -1, -1],
        [0, 3, 0, 2, 0],
        [-1, 0, 0, 3, -1]], float)
    observable = np.array([
        [4, 2, 0, 4, 8],
        [3, 2, 0, 4, 3],
        [2, 1, 0, -1, -2],
        [4, 3, 0, 2, 1],
        [6, 3, 0, 2, 4]], float)

    out, _, _ = viewshed(dem, 2, 2, **V)
    exp = np.where(dem >= observable, 127.0, 0.0)
    np.testing.assert_array_equal(out, exp)

    out, _, _ = viewshed(dem, 2, 2, mode="dem", curve_coeff=0.0)
    np.testing.assert_allclose(out, np.maximum(0.0, observable), atol=1e-12)

    out, _, _ = viewshed(dem, 2, 2, mode="ground", curve_coeff=0.0)
    np.testing.assert_allclose(out, np.maximum(0.0, observable - dem),
                               atol=1e-12)


@pytest.mark.parametrize("dem,obs,ground,demv", [
    ([0, 0, 0, 1, 0, 0, 0, 0], 2, [0, 0, 0, 0, 2, 3, 4, 5],
     [0, 0, 0, 1, 2, 3, 4, 5]),
    ([1, 1, 0, 1, 0, 1, 2, 2], 3, [0, 0, 0, 0, 0, 0, 0, 1 / 3.0],
     [1, 0, 0, 1, 0, 0, 1, 7 / 3.0]),
    ([0, 0, 0, 1, 1, 0, 0, 0], 0,
     [0, 0, 0, 0, 1 / 3.0, 5 / 3.0, 6 / 3.0, 7 / 3.0],
     [0, 0, 0, 0, 4 / 3.0, 5 / 3.0, 6 / 3.0, 7 / 3.0]),
    ([0, 0, 1, 2, 3, 4, 5, 6], 0, [0, 0, 0, 0, 0, 0, 0, 0],
     [0, 0, 0, 3 / 2.0, 8 / 3.0, 15 / 4.0, 24 / 5.0, 35 / 6.0]),
    ([0, 0, 1, 1, 3, 4, 5, 4], 0, [0, 0, 0, .5, 0, 0, 0, 11 / 6.0],
     [0, 0, 0, 3 / 2.0, 2, 15 / 4.0, 24 / 5.0, 35 / 6.0]),
])
def test_dem_vs_ground_1d(dem, obs, ground, demv):
    # test_viewshed.cpp TEST(Viewshed, dem_vs_ground) — 8x1 rasters
    d = np.array([dem], float)
    g, _, _ = viewshed(d, obs, 0, mode="ground", curve_coeff=0.0)
    np.testing.assert_allclose(g[0], ground, atol=1e-12)
    v, _, _ = viewshed(d, obs, 0, mode="dem", curve_coeff=0.0)
    np.testing.assert_allclose(v[0], demv, atol=1e-12)


def test_min_max_mask():
    # test_viewshed.cpp TEST(Viewshed, min_max_mask): flat 15x15,
    # observer (7,7), min 2 / max 6 -> 13x13 cropped ring output
    dem = np.zeros((15, 15))
    out, x0, y0 = viewshed(dem, 7, 7, min_distance=2, max_distance=6, **V)
    assert out.shape == (13, 13)
    assert (x0, y0) == (1, 0)
    expected = np.array([
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 127, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 0, 0, 0,
        0, 0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0, 0,
        0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
        0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
        0, 127, 127, 127, 127, 0, 0, 0, 127, 127, 127, 127, 0,
        127, 127, 127, 127, 127, 0, 0, 0, 127, 127, 127, 127, 127,
        0, 127, 127, 127, 127, 0, 0, 0, 127, 127, 127, 127, 0,
        0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
        0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0,
        0, 0, 127, 127, 127, 127, 127, 127, 127, 127, 127, 0, 0,
        0, 0, 0, 127, 127, 127, 127, 127, 127, 127, 0, 0, 0],
        float).reshape(13, 13)
    np.testing.assert_array_equal(out, expected)


def test_angle_mask_golden():
    # test_viewshed.cpp TEST(Viewshed, angle): flat 17x17, observer
    # (8,8), compass start 0 / end 30 -> cropped 6x9 wedge
    dem = np.zeros((17, 17))
    out, x0, y0 = viewshed(dem, 8, 8, start_angle=0, end_angle=30, **V)
    assert out.shape == (9, 6)
    assert (x0, y0) == (8, 0)
    expected = np.array([
        127, 127, 127, 127, 127, 127,
        127, 127, 127, 127, 127, 0,
        127, 127, 127, 127, 0, 0,
        127, 127, 127, 127, 0, 0,
        127, 127, 127, 0, 0, 0,
        127, 127, 127, 0, 0, 0,
        127, 127, 0, 0, 0, 0,
        127, 127, 0, 0, 0, 0,
        127, 0, 0, 0, 0, 0], float).reshape(9, 6)
    np.testing.assert_array_equal(out, expected)


def test_angle2_mask_golden():
    # test_viewshed.cpp TEST(Viewshed, angle2): 0..300 slice keeps the
    # full 11x11 window, masking only the north-by-northwest wedge
    dem = np.zeros((11, 11))
    out, x0, y0 = viewshed(dem, 5, 5, start_angle=0, end_angle=300, **V)
    assert out.shape == (11, 11)
    expected = np.full(121, 127.0)
    expected[[0, 1, 2, 3, 4, 11, 12, 13, 14, 15, 23, 24, 25, 26,
              36, 37, 48]] = 0
    np.testing.assert_array_equal(out, expected.reshape(11, 11))


def test_high_pitch_mask_golden():
    # test_viewshed.cpp TEST(Viewshed, high_mask): ramp at row 7,
    # observer (3,7), highPitch 58 degrees
    dem = np.zeros((15, 15))
    dem[7, 5:15] = [1, 3, 5, 7, 9, 11, 13, 15, 17, 19]
    out, _, _ = viewshed(dem, 3, 7, high_pitch=58, **V)
    expected = np.array([
        [127]*12 + [0]*3,
        [127]*11 + [0]*4,
        [127]*10 + [0]*5,
        [127]*9 + [0]*6,
        [127]*8 + [0]*7,
        [127]*7 + [0]*8,
        [127]*6 + [0]*9,
        [127]*12 + [0]*3,
        [127]*6 + [0]*9,
        [127]*7 + [0]*8,
        [127]*8 + [0]*7,
        [127]*9 + [0]*6,
        [127]*10 + [0]*5,
        [127]*11 + [0]*4,
        [127]*12 + [0]*3], float)
    np.testing.assert_array_equal(out, expected)


def test_low_pitch_dem_golden():
    # test_viewshed.cpp TEST(Viewshed, low_mask): lowPitch -45 in DEM
    # mode raises the observable plane to the -45-degree cone
    dem = np.zeros((5, 5))
    dem[2, 2] = 5
    out, _, _ = viewshed(dem, 2, 2, low_pitch=-45, mode="dem",
                         curve_coeff=0.0)
    expected = np.array([
        [2.17157, 2.76393, 3, 2.76393, 2.17157],
        [2.76393, 3.58579, 4, 3.58579, 2.76393],
        [3, 4, 5, 4, 3],
        [2.76393, 3.58579, 4, 3.58579, 2.76393],
        [2.17157, 2.76393, 3, 2.76393, 2.17157]])
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_target_height_and_values():
    # a 1-high wall at x=3 hides the ground behind it, but a 2-high
    # target behind the wall is visible
    dem = np.zeros((1, 8))
    dem[0, 3] = 1.0
    hid, _, _ = viewshed(dem, 0, 0, visible_val=5, invisible_val=7,
                         curve_coeff=0.0)
    np.testing.assert_array_equal(hid[0], [5, 5, 5, 5, 7, 7, 7, 7])
    vis, _, _ = viewshed(dem, 0, 0, target_height=10.0, visible_val=5,
                         invisible_val=7, curve_coeff=0.0)
    assert (vis[0] == 5).all()


def test_observer_height_reveals():
    # raising the observer makes the area behind a wall visible
    dem = np.zeros((9, 9))
    dem[4, 6] = 3.0
    low, _, _ = viewshed(dem, 4, 4, **V)
    assert low[4, 8] == 0
    high, _, _ = viewshed(dem, 4, 4, observer_z=10.0, **V)
    assert high[4, 8] == 127


def test_curvature_drops_far_cells():
    # with earth curvature, a far flat cell dips below the horizon
    dem = np.zeros((1, 4000))
    flat, _, _ = viewshed(dem, 0, 0, observer_z=1.0, gt=(0, 10, 0, 0, 0, 10),
                          curve_coeff=0.0)
    assert (flat[0] == 255).all()
    curved, _, _ = viewshed(dem, 0, 0, observer_z=1.0,
                            gt=(0, 10, 0, 0, 0, 10),
                            curve_coeff=0.85714, semimajor=6378137.0)
    assert curved[0, -1] == 0  # 40 km away, below the adjusted horizon
    assert curved[0, 1] == 255


def test_cell_modes_differ_and_bound():
    rng = np.random.default_rng(7)
    dem = rng.random((21, 21)) * 5
    outs = {m: viewshed(dem, 10, 10, mode="ground", curve_coeff=0.0,
                        cell_mode=m)[0] for m in
            ("edge", "diagonal", "min", "max")}
    assert (outs["min"] <= outs["edge"] + 1e-12).all()
    assert (outs["min"] <= outs["diagonal"] + 1e-12).all()
    assert (outs["max"] >= outs["edge"] - 1e-12).all()
    assert (outs["max"] >= outs["diagonal"] - 1e-12).all()
    assert not np.array_equal(outs["edge"], outs["diagonal"])


def test_scalar_reference_cross_check():
    """Cross-check the wavefront against a literal per-cell scalar
    transcription of processLineLeft/Right (sequential, Edge mode)."""
    rng = np.random.default_rng(42)
    dem = (rng.random((17, 23)) * 8).round(2)
    ox, oy = 9, 7
    z_obs = dem[oy, ox]
    A = dem - z_obs

    def calc_line(d, za):
        return za * d / (d - 1)

    def calc_edge(i, j, za, zb):
        return (za * i + zb * (j - i)) / (j - 1)

    H, W = dem.shape
    Z = A.copy()
    D = np.full((H, W), np.nan)
    D[oy, ox] = A[oy, ox]
    # exact scalar wavefront in increasing chebyshev rings
    for r in range(1, max(H, W)):
        cells = [(y, x) for y in range(H) for x in range(W)
                 if max(abs(x - ox), abs(y - oy)) == r]
        for (y, x) in cells:
            i, j = abs(x - ox), abs(y - oy)
            sx = 1 if x >= ox else -1
            sy = 1 if y >= oy else -1
            if j == 0:
                dfz = A[y, x] if i == 1 else calc_line(i, Z[y, x - sx])
            elif i == 0:
                dfz = A[y, x] if j == 1 else calc_line(j, Z[y - sy, x])
            elif i == j:
                dfz = A[y, x] if i == 1 else calc_line(i, Z[y - sy, x - sx])
            elif i > j:
                # dfThisPrev = previous cell in this line (i-1, j)
                dfz = calc_edge(j, i, Z[y - sy, x - sx], Z[y, x - sx])
            else:
                # dfLast = same column in the previous line (i, j-1)
                dfz = calc_edge(i, j, Z[y - sy, x - sx], Z[y - sy, x])
            D[y, x] = dfz
            Z[y, x] = max(A[y, x], dfz)

    got, _, _ = viewshed(dem, ox, oy, mode="ground", curve_coeff=0.0)
    exp = np.maximum(0.0, D - A)
    exp[oy, ox] = 0.0
    np.testing.assert_allclose(got, exp, atol=1e-10)


def test_cumulative_scale_and_sum():
    acc = np.array([[0, 1], [2, 4]], np.uint32)
    np.testing.assert_array_equal(cumulative_scale(acc),
                                  [[0, 63], [127, 255]])
    dem = np.zeros((12, 12))
    cum = cumulative_viewshed(dem, 4, curve_coeff=0.0)
    assert (cum == 255).all()  # flat: every observer sees everything
