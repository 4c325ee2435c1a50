"""DEM window ops + connected components + contour goldens
(independent brute-force oracles, mirroring autotest/alg strategy)."""

import numpy as np
import pytest

from gdal_ray.functions.ccl import (contour_levels, contour_segment_count,
                                    label_components, region_table)
from gdal_ray.functions.dem import (aspect, color_relief, hillshade,
                                    roughness, slope, tpi, tri)


def _dem(n=32, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n] / n
    return 100 + 40 * np.sin(3 * xx) * np.cos(2 * yy) + rng.normal(0, 1, (n, n))


def _win(z, y, x):
    return [z[y - 1, x - 1], z[y - 1, x], z[y - 1, x + 1],
            z[y, x - 1], z[y, x], z[y, x + 1],
            z[y + 1, x - 1], z[y + 1, x], z[y + 1, x + 1]]


def test_hillshade_matches_pointwise_oracle():
    """Vectorized hillshade == direct per-pixel evaluation of the
    reference formula (apps/gdaldem_lib.cpp GDALHillshadeAlg)."""
    z = _dem()
    ewres, nsres = 5.0, -5.0
    hs = hillshade(z, ewres, nsres, zfactor=2.0, azimuth=315, altitude=45)
    zf = 2.0 / 8.0
    alt, az = np.radians(45), np.radians(315)
    for (y, x) in [(1, 1), (5, 9), (20, 17), (30, 30)]:
        w = _win(z, y, x)
        gx = ((w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])) / ewres
        gy = ((w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])) / nsres
        cang = (254 * np.sin(alt) - (gy * 254 * np.cos(az) * np.cos(alt) * zf
                - gx * 254 * np.sin(az) * np.cos(alt) * zf)) \
            / np.sqrt(1 + zf * zf * (gx * gx + gy * gy))
        expect = 1.0 if cang <= 0 else 1.0 + cang
        assert hs[y, x] == pytest.approx(expect, rel=1e-12)
    assert np.isnan(hs[0, :]).all() and np.isnan(hs[:, 0]).all()
    interior = hs[1:-1, 1:-1]
    assert (interior >= 1.0).all() and (interior <= 255.0).all()


def test_slope_flat_and_ramp():
    flat = np.full((8, 8), 42.0)
    assert np.nanmax(slope(flat, 1.0, -1.0)) == 0.0
    # plane z = x: slope = 45 deg at unit resolution
    ramp = np.tile(np.arange(8, dtype=np.float64), (8, 1))
    s = slope(ramp, 1.0, -1.0)
    assert s[3, 3] == pytest.approx(45.0)
    sp = slope(ramp, 1.0, -1.0, percent=True)
    assert sp[3, 3] == pytest.approx(100.0)


def test_aspect_cardinal_directions():
    # z increases to the east -> downslope faces west (270 azimuth)
    east = np.tile(np.arange(8, dtype=np.float64), (8, 1))
    a = aspect(east)
    assert a[3, 3] == pytest.approx(270.0)
    # z increases to the south -> faces north (0)
    south = np.tile(np.arange(8, dtype=np.float64)[:, None], (1, 8))
    a = aspect(south)
    assert a[3, 3] == pytest.approx(0.0)
    flat = np.full((8, 8), 1.0)
    assert np.isnan(aspect(flat)[3, 3])


def test_tri_tpi_roughness_oracle():
    z = _dem(16)
    t_r = tri(z)
    t_w = tri(z, alg="wilson")
    t_p = tpi(z)
    r = roughness(z)
    for (y, x) in [(1, 1), (7, 9), (14, 14)]:
        w = _win(z, y, x)
        nb = [w[i] for i in (0, 1, 2, 3, 5, 6, 7, 8)]
        assert t_r[y, x] == pytest.approx(
            np.sqrt(sum((v - w[4]) ** 2 for v in nb)))
        assert t_w[y, x] == pytest.approx(
            sum(abs(v - w[4]) for v in nb) / 8.0)
        assert t_p[y, x] == pytest.approx(w[4] - np.mean(nb))
        assert r[y, x] == pytest.approx(max(w) - min(w))


def test_color_relief_interpolation():
    z = np.array([[0.0, 5.0], [10.0, 20.0]])
    levels = [0.0, 10.0, 20.0]
    colors = [(0, 0, 0), (100, 200, 50), (255, 255, 255)]
    out = color_relief(z, levels, colors)
    assert tuple(out[0, 0]) == (0, 0, 0)
    assert tuple(out[0, 1]) == (50, 100, 25)
    assert tuple(out[1, 0]) == (100, 200, 50)
    assert tuple(out[1, 1]) == (255, 255, 255)


# ------------------------------------------------------------------ CCL


def _flood_labels(v, connect=4):
    """Independent oracle: BFS flood fill."""
    h, w = v.shape
    lab = -np.ones((h, w), np.int32)
    nxt = 0
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connect == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for y in range(h):
        for x in range(w):
            if lab[y, x] >= 0:
                continue
            stack = [(y, x)]
            lab[y, x] = nxt
            while stack:
                cy, cx = stack.pop()
                for dy, dx in offs:
                    ny, nx_ = cy + dy, cx + dx
                    if 0 <= ny < h and 0 <= nx_ < w and lab[ny, nx_] < 0 \
                            and v[ny, nx_] == v[cy, cx]:
                        lab[ny, nx_] = nxt
                        stack.append((ny, nx_))
            nxt += 1
    return lab


@pytest.mark.parametrize("connect", [4, 8])
def test_label_components_vs_flood_fill(connect):
    rng = np.random.default_rng(11)
    v = rng.integers(0, 3, (24, 31), np.int32)
    ours = label_components(v, connect)
    oracle = _flood_labels(v, connect)
    # same partition (label values may differ): compare canonical forms
    assert ours.max() == oracle.max()
    # bijective mapping between labelings
    pairs = set(zip(ours.reshape(-1).tolist(), oracle.reshape(-1).tolist()))
    assert len(pairs) == ours.max() + 1


def test_region_table_counts():
    v = np.array([[1, 1, 2], [1, 2, 2], [3, 3, 3]], np.int32)
    lab = label_components(v, 4)
    t = region_table(v, lab)
    assert sorted(t["n_pixels"]) == [3, 3, 3]
    assert sorted(t["value"]) == [1, 2, 3]


# ------------------------------------------------------------------ contour


def test_contour_counts_circle():
    """Iso-line of a radial field: crossing count grows with radius."""
    n = 64
    yy, xx = np.mgrid[0:n, 0:n]
    z = np.hypot(xx - 32, yy - 32)
    c10 = contour_segment_count(z, 10.0)
    c20 = contour_segment_count(z, 20.0)
    assert c20 > c10 > 0
    assert contour_segment_count(z, 1000.0) == 0
    # a closed iso-line's segment count tracks its circumference
    # (grid-aligned marching squares emits ~1.2x 2*pi*r segments)
    assert 0.8 * 2 * np.pi * 10 < c10 < 1.6 * 2 * np.pi * 10


def test_contour_levels_interval():
    lv = contour_levels(3.0, 27.0, 10.0)
    np.testing.assert_array_equal(lv, [10.0, 20.0])
    lv = contour_levels(-5.0, 25.0, 10.0, base=5.0)
    np.testing.assert_array_equal(lv, [-5.0, 5.0, 15.0, 25.0])
