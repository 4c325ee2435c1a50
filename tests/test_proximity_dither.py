"""EDT / dither / palette kernels vs brute-force oracles."""

import numpy as np
import pytest

from gdal_ray.functions.proximity import (apply_palette, distance_transform,
                                          floyd_steinberg, median_cut_palette)


def test_edt_matches_brute_force():
    rng = np.random.default_rng(12)
    t = rng.random((24, 31)) < 0.05
    t[0, 0] = True  # ensure at least one target
    d = distance_transform(t)
    ys, xs = np.nonzero(t)
    yy, xx = np.mgrid[0:24, 0:31]
    brute = np.sqrt(((yy[:, :, None] - ys[None, None, :]) ** 2
                     + (xx[:, :, None] - xs[None, None, :]) ** 2).min(axis=2))
    np.testing.assert_allclose(d, brute, atol=1e-9)
    assert (d[t] == 0).all()


def test_edt_cellsize_scales():
    t = np.zeros((5, 5), bool)
    t[2, 2] = True
    d = distance_transform(t, cellsize=30.0)
    assert d[2, 0] == pytest.approx(60.0)
    assert d[0, 0] == pytest.approx(30.0 * np.sqrt(8))


def test_floyd_steinberg_preserves_mean():
    """Error diffusion keeps the local average close to the input."""
    rng = np.random.default_rng(7)
    z = rng.uniform(0, 255, (32, 32))
    levels = np.array([0.0, 85.0, 170.0, 255.0])
    idx = floyd_steinberg(z, levels)
    out = levels[idx]
    assert abs(out.mean() - z.mean()) < 2.0
    assert set(np.unique(idx)).issubset({0, 1, 2, 3})


def test_floyd_steinberg_flat_levels_exact():
    z = np.full((8, 8), 85.0)
    idx = floyd_steinberg(z, np.array([0.0, 85.0, 255.0]))
    assert (idx == 1).all()


def test_fillnodata_gradient_hole():
    from gdal_ray.functions.proximity import fillnodata

    z = np.arange(64, dtype=float).reshape(8, 8)
    v = np.ones((8, 8), bool)
    v[3:5, 3:5] = False
    out, m = fillnodata(z, v)
    assert m.all()
    # smooth field: filled values close to the original gradient
    assert abs(out[3, 3] - 27.0) < 1.5
    assert abs(out[4, 4] - 36.0) < 1.5
    # valid pixels untouched
    np.testing.assert_array_equal(out[v], z[v])


def test_fillnodata_max_dist_limits():
    from gdal_ray.functions.proximity import fillnodata

    z = np.zeros((9, 9))
    z[0, 0] = 7.0
    v = np.zeros((9, 9), bool)
    v[0, 0] = True
    out, m = fillnodata(z, v, max_dist=2.0)
    assert m[0, 1] and m[0, 2]
    assert out[0, 1] == pytest.approx(7.0)
    assert not m[0, 3]  # beyond max_dist
    assert not m[8, 8]


def test_median_cut_and_apply():
    rng = np.random.default_rng(3)
    # two well-separated color clusters
    a = rng.normal(50, 3, (100, 3))
    b = rng.normal(200, 3, (100, 3))
    px = np.clip(np.vstack([a, b]), 0, 255).astype(np.uint8).reshape(20, 10, 3)
    pal = median_cut_palette(px, 2)
    assert pal.shape == (2, 3)
    means = sorted(pal.mean(axis=1))
    assert means[0] < 80 and means[1] > 170
    idx = apply_palette(px, pal)
    # each pixel mapped to its own cluster's entry
    dark = pal[:, 0].argmin()
    assert (idx.reshape(-1)[:100] == dark).mean() > 0.99


def test_gdal_proximity_reference_checksums():
    """GDALComputeProximity conformance (autotest/alg/proximity.py):
    the scanline two-sweep port reproduces all three checksums,
    including FIXED_BUF_VAL (targets stay 0) and USE_INPUT_NODATA
    (pat.tif's GDAL_NODATA=255)."""
    import numpy as np

    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.proximity import gdal_proximity
    from gdal_ray.sources.tiff import decode_tiff, tiff_nodata

    data = open("/root/reference/autotest/alg/data/pat.tif", "rb").read()
    px, _ = decode_tiff(data)
    assert tiff_nodata(data) == 255.0

    out = gdal_proximity(px)
    b = np.clip(np.floor(out.astype(np.float32) + 0.5), 0, 255).astype(np.uint8)
    assert checksum_image(b) == 1941

    out = gdal_proximity(px, (65, 64), maxdist=12, nodata=-1,
                         fixed_buf_val=255)
    assert checksum_image(
        np.floor(out.astype(np.float32) + 0.5).astype(np.int64)) == 3256

    out = gdal_proximity(px, (65, 64), maxdist=12, nodata=0,
                         src_nodata=tiff_nodata(data))
    b = np.clip(np.floor(out.astype(np.float32) + 0.5), 0, 255).astype(np.uint8)
    assert checksum_image(b) == 1465


def test_proximity_fractional_targets_and_nodata():
    """The band's real (float) values drive target/nodata matching —
    no int truncation (GDALComputeProximity reads float64)."""
    import numpy as np

    from gdal_ray.functions.proximity import gdal_proximity

    src = np.array([[0.0, 0.5, 0.0], [0.0, 0.0, 0.0]])
    out = gdal_proximity(src, target_values=[0.5])
    assert out[0, 1] == 0.0 and out[0, 0] == 1.0
    assert out[1, 2] == np.hypot(1, 1)
    out2 = gdal_proximity(np.array([[0.25, 1.0], [0.0, 0.0]]),
                          target_values=[1.0], src_nodata=0.25, nodata=-1)
    assert out2[0, 0] == -1 and out2[0, 1] == 0.0
