"""Homography transformer (alg/gdal_homography.cpp): DLT fit with the
reference's normalization + gauge, closed inverse, composition."""

import numpy as np
import pytest

from gdal_ray.functions.gcp import (HomographyTransform, apply_homography,
                                    compose_homographies, fit_homography,
                                    georef_from_gcps, invert_homography)

AFFINE = np.array([100.0, 2.0, 0.5, 500.0, -0.25, -3.0, 1.0, 0.0, 0.0])
PROJ = np.array([10.0, 1.5, 0.2, 20.0, -0.1, 2.0, 1.0, 2e-3, -1e-3])


def _grid(n=7):
    px, ln = np.meshgrid(np.linspace(0, 60, n), np.linspace(0, 40, n))
    return px.ravel(), ln.ravel()


def test_apply_matches_affine_gt():
    px, ln = _grid()
    x, y = apply_homography(AFFINE, px, ln)
    np.testing.assert_allclose(x, 100 + 2 * px + 0.5 * ln)
    np.testing.assert_allclose(y, 500 - 0.25 * px - 3 * ln)


def test_invert_roundtrip():
    for h in (AFFINE, PROJ):
        hi = invert_homography(h)
        px, ln = _grid()
        x, y = apply_homography(h, px, ln)
        bx, by = apply_homography(hi, x, y)
        np.testing.assert_allclose(bx, px, atol=1e-9)
        np.testing.assert_allclose(by, ln, atol=1e-9)


def test_compose_order():
    px, ln = _grid()
    c = compose_homographies(AFFINE, PROJ)  # apply AFFINE then PROJ
    x1, y1 = apply_homography(AFFINE, px, ln)
    x2, y2 = apply_homography(PROJ, x1, y1)
    cx, cy = apply_homography(c, px, ln)
    np.testing.assert_allclose(cx, x2, rtol=1e-10)
    np.testing.assert_allclose(cy, y2, rtol=1e-10)


def test_fit_recovers_projective_map():
    px, ln = _grid(5)
    gx, gy = apply_homography(PROJ, px, ln)
    h = fit_homography(px, ln, gx, gy)
    tx, ty = apply_homography(h, px, ln)
    np.testing.assert_allclose(tx, gx, atol=1e-8)
    np.testing.assert_allclose(ty, gy, atol=1e-8)
    # off-GCP points too
    qx, qy = apply_homography(h, np.array([13.7]), np.array([21.3]))
    ex, ey = apply_homography(PROJ, np.array([13.7]), np.array([21.3]))
    np.testing.assert_allclose([qx[0], qy[0]], [ex[0], ey[0]], atol=1e-8)


def test_transform_beats_order1_on_projective_data():
    px, ln = _grid(6)
    gx, gy = apply_homography(PROJ, px, ln)
    hom = georef_from_gcps(px, ln, gx, gy, homography=True)
    assert isinstance(hom, HomographyTransform)
    assert hom.rms_residual(px, ln, gx, gy) < 1e-8
    aff = georef_from_gcps(px, ln, gx, gy, order=1)
    assert aff.rms_residual(px, ln, gx, gy) > 1e-3
    # closed inverse round-trips
    bx, by = hom.geo_to_pixel(gx, gy)
    np.testing.assert_allclose(bx, px, atol=1e-8)
    np.testing.assert_allclose(by, ln, atol=1e-8)


def test_degenerate_gcps_raise():
    with pytest.raises(ValueError):
        fit_homography([0, 1, 2, 3], [5, 5, 5, 5], [0, 1, 2, 3],
                       [0, 1, 2, 3])
    with pytest.raises(ValueError):
        fit_homography([0, 1], [0, 1], [0, 1], [0, 1])
