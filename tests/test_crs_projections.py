"""Conic/polar projection conformance (Lambert-93, Conus Albers,
polar stereographic) via projection invariants + round-trips.

The invariants are formula-independent ground truth (reference
delegates to PROJ, ogr/ogrct.cpp:655; we verify the same mathematical
contracts PROJ satisfies):
- forward∘inverse = identity to sub-mm;
- a CONFORMAL projection (LCC, stereographic) has scale k == 1 along
  its standard parallel(s) and an isotropic numeric Jacobian;
- an EQUAL-AREA projection (Albers) preserves the ellipsoidal area
  element everywhere: |det J(lam, phi)| == M * N * cos(phi).
"""

import numpy as np
import pytest

from gdal_ray.functions.crs import Transformer, _projection

E2_GRS80 = (1 / 298.257222101) * (2 - 1 / 298.257222101)


def _jacobian(proj, lon, lat, d=1e-6):
    x0, y0 = proj.forward(lon, lat)
    xl, yl = proj.forward(lon + d, lat)
    xp, yp = proj.forward(lon, lat + d)
    rd = np.radians(d)
    return ((xl - x0) / rd, (xp - x0) / rd,
            (yl - y0) / rd, (yp - y0) / rd)


def _radii(lat, a=6378137.0, e2=E2_GRS80):
    s = np.sin(np.radians(lat))
    W = np.sqrt(1 - e2 * s * s)
    return a * (1 - e2) / W**3, a / W  # (M meridional, N prime vertical)


@pytest.mark.parametrize("epsg,pts", [
    (2154, [(2.35, 48.85), (-4.5, 48.4), (7.7, 43.7), (3.0, 46.5)]),
    (5070, [(-96.0, 23.0), (-122.4, 37.8), (-74.0, 40.7), (-87.6, 41.9)]),
    (3413, [(-45.0, 90.0), (-45.0, 70.0), (10.0, 75.0), (-120.0, 80.0)]),
    (3031, [(0.0, -90.0), (0.0, -71.0), (120.0, -75.0), (-60.0, -80.0)]),
])
def test_roundtrip_submm(epsg, pts):
    p = _projection(epsg)
    lon = np.array([q[0] for q in pts])
    lat = np.array([q[1] for q in pts])
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    # poles have undefined lon; compare positions in projected space
    x2, y2 = p.forward(lon2, lat2)
    assert np.max(np.hypot(x2 - x, y2 - y)) < 1e-3


@pytest.mark.parametrize("epsg,std_lats", [
    (2154, (49.0, 44.0)),
    (3413, (70.0,)),
    (3031, (-71.0,)),
])
def test_conformal_scale_one_at_standard_parallels(epsg, std_lats):
    p = _projection(epsg)
    for lat in std_lats:
        for lon in (-30.0, 0.0, 20.0):
            dxl, dxp, dyl, dyp = _jacobian(p, lon, lat)
            M, N = _radii(lat, p.a, p.e2)
            k_along = np.hypot(dxl, dyl) / (N * np.cos(np.radians(lat)))
            h_along = np.hypot(dxp, dyp) / M
            assert abs(k_along - 1.0) < 1e-6, (epsg, lat, k_along)
            assert abs(h_along - 1.0) < 1e-6, (epsg, lat, h_along)


def test_conformal_isotropy_lcc():
    p = _projection(2154)
    for lon, lat in [(2.35, 48.85), (-4.0, 43.2), (8.0, 49.5)]:
        dxl, dxp, dyl, dyp = _jacobian(p, lon, lat)
        M, N = _radii(lat)
        k = np.hypot(dxl, dyl) / (N * np.cos(np.radians(lat)))
        h = np.hypot(dxp, dyp) / M
        assert abs(k / h - 1.0) < 1e-6  # conformal: equal scales
        # and perpendicular: J columns orthogonal
        dot = dxl * dxp + dyl * dyp
        assert abs(dot) / (np.hypot(dxl, dyl) * np.hypot(dxp, dyp)) < 1e-6


def test_albers_preserves_area_element():
    p = _projection(5070)
    for lon, lat in [(-96.0, 23.0), (-120.0, 49.0), (-70.0, 25.0),
                     (-96.0, 37.0)]:
        dxl, dxp, dyl, dyp = _jacobian(p, lon, lat)
        det = abs(dxl * dyp - dxp * dyl)
        M, N = _radii(lat, p.a, p.e2)
        expect = M * N * np.cos(np.radians(lat))
        assert abs(det / expect - 1.0) < 1e-6


def test_known_point_sanity():
    """Coarse position checks (city-scale tolerance) so a sign/offset
    bug can't pass the invariants by symmetry."""
    # Paris in Lambert-93 is near (652000, 6862000)
    x, y = _projection(2154).forward(2.3522, 48.8566)
    assert abs(x - 652000) < 10000 and abs(y - 6862000) < 10000
    # Origin of Conus Albers: (lon0, lat0) -> (0, 0)
    x, y = _projection(5070).forward(-96.0, 23.0)
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    # North pole is the 3413 projection center
    x, y = _projection(3413).forward(-45.0, 90.0)
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    # South pole center for 3031
    x, y = _projection(3031).forward(0.0, -90.0)
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    # 3031: the 0-meridian at 71S should sit on the negative-y axis
    x, y = _projection(3031).forward(0.0, -71.0)
    assert abs(x) < 1e-3 and y > 1e6


def test_transformer_dispatch_new_epsg():
    t = Transformer(4326, 2154)
    x, y = t.transform(np.array([2.3522]), np.array([48.8566]))
    lon, lat = t.inverse().transform(x, y)
    assert abs(lon[0] - 2.3522) < 1e-9 and abs(lat[0] - 48.8566) < 1e-9
    t2 = Transformer(2154, 3857)
    mx, my = t2.transform(x, y)
    assert abs(mx[0] - 2.3522 / 180.0 * np.pi * 6378137.0) < 1.0


def test_warp_through_lcc_crs():
    """End-to-end warp of an EPSG:2154-georeferenced image into
    WebMercator tiles: the GenImgProj chain composes the LCC inverse +
    Mercator forward; approx transform stays under gdalwarp's 0.125 px
    default error and the output is deterministic."""
    from gdal_ray.functions.codecs import decode_image
    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.stages.warp import (ApproxGridTransform,
                                      GenImgProjTransform,
                                      warp_image_to_tiles)

    rng = np.random.default_rng(42)
    px = rng.integers(0, 255, (256, 256, 3), np.uint8)
    # 256x256 @ 100 m around Paris in Lambert-93
    gt = (652000.0, 100.0, 0.0, 6862000.0, 0.0, -100.0)

    frags = warp_image_to_tiles(px, gt, 2154, "lcc0", None)
    assert frags, "no fragments produced"
    total_valid = sum(f["n_valid"] for f in frags)
    assert total_valid > 200 * 200  # most of the footprint lands
    cks = sorted(checksum_image(decode_image(f["pixels"])[:, :, 0])
                 for f in frags)
    # determinism: identical rerun
    frags2 = warp_image_to_tiles(px, gt, 2154, "lcc0", None)
    cks2 = sorted(checksum_image(decode_image(f["pixels"])[:, :, 0])
                  for f in frags2)
    assert cks == cks2

    # approx-vs-exact error below the gdalwarp default threshold
    exact = GenImgProjTransform(gt, 2154,
                                (652000.0, 100.0, 0.0, 6862000.0, 0.0, -100.0),
                                2154)
    z = frags[0]["z"]
    from gdal_ray.functions.tiles import tile_bounds
    bx0, by0, bx1, by1 = tile_bounds(frags[0]["tx"], frags[0]["ty"], z)
    res = (bx1 - bx0) / 256
    dst_gt = (bx0, res, 0.0, by1, 0.0, -res)
    exact = GenImgProjTransform(gt, 2154, dst_gt, 3857)
    approx = ApproxGridTransform(exact, 256, 256, grid=8)
    gx, gy = np.meshgrid(np.linspace(0, 256, 33), np.linspace(0, 256, 33))
    ex, ey = exact(gx.ravel(), gy.ravel())
    ax, ay = approx(gx.ravel(), gy.ravel())
    assert np.hypot(ex - ax, ey - ay).max() < 0.125
