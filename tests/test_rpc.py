"""RPC transformer (functions/rpc.py) — RPC00B semantics per
alg/gdal_rpc.cpp: exact forward, iterative inverse under the 0.1 px
default threshold, metadata parse, DEM hook, GenImgProj integration.
"""

import numpy as np
import pytest

from gdal_ray.functions.rpc import (
    RPCModel,
    RPCTransform,
    _terms,
    synthetic_rpc_scene,
)
from gdal_ray.stages.warp import ApproxGridTransform, GenImgProjTransform


def test_term_order_matches_reference():
    """Spot-check the 20-term order against gdal_rpc.cpp:196-216 with
    distinguishable primes."""
    L, P, H = np.float64(2.0), np.float64(3.0), np.float64(5.0)
    T = _terms(L, P, H).ravel()
    exp = [1, 2, 3, 5, 6, 10, 15, 4, 9, 25,
           30, 8, 18, 50, 12, 27, 75, 20, 45, 125]
    np.testing.assert_array_equal(T, exp)


def test_forward_is_rational_polynomial():
    m = synthetic_rpc_scene()
    t = RPCTransform(m)
    lon, lat, h = -122.3, 44.7, 150.0
    L = (lon - m.long_off) / m.long_scale
    P = (lat - m.lat_off) / m.lat_scale
    H = (h - m.height_off) / m.height_scale
    T = _terms(np.float64(L), np.float64(P), np.float64(H)).ravel()
    exp_px = (m.samp_num @ T) / (m.samp_den @ T) * m.samp_scale + m.samp_off
    exp_ln = (m.line_num @ T) / (m.line_den @ T) * m.line_scale + m.line_off
    px, ln = t.geo_to_pixel(np.float64(lon), np.float64(lat), np.float64(h))
    assert float(px) == pytest.approx(exp_px, abs=1e-12)
    assert float(ln) == pytest.approx(exp_ln, abs=1e-12)


def test_inverse_roundtrip_under_threshold():
    """pixel -> long/lat -> pixel closes to < 0.1 px (the reference's
    default dfPixErrThreshold) over a full scene grid."""
    t = RPCTransform(synthetic_rpc_scene(512, 512))
    px, ln = np.meshgrid(np.linspace(0, 512, 21), np.linspace(0, 512, 21))
    lon, lat = t.pixel_to_geo(px, ln)
    assert not np.isnan(lon).any()
    bx, bl = t.geo_to_pixel(lon, lat)
    err = np.maximum(np.abs(bx - px), np.abs(bl - ln))
    assert float(err.max()) < 0.1


def test_inverse_with_explicit_height():
    t = RPCTransform(synthetic_rpc_scene())
    h = np.full(5, 400.0)
    px = np.linspace(50, 450, 5)
    ln = np.linspace(60, 460, 5)
    lon, lat = t.pixel_to_geo(px, ln, h)
    bx, bl = t.geo_to_pixel(lon, lat, h)
    assert float(np.abs(bx - px).max()) < 0.1
    assert float(np.abs(bl - ln).max()) < 0.1


def test_dem_hook_reevaluated():
    """height_fn plays RPC_DEM: a sloped ground changes the solution
    vs h=0, and the roundtrip through the same DEM still closes."""
    ground = lambda lon, lat: 1000.0 * (np.asarray(lon) + 123.0)
    t_dem = RPCTransform(synthetic_rpc_scene(), height_fn=ground)
    t_flat = RPCTransform(synthetic_rpc_scene())
    px = np.array([100.0, 400.0])
    ln = np.array([120.0, 380.0])
    lon_d, lat_d = t_dem.pixel_to_geo(px, ln)
    lon_f, lat_f = t_flat.pixel_to_geo(px, ln)
    assert np.abs(lon_d - lon_f).max() > 1e-6  # parallax moved it
    bx, bl = t_dem.geo_to_pixel(lon_d, lat_d)
    assert float(np.abs(bx - px).max()) < 0.1


def test_from_metadata_roundtrip():
    m = synthetic_rpc_scene()
    md = {
        "LINE_OFF": m.line_off, "SAMP_OFF": m.samp_off,
        "LAT_OFF": m.lat_off, "LONG_OFF": m.long_off,
        "HEIGHT_OFF": m.height_off,
        "LINE_SCALE": m.line_scale, "SAMP_SCALE": m.samp_scale,
        "LAT_SCALE": m.lat_scale, "LONG_SCALE": m.long_scale,
        "HEIGHT_SCALE": m.height_scale,
        "LINE_NUM_COEFF": " ".join(map(str, m.line_num)),
        "LINE_DEN_COEFF": " ".join(map(str, m.line_den)),
        "SAMP_NUM_COEFF": " ".join(map(str, m.samp_num)),
        "SAMP_DEN_COEFF": " ".join(map(str, m.samp_den)),
    }
    m2 = RPCModel.from_metadata(md)
    t1, t2 = RPCTransform(m), RPCTransform(m2)
    px, ln = t1.geo_to_pixel(np.float64(-122.4), np.float64(44.6))
    qx, qn = t2.geo_to_pixel(np.float64(-122.4), np.float64(44.6))
    assert float(px) == float(qx) and float(ln) == float(qn)


def test_bad_coeff_count_raises():
    with pytest.raises(ValueError):
        RPCModel(samp_num=np.zeros(19))


def test_genimgproj_chain_with_rpc():
    """RPC as the src link of GenImgProj: src pixel -> (RPC) long/lat
    4326 -> dst grid 3857; the approx grid stays under the 0.125 px
    contract on a 256x256 scene."""
    t = RPCTransform(synthetic_rpc_scene(256, 256))
    # dst grid over the scene's long/lat footprint in webmercator
    lon, lat = t.pixel_to_geo(np.array([0.0, 256.0]), np.array([0.0, 256.0]))
    from gdal_ray.functions.crs import lonlat_to_webmercator
    xs, ys = lonlat_to_webmercator(lon, lat)
    x0, y1 = float(xs.min()), float(ys.max())
    res = float(xs.max() - xs.min()) / 256
    dst_gt = (x0, res, 0.0, y1, 0.0, -res)
    exact = GenImgProjTransform(None, 4326, dst_gt, 3857, src_georef=t)
    approx = ApproxGridTransform(exact, 256, 256, grid=16)
    gx, gy = np.meshgrid(np.linspace(1, 255, 40), np.linspace(1, 255, 40))
    ex, ey = exact(gx.ravel(), gy.ravel())
    ax, ay = approx(gx.ravel(), gy.ravel())
    ok = ~(np.isnan(ex) | np.isnan(ax))
    assert ok.sum() > 0.9 * ok.size
    err = np.hypot(ex[ok] - ax[ok], ey[ok] - ay[ok])
    assert float(err.max()) <= 0.125
