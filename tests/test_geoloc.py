"""Geolocation-array transformer (functions/geoloc.py) vs the
reference's GDALGeoLocTransformer semantics (alg/gdalgeoloc.cpp)."""

import numpy as np
import pytest

from gdal_ray.functions.affine import apply_gt
from gdal_ray.functions.geoloc import GeolocTransform, synthetic_swath

GT = (500_000.0, 30.0, 0.0, 4_200_000.0, 0.0, -30.0)


def test_forward_matches_affine():
    """Affine-consistent geoloc arrays reproduce the affine exactly
    (bilinear of a plane is the plane)."""
    tr = GeolocTransform(**synthetic_swath(96, 96, step=4, gt=GT))
    rng = np.random.default_rng(7)
    px = rng.uniform(0, 96, 500)
    ln = rng.uniform(0, 96, 500)
    x, y = tr.pixel_to_geo(px, ln)
    xa, ya = apply_gt(GT, px, ln)
    assert np.abs(x - xa).max() < 1e-6
    assert np.abs(y - ya).max() < 1e-6


def test_forward_infinite_extension():
    """Coordinates beyond the geoloc grid extrapolate the border cell
    (PixelLineToXY 'infinite extension', gdalgeoloc.cpp:371-470)."""
    tr = GeolocTransform(**synthetic_swath(96, 96, step=4, gt=GT))
    # raster pixel -3 / 99 are outside the sampled grid but the plane
    # extends exactly
    px = np.array([-3.0, 99.0, -1.0])
    ln = np.array([99.0, -3.0, 100.0])
    x, y = tr.pixel_to_geo(px, ln)
    xa, ya = apply_gt(GT, px, ln)
    assert np.abs(x - xa).max() < 1e-6
    assert np.abs(y - ya).max() < 1e-6


def test_inverse_roundtrip_affine():
    tr = GeolocTransform(**synthetic_swath(96, 96, step=4, gt=GT))
    rng = np.random.default_rng(11)
    px = rng.uniform(0, 96, 400)
    ln = rng.uniform(0, 96, 400)
    x, y = tr.pixel_to_geo(px, ln)
    p2, l2 = tr.geo_to_pixel(x, y)
    assert not np.isnan(p2).any()
    assert np.abs(p2 - px).max() < 0.05
    assert np.abs(l2 - ln).max() < 0.05


def test_inverse_roundtrip_distorted():
    """Backmap seed + Newton refine converges on a bent swath."""
    tr = GeolocTransform(**synthetic_swath(96, 96, step=4, gt=GT,
                                           distorted=True))
    rng = np.random.default_rng(13)
    px = rng.uniform(2, 94, 400)
    ln = rng.uniform(2, 94, 400)
    x, y = tr.pixel_to_geo(px, ln)
    p2, l2 = tr.geo_to_pixel(x, y)
    assert not np.isnan(p2).any()
    assert np.abs(p2 - px).max() < 0.05
    assert np.abs(l2 - ln).max() < 0.05


def test_antimeridian_shift():
    """ShiftGeoX (gdalgeoloc.cpp:72-90): neighbors >180° away wrap by
    ±360 before interpolation; the result re-wraps into [-180, 180]."""
    gx = np.array([[179.0, 179.8, -179.4], [179.0, 179.8, -179.4]])
    gy = np.array([[10.0, 10.0, 10.0], [11.0, 11.0, 11.0]])
    tw = GeolocTransform(geoloc_x=gx, geoloc_y=gy, wrap_x=True)
    # raster pixel 2.0 -> geoloc index 1.5: midpoint of 179.8 and
    # (-179.4 + 360) = 180.6 -> 180.2 -> wrapped -179.8
    x, _ = tw.pixel_to_geo(np.array([2.0]), np.array([0.5]))
    assert abs(x[0] - (-179.8)) < 1e-9
    tn = GeolocTransform(geoloc_x=gx, geoloc_y=gy, wrap_x=False)
    xn, _ = tn.pixel_to_geo(np.array([2.0]), np.array([0.5]))
    assert abs(xn[0] - 0.2) < 1e-9  # naive average without the shift


def test_nodata_samples_masked():
    kw = synthetic_swath(96, 96, step=4, gt=GT)
    kw["geoloc_x"][3, 5] = -999.0
    tr = GeolocTransform(nodata=-999.0, **kw)
    # a pixel whose 4 geoloc corners include the nodata sample -> NaN
    x, y = tr.pixel_to_geo(np.array([5 * 4 + 2.0 + 1.0]),
                           np.array([3 * 4 + 2.0 + 1.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])
    # far away unaffected
    x2, _ = tr.pixel_to_geo(np.array([60.0]), np.array([60.0]))
    assert np.isfinite(x2[0])


def test_warp_geoloc_matches_affine_render():
    """GeolocTransform through the full GenImgProj + warp stage: the
    affine-consistent swath must reproduce the affine warp on the
    shared valid mask (the autotest maxdiff bar, here exact)."""
    from gdal_ray.functions.codecs import decode_image
    from gdal_ray.stages.warp import warp_image_to_tiles

    rng = np.random.default_rng(1234)
    pixels = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
    georef = GeolocTransform(**synthetic_swath(96, 96, step=4, gt=GT))
    frags = warp_image_to_tiles(pixels, None, 32618, "geoloc",
                                src_georef=georef)
    base = warp_image_to_tiles(pixels, GT, 32618, "affine")

    def tilebufs(fl):
        out = {}
        for fr in fl:
            buf = np.zeros((256, 256, 3), np.int16)
            msk = np.zeros((256, 256), bool)
            ph = decode_image(fr["pixels"]).reshape(fr["fh"], fr["fw"], 3)
            mv = np.unpackbits(np.frombuffer(fr["mask"], np.uint8),
                               count=fr["fh"] * fr["fw"]).reshape(
                                   fr["fh"], fr["fw"]).astype(bool)
            buf[fr["y0"]:fr["y0"] + fr["fh"],
                fr["x0"]:fr["x0"] + fr["fw"]] = ph
            msk[fr["y0"]:fr["y0"] + fr["fh"],
                fr["x0"]:fr["x0"] + fr["fw"]] = mv
            out[fr["tile_key"]] = (buf, msk)
        return out

    b, o = tilebufs(base), tilebufs(frags)
    assert set(b) == set(o)
    md = 0
    for k in b:
        bb, bm = b[k]
        ob, om = o[k]
        both = bm & om
        if both.any():
            md = max(md, int(np.abs(bb - ob)[both].max()))
    assert md <= 1


def test_backmap_holes_filled():
    """A sparse geoloc grid leaves backmap holes; the fill pass +
    Newton still recovers the inverse."""
    tr = GeolocTransform(oversample=0.7,  # deliberately under-splatted
                         **synthetic_swath(96, 96, step=8, gt=GT))
    rng = np.random.default_rng(3)
    px = rng.uniform(4, 92, 200)
    ln = rng.uniform(4, 92, 200)
    x, y = tr.pixel_to_geo(px, ln)
    p2, l2 = tr.geo_to_pixel(x, y)
    assert np.isnan(p2).sum() == 0
    assert np.abs(p2 - px).max() < 0.05


def test_rejects_bad_arrays():
    with pytest.raises(ValueError):
        GeolocTransform(geoloc_x=np.zeros((4, 4)), geoloc_y=np.zeros((4, 5)))
    with pytest.raises(ValueError):
        GeolocTransform(geoloc_x=np.full((4, 4), -999.0),
                        geoloc_y=np.zeros((4, 4)), nodata=-999.0)
