"""gdaldem conformance against the reference's OWN expected checksums
on n43.tif (reference autotest/utilities/test_gdaldem_lib.py) — exact
GDALChecksumImage equality, incl. the PixelIsPoint half-pixel
geotransform shift and the auto geographic scale rule."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.dem import (aspect, auto_scale_geographic, hillshade,
                                    roughness, slope, tpi, tri)
from gdal_ray.sources.tiff import decode_tiff

N43 = "/root/reference/autotest/gdrivers/data/n43.tif"


@pytest.fixture(scope="module")
def n43():
    with open(N43, "rb") as f:
        px, gt = decode_tiff(f.read())
    return px.astype(np.float64), gt


def _byte(hs):
    return np.where(np.isnan(hs), 0,
                    np.clip(np.floor(hs + 0.5), 1, 255)).astype(np.uint8)


def _int32(v, nodata=-9999.0):
    out = np.where(np.isnan(v), nodata, v)
    return np.floor(out + 0.5).astype(np.int64)


def test_n43_pixel_is_point_geotransform(n43):
    _, gt = n43
    assert gt[0] == pytest.approx(-80.00416666666666)
    assert gt[3] == pytest.approx(44.00416666666666)


# (test_gdaldem_lib_hillshade / _combined / _ZevenbergenThorne[_combined])
@pytest.mark.parametrize("alg,combined,scaled,want", [
    ("horn", False, True, 45587),
    ("horn", False, False, 46008),
    ("horn", True, True, 43876),
    ("horn", True, False, 42176),
    ("zevenbergen-thorne", False, True, 46544),
    ("zevenbergen-thorne", False, False, 45373),
    ("zevenbergen-thorne", True, True, 43112),
    ("zevenbergen-thorne", True, False, 42340),
])
def test_hillshade_checksums(n43, alg, combined, scaled, want):
    z, gt = n43
    if scaled:
        xs = ys = 111120.0
    else:
        xs, ys = auto_scale_geographic(gt, z.shape[0])
    hs = hillshade(z, gt[1] * xs, gt[5] * ys, zfactor=30.0, alg=alg,
                   combined=combined)
    assert checksum_image(_byte(hs)) == want


def test_hillshade_compute_edges(n43):
    """(test_gdaldem_lib_hillshade_compute_edges: checksum 50239)"""
    z, gt = n43
    hs = hillshade(z, gt[1] * 111120.0, gt[5] * 111120.0, zfactor=30.0,
                   compute_edges=True)
    out = np.clip(np.floor(hs + 0.5), 1, 255).astype(np.uint8)
    assert not np.isnan(hs).any()
    assert checksum_image(out) == 50239


@pytest.mark.parametrize("scaled,want", [(True, 64393), (False, 65468)])
def test_slope_zt_checksums(n43, scaled, want):
    z, gt = n43
    if scaled:
        xs = ys = 111120.0
    else:
        xs, ys = auto_scale_geographic(gt, z.shape[0])
    s = slope(z, gt[1] * xs, gt[5] * ys, alg="zevenbergen-thorne")
    assert checksum_image(_int32(s)) == want


def test_aspect_zt_checksum(n43):
    z, gt = n43
    a = aspect(z, alg="zevenbergen-thorne")
    assert checksum_image(_int32(a)) == 50539


def test_tpi_tri_roughness_checksums(n43):
    z, _ = n43
    assert checksum_image(_int32(tpi(z))) == 60504
    assert checksum_image(_int32(tri(z, alg="wilson"))) == 61143
    assert checksum_image(_int32(tri(z, alg="riley"))) == 41233
    assert checksum_image(_int32(roughness(z))) == 38624


def test_hillshade_multidirectional_and_igor(n43):
    """(test_gdaldem_lib_hillshade_multidirectional[_ZT] / _igor:
    51784 / 50860 / 48830, all with computeEdges)."""
    from gdal_ray.functions.dem import (hillshade_igor,
                                        hillshade_multidirectional)

    z, gt = n43
    S = 111120.0

    def byte(hs):
        return np.clip(np.floor(hs + 0.5), 1, 255).astype(np.uint8)

    hs = hillshade_multidirectional(z, gt[1] * S, gt[5] * S, zfactor=30.0,
                                    compute_edges=True)
    assert checksum_image(byte(hs)) == 51784
    hs = hillshade_multidirectional(z, gt[1] * S, gt[5] * S, zfactor=30.0,
                                    alg="zevenbergen-thorne",
                                    compute_edges=True)
    assert checksum_image(byte(hs)) == 50860
    hs = hillshade_igor(z, gt[1] * S, gt[5] * S, zfactor=30.0,
                        compute_edges=True)
    assert checksum_image(byte(hs)) == 48830


def test_color_relief_reference_checksums(n43):
    """(test_gdaldem_lib_color_relief + _synthetic: linear band
    checksums 55066/37594/47768, nearest 57296, exact 8073; plus the
    4-pixel synthetic expectations, incl. nodata-255 guard entries)."""
    from gdal_ray.functions.dem import color_relief_gdal
    from gdal_ray.sources.tiff import tiff_nodata

    z, _ = n43
    nd = -32767.0
    levels = [500, 450, 300, 150, 76, 75, -32768]
    colors = [(255, 255, 255), (235, 220, 175), (190, 185, 135),
              (240, 250, 150), (50, 180, 50), (200, 230, 255),
              (200, 230, 255)]
    out = color_relief_gdal(z, levels, colors, "linear_interpolation",
                            src_nodata=nd)
    assert [checksum_image(out[:, :, b]) for b in range(3)] == \
        [55066, 37594, 47768]
    out = color_relief_gdal(z, levels, colors, "nearest_color_entry",
                            src_nodata=nd)
    assert checksum_image(out[:, :, 0]) == 57296
    out = color_relief_gdal(z, levels, colors, "exact_color_entry",
                            src_nodata=nd)
    assert checksum_image(out[:, :, 0]) == 8073

    z4 = np.array([[0, 1, 2, 3]], np.float64)
    for mode in ("nearest_color_entry", "exact_color_entry",
                 "linear_interpolation"):
        o = color_relief_gdal(z4, [0, 1, 2, 3],
                              [(0, 0, 0), (10, 11, 12), (20, 21, 22),
                               (30, 31, 32)], mode)
        assert o[0, :, 0].tolist() == [0, 10, 20, 30]
        assert o[0, :, 1].tolist() == [0, 11, 21, 31]
        assert o[0, :, 2].tolist() == [0, 12, 22, 32]
    # nodata-255 variant: nodata pixels keep the 255 table entry, and
    # values adjacent to it do not interpolate into it
    z5 = np.array([[0, 1, 2, 255]], np.float64)
    o = color_relief_gdal(z5, [0, 1, 2, 255],
                          [(0, 1, 2), (10, 11, 12), (20, 21, 22),
                           (255, 255, 255)], "linear_interpolation",
                          src_nodata=255.0)
    assert o[0, :, 0].tolist() == [0, 10, 20, 255]
    assert o[0, :, 1].tolist() == [1, 11, 21, 255]
