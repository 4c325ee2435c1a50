"""Tiling schemes (OGC TileMatrixSets) vs the reference's own
expectations (gcore/tilematrixset.cpp geometry;
autotest/utilities/test_gdalalg_raster_tile.py geodetic goldens)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.tiles import (SCHEMES, lonlat_to_tile,
                                      tile_geotransform)
from gdal_ray.functions.warpkernels import warp_affine
from gdal_ray.sources.tiff import decode_tiff

GEOD = SCHEMES["geodetic"]
MERC = SCHEMES["WebMercatorQuad"]


def test_aliases():
    assert SCHEMES["mercator"] is MERC
    assert SCHEMES["GoogleMapsCompatible"] is MERC
    assert SCHEMES["geodetic"] is SCHEMES["WorldCRS84Quad"]


def test_geodetic_matrix_sizes():
    # WorldCRS84Quad: 2x1 at zoom 0, doubling per zoom
    assert GEOD.matrix(0) == (2, 1)
    assert GEOD.matrix(3) == (16, 8)
    assert MERC.matrix(0) == (1, 1)


def test_geodetic_bounds_and_gt():
    xmin, ymin, xmax, ymax = GEOD.tile_bounds(0, 0, 0)
    assert (xmin, ymin, xmax, ymax) == (-180.0, -90.0, 0.0, 90.0)
    gt = GEOD.tile_geotransform(1, 0, 0, 256)
    assert gt == (0.0, 180.0 / 256, 0.0, 90.0, 0.0, -180.0 / 256)


def test_geodetic_tms_convention():
    # z1: 4x2; xyz row 0 = north, tms row 0 = south
    assert GEOD.tile_bounds(0, 0, 1, "xyz")[3] == 90.0
    assert GEOD.tile_bounds(0, 0, 1, "tms")[1] == -90.0


def test_coords_to_tile_roundtrip():
    tx, ty = GEOD.coords_to_tile(-179.9, 89.9, 2)
    assert (tx, ty) == (0, 0)
    tx, ty = GEOD.coords_to_tile(179.9, -89.9, 2)
    assert (tx, ty) == (7, 3)
    # edge clamp: lon exactly 180 lands in the last column
    tx, _ = GEOD.coords_to_tile(180.0, 0.0, 2)
    assert tx == 7


def test_mercator_scheme_matches_legacy_functions():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 64)
    lat = rng.uniform(-84, 84, 64)
    from gdal_ray.functions.crs import lonlat_to_webmercator
    x, y = lonlat_to_webmercator(lon, lat)
    tx1, ty1 = MERC.coords_to_tile(x, y, 7)
    tx2, ty2 = lonlat_to_tile(lon, lat, 7)
    assert np.array_equal(tx1, tx2) and np.array_equal(ty1, ty2)
    assert MERC.tile_geotransform(5, 9, 6) == tile_geotransform(5, 9, 6)


def test_small_world_geodetic_golden():
    # test_gdalalg_raster_tile_small_world_geodetic: two z0 tiles,
    # per-band checksums within abs=1 (the reference's own tolerance)
    with open("/root/reference/autotest/gdrivers/data/small_world.tif",
              "rb") as fh:
        px, gt = decode_tiff(fh.read())
    exp = {(0, 0): [1315, 63955, 5106], (1, 0): [24456, 25846, 15674]}
    for (tx, ty), want in exp.items():
        dst_gt = GEOD.tile_geotransform(tx, ty, 0)
        cs = [checksum_image(
            warp_affine(px[:, :, b], gt, dst_gt, 256, 256, "cubic"))
            for b in range(3)]
        assert all(abs(c - w) <= 1 for c, w in zip(cs, want)), (cs, want)
