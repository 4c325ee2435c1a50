"""WebMercatorQuad / XYZ tile math (vectorized).

Reproduces the reference's `gdal raster tile` tiling scheme semantics
(reference apps/gdalalg_raster_tile.cpp:65-88 WebMercatorQuad default,
:2323-2334 MAX_LAT = 85.0511287798066 clamp; xyz-vs-tms convention
apps/gdalalg_raster_tile.h:48; OGC TileMatrixSet registry
gcore/tilematrixset.cpp). The WebMercatorQuad matrix at zoom z is a
2^z x 2^z grid over the EPSG:3857 square [-pi*R, pi*R]^2; xyz has row
0 at the north edge, tms at the south edge.
"""

from __future__ import annotations

import numpy as np

from .affine import GeoTransform
from .crs import MAX_MERC_LAT, WEB_MERCATOR_EXTENT, lonlat_to_webmercator

DEFAULT_TILE_SIZE = 256


def mercator_to_tile(x, y, z: int, convention: str = "xyz"):
    """EPSG:3857 coords -> integer tile indices at zoom z. Vectorized.

    Points exactly on the east/south matrix edge are clamped into the
    last tile (matching the reference's containment convention).
    """
    n = 1 << z
    ext = WEB_MERCATOR_EXTENT
    fx = (np.asarray(x, np.float64) + ext) / (2 * ext) * n
    tx = np.clip(np.floor(fx), 0, n - 1).astype(np.int64)
    if convention == "xyz":
        fy = (ext - np.asarray(y, np.float64)) / (2 * ext) * n
    else:  # tms
        fy = (np.asarray(y, np.float64) + ext) / (2 * ext) * n
    ty = np.clip(np.floor(fy), 0, n - 1).astype(np.int64)
    return tx, ty


def lonlat_to_tile(lon, lat, z: int, convention: str = "xyz"):
    """lon/lat degrees -> tile indices; lat clamped to +/-85.0511287798066.

    Computed directly in angular space ((lon+180)/360 and
    (1 - ln(tan(pi/4 + phi/2))/pi)/2) rather than via EPSG:3857
    meters — algebraically identical, but exact for points that land
    precisely on tile edges (e.g. lon = 135 at z=8)."""
    n = 1 << z
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -MAX_MERC_LAT, MAX_MERC_LAT)
    tx = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    fy = (1.0 - np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) / np.pi) / 2.0 * n
    ty = np.clip(np.floor(fy), 0, n - 1).astype(np.int64)
    if convention != "xyz":
        ty = n - 1 - ty
    return tx, ty


def tile_bounds(tx, ty, z: int, convention: str = "xyz"):
    """Tile indices -> EPSG:3857 (xmin, ymin, xmax, ymax). Vectorized."""
    n = 1 << z
    ext = WEB_MERCATOR_EXTENT
    size = 2 * ext / n
    tx = np.asarray(tx, np.float64)
    ty = np.asarray(ty, np.float64)
    xmin = -ext + tx * size
    if convention == "xyz":
        ymax = ext - ty * size
        ymin = ymax - size
    else:
        ymin = -ext + ty * size
        ymax = ymin + size
    return xmin, ymin, xmin + size, ymax


def tile_geotransform(tx: int, ty: int, z: int, tile_size: int = DEFAULT_TILE_SIZE,
                      convention: str = "xyz") -> GeoTransform:
    """North-up EPSG:3857 geotransform of one tile's pixel grid."""
    xmin, ymin, xmax, ymax = tile_bounds(int(tx), int(ty), z, convention)
    res = (xmax - xmin) / tile_size
    return (float(xmin), float(res), 0.0, float(ymax), 0.0, -float(res))


def tile_key(tx, ty, z) -> np.ndarray:
    """Pack (z, x, y) into one int64 sort/partition key: z<<58 | x<<29 | y.

    Supports z <= 28; used as the groupby key for compose/overview
    shuffles so one integer column carries the whole address.
    """
    return (
        (np.asarray(z, np.int64) << 58)
        | (np.asarray(tx, np.int64) << 29)
        | np.asarray(ty, np.int64)
    )


def unpack_tile_key(key):
    key = np.asarray(key, np.int64)
    return key >> 58, (key >> 29) & ((1 << 29) - 1), key & ((1 << 29) - 1)


def parent_tile(tx, ty, z):
    """Tile at z-1 containing (tx, ty): the 2x2 overview reduction key
    (reference builds overview zooms from the zoom+1 tiles,
    apps/gdalalg_raster_tile.cpp:3136-3195)."""
    return np.asarray(tx, np.int64) >> 1, np.asarray(ty, np.int64) >> 1, z - 1


def tile_neighbors(tx: int, ty: int, z: int, k: int = 1):
    """k-ring of a tile: all tiles within Chebyshev distance k
    (x wraps around the antimeridian, y clamps at the poles) — the
    halo-expansion used for cross-cell kNN edge handling
    (SURVEY.md §2.4, the H3 k-ring analog on the XYZ grid)."""
    n = 1 << z
    out = []
    for dy in range(-k, k + 1):
        yy = ty + dy
        if yy < 0 or yy >= n:
            continue
        for dx in range(-k, k + 1):
            out.append(((tx + dx) % n, yy))
    return out


class TileScheme:
    """OGC TileMatrixSet geometry (gcore/tilematrixset.cpp registry,
    apps/gdalalg_raster_tile.cpp:65-88 aliases): an extent in scheme
    CRS units and the zoom-0 matrix size. WebMercatorQuad is 1x1 over
    the EPSG:3857 square; WorldCRS84Quad ('geodetic') is 2x1 over
    [-180,180]x[-90,90] degrees."""

    def __init__(self, name: str, extent: tuple, cols0: int, rows0: int,
                 epsg: int):
        self.name = name
        self.xmin, self.ymin, self.xmax, self.ymax = extent
        self.cols0 = cols0
        self.rows0 = rows0
        self.epsg = epsg

    def matrix(self, z: int) -> tuple[int, int]:
        return self.cols0 << z, self.rows0 << z

    def tile_size_units(self, z: int) -> float:
        return (self.xmax - self.xmin) / (self.cols0 << z)

    def coords_to_tile(self, x, y, z: int, convention: str = "xyz"):
        """Scheme-CRS coords -> tile indices (edge points clamp into
        the last tile, like mercator_to_tile)."""
        nc, nr = self.matrix(z)
        fx = (np.asarray(x, np.float64) - self.xmin) \
            / (self.xmax - self.xmin) * nc
        tx = np.clip(np.floor(fx), 0, nc - 1).astype(np.int64)
        if convention == "xyz":
            fy = (self.ymax - np.asarray(y, np.float64)) \
                / (self.ymax - self.ymin) * nr
        else:
            fy = (np.asarray(y, np.float64) - self.ymin) \
                / (self.ymax - self.ymin) * nr
        ty = np.clip(np.floor(fy), 0, nr - 1).astype(np.int64)
        return tx, ty

    def tile_bounds(self, tx, ty, z: int, convention: str = "xyz"):
        nc, nr = self.matrix(z)
        size = (self.xmax - self.xmin) / nc
        tx = np.asarray(tx, np.float64)
        ty = np.asarray(ty, np.float64)
        xmin = self.xmin + tx * size
        if convention == "xyz":
            ymax = self.ymax - ty * size
            ymin = ymax - size
        else:
            ymin = self.ymin + ty * size
            ymax = ymin + size
        return xmin, ymin, xmin + size, ymax

    def tile_geotransform(self, tx: int, ty: int, z: int,
                          tile_size: int = DEFAULT_TILE_SIZE,
                          convention: str = "xyz") -> GeoTransform:
        xmin, ymin, xmax, ymax = self.tile_bounds(int(tx), int(ty), z,
                                                  convention)
        res = (float(xmax) - float(xmin)) / tile_size
        return (float(xmin), res, 0.0, float(ymax), 0.0, -res)


SCHEMES = {
    "WebMercatorQuad": TileScheme(
        "WebMercatorQuad",
        (-WEB_MERCATOR_EXTENT, -WEB_MERCATOR_EXTENT,
         WEB_MERCATOR_EXTENT, WEB_MERCATOR_EXTENT), 1, 1, 3857),
    "WorldCRS84Quad": TileScheme(
        "WorldCRS84Quad", (-180.0, -90.0, 180.0, 90.0), 2, 1, 4326),
}
# reference aliases (apps/gdalalg_raster_tile.cpp:2280-2287)
SCHEMES["mercator"] = SCHEMES["GoogleMapsCompatible"] = \
    SCHEMES["WebMercatorQuad"]
SCHEMES["geodetic"] = SCHEMES["WorldCRS84Quad"]


def tiles_overlapping_bounds(xmin, ymin, xmax, ymax, z: int, convention: str = "xyz"):
    """Integer ranges of tiles intersecting a 3857 bbox:
    (tx0, tx1, ty0, ty1) inclusive. Mirrors GetTileIndices
    (reference apps/gdalalg_raster_tile.cpp:274)."""
    eps = 1e-9
    tx0, ty0 = mercator_to_tile(xmin + eps, ymax - eps, z, convention)
    tx1, ty1 = mercator_to_tile(xmax - eps, ymin + eps, z, convention)
    return int(tx0), int(tx1), int(ty0), int(ty1)
