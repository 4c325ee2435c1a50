"""Warp/reproject stage: images -> WebMercatorQuad tile fragments.

Re-expresses gdalwarp's pipeline (reference alg/gdaltransformer.cpp
GenImgProj chain; alg/gdalwarpkernel.cpp kernels; orchestration
alg/gdalwarpoperation.cpp ChunkAndWarpImage) Ray-Data-first:

- ``GenImgProjTransform``   dst pixel -> dst CRS -> src CRS -> src pixel,
  composed from two geotransform affines and the CRS hop
  (reference alg/gdal_alg_priv.h:310-339).
- ``ApproxGridTransform``   evaluates the exact chain on a coarse
  (k+1)x(k+1) grid of the dst tile and bilinearly interpolates inside
  — the GDALApproxTransformer contract (reference
  alg/gdaltransformer.cpp approximator; gdalwarp default error
  threshold 0.125 px, apps/gdalwarp_lib.cpp dfErrorThreshold).
- ``WarpToTiles``           the actor-pool stage: decode once, warp the
  image into every intersecting WebMercatorQuad tile at its
  resolution-matched zoom, emit *sub-rect fragments* keyed by packed
  tile key — the shuffle rows for the compose groupby
  (SURVEY.md §2.6).

Output fragment schema (one row per (image, tile) intersection):
    tile_key:int64, z:int16, tx:int32, ty:int32, image_id:string,
    x0:int32, y0:int32, fw:int32, fh:int32   (sub-rect in the tile)
    pixels:binary (raw codec, fh x fw x 3), mask:binary (packbits
    validity, fh x fw), n_valid:int64
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.affine import apply_gt, invert_gt
from ..functions.codecs import decode_image, encode_image
from ..functions.crs import (R_MERC, Transformer, WEB_MERCATOR_EXTENT,
                             lonlat_to_webmercator)
from ..functions.tiles import (DEFAULT_TILE_SIZE, tile_bounds, tile_key,
                               tiles_overlapping_bounds)
from ..functions.resample import sample

FRAGMENT_SCHEMA = pa.schema([
    ("tile_key", pa.int64()),
    ("z", pa.int16()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("image_id", pa.string()),
    ("x0", pa.int32()),
    ("y0", pa.int32()),
    ("fw", pa.int32()),
    ("fh", pa.int32()),
    ("pixels", pa.binary()),
    ("mask", pa.binary()),
    ("n_valid", pa.int64()),
])


class GenImgProjTransform:
    """dst pixel/line -> src pixel/line, the GenImgProj chain
    (dst affine) o (dst CRS -> src CRS) o (inverse src georeferencing)
    (reference alg/gdal_alg_priv.h:310-339).

    The src link is the inverse affine by default; a GCP-polynomial or
    TPS transformer (functions/gcp.py) slots in via ``src_georef`` —
    exactly GDALCreateGenImgProjTransformer2's METHOD=GCP_POLYNOMIAL /
    GCP_TPS choice (reference alg/gdaltransformer.cpp)."""

    def __init__(self, src_gt, src_epsg: int, dst_gt, dst_epsg: int,
                 src_georef=None):
        self.dst_gt = dst_gt
        self.src_georef = src_georef
        self.inv_src_gt = None if src_gt is None else invert_gt(src_gt)
        self.ct = Transformer(dst_epsg, src_epsg)

    def __call__(self, dpx, dpy):
        """Fractional dst pixel coords -> fractional src pixel coords."""
        wx, wy = apply_gt(self.dst_gt, dpx, dpy)
        sx, sy = self.ct.transform(wx, wy)
        if self.src_georef is not None:
            return self.src_georef.geo_to_pixel(sx, sy)
        return apply_gt(self.inv_src_gt, sx, sy)


class ApproxGridTransform:
    """Approximate a transform over a (w x h) dst pixel window by exact
    evaluation on a coarse grid + bilinear interpolation — the
    GDALApproxTransformer idea applied per tile (error checked in
    tests to stay below gdalwarp's 0.125 px default threshold)."""

    def __init__(self, exact, w: int, h: int, grid: int = 8):
        gx = np.linspace(0.0, w, grid + 1)
        gy = np.linspace(0.0, h, grid + 1)
        mg, ng = np.meshgrid(gx, gy)
        ex, ey = exact(mg.ravel(), ng.ravel())
        self.gx, self.gy = gx, gy
        self.ex = ex.reshape(mg.shape)
        self.ey = ey.reshape(mg.shape)
        self.w, self.h, self.grid = w, h, grid

    def __call__(self, dpx, dpy):
        sx = np.asarray(dpx, np.float64) / self.w * self.grid
        sy = np.asarray(dpy, np.float64) / self.h * self.grid
        x0 = np.clip(np.floor(sx), 0, self.grid - 1).astype(np.int64)
        y0 = np.clip(np.floor(sy), 0, self.grid - 1).astype(np.int64)
        fx = sx - x0
        fy = sy - y0
        out = []
        for g in (self.ex, self.ey):
            v = (g[y0, x0] * (1 - fx) * (1 - fy) + g[y0, x0 + 1] * fx * (1 - fy)
                 + g[y0 + 1, x0] * (1 - fx) * fy + g[y0 + 1, x0 + 1] * fx * fy)
            out.append(v)
        return out[0], out[1]


def mercator_scale(lat_deg) -> np.ndarray:
    """Web-Mercator point scale 1/cos(lat): ground meters -> 3857 units."""
    return 1.0 / np.cos(np.radians(np.asarray(lat_deg, np.float64)))


def auto_zoom(res_3857: float, tile_size: int = DEFAULT_TILE_SIZE,
              max_zoom: int = 24) -> int:
    """Resolution-matched zoom: the z whose tile resolution is nearest
    (in log2) to the source resolution in 3857 units — the reference's
    default max-zoom selection (`gdal raster tile` picks the zoom whose
    resolution best matches the source, apps/gdalalg_raster_tile.cpp)."""
    res0 = 2 * WEB_MERCATOR_EXTENT / tile_size  # z=0 resolution
    z = int(np.clip(np.round(np.log2(res0 / res_3857)), 0, max_zoom))
    return z


def src_bounds_3857(gt, epsg: int, w: int, h: int, edge_pts: int = 21,
                    georef=None):
    """Source footprint bbox in EPSG:3857, sampled along the edges
    (GDALSuggestedWarpOutput2's 21-points-per-edge rule, reference
    alg/gdaltransformer.cpp:193-216). ``georef`` (GCP poly / TPS)
    replaces the affine when the scene has no geotransform."""
    t = np.linspace(0.0, 1.0, edge_pts)
    px = np.concatenate([t * w, t * w, np.zeros(edge_pts), np.full(edge_pts, w)])
    ln = np.concatenate([np.zeros(edge_pts), np.full(edge_pts, h), t * h, t * h])
    if georef is not None:
        x, y = georef.pixel_to_geo(px, ln)
    else:
        x, y = apply_gt(gt, px, ln)
    ct = Transformer(epsg, 3857)
    mx, my = ct.transform(x, y)
    return float(mx.min()), float(my.min()), float(mx.max()), float(my.max())


_MESH_CACHE: dict[tuple, tuple] = {}


def _dst_mesh(fw: int, fh: int):
    """Cached dst pixel-center meshgrid (fragments repeat sizes)."""
    key = (fw, fh)
    m = _MESH_CACHE.get(key)
    if m is None:
        if len(_MESH_CACHE) > 512:
            _MESH_CACHE.clear()
        m = np.meshgrid(np.arange(fw) + 0.5, np.arange(fh) + 0.5)
        _MESH_CACHE[key] = m
    return m


def warp_image_to_tiles(pixels: np.ndarray, gt, epsg: int, image_id: str,
                        zoom: int | None = None, *, resampling: str = "bilinear",
                        tile_size: int = DEFAULT_TILE_SIZE,
                        max_tiles: int = 256, approx_grid: int = 8,
                        exact_transform: bool = False,
                        frag_codec: str = "raw", src_georef=None,
                        owner=None):
    """Warp one georeferenced image into WebMercatorQuad tile fragments.

    Returns a list of fragment dicts (FRAGMENT_SCHEMA fields).
    ``frag_codec='raw0'`` skips fragment compression — use when the
    fragments are consumed inside the same task (partitioned compose).
    ``src_georef`` (functions/gcp.py transformer) georeferences the
    scene by GCPs instead of the affine ``gt``.
    ``owner`` = (z, tx, ty) of an owning leaf tile: only fragments
    whose tile lies inside that leaf are computed — the partitioned
    compose path warps each image once PER OWNED REGION instead of
    warping the whole scene and discarding the other leaves' tiles.
    """
    h, w = pixels.shape[:2]
    xmin, ymin, xmax, ymax = src_bounds_3857(gt, epsg, w, h,
                                             georef=src_georef)
    if zoom is None:
        # source resolution in 3857 units at the footprint center
        cy = 0.5 * (ymin + ymax)
        lat = np.degrees(2 * np.arctan(np.exp(cy / R_MERC)) - np.pi / 2)
        if src_georef is not None:
            # finite-difference pixel size at the scene center
            gx, gy = src_georef.pixel_to_geo(
                np.array([w / 2 - 0.5, w / 2 + 0.5, w / 2, w / 2]),
                np.array([h / 2, h / 2, h / 2 - 0.5, h / 2 + 0.5]))
            res_x = float(np.hypot(gx[1] - gx[0], gy[1] - gy[0]))
            res_y = float(np.hypot(gx[3] - gx[2], gy[3] - gy[2]))
            res_ground = 0.5 * (res_x + res_y)
        else:
            res_ground = float(np.hypot(gt[1], gt[4]))
        if epsg == 4326:
            res_ground *= 111320.0  # degrees -> meters
        res_3857 = res_ground * float(mercator_scale(lat))
        zoom = auto_zoom(res_3857, tile_size)
    tx0, tx1, ty0, ty1 = tiles_overlapping_bounds(xmin, ymin, xmax, ymax, zoom)
    if owner is not None:
        pz, ptx, pty = (int(v) for v in owner)
        if zoom < pz:
            # a fragment coarser than the leaf zoom has no owning
            # leaf; silently dropping it would break bit-identity
            # with the fragment-shuffle path
            raise ValueError(
                f"image {image_id} warps at z{zoom}, coarser than the "
                f"leaf zoom z{pz}: the partitioned path needs auto zoom "
                ">= base_zoom — lower base_zoom or use the "
                "fragment-shuffle path (tiling.compose_tiles)")
        s = zoom - pz
        tx0, tx1 = max(tx0, ptx << s), min(tx1, ((ptx + 1) << s) - 1)
        ty0, ty1 = max(ty0, pty << s), min(ty1, ((pty + 1) << s) - 1)
        if tx0 > tx1 or ty0 > ty1:
            return []
    n_tiles = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    if n_tiles > max_tiles:
        raise ValueError(
            f"{image_id}: {n_tiles} tiles at z{zoom} exceeds max_tiles={max_tiles}")

    ext = WEB_MERCATOR_EXTENT
    n = 1 << zoom
    res = 2 * ext / n / tile_size  # 3857 units per dst pixel
    frags = []
    for ty in range(ty0, ty1 + 1):
        for tx in range(tx0, tx1 + 1):
            bxmin, bymin, bxmax, bymax = tile_bounds(tx, ty, zoom)
            # sub-rect of this tile covered by the source bbox
            fx0 = int(np.clip(np.floor((xmin - bxmin) / res), 0, tile_size))
            fx1 = int(np.clip(np.ceil((xmax - bxmin) / res), 0, tile_size))
            fy0 = int(np.clip(np.floor((bymax - ymax) / res), 0, tile_size))
            fy1 = int(np.clip(np.ceil((bymax - ymin) / res), 0, tile_size))
            fw, fh = fx1 - fx0, fy1 - fy0
            if fw <= 0 or fh <= 0:
                continue
            dst_gt = (bxmin + fx0 * res, res, 0.0, bymax - fy0 * res, 0.0, -res)
            exact = GenImgProjTransform(gt, epsg, dst_gt, 3857,
                                        src_georef=src_georef)
            tr = exact if exact_transform else ApproxGridTransform(
                exact, fw, fh, grid=min(approx_grid, max(2, fw // 16), max(2, fh // 16)))
            dpx, dpy = _dst_mesh(fw, fh)
            spx, spy = tr(dpx, dpy)
            out, valid = sample(pixels, spx, spy, resampling)
            n_valid = int(valid.sum())
            if n_valid == 0:
                continue
            frags.append({
                "tile_key": int(tile_key(tx, ty, zoom)),
                "z": zoom, "tx": tx, "ty": ty, "image_id": image_id,
                "x0": fx0, "y0": fy0, "fw": fw, "fh": fh,
                "pixels": encode_image(out, frag_codec),
                "mask": np.packbits(valid.astype(np.uint8)).tobytes(),
                "n_valid": n_valid,
            })
    return frags


def _frag_table(frags: list[dict]) -> pa.Table:
    cols = {f.name: [] for f in FRAGMENT_SCHEMA}
    for fr in frags:
        for k in cols:
            cols[k].append(fr[k])
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in FRAGMENT_SCHEMA})


class WarpToTiles:
    """Actor-pool map_batches stage: decode + warp each image row to
    tile fragments (stateful: per-actor transformer/codec reuse —
    reference warp kernel state alg/gdalwarpkernel.cpp:83-135)."""

    def __init__(self, zoom: int | None = None, resampling: str = "bilinear",
                 tile_size: int = DEFAULT_TILE_SIZE, georef_fn=None):
        from ..sources.images import georef as default_georef

        self.zoom = zoom
        self.resampling = resampling
        self.tile_size = tile_size
        self.georef_fn = georef_fn or (lambda image_id: default_georef(int(image_id[3:])))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import decode_images

        frags: list[dict] = []
        ids = batch["image_id"].to_pylist()
        pixs = decode_images(batch["bytes"].to_pylist())
        for i, px in enumerate(pixs):
            gt, epsg = self.georef_fn(ids[i])
            frags.extend(warp_image_to_tiles(
                px, gt, epsg, ids[i], self.zoom,
                resampling=self.resampling, tile_size=self.tile_size))
        return _frag_table(frags)
