"""Polygon rasterization (vector -> raster burn-in).

Reference semantics: alg/gdalrasterize.cpp — default burn rule is the
scanline even-odd CENTER test (a pixel is burned when its center is
inside the polygon, alg/llrasterize.cpp); ``ALL_TOUCHED`` (:779) burns
every pixel the geometry touches; ``MERGE_ALG`` REPLACE/ADD (:800-817)
chooses overwrite vs accumulate; the burn value is constant or from an
attribute (apps/gdal_rasterize_lib.cpp -a).

Grid spec is (xmin, ymin, xmax, ymax, nx, ny) with row 0 at ymin
(south-up; callers flip for north-up rasters). The center test reuses
the prepared even-odd ray caster; ALL_TOUCHED uses exact cell-clip
(Sutherland-Hodgman): a cell is touched iff the polygon clipped to the
cell is non-empty.

At scale this runs per cell-bucket: polygons are clipped to each
bucket's rect first (the groupby-aggregate over cell-bucketed geometry
fragments of the north rule); these kernels are the per-bucket math.
"""

from __future__ import annotations

import numpy as np

from .geom import PreparedPolygon, clip_ring_to_rect
from .wkb import Geom, wkb_to_geom

GridSpec = tuple[float, float, float, float, int, int]


def cell_centers(spec: GridSpec):
    xmin, ymin, xmax, ymax, nx, ny = spec
    cx = xmin + (xmax - xmin) * (np.arange(nx) + 0.5) / nx
    cy = ymin + (ymax - ymin) * (np.arange(ny) + 0.5) / ny
    return cx, cy


def burn_centers(wkbs: list[bytes], values, spec: GridSpec,
                 merge: str = "add"):
    """Burn polygons by the CENTER rule.

    Returns (cell_x, cell_y, burn) arrays of the non-empty cells:
    merge='add' accumulates values, 'count' counts covering polygons,
    'replace' keeps the LAST burned value (callers order the inputs —
    the reference burns features in layer order).
    """
    xmin, ymin, xmax, ymax, nx, ny = spec
    cx, cy = cell_centers(spec)
    acc = np.zeros((ny, nx), np.float64)
    cnt = np.zeros((ny, nx), np.int64)
    rep = np.full((ny, nx), np.nan)
    values = np.asarray(values, np.float64)
    sx = nx / (xmax - xmin)
    sy = ny / (ymax - ymin)
    for w, v in zip(wkbs, values):
        p = PreparedPolygon(wkb_to_geom(bytes(w)))
        bx0, by0, bx1, by1 = p.bbox
        i0 = int(np.clip(np.floor((bx0 - xmin) * sx), 0, nx))
        i1 = int(np.clip(np.ceil((bx1 - xmin) * sx), 0, nx))
        j0 = int(np.clip(np.floor((by0 - ymin) * sy), 0, ny))
        j1 = int(np.clip(np.ceil((by1 - ymin) * sy), 0, ny))
        if i1 <= i0 or j1 <= j0:
            continue
        gx, gy = np.meshgrid(cx[i0:i1], cy[j0:j1])
        inside = p.contains_points(gx.ravel(), gy.ravel()).reshape(gy.shape)
        sub = (slice(j0, j1), slice(i0, i1))
        acc[sub][inside] += v
        cnt[sub][inside] += 1
        rep[sub][inside] = v
    hit = cnt > 0
    jy, jx = np.nonzero(hit)
    if merge == "add":
        burn = acc[hit]
    elif merge == "count":
        burn = cnt[hit].astype(np.float64)
    elif merge == "replace":
        burn = rep[hit]
    else:
        raise NotImplementedError(f"merge {merge!r}")
    return jx.astype(np.int64), jy.astype(np.int64), burn


def touched_cells(wkb: bytes, spec: GridSpec):
    """ALL_TOUCHED: (cell_x, cell_y) of every cell the polygon
    intersects (exact, via per-cell Sutherland-Hodgman clip)."""
    xmin, ymin, xmax, ymax, nx, ny = spec
    g = wkb_to_geom(bytes(wkb))
    p = PreparedPolygon(g)
    bx0, by0, bx1, by1 = p.bbox
    sx = nx / (xmax - xmin)
    sy = ny / (ymax - ymin)
    i0 = int(np.clip(np.floor((bx0 - xmin) * sx), 0, nx - 1))
    i1 = int(np.clip(np.floor((bx1 - xmin) * sx), 0, nx - 1))
    j0 = int(np.clip(np.floor((by0 - ymin) * sy), 0, ny - 1))
    j1 = int(np.clip(np.floor((by1 - ymin) * sy), 0, ny - 1))
    out_x, out_y = [], []
    wx = (xmax - xmin) / nx
    wy = (ymax - ymin) / ny
    for j in range(j0, j1 + 1):
        for i in range(i0, i1 + 1):
            cxmin = xmin + i * wx
            cymin = ymin + j * wy
            touched = False
            for ring in g.rings:
                if len(clip_ring_to_rect(ring, cxmin, cymin,
                                         cxmin + wx, cymin + wy)) >= 4:
                    touched = True
                    break
            if not touched:
                # polygon may fully contain the cell (no ring crosses it)
                touched = bool(p.contains_points(
                    np.array([cxmin + wx / 2]), np.array([cymin + wy / 2]))[0])
            if touched:
                out_x.append(i)
                out_y.append(j)
    return np.array(out_x, np.int64), np.array(out_y, np.int64)
