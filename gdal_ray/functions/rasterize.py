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


def fill_polygon_cells(rings_px: list, h: int, w: int):
    """Exact port of GDALdllImageFilledPolygon's scanline fill
    (reference alg/llrasterize.cpp:58-170): even-odd pairing at
    scanline centers y+0.5, crossing rule dy1 <= y+0.5 < dy2,
    intersections snapped with floor(x + 0.5), bottom horizontal
    segments filled separately. ``rings_px`` are (N, 2) arrays of
    fractional PIXEL coordinates (closed or open). Returns (ys, xs)
    of burned cells."""
    xs_all: list = []
    ys_all: list = []
    pts = []
    sizes = []
    for r in rings_px:
        r = np.asarray(r, np.float64)
        if len(r) > 1 and np.allclose(r[0], r[-1]):
            r = r[:-1]
        pts.append(r)
        sizes.append(len(r))
    if not pts:
        return np.array([], np.int64), np.array([], np.int64)
    allp = np.concatenate(pts)
    px, py = allp[:, 0], allp[:, 1]
    miny = max(int(py.min()), 0)
    maxy = min(int(py.max()), h - 1)
    maxx = w - 1
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        ints = []
        partoffset = 0
        part = 0
        for i in range(len(allp)):
            if i == partoffset + sizes[part]:
                partoffset += sizes[part]
                part += 1
            if i == partoffset:
                ind1 = partoffset + sizes[part] - 1
                ind2 = partoffset
            else:
                ind1, ind2 = i - 1, i
            dy1, dy2 = py[ind1], py[ind2]
            if (dy1 < dy and dy2 < dy) or (dy1 > dy and dy2 > dy):
                continue
            if dy1 < dy2:
                dx1, dx2 = px[ind1], px[ind2]
            elif dy1 > dy2:
                dy1, dy2 = dy2, dy1
                dx2, dx1 = px[ind1], px[ind2]
            else:
                # bottom horizontal segments fill separately
                if px[ind1] > px[ind2]:
                    hx1 = int(np.floor(px[ind2] + 0.5))
                    hx2 = int(np.floor(px[ind1] + 0.5))
                    if hx1 > maxx or hx2 <= 0:
                        continue
                    for x in range(max(hx1, 0), min(hx2 - 1, maxx) + 1):
                        ys_all.append(y)
                        xs_all.append(x)
                continue
            if dy1 <= dy < dy2:
                inter = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                ints.append(int(np.floor(inter + 0.5)))
        ints.sort()
        for i in range(0, len(ints) - 1, 2):
            if ints[i] <= maxx and ints[i + 1] > 0:
                for x in range(max(ints[i], 0), min(ints[i + 1] - 1, maxx) + 1):
                    ys_all.append(y)
                    xs_all.append(x)
    return np.array(ys_all, np.int64), np.array(xs_all, np.int64)


def line_cells(pts_px: np.ndarray, h: int, w: int):
    """Exact port of GDALdllImageLine's Bresenham walk (reference
    alg/llrasterize.cpp:255+): floor() endpoints, intermediate segment
    endpoints burned once. Returns (ys, xs)."""
    pts = np.asarray(pts_px, np.float64)
    ys_all: list = []
    xs_all: list = []
    npts = len(pts)
    for j in range(1, npts):
        ix = int(np.floor(pts[j - 1, 0]))
        iy = int(np.floor(pts[j - 1, 1]))
        ix1 = int(np.floor(pts[j, 0]))
        iy1 = int(np.floor(pts[j, 1]))
        ndx = abs(ix1 - ix)
        ndy = abs(iy1 - iy)
        xstep = -1 if ix > ix1 else 1
        ystep = -1 if iy > iy1 else 1
        if ndx >= ndy:
            xerr = ndy << 1
            yerr = xerr - (ndx << 1)
            err = xerr - ndx
            n = ndx
            if j != npts - 1:
                n -= 1
            while n >= 0:
                if 0 <= ix < w and 0 <= iy < h:
                    ys_all.append(iy)
                    xs_all.append(ix)
                ix += xstep
                if err > 0:
                    iy += ystep
                    err += yerr
                else:
                    err += xerr
                n -= 1
        else:
            yerr_ = ndx << 1
            xerr_ = yerr_ - (ndy << 1)
            err = yerr_ - ndy
            n = ndy
            if j != npts - 1:
                n -= 1
            while n >= 0:
                if 0 <= ix < w and 0 <= iy < h:
                    ys_all.append(iy)
                    xs_all.append(ix)
                iy += ystep
                if err > 0:
                    ix += xstep
                    err += xerr_
                else:
                    err += yerr_
                n -= 1
    return np.array(ys_all, np.int64), np.array(xs_all, np.int64)
