"""Proximity (distance-to-target raster) + dither + palette.

- ``distance_transform``: exact Euclidean distance to the nearest
  target pixel (reference alg/gdalproximity.cpp computes the same
  proximity raster; this uses the Felzenszwalb-Huttenlocher exact
  squared-EDT, O(n) per row/column pass — published algorithm).
- ``floyd_steinberg``: error-diffusion dither to a palette
  (reference alg/gdaldither.cpp GDALDitherRGB2PCT serpentine=False
  left-to-right scan, error weights 7/16, 3/16, 5/16, 1/16).
- ``median_cut_palette``: RGB -> N-color palette (reference
  alg/gdalmediancut.cpp GDALComputeMedianCutPCT box-split on the
  widest channel).
"""

from __future__ import annotations

import numpy as np

_INF = 1e20


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """1-D squared distance transform of sampled function f."""
    n = len(f)
    d = np.empty(n)
    v = np.zeros(n, np.int64)
    z = np.empty(n + 1)
    k = 0
    v[0] = 0
    z[0] = -_INF
    z[1] = _INF
    for q in range(1, n):
        while True:
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            if s <= z[k]:
                k -= 1
                if k < 0:
                    k = 0
                    v[0] = q
                    z[0] = -_INF
                    z[1] = _INF
                    break
            else:
                k += 1
                v[k] = q
                z[k] = s
                z[k + 1] = _INF
                break
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def distance_transform(targets: np.ndarray, cellsize: float = 1.0) -> np.ndarray:
    """Euclidean distance from every cell to the nearest True cell."""
    t = np.asarray(targets, bool)
    h, w = t.shape
    f = np.where(t, 0.0, _INF)
    # column pass then row pass
    g = np.empty_like(f)
    for x in range(w):
        g[:, x] = _edt_1d(f[:, x])
    d2 = np.empty_like(f)
    for y in range(h):
        d2[y, :] = _edt_1d(g[y, :])
    return np.sqrt(d2) * cellsize


def fillnodata(band: np.ndarray, valid: np.ndarray,
               max_dist: float = 100.0) -> np.ndarray:
    """Fill invalid pixels by inverse-distance weighting of the
    nearest valid pixel along each of 8 scan directions (the
    GDALFillNodata idea, reference alg/fillnodata.cpp — which searches
    the four quadrants; this variant uses 8 fixed rays, documented
    divergence). Pixels with no valid hit within ``max_dist`` stay
    unchanged; returns (filled, filled_mask)."""
    z = np.asarray(band, np.float64)
    v = np.asarray(valid, bool)
    h, w = z.shape
    num = np.zeros((h, w))
    den = np.zeros((h, w))

    def scan(dy: int, dx: int):
        """Propagate last-valid (value, dist) along direction (dy,dx)."""
        step = float(np.hypot(dy, dx))
        last_val = np.full((h, w), np.nan)
        last_d = np.full((h, w), np.inf)
        ys = range(h) if dy >= 0 else range(h - 1, -1, -1)
        for y in ys:
            py = y - dy
            if 0 <= py < h:
                prev_val = last_val[py]
                prev_d = last_d[py]
                if dx > 0:
                    prev_val = np.concatenate([[np.nan], prev_val[:-1]])
                    prev_d = np.concatenate([[np.inf], prev_d[:-1]])
                elif dx < 0:
                    prev_val = np.concatenate([prev_val[1:], [np.nan]])
                    prev_d = np.concatenate([prev_d[1:], [np.inf]])
                last_val[y] = prev_val
                last_d[y] = prev_d + step
            elif dy != 0:
                last_val[y] = np.nan
                last_d[y] = np.inf
            if dy == 0:
                # horizontal scan: do the row in-place
                row_val = np.full(w, np.nan)
                row_d = np.full(w, np.inf)
                xs = range(w) if dx > 0 else range(w - 1, -1, -1)
                for x in xs:
                    if v[y, x]:
                        row_val[x] = z[y, x]
                        row_d[x] = 0.0
                    else:
                        px = x - dx
                        if 0 <= px < w:
                            row_val[x] = row_val[px]
                            row_d[x] = row_d[px] + step
                last_val[y] = row_val
                last_d[y] = row_d
            else:
                hit = v[y]
                last_val[y][hit] = z[y][hit]
                last_d[y][hit] = 0.0
        ok = ~v & np.isfinite(last_val) & (last_d <= max_dist) & (last_d > 0)
        num[ok] += last_val[ok] / last_d[ok]
        den[ok] += 1.0 / last_d[ok]

    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                   (1, 1), (1, -1), (-1, 1), (-1, -1)):
        scan(dy, dx)

    out = z.copy()
    filled = den > 0
    out[filled] = num[filled] / den[filled]
    return out, (v | filled)


def floyd_steinberg(band: np.ndarray, levels: np.ndarray) -> np.ndarray:
    """Dither one band to the given sorted output levels (error
    diffusion 7/16 right, 3/16 down-left, 5/16 down, 1/16 down-right;
    left-to-right scan)."""
    z = np.asarray(band, np.float64).copy()
    lv = np.asarray(levels, np.float64)
    h, w = z.shape
    out = np.empty((h, w), np.uint8)
    for y in range(h):
        for x in range(w):
            old = z[y, x]
            i = int(np.argmin(np.abs(lv - old)))
            out[y, x] = i
            err = old - lv[i]
            if x + 1 < w:
                z[y, x + 1] += err * 7 / 16
            if y + 1 < h:
                if x > 0:
                    z[y + 1, x - 1] += err * 3 / 16
                z[y + 1, x] += err * 5 / 16
                if x + 1 < w:
                    z[y + 1, x + 1] += err * 1 / 16
    return out


def median_cut_palette(pixels: np.ndarray, n_colors: int) -> np.ndarray:
    """(h, w, 3) uint8 -> (n_colors, 3) palette by median-cut."""
    px = pixels.reshape(-1, 3).astype(np.float64)
    boxes = [px]
    while len(boxes) < n_colors:
        # split the box with the largest channel range
        spans = [b.max(axis=0) - b.min(axis=0) if len(b) else np.zeros(3)
                 for b in boxes]
        bi = int(np.argmax([s.max() for s in spans]))
        b = boxes[bi]
        if len(b) < 2:
            break
        ch = int(np.argmax(spans[bi]))
        med = np.median(b[:, ch])
        lo = b[b[:, ch] <= med]
        hi = b[b[:, ch] > med]
        if len(lo) == 0 or len(hi) == 0:
            order = np.argsort(b[:, ch], kind="stable")
            half = len(b) // 2
            lo, hi = b[order[:half]], b[order[half:]]
        boxes[bi:bi + 1] = [lo, hi]
    pal = np.array([b.mean(axis=0) if len(b) else np.zeros(3) for b in boxes])
    return np.clip(np.floor(pal + 0.5), 0, 255).astype(np.uint8)


def apply_palette(pixels: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Nearest-palette-entry index per pixel (rgb-to-palette without
    dithering)."""
    px = pixels.reshape(-1, 3).astype(np.float64)
    pal = palette.astype(np.float64)
    d = ((px[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1).astype(np.uint8).reshape(pixels.shape[:2])


def gdal_proximity(src: np.ndarray, target_values=None, *,
                   maxdist: float | None = None, nodata: float = 65535.0,
                   fixed_buf_val: float | None = None,
                   src_nodata: float | None = None,
                   distmult: float = 1.0) -> np.ndarray:
    """Faithful port of GDALComputeProximity's two-sweep scanline
    algorithm (reference alg/gdalproximity.cpp:285-431,449-575):
    top-down then bottom-up passes, each line processed forward and
    backward, propagating per-column nearest-target coordinates.
    Bit-compatible with the reference's proximity checksums; the exact
    EDT (``distance_transform``) remains the vectorized scale kernel.

    Semantics: target pixels output 0 (even with ``fixed_buf_val``);
    pixels beyond ``maxdist`` (or equal to ``src_nodata`` when input
    nodata is respected) output ``nodata``."""
    # keep the band's REAL values for target/nodata comparisons
    # (GDALComputeProximity reads the band as float64; an int cast
    # would truncate fractional targets / src_nodata — ADVICE r2 fix)
    v = np.asarray(src).astype(np.float64)
    h, w = v.shape
    if maxdist is None:
        maxdist = w + h
    if target_values is None:
        is_target = v != 0
    else:
        is_target = np.isin(v, list(target_values))
    prox = np.full((h, w), -1.0, np.float64)
    big = max(maxdist, float(w)) ** 2 * 2.0

    def process_line(y, near_x, near_y, forward, line_prox):
        rng = range(w) if forward else range(w - 1, -1, -1)
        step = 1 if forward else -1
        first = 0 if forward else w - 1
        for x in rng:
            if is_target[y, x]:
                line_prox[x] = 0.0
                near_x[x] = x
                near_y[x] = y
                continue
            near_d2 = big
            if near_x[x] != -1:
                d2 = (near_x[x] - x) ** 2 + (near_y[x] - y) ** 2
                if d2 < near_d2:
                    near_d2 = d2
                else:
                    near_x[x] = -1
                    near_y[x] = -1
            last = x - step
            if x != first and near_x[last] != -1:
                d2 = (near_x[last] - x) ** 2 + (near_y[last] - y) ** 2
                if d2 < near_d2:
                    near_d2 = d2
                    near_x[x] = near_x[last]
                    near_y[x] = near_y[last]
            tr = x + step
            if 0 <= tr < w and near_x[tr] != -1:
                d2 = (near_x[tr] - x) ** 2 + (near_y[tr] - y) ** 2
                if d2 < near_d2:
                    near_d2 = d2
                    near_x[x] = near_x[tr]
                    near_y[x] = near_y[tr]
            if near_x[x] != -1 \
                    and (src_nodata is None or v[y, x] != src_nodata) \
                    and near_d2 <= maxdist * maxdist \
                    and (line_prox[x] < 0 or near_d2 < line_prox[x] ** 2):
                line_prox[x] = np.sqrt(near_d2)

    # top-down sweep (L->R then R->L per line)
    nx = np.full(w, -1, np.int64)
    ny = np.full(w, -1, np.int64)
    for y in range(h):
        line = prox[y]
        process_line(y, nx, ny, True, line)
        process_line(y, nx, ny, False, line)
    # bottom-up sweep (R->L then L->R per line)
    nx.fill(-1)
    ny.fill(-1)
    for y in range(h - 1, -1, -1):
        line = prox[y]
        process_line(y, nx, ny, False, line)
        process_line(y, nx, ny, True, line)

    out = prox.copy()
    neg = out < 0
    pos = out > 0
    if fixed_buf_val is not None:
        out[pos] = fixed_buf_val
    else:
        out[pos] *= distmult
    out[neg] = nodata
    return out
