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
