"""GDALComputeMedianCutPCT + GDALDitherRGB2PCT exact rewrites.

Reference: alg/gdalmediancut.cpp (histogram path, nBits=5 — the
public GDALComputeMedianCutPCT wrapper), alg/gdaldither.cpp
(GDALDitherRGB2PCT: 5-bit color-cube lookup filled by L1
FindNearestColor, GDAL's 6ths error diffusion — NOT classic
Floyd-Steinberg: nSixth = trunc(err/6); below-left += nSixth,
below-right = nSixth, below += err - 5*nSixth, right-carry 2*nSixth).

Conformance: autotest/alg/dither.py::test_dither_1 pins the 8-color
table of rgbsmall.tif and dither checksum 8803; replicated in
tests/test_mediancut.py.

The median cut itself runs on a 32**3 histogram — a combiner-friendly
partial (per-batch bincount of 15-bit codes, summed by the reducer),
so the distributed form is: map_batches partial histograms ->
driver-side cut over the fixed 32768-bin table (bounded state) ->
broadcast palette -> per-tile dither/apply.
"""

from __future__ import annotations

import numpy as np


def rgb_histogram_5bit(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(32, 32, 32) uint64 histogram of 5-bit-quantized RGB (the
    per-batch partial; sum partials to merge)."""
    code = ((np.asarray(r).ravel().astype(np.int64) >> 3) * 32 * 32
            + (np.asarray(g).ravel().astype(np.int64) >> 3) * 32
            + (np.asarray(b).ravel().astype(np.int64) >> 3))
    return np.bincount(code, minlength=32 * 32 * 32).reshape(32, 32, 32)


class _Box:
    __slots__ = ("rmin", "rmax", "gmin", "gmax", "bmin", "bmax", "total")

    def __init__(self, rmin, rmax, gmin, gmax, bmin, bmax, total):
        self.rmin, self.rmax = rmin, rmax
        self.gmin, self.gmax = gmin, gmax
        self.bmin, self.bmax = bmin, bmax
        self.total = total


def _shrink(box: _Box, hist: np.ndarray) -> None:
    """Contract box to its occupied cells (shrinkbox,
    gdalmediancut.cpp:1075+), vectorized via nonzero of the sub-cube."""
    sub = hist[box.rmin:box.rmax + 1, box.gmin:box.gmax + 1,
               box.bmin:box.bmax + 1]
    rr, gg, bb = np.nonzero(sub)
    if len(rr) == 0:
        return
    box.rmin, box.rmax = box.rmin + int(rr.min()), box.rmin + int(rr.max())
    box.gmin, box.gmax = box.gmin + int(gg.min()), box.gmin + int(gg.max())
    box.bmin, box.bmax = box.bmin + int(bb.min()), box.bmin + int(bb.max())


def median_cut_pct(hist: np.ndarray, n_colors: int) -> np.ndarray:
    """Median-cut a (32,32,32) histogram into <= n_colors RGB entries
    (exact gdalmediancut.cpp semantics, nBits=5). Returns
    (n, 3) uint8 palette in the reference's usedboxes order."""
    hist = np.asarray(hist, np.int64)
    occ = np.nonzero(hist)
    if len(occ[0]) == 0:
        return np.zeros((0, 3), np.uint8)
    first = _Box(int(occ[0].min()), int(occ[0].max()),
                 int(occ[1].min()), int(occ[1].max()),
                 int(occ[2].min()), int(occ[2].max()),
                 int(hist.sum()))
    used: list[_Box] = [first]   # head of list = most recent (LIFO)
    free = n_colors - 1

    while free > 0:
        # largest_box: strict >, head-first traversal wins ties
        best = None
        for p in used:
            if ((p.rmax > p.rmin or p.gmax > p.gmin or p.bmax > p.bmin)
                    and (best is None or p.total > best.total)):
                best = p
        if best is None:
            break
        _splitbox(best, hist, used)
        free -= 1

    pal = np.array([[((p.rmin + p.rmax) << 3) // 2,
                     ((p.gmin + p.gmax) << 3) // 2,
                     ((p.bmin + p.bmax) << 3) // 2] for p in used],
                   np.int64)
    return pal.astype(np.uint8)


def _splitbox(ptr: _Box, hist: np.ndarray, used: list[_Box]) -> None:
    """splitbox (gdalmediancut.cpp:766): longest axis (ties R>=G>=B),
    axis-projected histogram, median split, both halves shrunk; the
    new lower half is PREPENDED to the used list."""
    rspan = ptr.rmax - ptr.rmin
    gspan = ptr.gmax - ptr.gmin
    bspan = ptr.bmax - ptr.bmin
    sub = hist[ptr.rmin:ptr.rmax + 1, ptr.gmin:ptr.gmax + 1,
               ptr.bmin:ptr.bmax + 1]
    if rspan >= gspan and rspan >= bspan:
        axis, first, last = 0, ptr.rmin, ptr.rmax
        hist2 = sub.sum(axis=(1, 2))
    elif gspan >= bspan:
        axis, first, last = 1, ptr.gmin, ptr.gmax
        hist2 = sub.sum(axis=(0, 2))
    else:
        axis, first, last = 2, ptr.bmin, ptr.bmax
        hist2 = sub.sum(axis=(0, 1))

    # median point: smallest i with cumsum >= total/2 (integer half)
    half = ptr.total // 2
    s = 0
    i = first
    for k, v in enumerate(hist2):
        s += int(v)
        if s >= half:
            i = first + k
            break
    else:
        i = last + 1
    if i == first:
        i += 1

    lo_total = int(hist2[:i - first].sum())
    hi_total = int(hist2[i - first:].sum())
    new_cb = _Box(ptr.rmin, ptr.rmax, ptr.gmin, ptr.gmax,
                  ptr.bmin, ptr.bmax, lo_total)
    ptr.total = hi_total
    if axis == 0:
        new_cb.rmax = i - 1
        ptr.rmin = i
    elif axis == 1:
        new_cb.gmax = i - 1
        ptr.gmin = i
    else:
        new_cb.bmax = i - 1
        ptr.bmin = i
    used.insert(0, new_cb)
    _shrink(new_cb, hist)
    _shrink(ptr, hist)


# ------------------------------------------------------------------ dither


def build_color_cube(palette: np.ndarray, nbits: int = 5) -> np.ndarray:
    """(L, L, L) uint8 cube mapping quantized (r, g, b) cells to the
    L1-nearest palette index (gdaldither.cpp FindNearestColor cube:
    cell value = (i*255)/(L-1); strict <, first index wins ties)."""
    L = 1 << nbits
    pal = np.asarray(palette, np.int64)
    cell = (np.arange(L) * 255) // (L - 1)
    rr, gg, bb = np.meshgrid(cell, cell, cell, indexing="ij")
    # (L^3, P) L1 distances
    d = (np.abs(rr.ravel()[:, None] - pal[None, :, 0])
         + np.abs(gg.ravel()[:, None] - pal[None, :, 1])
         + np.abs(bb.ravel()[:, None] - pal[None, :, 2]))
    return d.argmin(axis=1).astype(np.uint8).reshape(L, L, L)


def dither_rgb2pct(pixels: np.ndarray, palette: np.ndarray,
                   cube: np.ndarray | None = None) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) uint8 palette indices with GDAL's
    error diffusion (gdaldither.cpp:373-560, bDither=TRUE, nBits=5).
    Matches the reference's checksums bit-for-bit."""
    if cube is None:
        cube = build_color_cube(palette)
    pal = np.asarray(palette, np.int64)
    px = np.asarray(pixels, np.int64)
    h, w, _ = px.shape
    out = np.zeros((h, w), np.uint8)
    nxt = np.zeros((w + 2, 3), np.int64)   # next-line error, +1 offset

    def sixth(e: int) -> int:
        # C integer division truncates toward zero
        return -((-e) // 6) if e < 0 else e // 6

    for y in range(h):
        line = np.clip(px[y] + nxt[1:w + 1], 0, 255)
        nxt[:] = 0
        carry = (0, 0, 0)
        for x in range(w):
            r = min(255, max(0, int(line[x, 0]) + carry[0]))
            g = min(255, max(0, int(line[x, 1]) + carry[1]))
            b = min(255, max(0, int(line[x, 2]) + carry[2]))
            idx = int(cube[(r * 32) >> 8, (g * 32) >> 8, (b * 32) >> 8])
            out[y, x] = idx
            c = []
            for ch, v in enumerate((r, g, b)):
                e = v - int(pal[idx, ch])
                s = sixth(e)
                nxt[x, ch] += s              # below-left
                nxt[x + 2, ch] = s           # below-right (assigned)
                nxt[x + 1, ch] += e - 5 * s  # below (added)
                c.append(2 * s)              # right carry
            carry = tuple(c)
    return out
