"""nearblack / gdal raster clean-collar (apps/nearblack_lib.cpp,
"twopasses" algorithm).

Scans the image collar inward and replaces pixels within
``near_dist`` of any of the collar colors (default black, or white,
or an explicit color list) with the canonical collar value, stopping
a scan ray once ``max_non_black`` valid pixels have been crossed.
Two passes (top-down then bottom-up), each running a left->right and
a right->left horizontal check plus a per-column vertical check with
carried column counts — a faithful transcription of ProcessLine
(nearblack_lib.cpp:545-770) with the per-pixel color test vectorized
per line.

Returns the processed image (+ optional alpha band) and the validity
mask (255 = kept, 0 = collar), matching setAlpha/setMask semantics.
"""

from __future__ import annotations

import numpy as np


def _nonblack_line(line: np.ndarray, colors: np.ndarray,
                   near_dist: int) -> np.ndarray:
    """bIsNonBlack per pixel: True when the pixel is farther than
    near_dist from EVERY collar color in some band (the color loop in
    nearblack_lib.cpp:577-601: a pixel is 'black' if any color matches
    within near_dist on all bands)."""
    # line: (W, B) int16; colors: (C, B)
    diff = np.abs(line[None, :, :].astype(np.int32)
                  - colors[:, None, :].astype(np.int32))  # (C, W, B)
    matches = (diff <= near_dist).all(axis=2)  # (C, W)
    return ~matches.any(axis=0)


def _process_line(line: np.ndarray, mask_line: np.ndarray,
                  left_to_right: bool, n_src_bands: int, near_dist: int,
                  max_non_black: int, colors: np.ndarray, replace: int,
                  counts: np.ndarray, do_vertical: bool, bottom_up: bool,
                  line_from_edge: int, has_alpha: bool) -> None:
    W = line.shape[0]
    nb = _nonblack_line(line[:, :n_src_bands], colors, near_dist)

    def wipe(idx) -> None:
        line[idx, :n_src_bands] = replace
        if has_alpha:
            line[idx, -1] = 0
        mask_line[idx] = 0

    if do_vertical:
        active = counts <= max_non_black
        inc = active & nb
        counts[inc] += 1
        # newly over the limit -> terminated, not replaced
        over = inc & (counts > max_non_black)
        # valid data on the very first line with max_non_black > 0:
        # terminate the column without replacing (:611-617)
        edge_stop = np.zeros(W, bool)
        if line_from_edge == 0 and max_non_black > 0:
            edge_stop = inc & ~over
            counts[edge_stop] = max_non_black + 1
        replace_cols = active & ~over & ~edge_stop
        if replace_cols.any():
            wipe(np.nonzero(replace_cols)[0])
            nb = None  # line changed; horizontal check re-tests below

    if nb is None:
        nb = _nonblack_line(line[:, :n_src_bands], colors, near_dist)

    # horizontal check (bottom-up passes force max_non_black to 0)
    h_max = 0 if bottom_up else max_non_black
    rng = range(W - 1) if left_to_right else range(W - 1, 0, -1)
    n_non_black = 0
    for i in rng:
        if nb[i]:
            # grey-area coupling with the vertical pass (:696-700)
            if counts[i] <= h_max:
                n_non_black = counts[i]
            else:
                n_non_black += 1
        if n_non_black > h_max:
            break
        if nb[i] and h_max > 0 and i == (0 if left_to_right else W - 1):
            break
        wipe(i)


def nearblack(img: np.ndarray, *, near_dist: int = 15,
              max_non_black: int = 2, white: bool = False,
              colors=None, set_alpha: bool = False,
              ) -> tuple[np.ndarray, np.ndarray]:
    """Run the two-pass collar clean. ``img`` is (H, W, bands) uint8.

    Returns (out, mask): out has an extra alpha band when set_alpha;
    mask is the (H, W) uint8 validity mask (0 = collar)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    H, W, B = img.shape
    if colors is None:
        colors = [(255,) * B] if white else [(0,) * B]
    colors = np.asarray(colors, np.int32)
    if colors.ndim != 2 or colors.shape[1] != B:
        raise ValueError("each color needs one entry per source band")
    # replace value rule (nearblack_lib.cpp:552-556)
    replace = 255 if (len(colors) == 1 and colors[0][0] == 255) else 0

    out = np.ascontiguousarray(img, np.uint8).copy()
    if set_alpha:
        out = np.concatenate(
            [out, np.full((H, W, 1), 255, np.uint8)], axis=2)
    mask = np.full((H, W), 255, np.uint8)

    # top-down pass
    counts = np.zeros(W, np.int64)
    for y in range(H):
        _process_line(out[y], mask[y], True, B, near_dist, max_non_black,
                      colors, replace, counts, True, False, y, set_alpha)
        _process_line(out[y], mask[y], False, B, near_dist, max_non_black,
                      colors, replace, counts, False, False, y, set_alpha)
    # bottom-up pass over the processed image
    counts[:] = 0
    for y in range(H - 1, -1, -1):
        _process_line(out[y], mask[y], True, B, near_dist, max_non_black,
                      colors, replace, counts, True, True, H - 1 - y,
                      set_alpha)
        _process_line(out[y], mask[y], False, B, near_dist, max_non_black,
                      colors, replace, counts, False, True, H - 1 - y,
                      set_alpha)
    return out, mask
