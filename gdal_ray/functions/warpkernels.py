"""Warp-level area resamplers: Average / RMS / Sum / Mode / Min / Max /
Med / Q1 / Q3 — the GWKAverageOrMode family.

Semantics follow reference alg/gdalwarpkernel.cpp GWKAverageOrModeThread
(:6496-7630):

- each dst pixel's FOOTPRINT is the source-space rect spanned by the
  transforms of its two corners (x, y) and (x+1, y+1) (coordinates
  swapped into order when the transform flips them);
- the covered source column range is
  ``[max(floor(xmin+eps), 0), min(ceil(xmax-eps), srcW))`` widened to at
  least one column (same for rows);
- Average/RMS/Mode weight edge rows/columns by their fractional
  coverage (COMPUTE_WEIGHT_Y / COMPUTE_WEIGHT macros);
- Med/Q1/Q3 collect the covered values UNWEIGHTED, sort, and take
  ``index = ceil(q * n - 1)`` (:7604-7609);
- Mode counts weighted occurrences, first-encountered value wins ties
  (GWKTS_First, the default tie strategy);
- Sum is the weighted sum of covered values.

``warp_affine`` drives either these area kernels or the point samplers
(nearest/bilinear/cubic/cubicspline/lanczos in functions/resample.py)
through a same-CRS GenImgProj chain — the conformance surface for the
reference's autotest/alg/data/utmsmall_* golden images.
"""

from __future__ import annotations

import numpy as np

from .affine import apply_gt, invert_gt
from .resample import _cast_back, sample

_EPS = 1e-10

AREA_ALGOS = ("average", "rms", "sum", "mode", "min", "max",
              "med", "q1", "q3")

_QUANT = {"med": 0.5, "q1": 0.25, "q3": 0.75}


def _edge_weights(lo: float, hi: float, i0: int, i1: int) -> np.ndarray:
    """Per-index fractional coverage weights over [i0, i1)."""
    w = np.ones(i1 - i0, np.float64)
    if i1 - i0 == 1:
        return w
    w[0] = 1.0 - (lo - i0)
    w[-1] = 1.0 - (i1 - hi)
    return w


def warp_area(src: np.ndarray, cx: np.ndarray, cy: np.ndarray,
              algo: str, valid: np.ndarray | None = None,
              wrap_x: bool = False):
    """Area-resample ``src`` onto a dst grid whose CORNER source
    coordinates are given by ``cx``/``cy`` of shape (dst_h+1, dst_w+1)
    (fractional source pixel coords).

    ``wrap_x=True`` enables the antimeridian rule (reference
    GWKAverageOrModeThread bWrapOverX, alg/gdalwarpkernel.cpp:6790+):
    a footprint whose corner x's are farther apart than half the
    raster is read as the WRAPPED interval [xmax, xmin + sw) with
    modulo column indexing — global rasters where dst pixels straddle
    the +-180 column seam.

    Returns (out, out_valid); ``valid`` optionally masks source pixels
    (GWK unified validity mask).
    """
    if algo not in AREA_ALGOS:
        raise NotImplementedError(f"warp area algo {algo!r}")
    sh, sw = src.shape[:2]
    dh, dw = cx.shape[0] - 1, cx.shape[1] - 1
    out = np.zeros((dh, dw), np.float64)
    out_valid = np.zeros((dh, dw), bool)
    srcf = src.astype(np.float64)
    quant = _QUANT.get(algo)
    for y in range(dh):
        for x in range(dw):
            xs = (cx[y, x], cx[y + 1, x + 1])
            ys = (cy[y, x], cy[y + 1, x + 1])
            xmin, xmax = (xs[0], xs[1]) if xs[0] <= xs[1] else (xs[1], xs[0])
            ymin, ymax = (ys[0], ys[1]) if ys[0] <= ys[1] else (ys[1], ys[0])
            wrapped = wrap_x and (xmax - xmin) > sw / 2.0
            if wrapped:
                xmin, xmax = xmax, xmin + sw
            if not (xmax > -_EPS and xmin < (2 * sw if wrapped else sw) + _EPS):
                continue
            if not (ymax > -_EPS and ymin < sh + _EPS):
                continue
            ix0 = int(max(np.floor(xmin + _EPS), 0.0))
            ix1 = int(np.ceil(xmax - _EPS))
            if not wrapped:
                ix1 = min(ix1, sw)
            if ix0 == ix1 and ix1 < sw:
                ix1 += 1
            iy0 = int(max(np.floor(ymin + _EPS), 0.0))
            iy1 = min(int(np.ceil(ymax - _EPS)), sh)
            if iy0 == iy1 and iy1 < sh:
                iy1 += 1
            if ix0 >= ix1 or iy0 >= iy1:
                continue
            if wrapped:
                cols = np.arange(ix0, ix1) % sw
                block = srcf[iy0:iy1][:, cols]
                vm = valid[iy0:iy1][:, cols] if valid is not None else None
            else:
                block = srcf[iy0:iy1, ix0:ix1]
                vm = valid[iy0:iy1, ix0:ix1] if valid is not None else None
            if vm is not None and not vm.any():
                continue
            wts = (_edge_weights(ymin, ymax, iy0, iy1)[:, None]
                   * _edge_weights(xmin, xmax, ix0, ix1)[None, :])
            if vm is not None:
                wts = np.where(vm, wts, 0.0)
                if wts.sum() <= 0:
                    continue
            if algo == "average":
                out[y, x] = (block * wts).sum() / wts.sum()
            elif algo == "rms":
                out[y, x] = np.sqrt((block * block * wts).sum() / wts.sum())
            elif algo == "sum":
                out[y, x] = (block * wts).sum()
            elif algo == "min":
                out[y, x] = block[vm].min() if vm is not None else block.min()
            elif algo == "max":
                out[y, x] = block[vm].max() if vm is not None else block.max()
            elif algo == "mode":
                flat = block.ravel()
                fw = wts.ravel()
                keep = fw > 0
                flat, fw = flat[keep], fw[keep]
                # first-encountered wins ties (GWKTS_First): np.unique
                # sorts, so accumulate in encounter order instead
                vals: list[float] = []
                counts: list[float] = []
                index: dict[float, int] = {}
                best_i, best_c = 0, -1.0
                for v, wgt in zip(flat.tolist(), fw.tolist()):
                    i = index.get(v)
                    if i is None:
                        i = len(vals)
                        index[v] = i
                        vals.append(v)
                        counts.append(0.0)
                    counts[i] += wgt
                    if counts[i] > best_c:
                        best_i, best_c = i, counts[i]
                out[y, x] = vals[best_i]
            else:  # med / q1 / q3 — unweighted sorted quantile index
                flat = block[vm] if vm is not None else block.ravel()
                svals = np.sort(flat)
                qi = int(np.ceil(quant * svals.size - 1))
                out[y, x] = svals[max(qi, 0)]
            out_valid[y, x] = True
    res = _cast_back(out[..., None], src.dtype, 0, out_valid[..., None])
    return res[..., 0], out_valid


def warp_affine(src: np.ndarray, src_gt, dst_gt, dst_h: int, dst_w: int,
                algo: str = "nearest", valid: np.ndarray | None = None):
    """Same-CRS warp through the GenImgProj affine chain
    (dst pixel -> world -> src pixel; reference
    alg/gdaltransformer.cpp GenImgProj with no CRS hop). Point
    resamplers sample dst pixel CENTERS; area resamplers aggregate the
    dst pixel CORNER footprints."""
    inv = invert_gt(src_gt)

    def to_src(px, py):
        wx, wy = apply_gt(dst_gt, px, py)
        return apply_gt(inv, wx, wy)

    if algo in AREA_ALGOS:
        gx, gy = np.meshgrid(np.arange(dst_w + 1, dtype=np.float64),
                             np.arange(dst_h + 1, dtype=np.float64))
        cx, cy = to_src(gx, gy)
        return warp_area(src, cx, cy, algo, valid=valid)
    gx, gy = np.meshgrid(np.arange(dst_w, dtype=np.float64) + 0.5,
                         np.arange(dst_h, dtype=np.float64) + 0.5)
    sx, sy = to_src(gx, gy)
    return sample(src, sx, sy, algo)
