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


def _footprint_bounds(cx, cy, y, x, sh, sw, wrap_x):
    """Source-space integer footprint of dst pixel (y, x); returns
    (ix0, ix1, iy0, iy1, xmin, xmax, ymin, ymax, wrapped) or None when
    the footprint misses the raster (GWKAverageOrModeThread corner
    logic, alg/gdalwarpkernel.cpp:6700-6800)."""
    xs = (cx[y, x], cx[y + 1, x + 1])
    ys = (cy[y, x], cy[y + 1, x + 1])
    xmin, xmax = (xs[0], xs[1]) if xs[0] <= xs[1] else (xs[1], xs[0])
    ymin, ymax = (ys[0], ys[1]) if ys[0] <= ys[1] else (ys[1], ys[0])
    wrapped = wrap_x and (xmax - xmin) > sw / 2.0
    if wrapped:
        xmin, xmax = xmax, xmin + sw
    if not (xmax > -_EPS and xmin < (2 * sw if wrapped else sw) + _EPS):
        return None
    if not (ymax > -_EPS and ymin < sh + _EPS):
        return None
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
        return None
    return ix0, ix1, iy0, iy1, xmin, xmax, ymin, ymax, wrapped


def src_validity_masks(bands: np.ndarray, nodata, policy: str = "partial"):
    """Per-band + global validity from per-band nodata values under the
    UNIFIED_SRC_NODATA policy (reference alg/gdalwarper.cpp:1309-1340,
    conformed to autotest/utilities/test_gdalwarp_lib.py
    test_gdalwarp_lib_src_nodata_with_dstalpha):

    - ``yes``: a pixel is nodata iff ALL bands match their nodata value;
      every band shares that unified mask (bands keep individually-
      matching values when any other band is live).
    - ``no``: each band masks independently; the global (alpha) mask is
      always valid.
    - ``partial`` (default): each band masks independently, but the
      global mask goes invalid where ALL bands are nodata.

    ``bands`` is (nbands, h, w); ``nodata`` a per-band sequence where
    ``None`` means the band has no nodata. Returns
    ``(per_band_valid (nbands,h,w) bool, global_valid (h,w) bool)``.
    """
    if policy not in ("yes", "no", "partial"):
        raise ValueError(f"UNIFIED_SRC_NODATA policy {policy!r}")
    nb, sh, sw = bands.shape
    match = np.zeros((nb, sh, sw), bool)
    for b in range(nb):
        if nodata[b] is not None:
            match[b] = bands[b] == nodata[b]
    all_nodata = match.all(axis=0)
    if policy == "yes":
        unified = ~all_nodata
        return np.broadcast_to(unified, (nb, sh, sw)).copy(), unified
    per_band = ~match
    if policy == "no":
        return per_band, np.ones((sh, sw), bool)
    return per_band, ~all_nodata


def warp_area_average_bands(bands: np.ndarray, cx, cy,
                            valid: np.ndarray | None = None,
                            excluded_values=(),
                            excluded_pct: float = 0.5,
                            nodata_pct: float = 1.0,
                            wrap_x: bool = False):
    """Joint multi-band Average with EXCLUDED_VALUES /
    EXCLUDED_VALUES_PCT_THRESHOLD / NODATA_VALUES_PCT_THRESHOLD
    semantics (reference alg/gdalwarpkernel.cpp:6850-6990, the special
    all-bands-together Average path; option docs alg/gdalwarper.cpp
    :1475-1499; conformance autotest/alg/warp.py
    test_warp_average_excluded_values /
    test_warp_average_NODATA_VALUES_PCT_THRESHOLD):

    - source pixels whose cross-band tuple equals one of
      ``excluded_values`` (each a len-nbands tuple) stay VALID for
      density purposes but are excluded from the mean;
    - if the invalid (nodata-masked) weight reaches
      ``nodata_pct`` × total weight, the dst pixel is unset;
    - else if the excluded weight reaches ``excluded_pct`` × total
      weight, the dst pixel takes the most-represented excluded tuple
      (per-pixel occurrence COUNT, not weight — anCountExcludedValues);
    - else the weighted mean over regular pixels.

    ``bands`` is (nbands, h, w); ``valid`` an optional (h, w) unified
    mask. Returns (out (nbands, dh, dw) in the source dtype, out_valid
    (dh, dw)).
    """
    nb, sh, sw = bands.shape
    dh, dw = cx.shape[0] - 1, cx.shape[1] - 1
    out = np.zeros((nb, dh, dw), np.float64)
    out_valid = np.zeros((dh, dw), bool)
    srcf = bands.astype(np.float64)
    excl = [np.asarray(t, np.float64) for t in excluded_values]
    for t in excl:
        if t.shape != (nb,):
            raise ValueError(
                f"EXCLUDED_VALUES should contain one or several tuples "
                f"of {nb} values")
    for y in range(dh):
        for x in range(dw):
            fb = _footprint_bounds(cx, cy, y, x, sh, sw, wrap_x)
            if fb is None:
                continue
            ix0, ix1, iy0, iy1, xmin, xmax, ymin, ymax, wrapped = fb
            if wrapped:
                cols = np.arange(ix0, ix1) % sw
                block = srcf[:, iy0:iy1][:, :, cols]
                vm = valid[iy0:iy1][:, cols] if valid is not None else None
            else:
                block = srcf[:, iy0:iy1, ix0:ix1]
                vm = valid[iy0:iy1, ix0:ix1] if valid is not None else None
            wts = (_edge_weights(ymin, ymax, iy0, iy1)[:, None]
                   * _edge_weights(xmin, xmax, ix0, ix1)[None, :])
            if vm is None:
                vm = np.ones(wts.shape, bool)
            w_invalid = wts[~vm].sum()
            # pixel-tuple membership in each excluded tuple
            is_excl = np.zeros(wts.shape, bool)
            counts = []
            for t in excl:
                m = vm & np.all(block == t[:, None, None], axis=0)
                counts.append(int(m.sum()))
                is_excl |= m
            w_excl = wts[is_excl].sum()
            reg = vm & ~is_excl
            w_reg = wts[reg].sum()
            total = w_invalid + w_excl + w_reg
            if total <= 0:
                continue
            if w_invalid > 0 and w_invalid >= nodata_pct * total - _EPS:
                continue
            if w_excl > 0 and w_excl >= excluded_pct * total - _EPS:
                best = int(np.argmax(counts))
                out[:, y, x] = excl[best]
                out_valid[y, x] = True
            elif w_reg > 0:
                wr = wts * reg
                out[:, y, x] = (block * wr).sum(axis=(1, 2)) / wr.sum()
                out_valid[y, x] = True
    res = _cast_back(np.moveaxis(out, 0, -1), bands.dtype, 0,
                     np.broadcast_to(out_valid[..., None], out.shape[1:]
                                     + (nb,)))
    return np.moveaxis(res, -1, 0), out_valid


def warp_area(src: np.ndarray, cx: np.ndarray, cy: np.ndarray,
              algo: str, valid: np.ndarray | None = None,
              wrap_x: bool = False, mode_ties: str = "first"):
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
    if mode_ties not in ("first", "min", "max"):
        raise ValueError(f"MODE_TIES strategy {mode_ties!r}")
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
                # MODE_TIES (reference GWKTS_*, alg/gdalwarpkernel.cpp
                # :7288-7300): ties on accumulated weight break to the
                # first-encountered ("first"), smallest ("min") or
                # largest ("max") value. np.unique sorts, so accumulate
                # in encounter order instead.
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
                    better = counts[i] > best_c
                    if not better and counts[i] == best_c:
                        if mode_ties == "min":
                            better = v < vals[best_i]
                        elif mode_ties == "max":
                            better = v > vals[best_i]
                    if better:
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
                algo: str = "nearest", valid: np.ndarray | None = None,
                mode_ties: str = "first"):
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
        return warp_area(src, cx, cy, algo, valid=valid,
                         mode_ties=mode_ties)
    gx, gy = np.meshgrid(np.arange(dst_w, dtype=np.float64) + 0.5,
                         np.arange(dst_h, dtype=np.float64) + 0.5)
    sx, sy = to_src(gx, gy)
    return sample(src, sx, sy, algo)


def warp_affine_bands(bands: np.ndarray, src_gt, dst_gt, dst_h: int,
                      dst_w: int, algo: str = "average", *,
                      nodata=None, unified: str = "partial",
                      excluded_values=(), excluded_pct: float = 0.5,
                      nodata_pct: float = 1.0, mode_ties: str = "first"):
    """Multi-band same-CRS warp with the reference's masking option
    surface (alg/gdalwarper.cpp:1309-1527): ``nodata`` is a per-band
    sequence (None entries = no nodata), ``unified`` the
    UNIFIED_SRC_NODATA policy, ``excluded_values`` a list of per-band
    tuples excluded from Average, ``excluded_pct``/``nodata_pct`` the
    EXCLUDED_VALUES_PCT_THRESHOLD / NODATA_VALUES_PCT_THRESHOLD
    fractions, ``mode_ties`` the GWKTS tie strategy.

    ``bands`` is (nbands, h, w). Returns (out (nbands, dh, dw),
    global_out_valid (dh, dw)).
    """
    nb = bands.shape[0]
    if nodata is None:
        per_valid = global_valid = None
    else:
        per_valid, global_valid = src_validity_masks(
            bands, nodata, policy=unified)
    if excluded_values or nodata_pct < 1.0:
        # Both thresholds live in the reference's joint-band Average
        # path (GWKAverageOrModeThread nAlgo==GWKAOM_Average special
        # case); they have no meaning for other resamplers.
        if algo != "average":
            raise NotImplementedError(
                "EXCLUDED_VALUES / NODATA_VALUES_PCT_THRESHOLD only "
                "apply to Average (reference alg/gdalwarpkernel.cpp "
                "joint-band path)")
        inv = invert_gt(src_gt)
        gx, gy = np.meshgrid(np.arange(dst_w + 1, dtype=np.float64),
                             np.arange(dst_h + 1, dtype=np.float64))
        wx, wy = apply_gt(dst_gt, gx, gy)
        cx, cy = apply_gt(inv, wx, wy)
        return warp_area_average_bands(
            bands, cx, cy, valid=global_valid,
            excluded_values=excluded_values, excluded_pct=excluded_pct,
            nodata_pct=nodata_pct)
    out = []
    ok_all = None
    for b in range(nb):
        v = per_valid[b] if per_valid is not None else None
        ob, ok = warp_affine(bands[b], src_gt, dst_gt, dst_h, dst_w,
                             algo, valid=v, mode_ties=mode_ties)
        out.append(ob)
        ok_all = ok if ok_all is None else (ok_all | ok)
    return np.stack(out), ok_all
