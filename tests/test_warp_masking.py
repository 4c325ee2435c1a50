"""Warp masking-option parity: UNIFIED_SRC_NODATA, EXCLUDED_VALUES(+
PCT_THRESHOLD), NODATA_VALUES_PCT_THRESHOLD, MODE_TIES.

Numeric expectations are transcribed from the reference's own suites:
autotest/alg/warp.py test_warp_average_excluded_values /
test_warp_average_NODATA_VALUES_PCT_THRESHOLD (2x2 -> 1x1 average),
and option semantics from alg/gdalwarper.cpp:1309-1527 /
alg/gdalwarpkernel.cpp:7288-7300 (GWKTS tie strategies).
"""

import numpy as np
import pytest

from gdal_ray.functions.warpkernels import (
    src_validity_masks,
    warp_area,
    warp_area_average_bands,
)

# whole-raster 2x2 src -> single dst pixel: corner grids
CX = np.array([[0.0, 2.0], [0.0, 2.0]])
CY = np.array([[0.0, 0.0], [2.0, 2.0]])


def _bands3():
    b1 = np.array([[10, 20], [30, 40]], np.uint8)
    return np.stack([b1, b1 + 1, b1 + 2])


def test_excluded_values_below_threshold_ignored():
    # 25% excluded < default 50% threshold: excluded pixels drop out of
    # the mean (autotest expectation (10+20+40)//3 per band).
    out, ok = warp_area_average_bands(
        _bands3(), CX, CY, excluded_values=[(30, 31, 32)])
    assert ok[0, 0]
    assert tuple(out[:, 0, 0]) == (23, 24, 25)


@pytest.mark.parametrize("pct,expect", [
    (0.0, (30, 31, 32)),    # 25% >= 0%
    (0.24, (30, 31, 32)),   # 25% >= 24%
    (0.26, (23, 24, 25)),   # 25% < 26% -> regular mean
])
def test_excluded_values_pct_threshold(pct, expect):
    out, ok = warp_area_average_bands(
        _bands3(), CX, CY, excluded_values=[(30, 31, 32)],
        excluded_pct=pct)
    assert ok[0, 0]
    assert tuple(out[:, 0, 0]) == expect


def test_excluded_values_no_match():
    out, ok = warp_area_average_bands(
        _bands3(), CX, CY, excluded_values=[(30, 31, 0)])
    assert ok[0, 0]
    assert tuple(out[:, 0, 0]) == (25, 26, 27)


def test_excluded_values_bad_tuple_len():
    with pytest.raises(ValueError,
                       match="one or several tuples of 3 values"):
        warp_area_average_bands(
            _bands3(), CX, CY, excluded_values=[(30, 31)])


@pytest.mark.parametrize("pct,expect_valid,expect", [
    (1.0, True, 27),    # default: 25% nodata < 100%
    (0.80, True, 27),
    (0.30, True, 27),
    (0.25, False, 0),   # 25% >= 25% -> dst unset (becomes dst nodata)
])
def test_nodata_values_pct_threshold(pct, expect_valid, expect):
    band = np.array([[10, 20], [30, 40]], np.uint8)[None]
    _, gvalid = src_validity_masks(band, [20])
    out, ok = warp_area_average_bands(
        band, CX, CY, valid=gvalid, nodata_pct=pct)
    assert bool(ok[0, 0]) is expect_valid
    if expect_valid:
        assert out[0, 0, 0] == expect  # round((10+30+40)/3)


@pytest.mark.parametrize("ties,expect", [
    ("first", 20.0),  # encounter order 20,10,20,10
    ("min", 10.0),
    ("max", 20.0),
])
def test_mode_ties(ties, expect):
    src = np.array([[20.0, 10.0], [20.0, 10.0]])
    out, ok = warp_area(src, CX, CY, "mode", mode_ties=ties)
    assert ok[0, 0]
    assert out[0, 0] == expect


def test_mode_ties_bad_strategy():
    with pytest.raises(ValueError, match="MODE_TIES"):
        warp_area(np.zeros((2, 2)), CX, CY, "mode", mode_ties="median")


def test_unified_src_nodata_policies():
    b1 = np.array([[10, 20], [30, 40]], np.float64)
    b2 = np.array([[11, 21], [31, 41]], np.float64)
    bands = np.stack([b1, b2])

    # Only band 1 has nodata (20), matched at (0,1); never all-bands.
    per, glob = src_validity_masks(bands, [20, None], policy="yes")
    assert per.all() and glob.all()  # unified: pixel live if ANY band live

    per, glob = src_validity_masks(bands, [20, None], policy="partial")
    assert not per[0, 0, 1] and per[1].all() and glob.all()

    per, glob = src_validity_masks(bands, [20, None], policy="no")
    assert not per[0, 0, 1] and glob.all()

    # A pixel where ALL bands are nodata goes globally invalid under
    # "yes" and "partial" but not "no".
    b1n = np.array([[10, 20], [30, 20]], np.float64)
    b2n = np.array([[11, 21], [31, 21]], np.float64)
    both = np.stack([b1n, b2n])
    per, glob = src_validity_masks(both, [20, 21], policy="yes")
    assert not glob[0, 1] and not glob[1, 1] and glob[0, 0]
    assert (per == glob[None]).all()

    per, glob = src_validity_masks(both, [20, 21], policy="partial")
    assert not glob[0, 1] and not glob[1, 1]

    _, glob = src_validity_masks(both, [20, 21], policy="no")
    assert glob.all()

    with pytest.raises(ValueError, match="UNIFIED_SRC_NODATA"):
        src_validity_masks(both, [20, 21], policy="maybe")


def test_warp_affine_bands_options_layer():
    from gdal_ray.functions.warpkernels import warp_affine_bands
    bands = _bands3()
    gt, dgt = (1, 1, 0, 1, 0, 1), (1, 2, 0, 1, 0, 2)
    out, ok = warp_affine_bands(bands, gt, dgt, 1, 1, "average",
                                excluded_values=[(30, 31, 32)])
    assert ok[0, 0] and tuple(out[:, 0, 0]) == (23, 24, 25)
    out, ok = warp_affine_bands(bands[:1], gt, dgt, 1, 1, "average",
                                nodata=[20], nodata_pct=0.25)
    assert not ok[0, 0]
    out, ok = warp_affine_bands(bands, gt, dgt, 1, 1, "mode",
                                mode_ties="max")
    assert tuple(out[:, 0, 0]) == (40, 41, 42)
    with pytest.raises(NotImplementedError, match="EXCLUDED_VALUES"):
        warp_affine_bands(bands, gt, dgt, 1, 1, "mode",
                          excluded_values=[(30, 31, 32)])


def test_excluded_values_respects_validity_mask():
    # nodata pixel + excluded pixel together: nodata weight counts
    # toward NODATA threshold, excluded toward EXCLUDED threshold,
    # regular mean over the rest.
    band = np.stack([np.array([[10, 20], [30, 40]], np.float64)])
    _, gvalid = src_validity_masks(band, [20.0])
    out, ok = warp_area_average_bands(
        band, CX, CY, valid=gvalid, excluded_values=[(30.0,)],
        excluded_pct=0.5)
    # 25% nodata < 100%; excluded 25% of total < 50% -> mean(10, 40)
    assert ok[0, 0] and out[0, 0, 0] == 25.0
    out, ok = warp_area_average_bands(
        band, CX, CY, valid=gvalid, excluded_values=[(30.0,)],
        excluded_pct=0.25)
    assert ok[0, 0] and out[0, 0, 0] == 30.0
