"""`gdal raster color-map` + `gdal raster nodata-to-alpha` step
conformance (VERDICT r4 directive #6).

Reference: apps/gdalalg_raster_color_map.cpp,
apps/gdalalg_raster_nodata_to_alpha.cpp; every expected value below
is the reference's own published assertion in
autotest/utilities/test_gdalalg_raster_color_map.py and
test_gdalalg_raster_nodata_to_alpha.py.
"""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.dem import (color_map, color_map_from_table,
                                    parse_color_file)
from gdal_ray.functions.pixelfuncs import nodata_to_alpha

REF = "/root/reference/autotest"
N43 = f"{REF}/gdrivers/data/n43.tif"
COLORFILE = f"{REF}/utilities/data/color_file.txt"
PAL_BMP = f"{REF}/gcore/data/8bit_pal.bmp"
BYTE = f"{REF}/gcore/data/byte.tif"

needs_ref = pytest.mark.skipif(not os.path.exists(N43),
                               reason="reference absent")


def _n43():
    from gdal_ray.sources.tiff import decode_tiff

    px, _ = decode_tiff(open(N43, "rb").read())
    return px.astype(np.float64)


@needs_ref
@pytest.mark.parametrize(
    "selection,add_alpha,expected",
    [
        ("interpolate", False, [55066, 37594, 47768]),
        ("interpolate", True, [55066, 37594, 47768, 48613]),
        ("exact", False, [8073, 53707, 59536]),
        ("nearest", False, [57296, 42926, 47181]),
    ],
)
def test_color_map_from_file(selection, add_alpha, expected):
    levels, colors, alphas = parse_color_file(open(COLORFILE).read())
    out = color_map(_n43(), levels, colors, alphas,
                    color_selection=selection, add_alpha=add_alpha)
    assert out.shape[2] == len(expected)
    assert [checksum_image(out[:, :, b])
            for b in range(out.shape[2])] == expected


@needs_ref
@pytest.mark.parametrize(
    "add_alpha,expected",
    [(False, [4672, 4672, 4672]), (True, [4672, 4672, 4672, 4873])],
)
def test_color_map_from_color_table(add_alpha, expected):
    from gdal_ray.sources.bmp import decode_bmp

    idx, palette = decode_bmp(open(PAL_BMP, "rb").read())
    assert palette is not None
    out = color_map_from_table(idx, palette, add_alpha=add_alpha)
    assert [checksum_image(out[:, :, b])
            for b in range(out.shape[2])] == expected


@needs_ref
def test_nodata_to_alpha_noop():
    from gdal_ray.sources.tiff import decode_tiff

    px, _ = decode_tiff(open(BYTE, "rb").read())
    out = nodata_to_alpha(px, None)
    assert out.ndim == 2 and checksum_image(out) == 4672


def test_nodata_to_alpha_nominal():
    px = np.array([[1, 2]], np.uint8)
    out = nodata_to_alpha(px, 1)
    assert out.shape == (1, 2, 2)
    assert out[:, :, 0].tobytes() == b"\x01\x02"
    assert out[:, :, 1].tobytes() == b"\x00\xff"


def test_nodata_to_alpha_per_band():
    px = np.dstack([np.array([[1, 2, 3]], np.uint8),
                    np.array([[3, 1, 2]], np.uint8),
                    np.array([[3, 2, 1]], np.uint8)])
    out = nodata_to_alpha(px, [3, 2, 1])
    assert out.shape == (1, 3, 4)
    for b in range(3):
        assert (out[:, :, b] == px[:, :, b]).all()
    assert out[:, :, 3].tobytes() == b"\xff\xff\x00"
    with pytest.raises(ValueError, match="3 nodata values"):
        nodata_to_alpha(px, [3, 2])


def test_nodata_to_alpha_uint16_opaque_range():
    px = np.array([[100, 40000]], np.uint16)
    out = nodata_to_alpha(px, 100)
    assert out.dtype == np.uint16
    assert out[:, :, 1].tolist() == [[0, 65535]]


def test_color_file_percentage_and_nv():
    levels, colors, alphas = parse_color_file(
        "nv 10 20 30 0\n0% 0 0 0\n50% 100 100 100\n100% 200 200 200\n",
        band_min=0.0, band_max=200.0)
    assert levels[0] is None and colors[0] == (10, 20, 30)
    assert levels[1:] == [0.0, 100.0, 200.0]
    band = np.array([[0.0, 100.0, 200.0, -1.0]])
    out = color_map(band, levels, colors, alphas, src_nodata=-1.0)
    assert out[0, 1, 0] == 100
    assert tuple(out[0, 3]) == (10, 20, 30)  # nv color on nodata
    import pytest as _pytest
    with _pytest.raises(ValueError, match="band range"):
        parse_color_file("50% 1 2 3\n")
