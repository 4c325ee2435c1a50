"""TIFF codec extensions vs the reference gcore fixtures: LZMA,
LERC(+DEFLATE) incl. Lerc2 v4 Huffman paths, 64-bit & complex sample
types, predictor-2 on float/64-bit lanes, missing StripByteCounts,
planar-separate tiled layouts."""
import glob
import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.tiff import decode_tiff

G = "/root/reference/autotest/gcore/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(G), reason="reference fixtures unavailable")


def _read(rel):
    return decode_tiff(open(os.path.join(G, rel), "rb").read())[0]


@pytest.fixture(scope="module")
def byte_ref():
    return _read("byte.tif")


@pytest.fixture(scope="module")
def rgb_ref():
    return _read("rgbsmall.tif")


@pytest.mark.parametrize("rel", [
    "gtiff/byte_LZMA.tif", "gtiff/byte_LZMA_tiled.tif",
    "gtiff/byte_LERC.tif", "gtiff/byte_LERC_tiled.tif",
    "gtiff/byte_LERC_DEFLATE.tif", "gtiff/byte_LERC_DEFLATE_tiled.tif",
])
def test_byte_codecs_bit_exact(rel, byte_ref):
    px = _read(rel)
    assert np.array_equal(px, byte_ref)
    assert checksum_image(px) == 4672


@pytest.mark.parametrize("rel", [
    "gtiff/rgbsmall_LZMA.tif", "gtiff/rgbsmall_LZMA_separate.tif",
    "gtiff/rgbsmall_LZMA_tiled.tif",
    "gtiff/rgbsmall_LZMA_tiled_separate.tif",
    "gtiff/rgbsmall_LERC.tif", "gtiff/rgbsmall_LERC_separate.tif",
    "gtiff/rgbsmall_LERC_tiled.tif",
    "gtiff/rgbsmall_LERC_tiled_separate.tif",
    "gtiff/rgbsmall_LERC_DEFLATE.tif",
    "gtiff/rgbsmall_LERC_DEFLATE_separate.tif",
    "gtiff/rgbsmall_LERC_DEFLATE_tiled.tif",
    "gtiff/rgbsmall_LERC_DEFLATE_tiled_separate.tif",
])
def test_rgbsmall_codecs_bit_exact(rel, rgb_ref):
    # exercises the Lerc2 v4 delta-Huffman nDim=3 path, masked tile
    # padding, and the planar-separate tiled layout
    assert np.array_equal(_read(rel), rgb_ref)


def test_lerc_zstd_documented_subset():
    with pytest.raises(NotImplementedError, match="ZSTD"):
        _read("gtiff/byte_LERC_ZSTD.tif")


@pytest.mark.parametrize("rel,dtype", [
    ("uint64.tif", np.uint64), ("int64.tif", np.int64),
    ("gtiff/uint64_full_range.tif", np.uint64),
    ("gtiff/int64_full_range.tif", np.int64),
    ("float16.tif", np.float16),
])
def test_wide_int_and_half(rel, dtype, byte_ref):
    px = _read(rel)
    assert px.dtype == dtype
    if "full_range" not in rel:
        assert checksum_image(px) == 4672


@pytest.mark.parametrize("rel,dtype", [
    ("cint16.tif", np.complex64), ("cint32.tif", np.complex128),
    ("cfloat32.tif", np.complex64), ("cfloat64.tif", np.complex128),
    ("gtiff/cint32_big_endian.tif", np.complex128),
    ("complex_float32.tif", np.complex64),
    ("complex_int32.tif", np.complex128),
])
def test_complex_types(rel, dtype):
    px = _read(rel)
    assert px.dtype == dtype
    assert np.isfinite(px.real).all()


def test_complex_imag_content():
    px = _read("gtiff/complex_non_zero_real_zero_imag.tif")
    assert np.iscomplexobj(px)
    assert np.all(px.imag == 0)
    assert np.any(px.real != 0)


@pytest.mark.parametrize("rel", [
    "gtiff/float32_LZW_predictor_2.tif",
    "gtiff/float64_LZW_predictor_2.tif",
    "gtiff/uint64_LZW_predictor_2.tif",
])
def test_predictor2_on_wide_lanes(rel, byte_ref):
    # libtiff horAcc on the raw integer lanes regardless of format
    px = _read(rel)
    assert checksum_image(px) == 4672


def test_missing_strip_byte_counts():
    px = _read("one_strip_nobytecount.tif")
    assert px.shape == (2001, 1)


@pytest.mark.parametrize("rel,cs", [
    ("ycbcr_11_lzw.tif", (13459, 12939, 12414)),
    ("ycbcr_12_lzw.tif", (13565, 13105, 12660)),
    ("ycbcr_21_lzw.tif", (13587, 13297, 12760)),
    ("ycbcr_22_lzw.tif", (13393, 13137, 12656)),
    ("ycbcr_41_lzw.tif", (13218, 12758, 12592)),
    ("ycbcr_42_lzw.tif", (13277, 12779, 12614)),
    ("ycbcr_42_lzw_optimized.tif", (19918, 20120, 19087)),
    ("ycbcr_44_lzw.tif", (12994, 13229, 12149)),
    ("ycbcr_44_lzw_optimized.tif", (19666, 19860, 18836)),
])
def test_ycbcr_lzw_checksum_matrix(rel, cs):
    """gcore tiff_read.py test_tiff_read_ycbcr_lzw: subsampled YCbCr
    strips through the tif_color.c fixed-point conversion — per-band
    GDAL checksums matched exactly."""
    px = _read(rel)
    assert tuple(checksum_image(px[:, :, i]) for i in range(3)) == cs


@pytest.mark.parametrize("rel", ["ycbcr_14_lzw.tif", "ycbcr_24_lzw.tif"])
def test_ycbcr_unsupported_combos(rel):
    with pytest.raises(NotImplementedError):
        _read(rel)
