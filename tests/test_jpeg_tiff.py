"""JPEG-in-TIFF (Compression=7, TIFF TechNote2) vs the reference's
own fixtures and checksums (autotest/gcore/tiff_read.py,
tiff_write.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.jpeg import decode_jpeg_tiff
from gdal_ray.sources.tiff import decode_tiff

DATA = "/root/reference/autotest/gcore/data"


def _cs(px: np.ndarray, band: int = 0) -> int:
    px3 = px if px.ndim == 3 else px[:, :, None]
    return checksum_image(px3[:, :, band].astype(np.float64))


def _read(name: str) -> bytes:
    with open(f"{DATA}/{name}", "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("name", ["stefan_full_rgba_jpeg_contig.tif",
                                  "stefan_full_rgba_jpeg_separate.tif"])
def test_rgba_jpeg_golden(name):
    # tiff_read.py test_tiff_jpeg_rgba_{pixel,band}_interleaved:
    # photometric=RGB 4-component JPEG, both interleave layouts
    px, _gt = decode_tiff(_read(name))
    assert px.shape == (150, 162, 4)
    assert [_cs(px, b) for b in range(4)] == [16404, 62700, 37913, 14174]


@pytest.mark.parametrize("name", ["tif_jpeg_too_big_last_stripe.tif",
                                  "tif_jpeg_ycbcr_too_big_last_stripe.tif"])
def test_too_big_last_stripe(name):
    # tiff_read.py test_tiff_read_jpeg_too_big_last_stripe: the JPEG
    # stream encodes more rows than the image; crop, checksum 4557
    px, _gt = decode_tiff(_read(name))
    assert px.shape[:2] == (19, 20)
    assert _cs(px) == 4557


def test_unusual_jpegtable_golden():
    # tiff_write.py test_tiff_write_139 precursor: JPEGTables stream
    # with non-default table ids; checksum 4771
    px, _gt = decode_tiff(_read("byte_jpg_unusual_jpegtable.tif"))
    assert _cs(px) == 4771


def test_irregular_tile_size_raises_like_reference():
    # tiff_read.py test_tiff_read_irregular_tile_size_jpeg_in_tiff:
    # the reference also errors on checksum of this corrupt layout
    with pytest.raises(Exception):
        px, _ = decode_tiff(_read("irregular_tile_size_jpeg_in_tiff.tif"))
        _cs(px)


def test_abbreviated_stream_merging():
    # decode_jpeg_tiff must honor tables from the JPEGTables stream
    # and let the strip's own tables override
    from gdal_ray.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    full = encode_jpeg(px, quality=95)
    # split: tables-only prefix (SOI..before SOF) + abbreviated image
    sof = full.find(b"\xff\xc0")
    tables = full[:sof] + b"\xff\xd9"
    stream = b"\xff\xd8" + full[sof:]
    out = decode_jpeg_tiff(stream, tables)
    assert np.array_equal(out, decode_jpeg_tiff(full, None))


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


def test_write_jpeg_tiff_gray_roundtrip():
    from gdal_ray.sources.tiff import encode_tiff

    src, gt = decode_tiff(
        open("/root/reference/autotest/gcore/data/byte.tif", "rb").read())
    out = encode_tiff(src.astype(np.uint8), gt=gt, compression="jpeg",
                      jpeg_quality=95)
    back, gt2 = decode_tiff(out)
    assert gt2 == gt and back.shape == src.shape
    assert _psnr(src, back) >= 40


def test_write_jpeg_tiff_rgb_roundtrip():
    from gdal_ray.sources.tiff import encode_tiff

    src, _ = decode_tiff(
        open("/root/reference/autotest/gcore/data/rgbsmall.tif", "rb").read())
    out = encode_tiff(src.astype(np.uint8), compression="jpeg",
                      jpeg_quality=95)
    back, _ = decode_tiff(out)
    assert back.shape == src.shape
    assert _psnr(src, back) >= 40
    assert len(out) < src.nbytes // 2  # actually compressed


def test_ycbcr_photometric_forces_transform():
    # color='ycbcr' must convert even without JFIF/Adobe markers;
    # color='rgb' must stack planes directly
    from gdal_ray.functions.jpeg import encode_jpeg

    px = np.full((8, 8, 3), 128, np.uint8)
    px[:, :, 0] = 200
    data = encode_jpeg(px, quality=100)
    ycc = decode_jpeg_tiff(data, None, "ycbcr")
    rgb = decode_jpeg_tiff(data, None, "rgb")
    assert ycc.shape == rgb.shape == (8, 8, 3)
    assert not np.array_equal(ycc, rgb)
