"""Geospatial PDF raster driver vs reference autotest/gdrivers/pdf.py.

The reference's CreateCopy tests (test_pdf_iso32000, _dpi_300,
_no_compression) check that a byte.tif round-trip preserves the
geotransform, SRS and a non-null checksum; with the engine's lossless
FlateDecode path the checksum is exactly the source's 4672."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.pdf import encode_pdf, read_pdf
from gdal_ray.sources.tiff import decode_tiff

BYTE = "/root/reference/autotest/gcore/data/byte.tif"
RGB = "/root/reference/autotest/gcore/data/rgbsmall.tif"


def _byte():
    return decode_tiff(open(BYTE, "rb").read())


def test_pdf_iso32000_roundtrip():
    """test_pdf_iso32000: CreateCopy + reopen, gt/srs/checksum."""
    px, gt = _byte()
    pdf = encode_pdf(px, gt=gt, epsg=26711)
    assert pdf.startswith(b"%PDF-1.6")
    r = read_pdf(pdf)
    assert checksum_image(r["pixels"]) == 4672
    assert r["epsg"] == 26711
    assert np.abs(np.array(r["gt"]) - np.array(gt)).max() < 1e-6


def test_pdf_dpi_300():
    """test_pdf_iso32000_dpi_300: MediaBox scales with DPI, georef
    unchanged."""
    px, gt = _byte()
    pdf = encode_pdf(px, gt=gt, epsg=26711, dpi=300)
    assert b"/MediaBox [0 0 4.8 4.8]" in pdf   # 20px at 300dpi
    r = read_pdf(pdf)
    assert checksum_image(r["pixels"]) == 4672
    assert np.abs(np.array(r["gt"]) - np.array(gt)).max() < 1e-6


def test_pdf_no_compression():
    """test_pdf_no_compression."""
    px, gt = _byte()
    r = read_pdf(encode_pdf(px, gt=gt, epsg=26711, compression="none"))
    assert checksum_image(r["pixels"]) == 4672


def test_pdf_rgb_geographic():
    px, gt = decode_tiff(open(RGB, "rb").read())
    r = read_pdf(encode_pdf(px, gt=gt, epsg=4326))
    assert (r["pixels"] == px).all()
    assert r["epsg"] == 4326
    assert np.abs(np.array(r["gt"]) - np.array(gt)).max() < 1e-12


def test_pdf_jpeg_compression():
    """test_pdf_jpeg_compression analog: DCTDecode path, PSNR gate."""
    px, gt = _byte()
    r = read_pdf(encode_pdf(px, gt=gt, epsg=26711, compression="jpeg",
                            jpeg_quality=90))
    d = r["pixels"].astype(float) - px.astype(float)
    psnr = 10 * np.log10(255.0 ** 2 / max((d ** 2).mean(), 1e-9))
    assert psnr > 30


def test_pdf_indexed_palette():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (17, 3), np.uint8)
    idx = rng.integers(0, 17, (30, 40)).astype(np.uint8)
    r = read_pdf(encode_pdf(idx, palette=pal))
    assert (r["pixels"] == pal[idx]).all()


def test_pdf_open_raster_probe():
    from gdal_ray.sources.raster_open import open_raster

    px, gt = _byte()
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(encode_pdf(px, gt=gt, epsg=26711))
        name = f.name
    r = open_raster(name)
    assert r["driver"] == "PDF"
    assert checksum_image(r["pixels"]) == 4672


def test_pdf_not_a_pdf():
    with pytest.raises(ValueError, match="not a PDF"):
        read_pdf(b"hello")
