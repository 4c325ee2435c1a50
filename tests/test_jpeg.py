"""Baseline JPEG codec conformance: round-trip quality on the corpus,
interop decode of the reference's own libjpeg-produced fixtures
(autotest/gdrivers/data/jpeg/), color-space and subsampling paths."""

import numpy as np
import pytest

from gdal_ray.functions.codecs import decode_image, encode_image, psnr
from gdal_ray.functions.jpeg import decode_jpeg, encode_jpeg

JDATA = "/root/reference/autotest/gdrivers/data/jpeg"


def test_gray_roundtrip_high_quality():
    g = (np.arange(64 * 48).reshape(48, 64) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (48, 64)
    assert psnr(g, out) > 45


def test_rgb_roundtrip_odd_dimensions():
    """Non-multiple-of-8 sizes pad on encode, crop on decode."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (37, 51, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=98))
    assert out.shape == (37, 51, 3)
    assert psnr(px, out) > 30  # pure noise: hardest possible content


def test_corpus_jpeg_rows_are_real_jfif_above_psnr_gate():
    """The corpus 'jpeg' rows are real JFIF bytes (SOI/EOI markers)
    and hold the >=40 dB per-row invariant from BASELINE.json."""
    from gdal_ray.sources.images import image_fmt, image_pixels

    for idx in (1, 3, 5, 7):  # sizes 100/512 alternating
        assert image_fmt(idx) == "jpeg"
        px = image_pixels(idx)
        blob = encode_image(px, "jpeg")
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        out = decode_image(blob)
        assert out.shape == px.shape
        assert psnr(px, out) >= 40.0


def test_legacy_jq5_payloads_still_decode():
    from gdal_ray.functions.codecs import _decode_jq, _encode_jq

    px = (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 256).astype(np.uint8)
    out = decode_image(_encode_jq(px))
    assert psnr(px, _decode_jq(_encode_jq(px))) > 40
    assert out.shape == px.shape


def test_interop_rgbsmall_rgb_jpeg_vs_lossless_tiff():
    """Decode a REAL libjpeg-produced file (RGB color space, Adobe
    APP14 transform=0) and compare against the lossless TIFF original
    of the same scene — quality-75 JPEG should land ~31 dB; a broken
    transform or layout lands < 20."""
    from gdal_ray.sources.tiff import decode_tiff

    out = decode_jpeg(open(f"{JDATA}/rgbsmall_rgb.jpg", "rb").read())
    ref = decode_tiff(
        open("/root/reference/autotest/gcore/data/rgbsmall.tif", "rb").read())
    px = np.asarray(ref[0] if isinstance(ref, tuple) else ref)
    if px.ndim == 3 and px.shape[0] == 3:
        px = px.transpose(1, 2, 0)
    assert out.shape == px.shape
    assert psnr(px.astype(np.uint8), out) > 30


def test_interop_albania_420_subsampled():
    """4:2:0 YCbCr decode of the reference's albania.jpg fixture."""
    out = decode_jpeg(open(f"{JDATA}/albania.jpg", "rb").read())
    assert out.shape == (260, 361, 3)
    # plausible natural-image stats, not garbage
    assert 60 < out.mean() < 120
    assert out.std() > 20


def test_non_baseline_raises():
    with pytest.raises(NotImplementedError):
        decode_jpeg(open(f"{JDATA}/12bit_rose_extract.jpg", "rb").read())


def test_restart_interval_roundtrip():
    """DRI/RSTn segmented streams: encoder emits RSTn markers with DC
    predictor resets; the decoder's per-segment path reproduces the
    unsegmented result exactly."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (48, 80, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(px, quality=97))
    seg = encode_jpeg(px, quality=97, restart_interval=3)
    assert b"\xff\xdd" in seg  # DRI present
    out = decode_jpeg(seg)
    assert np.array_equal(plain, out)
