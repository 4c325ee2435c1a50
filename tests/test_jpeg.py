"""Baseline JPEG codec conformance: round-trip quality on the corpus,
interop decode of the reference's own libjpeg-produced fixtures
(autotest/gdrivers/data/jpeg/), color-space and subsampling paths."""

import numpy as np
import pytest

from gdal_ray.functions.codecs import decode_image, encode_image, psnr
from gdal_ray.functions import jpeg
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


def test_interop_albania_420_subsampled_bit_exact():
    """4:2:0 YCbCr decode of the reference's albania.jpg fixture is
    BIT-EXACT with libjpeg 6b: autotest/gdrivers/jpeg.py test_jpeg_1
    pins band-2 checksum 17016 for the non-9b/8 libjpeg (the islow
    IDCT + fancy upsampling + fixed-point YCbCr this codec ports)."""
    from gdal_ray.functions.checksum import checksum_image

    out = decode_jpeg(open(f"{JDATA}/albania.jpg", "rb").read())
    assert out.shape == (260, 361, 3)
    assert checksum_image(out[:, :, 1].astype(np.float64)) == 17016


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


def test_fast_scan_encoder_bit_identical_to_serial():
    """_encode_scan_fast must produce byte-identical streams to the
    per-symbol reference encoder, across restart intervals."""
    rng = np.random.default_rng(123)
    for shape, ri in [((64, 56, 3), 0), ((72, 72, 3), 3), ((40, 40), 1)]:
        px = rng.normal(128, 40, shape).clip(0, 255).astype(np.uint8)
        if px.ndim == 2:
            planes = [px.astype(np.float64)]
        else:
            r, g, b = (px[..., i].astype(np.float64) for i in range(3))
            planes = [0.299 * r + 0.587 * g + 0.114 * b,
                      -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0,
                      0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0]
        qlum, qchrom = jpeg._quality_tables(85)
        qtabs = [qlum] + [qchrom] * (len(planes) - 1)
        comp_zz = []
        for plane, qt in zip(planes, qtabs):
            blocks, _, _ = jpeg._to_blocks(plane - 128.0)
            qc = np.round(jpeg._fdct_blocks(blocks).reshape(-1, 64)
                          / qt[None, :]).astype(np.int64)
            comp_zz.append(qc[:, jpeg.ZIGZAG])
        tables = [0] + [1] * (len(planes) - 1)
        assert (jpeg._encode_scan(comp_zz, tables, ri)
                == jpeg._encode_scan_fast(comp_zz, tables, ri))


def test_lockstep_decoder_matches_serial_decoder():
    """Restart-segment lockstep decode must yield the same pixels as the
    serial symbol loop (ri=0 stream of the same quantized coefficients)."""
    rng = np.random.default_rng(321)
    px = rng.normal(128, 48, (96, 104, 3)).clip(0, 255).astype(np.uint8)
    with_rst = jpeg.encode_jpeg(px, quality=88, restart_interval=2)
    without = jpeg.encode_jpeg(px, quality=88, restart_interval=0)
    assert np.array_equal(jpeg.decode_jpeg(with_rst), jpeg.decode_jpeg(without))
    # corpus configuration: flat tables + auto restart interval
    flat = (np.full(64, 5, np.int64), np.full(64, 4, np.int64))
    auto = jpeg.encode_jpeg(px, quant_tables=flat, restart_interval="auto")
    plain = jpeg.encode_jpeg(px, quant_tables=flat)
    assert np.array_equal(jpeg.decode_jpeg(auto), jpeg.decode_jpeg(plain))


def test_batched_decode_matches_single():
    """decode_jpeg_batch merges many images' restart lanes into one
    state machine; pixels must equal per-image decode for mixed sizes,
    tables and subsampling, in input order."""
    rng = np.random.default_rng(99)
    blobs = []
    for shape, q in (((64, 64, 3), 90), ((40, 56), 75), ((100, 100, 3), 85),
                     ((16, 16, 3), 92), ((33, 47), 60)):
        px = rng.normal(128, 40, shape).clip(0, 255).astype(np.uint8)
        blobs.append(jpeg.encode_jpeg(px, quality=q, restart_interval="auto"))
    # a no-restart member exercises the single-lane merge path
    px = rng.normal(128, 40, (48, 48, 3)).clip(0, 255).astype(np.uint8)
    blobs.append(jpeg.encode_jpeg(px, quality=88, restart_interval=0))
    singles = [jpeg.decode_jpeg(b) for b in blobs]
    batched = jpeg.decode_jpeg_batch(blobs)
    assert len(batched) == len(singles)
    for a, b in zip(singles, batched):
        assert np.array_equal(a, b)


def test_batched_decode_chunking_cap():
    """More merged lanes than MAX_LANES: the batch splits into chunks
    and still matches (exercises the chunk-flush boundary)."""
    rng = np.random.default_rng(7)
    pxs = [rng.normal(128, 40, (80, 80, 3)).clip(0, 255).astype(np.uint8)
           for _ in range(8)]
    blobs = [jpeg.encode_jpeg(p, quality=85, restart_interval=1)
             for p in pxs]  # 100 lanes each
    singles = [jpeg.decode_jpeg(b) for b in blobs]
    batched = jpeg.decode_jpeg_batch(blobs)
    for a, b in zip(singles, batched):
        assert np.array_equal(a, b)


def test_decode_images_mixed_formats_preserve_order():
    from gdal_ray.functions.codecs import decode_images, encode_image

    rng = np.random.default_rng(11)
    pxs = [rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
           for _ in range(6)]
    fmts = ["png", "jpeg", "raw", "jpeg", "png", "jpeg"]
    blobs = [encode_image(p, f) for p, f in zip(pxs, fmts)]
    outs = decode_images(blobs)
    for px, out, fmt in zip(pxs, outs, fmts):
        assert out.shape == px.shape
        if fmt != "jpeg":
            assert np.array_equal(out, px)
        else:
            from gdal_ray.functions.codecs import psnr
            assert psnr(px, out) > 25.0
