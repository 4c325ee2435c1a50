"""JPEG2000 decoder (functions/jp2k.py) vs the reference's own
published fixture checksums (autotest/gdrivers/jp2openjpeg.py,
jp2kak.py) — every value below is the reference's own assertion."""

import glob
import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.jp2k import decode_jp2

D = "/root/reference/autotest/gdrivers/data/jpeg2000/"

PUBLISHED = [
    # (file, band, checksum, source assertion)
    ("byte.jp2", 0, 50054),            # jp2openjpeg.py:76
    ("int16.jp2", 0, 4587),            # jp2kak.py:53
    ("byte_tile_2048.jp2", 0, 4610),   # jp2openjpeg.py:3059
    ("tile_size_16.jp2", 0, 44216),    # jp2openjpeg.py:3688
    ("3_13bit_and_1bit.jp2", 0, 64570),  # jp2openjpeg.py:233
    ("3_13bit_and_1bit.jp2", 1, 57277),
    ("3_13bit_and_1bit.jp2", 2, 56048),
    ("3_13bit_and_1bit.jp2", 3, 61292),
]


@pytest.mark.parametrize("fname,band,want", PUBLISHED,
                         ids=[f"{f}:{b}" for f, b, _ in PUBLISHED])
def test_published_checksums(fname, band, want):
    px, info = decode_jp2(open(D + fname, "rb").read())
    b = px if px.ndim == 2 else px[:, :, band]
    assert checksum_image(b) == want


def test_lossless_roundtrips_byte_exact():
    # reversible 5/3 decodes must equal the canonical byte.tif
    from gdal_ray.sources.tiff import decode_tiff

    ref, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/byte.tif", "rb").read())
    for f in ("byte_lossless_openjp2_golden.jp2", "int16_lossless.jp2",
              "byte_one_poc.j2k"):
        px, _ = decode_jp2(open(D + f, "rb").read())
        assert np.array_equal(np.asarray(px, np.int32),
                              ref.astype(np.int32)), f


def test_13bit_dtype_and_mct():
    px, info = decode_jp2(open(D + "3_13bit_and_1bit.jp2", "rb").read())
    assert px.dtype == np.uint16
    assert info["mct"] == 1 and info["depths"] == [13, 13, 13, 1]
    assert px[:, :, 3].max() <= 1


def test_fixture_sweep_no_crashes():
    """Every well-formed jp2/j2k fixture decodes; the deliberately
    broken ones (truncated, >31-bit dims) raise cleanly."""
    ok = 0
    for p in sorted(glob.glob(D + "*.jp2") + glob.glob(D + "*.j2k")):
        name = os.path.basename(p)
        if name == "single_block_32769_16385.jp2":
            continue        # decodes (537 Mpx single block) but slow
        if name in ("dimensions_above_31bit.jp2", "truncated.jp2",
                    "small_world_truncated.jp2"):
            with pytest.raises((ValueError, IndexError, MemoryError)):
                decode_jp2(open(p, "rb").read())
            continue
        px, info = decode_jp2(open(p, "rb").read())
        assert px.shape[0] == info["height"]
        assert px.shape[1] == info["width"]
        ok += 1
    assert ok >= 30


def test_multi_tile_and_sizes():
    px, _ = decode_jp2(open(D + "513x513.jp2", "rb").read())
    assert px.shape == (513, 513)
    px, _ = decode_jp2(open(D + "uint32_2x2_lossless_nbits_20.j2k",
                            "rb").read())
    assert px.shape == (2, 2)


def test_reduced_resolution_published_overviews():
    # jp2openjpeg.py:3650 (513x513 overview 29642) and :3689
    # (tile_size_16 overview 61711)
    px, info = decode_jp2(open(D + "513x513.jp2", "rb").read(),
                          reduce=1)
    assert px.shape == (257, 257)
    assert checksum_image(px) == 29642
    px, _ = decode_jp2(open(D + "tile_size_16.jp2", "rb").read(),
                       reduce=1)
    assert px.shape == (128, 128)
    assert checksum_image(px) == 61711
    # reduce on a lossless file halves dims per step
    px, _ = decode_jp2(open(D + "byte.jp2", "rb").read(), reduce=2)
    assert px.shape == (25, 25)


def test_encoder_lossless_roundtrips():
    """The write path (reversible 5/3, LRCP single layer): decode of
    our encode is bit-identical across dtypes, odd sizes,
    multi-code-block bands and RGB."""
    from gdal_ray.functions.jp2k import (decode_j2k, decode_jp2,
                                         encode_j2k, encode_jp2)

    rng = np.random.default_rng(7)
    for a, lv in [
        (np.arange(64, dtype=np.uint8).reshape(8, 8), 1),
        (rng.integers(0, 256, (70, 90)).astype(np.uint8), 3),
        (rng.integers(0, 256, (130, 150)).astype(np.uint8), 1),
        (rng.integers(0, 65535, (40, 60)).astype(np.uint16), 2),
        ((rng.integers(0, 65535, (30, 30)) - 32768).astype(np.int16),
         2),
    ]:
        back, _ = decode_j2k(encode_j2k(a, levels=lv))
        assert np.array_equal(back[0], a)
    rgb = rng.integers(0, 256, (50, 66, 3)).astype(np.uint8)
    px, _ = decode_jp2(encode_jp2(rgb, levels=2))
    assert np.array_equal(px, rgb)


def test_encoder_reference_fixtures_roundtrip():
    """CreateCopy parity shape (jp2openjpeg_4/_5): the reference's
    own byte/int16 content encodes+decodes to its published
    checksum."""
    from gdal_ray.functions.jp2k import decode_jp2, encode_jp2
    from gdal_ray.sources.tiff import decode_tiff

    for name, cs in (("byte.tif", 4672), ("int16.tif", 4672)):
        src, _ = decode_tiff(open(
            f"/root/reference/autotest/gcore/data/{name}", "rb").read())
        px, _ = decode_jp2(encode_jp2(src, levels=2))
        assert checksum_image(px) == cs
    sw, _ = decode_tiff(open(
        "/root/reference/autotest/gdrivers/data/small_world.tif",
        "rb").read())
    px, _ = decode_jp2(encode_jp2(sw, levels=3))
    assert [checksum_image(px[:, :, b]) for b in range(3)] == \
        [30111, 32302, 40026]


def test_mq_encoder_decoder_fuzz():
    from gdal_ray.functions.jp2k import MQDecoder, MQEncoder

    for seed in range(8):
        rng = np.random.default_rng(seed)
        n = 8000
        p = rng.uniform(0.02, 0.98)
        bits = (rng.random(n) < p).astype(int).tolist()
        ctxs = rng.integers(0, 19, n).tolist()
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == bits, seed


def test_open_raster_jp2_geojp2():
    """JP2 rides the unified open probe: pixels via the decoder,
    georef from the GeoJP2 uuid box (the published byte.jp2 facts)."""
    from gdal_ray.sources.raster_open import open_raster

    r = open_raster(D + "byte.jp2")
    assert r["driver"] == "JP2OpenJPEG"
    assert checksum_image(r["pixels"]) == 50054
    assert r["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert r["epsg"] == 26711
    # world-file georef fallback for nogeoref + .j2w
    r2 = open_raster(D + "byte_nogeoref.jp2")
    assert checksum_image(r2["pixels"]) == 4940


# ------------------------------------------------------- lossy 9/7 encoder


def test_lossy_roundtrip_psnr_gate():
    """VERDICT r4 directive #5: encode->decode PSNR >= 40 dB at the
    GDAL JP2OpenJPEG default QUALITY=25 on the reference's own
    byte/rgbsmall fixtures (jp2openjpeg.py lossy CreateCopy cases)."""
    from gdal_ray.functions.jp2k import decode_jp2, encode_jp2_lossy
    from gdal_ray.sources.tiff import decode_tiff

    for name in ("byte.tif", "rgbsmall.tif"):
        src, _ = decode_tiff(open(
            f"/root/reference/autotest/gcore/data/{name}", "rb").read())
        arr = src.astype(np.uint8)
        dec, info = decode_jp2(encode_jp2_lossy(arr, quality=25.0))
        assert dec.shape == arr.shape
        err = dec.astype(np.float64) - arr.astype(np.float64)
        mse = float(np.mean(err * err))
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
        assert psnr >= 40.0, (name, psnr)


def test_lossy_quality_monotone():
    """Higher QUALITY -> finer quantization -> higher PSNR and more
    bytes; QUALITY approaching 100 approaches lossless."""
    from gdal_ray.functions.jp2k import decode_jp2, encode_jp2_lossy
    from gdal_ray.sources.tiff import decode_tiff

    src, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/utmsmall.tif", "rb").read())
    arr = src.astype(np.uint8)
    stats = []
    for q in (10.0, 25.0, 60.0, 95.0):
        blob = encode_jp2_lossy(arr, quality=q)
        dec, _ = decode_jp2(blob)
        err = dec.astype(np.float64) - arr.astype(np.float64)
        mse = float(np.mean(err * err))
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
        stats.append((psnr, len(blob)))
    psnrs = [s[0] for s in stats]
    assert psnrs == sorted(psnrs)
    assert stats[-1][0] >= 70.0


def test_fdwt97_inverts_idwt():
    from gdal_ray.functions.jp2k import _dwt97_1d, _fdwt97_1d

    rng = np.random.default_rng(3)
    x = rng.uniform(-128, 128, (33, 7)).astype(np.float32)
    back = _dwt97_1d(_fdwt97_1d(x, 0), 0)
    assert np.abs(back - x).max() < 1e-3


def test_tile_sink_jp2_codec(ray_session, tmp_path):
    """write_tiles(codec='jp2') stores JP2 payloads that decode back
    within the lossy gate."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.codecs import encode_image
    from gdal_ray.functions.jp2k import decode_jp2
    from gdal_ray.stages.tiling import write_tiles

    rng = np.random.default_rng(1)
    tiles = []
    for k in range(3):
        px = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        tiles.append({"z": 2, "tile_key": k, "n_valid": 32 * 32,
                      "checksum": checksum_image(px),
                      "pixels": encode_image(px, "raw")})
    ds = ray.data.from_items(tiles)
    out = str(tmp_path / "tiles_jp2")
    stats = write_tiles(ds, out, codec="jp2:60")
    assert stats["n_tiles"] == 3
    import glob
    files = glob.glob(f"{out}/part-*.parquet")
    assert files
    t = pa.concat_tables(pq.read_table(f) for f in files)
    assert set(t["codec"].to_pylist()) == {"jp2"}
    for blob in t["pixels"].to_pylist():
        px, _ = decode_jp2(blob)
        assert px.shape == (32, 32, 3)
