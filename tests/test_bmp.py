"""BMP driver vs the reference's own fixtures
(autotest/gcore/bmp_read.py init_list checksums)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.bmp import decode_bmp, encode_bmp

G = "/root/reference/autotest/gcore/data"


@pytest.mark.parametrize("fn,exp,npal", [
    ("1bit.bmp", 200, 2),
    ("4bit_pal.bmp", 2587, 16),
    ("8bit_pal.bmp", 4672, 256),
    ("byte_rle8.bmp", 4672, 256),
])
def test_paletted_goldens(fn, exp, npal):
    with open(f"{G}/{fn}", "rb") as fh:
        px, pal = decode_bmp(fh.read())
    assert px.dtype == np.uint8
    assert checksum_image(px) == exp
    assert pal is not None and len(pal) == npal


def test_rgb_golden():
    # bmp_read.py: bmp/red_rgb_1x1.bmp band 1 checksum 3 (pure red)
    with open(f"{G}/bmp/red_rgb_1x1.bmp", "rb") as fh:
        px, pal = decode_bmp(fh.read())
    assert pal is None and px.shape == (1, 1, 3)
    assert checksum_image(px[:, :, 0]) == 3
    assert tuple(px[0, 0]) == (255, 0, 0)


@pytest.mark.parametrize("shape", [(37, 23), (8, 8), (5, 17)])
def test_gray_roundtrip(shape):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    back, pal = decode_bmp(encode_bmp(a))
    assert np.array_equal(back, a)
    assert np.array_equal(pal, np.repeat(
        np.arange(256, dtype=np.uint8)[:, None], 3, axis=1))


def test_rgb_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (11, 13, 3)).astype(np.uint8)
    back, pal = decode_bmp(encode_bmp(rgb))
    assert pal is None and np.array_equal(back, rgb)


def test_paletted_roundtrip():
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    back, pback = decode_bmp(encode_bmp(idx, pal))
    assert np.array_equal(back, idx)
    assert np.array_equal(pback[:3], pal)


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import gt_to_worldfile, open_raster

    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    p = tmp_path / "x.bmp"
    p.write_bytes(encode_bmp(arr))
    (tmp_path / "x.wld").write_text(
        gt_to_worldfile((100.0, 10.0, 0.0, 200.0, 0.0, -10.0)))
    r = open_raster(str(p))
    assert r["driver"] == "BMP"
    assert np.array_equal(np.asarray(r["pixels"]), arr)
    assert r["gt"] == (100.0, 10.0, 0.0, 200.0, 0.0, -10.0)
    assert r["palette"] is not None
