"""GIF driver vs the reference's own fixtures
(autotest/gdrivers/gif.py: bug407 57921, colormap entries, byte.tif
CreateCopy 4672)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.gif import decode_gif, encode_gif

BUG407 = "/root/reference/autotest/gdrivers/data/gif/bug407.gif"


def test_bug407_golden():
    # gif.py test_gif_1: band 1 checksum 57921
    with open(BUG407, "rb") as fh:
        img, pal, meta = decode_gif(fh.read())
    assert img.shape == (400, 400)
    assert checksum_image(img) == 57921
    # gif.py test_gif_4: 16-entry colormap, pinned first two entries,
    # no transparency, background 0
    assert len(pal) == 16
    assert tuple(pal[0]) == (255, 255, 255)
    assert tuple(pal[1]) == (255, 255, 208)
    assert "transparent" not in meta
    assert meta["background"] == 0


def test_byte_createcopy_golden():
    # gif.py test_gif_2/5: byte.tif -> GIF -> checksum stays 4672
    from gdal_ray.sources.tiff import decode_tiff

    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as fh:
        band = decode_tiff(fh.read())[0]
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    img, pback, _ = decode_gif(encode_gif(band, pal))
    assert np.array_equal(img, band)
    assert checksum_image(img) == 4672


@pytest.mark.parametrize("shape", [(37, 23), (1, 1), (300, 7)])
def test_roundtrip(shape):
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, shape).astype(np.uint8)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    img, _, _ = decode_gif(encode_gif(a, pal))
    assert np.array_equal(img, a)


def test_small_palette_roundtrip():
    # 3-color palette -> 2-bit color table, min LZW code size 2
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 0]], np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    img, pback, _ = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(img, idx)
    assert np.array_equal(pback[:3], pal)


def test_dictionary_reset_path():
    # enough distinct pairs to push next_code past 4095 and force the
    # giflib clear+reset flow in both encoder and decoder
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (120, 120)).astype(np.uint8)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    img, _, _ = decode_gif(encode_gif(a, pal))
    assert np.array_equal(img, a)


def test_open_raster_probe(tmp_path):
    from gdal_ray.sources.raster_open import gt_to_worldfile, open_raster

    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    p = tmp_path / "x.gif"
    p.write_bytes(encode_gif(arr, pal))
    (tmp_path / "x.wld").write_text(
        gt_to_worldfile((100.0, 10.0, 0.0, 200.0, 0.0, -10.0)))
    r = open_raster(str(p))
    assert r["driver"] == "GIF"
    assert np.array_equal(np.asarray(r["pixels"]), arr)
    assert r["gt"] == (100.0, 10.0, 0.0, 200.0, 0.0, -10.0)
