"""RasterLite2 driver conformance vs the reference's own fixtures
(autotest/gdrivers/rl2.py, data/rasterlite2/*.rl2) plus write
roundtrips matching its CreateCopy tests (test_rl2_6..14)."""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.raster_open import open_raster
from gdal_ray.sources.rasterlite2 import read_rl2, rl2_subdatasets, \
    write_rl2

D = "/root/reference/autotest/gdrivers/data/rasterlite2/"
G = "/root/reference/autotest/gcore/data/"


def _cs(px, band=0):
    return checksum_image(px if px.ndim == 2 else px[:, :, band])


def test_rl2_byte_gray():
    # test_rl2_2: gray DEFLATE coverage + section-pyramid overview
    r = read_rl2(D + "byte.rl2")
    assert _cs(r["pixels"]) == 4672
    assert r["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert r["epsg"] == 26711
    assert r["pixels"].min() == 74
    assert r["overviews"] == []          # all pyramid dims < 64
    assert rl2_subdatasets(D + "byte.rl2") == []
    r = read_rl2(D + "byte.rl2", show_all_pyramids=True)
    assert [(o[2], o[3]) for o in r["overviews"]] == \
        [(10, 10), (5, 5), (3, 3)]
    o0 = read_rl2(D + "byte.rl2", overview=0, show_all_pyramids=True)
    assert _cs(o0["pixels"]) == 1087


def test_rl2_rgb_jpeg_sections():
    # test_rl2_3: JPEG RGB, two sections, DCT-scaled overviews
    r = read_rl2(D + "small_world.rl2")
    assert _cs(r["pixels"], 0) == 25550
    assert _cs(r["pixels"], 1) == 28146
    assert len(r["overviews"]) == 2
    o1 = read_rl2(D + "small_world.rl2", overview=1)
    assert _cs(o1["pixels"], 0) == 51412
    subs = rl2_subdatasets(D + "small_world.rl2")
    assert [s[0].split(":", 2)[2] for s in subs] == \
        ["small_world:1:world_west", "small_world:2:world_east"]
    s1 = read_rl2(D + "small_world.rl2", section_id=1)
    assert _cs(s1["pixels"], 0) == 3721
    assert len(s1["overviews"]) == 1
    s1o = read_rl2(D + "small_world.rl2", section_id=1, overview=0)
    assert _cs(s1o["pixels"], 0) == 35686


def test_rl2_palette():
    # test_rl2_4: paletted coverage + pick-decimated overview
    r = read_rl2(D + "small_world_pct.rl2")
    assert _cs(r["pixels"]) == 14890
    assert r["palette"] is not None
    assert tuple(r["palette"][1]) == (176, 184, 176)
    o0 = read_rl2(D + "small_world_pct.rl2", overview=0)
    assert _cs(o0["pixels"]) == 35614


def test_rl2_multi_type():
    # test_rl2_5: one DB, 11 coverages across every sample type
    subs = rl2_subdatasets(D + "multi_type.rl2")
    assert [s[0].split(":")[-1] for s in subs] == \
        ["uint8", "int8", "uint16", "int16", "uint32", "int32",
         "float", "double", "1bit", "2bit", "4bit"]
    exp = {"uint8": (np.uint8, 4672), "int8": (np.int8, 4575),
           "uint16": (np.uint16, 4457), "int16": (np.int16, 4457),
           "uint32": (np.uint32, 4457), "int32": (np.int32, 4457),
           "float": (np.float32, 4457), "double": (np.float64, 4457),
           "1bit": (np.uint8, 4873)}
    for cov, (dt, cs) in exp.items():
        r = read_rl2(D + "multi_type.rl2", coverage=cov)
        assert r["pixels"].dtype == dt, cov
        assert _cs(r["pixels"]) == cs, cov


def test_rl2_unified_open():
    r = open_raster(D + "byte.rl2")
    assert _cs(r["pixels"]) == 4672
    r = open_raster(
        f"RASTERLITE2:{D}small_world.rl2:small_world:1:world_west")
    assert _cs(r["pixels"], 0) == 3721


@pytest.mark.parametrize("name,comp,cs", [
    ("byte.tif", "DEFLATE", 4672),
    ("uint16.tif", "DEFLATE", 4672),
    ("int16.tif", "DEFLATE", 4672),
    ("uint32.tif", "DEFLATE", 4672),
    ("int32.tif", "DEFLATE", 4672),
    ("float32.tif", "DEFLATE", 4672),
    ("float64.tif", "DEFLATE", 4672),
])
def test_rl2_write_roundtrip(tmp_path, name, comp, cs):
    # CreateCopy parity (test_rl2_6/9..14): lossless roundtrip
    src = open_raster(os.path.join(G, name))
    out = str(tmp_path / (name + ".rl2"))
    write_rl2(out, src["pixels"], src["gt"], src["epsg"] or 4326,
              compression=comp)
    back = read_rl2(out)
    assert _cs(back["pixels"]) == cs
    assert back["pixels"].dtype == src["pixels"].dtype
    assert np.allclose(back["gt"], src["gt"])


def test_rl2_write_rgb_png(tmp_path):
    # test_rl2_7: RGB with COMPRESS=PNG
    src = open_raster(
        "/root/reference/autotest/gdrivers/data/small_world.tif")
    out = str(tmp_path / "sw.rl2")
    write_rl2(out, src["pixels"], src["gt"], 4326, compression="PNG")
    back = read_rl2(out)
    assert _cs(back["pixels"], 0) == 30111
    assert np.array_equal(back["pixels"], src["pixels"])


def test_jpeg_scaled_decode_dims():
    # libjpeg scale_denom contract: ceil(dim/denom), content = the
    # reduced-IDCT render (bit-exactness is pinned by the rl2
    # overview checksums above)
    from gdal_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    px = rng.integers(0, 255, (65, 130, 3), np.uint8)
    data = encode_jpeg(px, quality=90)
    for d in (2, 4, 8):
        sm = decode_jpeg(data, scale_denom=d)
        assert sm.shape == (-(-65 // d), -(-130 // d), 3)
    full = decode_jpeg(data)
    half = decode_jpeg(data, scale_denom=2).astype(np.int32)
    # the 1/2 render approximates 2x2 averaging of the full render
    avg = full[:64].reshape(32, 2, 65, 2, 3).mean(axis=(1, 3))
    assert np.abs(half[:32, :65] - avg).mean() < 6.0
