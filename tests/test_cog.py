"""COG layout writer/reader: ghost area, IFDs-before-data, overview
chain, leader/trailer blocks, cross-check with the plain TIFF reader."""

import struct

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.cog import (cog_level_count, cog_structural_metadata,
                                  decode_cog, encode_cog, reduce2_average)
from gdal_ray.sources.tiff import decode_tiff, tiff_epsg


def _pyramid(px, tile):
    levels = [px]
    while max(levels[-1].shape[:2]) > tile:
        levels.append(reduce2_average(levels[-1]))
    return levels


def test_roundtrip_all_levels_gray():
    rng = np.random.default_rng(3)
    px = (rng.random((700, 520)) * 255).astype(np.uint8)
    gt = (1000.0, 10.0, 0.0, 2000.0, 0.0, -10.0)
    blob = encode_cog(px, gt=gt, tile=128, epsg=32631)
    levels = _pyramid(px, 128)
    assert cog_level_count(blob) == len(levels)
    for li, lv in enumerate(levels):
        got, ggt = decode_cog(blob, li)
        np.testing.assert_array_equal(got, lv)
        if li == 0:
            assert ggt == gt
    with pytest.raises(IndexError):
        decode_cog(blob, len(levels))


def test_roundtrip_rgb_and_float():
    rng = np.random.default_rng(4)
    rgb = (rng.random((300, 300, 3)) * 255).astype(np.uint8)
    blob = encode_cog(rgb, tile=256)
    got, _ = decode_cog(blob, 0)
    np.testing.assert_array_equal(got, rgb)
    ov, _ = decode_cog(blob, 1)
    np.testing.assert_array_equal(ov, reduce2_average(rgb))

    f = rng.random((260, 200)).astype(np.float32)
    got, _ = decode_cog(encode_cog(f, tile=256), 0)
    np.testing.assert_array_equal(got, f)


def test_ghost_area_exact_strings():
    blob = encode_cog(np.zeros((64, 64), np.uint8), tile=64)
    md = cog_structural_metadata(blob)
    assert md == {
        "LAYOUT": "IFDS_BEFORE_DATA",
        "BLOCK_ORDER": "ROW_MAJOR",
        "BLOCK_LEADER": "SIZE_AS_UINT4",
        "BLOCK_TRAILER": "LAST_4_BYTES_REPEATED",
        "KNOWN_INCOMPATIBLE_EDITION": "NO",
    }
    # the size header is the reference's exact %06d format
    assert blob[8:38].startswith(b"GDAL_STRUCTURAL_METADATA_SIZE=")


def test_leader_and_trailer_bytes():
    px = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    blob = encode_cog(px, tile=64, compression="none")
    got, _ = decode_cog(blob, 0)
    np.testing.assert_array_equal(got, px)
    # locate the single tile: leader 4 bytes before, trailer repeats last 4
    import gdal_ray.sources.cog as cogmod
    tags = list(cogmod._walk_ifds(blob))[0]
    off, cnt = tags[324][0], tags[325][0]
    assert struct.unpack("<I", blob[off - 4:off])[0] == cnt
    assert blob[off + cnt:off + cnt + 4] == blob[off + cnt - 4:off + cnt]


def test_level0_reads_through_plain_tiff_reader():
    rng = np.random.default_rng(5)
    px = (rng.random((200, 300)) * 255).astype(np.uint8)
    gt = (5.0, 2.0, 0.0, 90.0, 0.0, -2.0)
    blob = encode_cog(px, gt=gt, tile=128, epsg=4326)
    got, ggt = decode_tiff(blob)
    np.testing.assert_array_equal(got, px)
    assert tuple(ggt) == gt
    assert tiff_epsg(blob) == 4326


def test_byte_fixture_checksum_through_cog():
    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as f:
        px, gt = decode_tiff(f.read())
    blob = encode_cog(px, gt=gt, tile=256)
    got, _ = decode_cog(blob, 0)
    assert checksum_image(got) == 4672
    assert cog_level_count(blob) == 1  # 20x20 fits one tile