"""OpenEXR driver vs reference autotest/gdrivers/exr.py.

The reference's CreateCopy matrix re-expressed through the engine's
writer+reader: every dtype round-trips to checksum 4672, the RGB
HALF auto-rescale path reproduces the exact [12852, 12226, 10731]
tiled goldens (checksums of the [0,1] Float32 bands GDAL exposes),
and AUTO_RESCALE=NO keeps the source checksums."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.exr import encode_exr, read_exr
from gdal_ray.sources.tiff import decode_tiff

GCORE = "/root/reference/autotest/gcore/data"
SW = "/root/reference/autotest/gdrivers/data/small_world.tif"


def _tif(name):
    return decode_tiff(open(f"{GCORE}/{name}", "rb").read())


@pytest.mark.parametrize("comp", ["zip", "zips", "rle", "none"])
@pytest.mark.parametrize("ptype", ["HALF", "FLOAT", "UINT"])
def test_exr_byte_matrix(comp, ptype):
    """test_exr_byte_createcopy{,_pixel_type_*} + compression tests."""
    px, gt = _tif("byte.tif")
    r = read_exr(encode_exr(px, gt=gt, compression=comp,
                            pixel_type=ptype))
    assert checksum_image(r["pixels"]) == 4672
    assert r["gt"] == gt
    assert r["compression"] == comp.upper()


@pytest.mark.parametrize("name", ["uint16.tif", "uint32.tif",
                                  "float32.tif", "float64.tif"])
def test_exr_dtypes(name):
    """test_exr_{uint16,uint32,float32,float64}_createcopy."""
    px, _ = _tif(name)
    assert checksum_image(read_exr(encode_exr(px))["pixels"]) == 4672


def test_exr_rgb_byte_tiled_golden():
    """test_exr_rgb_byte_tiled: AUTO_RESCALE'd HALF RGB reads back as
    [0,1] Float32 with the reference's exact checksums."""
    sw, gt = decode_tiff(open(SW, "rb").read())
    r = read_exr(encode_exr(sw, gt=gt, tiled=True, tile_w=64,
                            tile_h=32))
    assert [checksum_image(r["pixels"][:, :, b]) for b in range(3)] \
        == [12852, 12226, 10731]
    assert r["pixels"].dtype == np.float32


def test_exr_rgb_no_auto_rescale():
    """test_exr_rgb_byte_strip_no_auto_rescale."""
    sw, _ = decode_tiff(open(SW, "rb").read())
    r = read_exr(encode_exr(sw, auto_rescale=False))
    assert [checksum_image(r["pixels"][:, :, b]) for b in range(3)] \
        == [checksum_image(sw[:, :, b]) for b in range(3)]


def test_exr_tiled_edge_tiles():
    """test_exr_tiling_custom_tile_size analog: 13x15 tiles on 20x20."""
    px, _ = _tif("byte.tif")
    r = read_exr(encode_exr(px, tiled=True, tile_w=13, tile_h=15))
    assert checksum_image(r["pixels"]) == 4672


def test_exr_rgba_and_georef():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (21, 17, 4), np.uint8)
    gt = (10.0, 0.5, 0.0, 20.0, 0.0, -0.5)
    r = read_exr(encode_exr(img, gt=gt, wkt="EPSG:4326",
                            auto_rescale=False))
    assert r["pixels"].shape == (21, 17, 4)
    assert np.allclose(r["pixels"], img)
    assert r["gt"] == gt
    assert r["wkt"] == "EPSG:4326"


def test_exr_open_raster_probe():
    import tempfile

    from gdal_ray.sources.raster_open import open_raster

    px, gt = _tif("byte.tif")
    with tempfile.NamedTemporaryFile(suffix=".exr", delete=False) as f:
        f.write(encode_exr(px, gt=gt))
        name = f.name
    r = open_raster(name)
    assert r["driver"] == "EXR"
    assert checksum_image(r["pixels"]) == 4672


def test_exr_unsupported_compression_raises():
    px, _ = _tif("byte.tif")
    data = bytearray(encode_exr(px, compression="none"))
    i = data.index(b"compression\x00compression\x00")
    data[i + len(b"compression\x00compression\x00") + 4] = 4  # PIZ
    with pytest.raises(NotImplementedError, match="PIZ"):
        read_exr(bytes(data))
