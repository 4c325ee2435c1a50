"""CCITT G4 codec + CALS driver vs the reference's autotest goldens."""
import numpy as np

from gdal_ray.functions.ccittg4 import decode_g4, encode_g4
from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.cals import (
    CALS_WHITE_FIRST_CT, read_cals, write_cals,
)
from gdal_ray.sources.tiff import decode_tiff


def test_g4_roundtrip():
    rng = np.random.RandomState(7)
    for shape in [(5, 8), (13, 100), (3, 1), (20, 257)]:
        img = (rng.rand(*shape) > 0.6).astype(np.uint8)
        assert np.array_equal(
            img, decode_g4(encode_g4(img), shape[1], shape[0])), shape
    # long runs exercise make-up + extended make-up codes
    img = np.zeros((2, 3000), np.uint8)
    img[0, 100:2900] = 1
    assert np.array_equal(img, decode_g4(encode_g4(img), 3000, 2))


def test_g4_tiff_slim_golden():
    """gcore tiff_read.py test_tiff_g4_split: slim_g4.tif cs 3322
    through a libtiff-written FAX4 stream."""
    px, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/slim_g4.tif", "rb").read())
    assert px.shape == (7200, 1000)
    assert checksum_image(px) == 3322


def test_cals_createcopy_inverts_without_ct():
    """autotest cals.py test_cals_1/2: sources without the white-first
    color table invert once through a CALS copy."""
    from gdal_ray.sources.hfa import decode_hfa

    src, _, _ = decode_hfa(open(
        "/root/reference/autotest/gdrivers/data/hfa/small1bit.img",
        "rb").read())
    r = read_cals(write_cals(src))
    assert checksum_image(r["pixels"]) == 9907
    src2, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/oddsize1bit.tif",
        "rb").read())
    r2 = read_cals(write_cals(src2))
    assert checksum_image(r2["pixels"]) == 3883


def test_cals_to_cals_preserves():
    """test_cals_3: the white-first color table suppresses the
    inversion, so CALS->CALS copies are bit-stable."""
    src2, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/oddsize1bit.tif",
        "rb").read())
    r = read_cals(write_cals(src2))
    r2 = read_cals(write_cals(r["pixels"],
                              color_table=r["color_table"],
                              density=600))
    assert checksum_image(r2["pixels"]) == 3883
    assert r2["density"] == 600
    assert r["color_table"] == CALS_WHITE_FIRST_CT


def test_cals_orientation_metadata():
    """test_cals_5: PIXEL_PATH/LINE_PROGRESSION survive; the default
    (0,270) reports nothing."""
    img = np.zeros((1, 1), np.uint8)
    r = read_cals(write_cals(img, pixel_path=90, line_progression=270))
    assert r["pixel_path"] == 90 and r["line_progression"] == 270
    r = read_cals(write_cals(img))
    assert "pixel_path" not in r


def test_cals_open_raster():
    from gdal_ray.sources.raster_open import open_raster
    from gdal_ray.sources.vsi import vsimem_write

    img = (np.arange(64).reshape(8, 8) % 3 == 0).astype(np.uint8)
    vsimem_write("t.cal", write_cals(img))
    r = open_raster("/vsimem/t.cal")
    assert r["driver"] == "CALS"
    assert np.array_equal(r["pixels"], 1 - img)
