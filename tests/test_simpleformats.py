"""TGA/ZMap/HF2/SIGDEM/NGSGEOID/NSIDCbin/TIL vs reference goldens
(autotest tga.py, zmap.py, hf2.py, sigdem.py, ngsgeoid.py,
nsidcbin.py, til.py)."""
import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.simpleformats import (
    read_hf2, read_ngsgeoid, read_nsidcbin, read_sigdem, read_tga,
    read_til, read_zmap, write_hf2, write_sigdem, write_zmap,
)
from gdal_ray.sources.tiff import decode_tiff

TGA = "/root/reference/autotest/gdrivers/data/tga/"


def _tga_cs(name):
    r = read_tga(open(TGA + name, "rb").read())
    px = r["pixels"]
    if px.ndim == 2:
        return [checksum_image(px)]
    return [checksum_image(px[:, :, i]) for i in range(px.shape[2])]


@pytest.mark.parametrize("name,want", [
    ("ref_test_suite/cbw8.tga", [43089]),
    ("ref_test_suite/ccm8.tga", [38151]),
    ("ref_test_suite/ctc24.tga", [9797, 9952, 9848]),
    ("ref_test_suite/ubw8.tga", [43089]),
    ("ref_test_suite/ucm8.tga", [38151]),
    ("ref_test_suite/utc16.tga", [64747, 64839, 64796]),
    ("ref_test_suite/utc24.tga", [9797, 9952, 9848]),
    ("ref_test_suite/utc32.tga", [9797, 9952, 9848, 0]),
    ("stefan_full_rgba.tga", [12603, 58561, 36064, 10807]),
    # RLE runs crossing scanlines
    ("from_ffmpeg_samples/test1g.tga", [13077]),
    ("from_ffmpeg_samples/TEST24rle.tga", [39607, 6458, 44534]),
])
def test_tga_checksums(name, want):
    assert _tga_cs(name) == want


def test_tga_metadata_and_palette():
    r = read_tga(open(TGA + "ref_test_suite/cbw8.tga", "rb").read())
    assert r["author"] == "Ricky True"
    assert r["comments"] == ("Sample 8 bit run length compressed "
                             "black and white image")
    assert r["image_id"] == "Truevision(R) Sample Image"
    r = read_tga(open(TGA + "ref_test_suite/ucm8.tga", "rb").read())
    assert tuple(r["palette"][0]) == (0, 0, 0)
    assert tuple(r["palette"][1]) == (8, 8, 8)
    assert tuple(r["palette"][64]) == (248, 0, 0)


@pytest.fixture(scope="module")
def byte_tif():
    return decode_tiff(open(
        "/root/reference/autotest/gcore/data/byte.tif", "rb").read())


def test_zmap_roundtrip(byte_tif):
    """autotest zmap.py: CreateCopy of byte.tif keeps cs 4672."""
    px, gt = byte_tif
    grid, gt2, nodata = read_zmap(write_zmap(px.astype(np.float64),
                                             gt))
    assert checksum_image(grid) == 4672
    assert gt2 == pytest.approx(gt)
    assert nodata == 1e30


@pytest.mark.parametrize("gz", [False, True])
def test_hf2_byte_roundtrip(byte_tif, gz):
    """autotest hf2.py test 1/2: byte.tif through HF2 and HFZ."""
    px, gt = byte_tif
    grid, gt2 = read_hf2(write_hf2(px.astype(np.float64), gt,
                                   gzipped=gz))
    assert checksum_image(grid) == 4672
    assert gt2 == pytest.approx(gt)


def test_hf2_float_and_dted():
    """hf2.py test 4 (float.img 23529) and 5 (n43.dt0 49187)."""
    from gdal_ray.sources.hfa import decode_hfa
    from gdal_ray.sources.terrain import read_dted

    fl, _, _ = decode_hfa(open(
        "/root/reference/autotest/gdrivers/data/hfa/float.img",
        "rb").read())
    if fl.ndim == 3:
        fl = fl[:, :, 0]
    grid, _ = read_hf2(write_hf2(fl.astype(np.float64),
                                 (0, 1, 0, 0, 0, -1)))
    assert checksum_image(grid) == 23529
    dt, gtd = read_dted(open(
        "/root/reference/autotest/gdrivers/data/n43.dt0", "rb").read())
    grid, _ = read_hf2(write_hf2(dt.astype(np.float64), gtd))
    assert checksum_image(grid) == 49187


def test_sigdem_roundtrip(byte_tif):
    """autotest sigdem.py: byte.tif cs 4672 with georef + EPSG."""
    px, gt = byte_tif
    r = read_sigdem(write_sigdem(px.astype(np.float64), gt,
                                 epsg=26711))
    assert checksum_image(r["pixels"]) == 4672
    assert r["epsg"] == 26711
    assert r["gt"] == pytest.approx(gt)
    assert r["nodata"] == -9999.0


@pytest.mark.parametrize("name", ["g2009u01_le_truncated.bin",
                                  "g2009u01_be_truncated.bin"])
def test_ngsgeoid(name):
    """autotest ngsgeoid.py: cs 65534 + exact gt, both byte orders."""
    g, gt = read_ngsgeoid(open(
        "/root/reference/autotest/gdrivers/data/ngsgeoid/" + name,
        "rb").read())
    assert checksum_image(np.nan_to_num(g)) == 65534
    want = (229.99166666666667, 0.01666666666667, 0.0,
            40.00833333333334, 0.0, -0.01666666666667)
    assert gt == pytest.approx(want)


def test_nsidcbin():
    """autotest nsidcbin.py: 316 cols, byte value 27 at (60,44)."""
    r = read_nsidcbin(open(
        "/root/reference/autotest/gdrivers/data/nsidcbin/"
        "nt_20220409_f18_nrt_s.bin", "rb").read())
    assert r["pixels"].shape[1] == 316
    assert int(r["pixels"][44, 60]) == 27


def test_til():
    """autotest til.py: testtil.til mosaics to byte.tif's cs 4672."""
    px, gt = read_til(
        open("/root/reference/autotest/gdrivers/data/til/testtil.til"
             ).read(),
        "/root/reference/autotest/gdrivers/data/til")
    assert checksum_image(px if px.ndim == 2 else px[:, :, 0]) == 4672
    assert gt == pytest.approx((440720.0, 60.0, 0.0, 3751320.0, 0.0,
                                -60.0))


def test_open_raster_probes(byte_tif):
    from gdal_ray.sources.raster_open import open_raster
    from gdal_ray.sources.vsi import vsimem_write

    px, gt = byte_tif
    vsimem_write("t.hf2", write_hf2(px.astype(np.float64), gt))
    r = open_raster("/vsimem/t.hf2")
    assert r["driver"] == "HF2" and checksum_image(r["pixels"]) == 4672
    vsimem_write("t.sigdem", write_sigdem(px.astype(np.float64), gt))
    assert open_raster("/vsimem/t.sigdem")["driver"] == "SIGDEM"
    vsimem_write("t.zmap",
                 write_zmap(px.astype(np.float64), gt).encode())
    assert open_raster("/vsimem/t.zmap")["driver"] == "ZMap"
    r = open_raster(TGA + "ref_test_suite/ubw8.tga")
    assert r["driver"] == "TGA"
