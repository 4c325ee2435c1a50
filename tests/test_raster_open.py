"""Unified open_raster: magic probe + sidecar georeferencing
(gcore/gdal_misc.cpp GDALReadWorldFile, gt_wkt_srs.cpp GeoKey EPSG)."""
import numpy as np

from gdal_ray.functions.codecs import encode_image
from gdal_ray.sources.raster_open import (epsg_from_wkt, gt_to_worldfile,
                                          open_raster, worldfile_to_gt)
from gdal_ray.sources.tiff import encode_tiff, tiff_epsg


def _px():
    rng = np.random.default_rng(5)
    return rng.integers(0, 255, (16, 20, 3), np.uint8)


def test_worldfile_roundtrip():
    gt = (304800.0, 60.0, 0.0, 3810000.0, 0.0, -60.0)
    assert worldfile_to_gt(gt_to_worldfile(gt)) == gt
    # the GDAL worked example: C/F are pixel centers
    wf = "60.0\n0.0\n0.0\n-60.0\n304830.0\n3809970.0\n"
    assert worldfile_to_gt(wf) == gt


def test_epsg_from_wkt():
    wkt = ('PROJCS["x",GEOGCS["y",DATUM["d",SPHEROID["s",1,2],'
           'AUTHORITY["EPSG","6326"]],AUTHORITY["EPSG","4326"]],'
           'AUTHORITY["EPSG","32633"]]')
    assert epsg_from_wkt(wkt) == 32633
    assert epsg_from_wkt("EPSG:3857") == 3857
    assert epsg_from_wkt('GEOGCS["u"]') is None


def test_open_png_with_worldfile_and_prj(tmp_path):
    px = _px()
    gt = (10.0, 0.5, 0.0, 20.0, 0.0, -0.5)
    p = tmp_path / "img.png"
    p.write_bytes(encode_image(px, "png"))
    (tmp_path / "img.pgw").write_text(gt_to_worldfile(gt))
    (tmp_path / "img.prj").write_text(
        'PROJCS["m",AUTHORITY["EPSG","3857"]]')
    got = open_raster(str(p))
    assert got["driver"] == "PNG"
    np.testing.assert_array_equal(got["pixels"], px)
    assert got["gt"] == gt and got["epsg"] == 3857


def test_open_jpeg_wld_fallback(tmp_path):
    px = _px()
    p = tmp_path / "scene.jpg"
    p.write_bytes(encode_image(px, "jpeg"))
    (tmp_path / "scene.wld").write_text(
        gt_to_worldfile((0.0, 1.0, 0.0, 0.0, 0.0, -1.0)))
    got = open_raster(str(p))
    assert got["driver"] == "JPEG"
    assert got["gt"] == (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    assert got["pixels"].shape == px.shape  # lossy codec: shape only


def test_open_geotiff_epsg_geokey(tmp_path):
    px = _px()[:, :, 0]
    gt = (500000.0, 30.0, 0.0, 4649776.0, 0.0, -30.0)
    data = encode_tiff(px, gt=gt, epsg=32633)
    assert tiff_epsg(data) == 32633
    p = tmp_path / "t.tif"
    p.write_bytes(data)
    got = open_raster(str(p))
    assert got["driver"] == "GTiff"
    assert got["gt"] == gt and got["epsg"] == 32633
    np.testing.assert_array_equal(got["pixels"], px)


def test_open_vsimem():
    from gdal_ray.sources.vsi import vsimem_unlink, vsimem_write

    px = _px()
    path = vsimem_write("open_raster_test.png", encode_image(px, "png"))
    try:
        got = open_raster(path)
        np.testing.assert_array_equal(got["pixels"], px)
        assert got["gt"] is None
    finally:
        vsimem_unlink("open_raster_test.png")
