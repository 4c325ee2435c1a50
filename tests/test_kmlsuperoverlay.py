"""KMLSuperOverlay write/read vs the reference's own autotest
(autotest/gdrivers/kmlsuperoverlay.py tests 1-4)."""
import os
import tempfile

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.kmlsuperoverlay import (read_superoverlay,
                                              write_superoverlay)
from gdal_ray.sources.tiff import decode_tiff, tiff_epsg

GD = "/root/reference/autotest/gdrivers/data"


def _small_world():
    px, gt = decode_tiff(open(f"{GD}/small_world.tif", "rb").read())[:2]
    return np.moveaxis(px, 2, 0), gt


def test_superoverlay_kmz_png_roundtrip(tmp_path):
    # test_kmlsuperoverlay_1: small_world FORMAT=PNG -> kmz, cs 30111
    px, gt = _small_world()
    assert checksum_image(px[0]) == 30111
    path = str(tmp_path / "kmlout.kmz")
    files = write_superoverlay(px, gt, 4326, path, fmt="PNG")
    assert set(files) == {"doc.kml", "0/0/0.png", "0/0/0.kml"}
    rd = read_superoverlay(path)
    assert rd["pixels"].shape == (4, 200, 400)
    assert checksum_image(rd["pixels"][0]) == 30111
    # alpha fully opaque (no nodata)
    assert (rd["pixels"][3] == 255).all()
    assert rd["geo"] == (90.0, -90.0, 180.0, -180.0)


def test_superoverlay_kml_dir_png_roundtrip(tmp_path):
    # test_kmlsuperoverlay_2: same but to a bare .kml + tile dirs
    px, gt = _small_world()
    path = str(tmp_path / "kmlout.kml")
    write_superoverlay(px, gt, 4326, path, fmt="PNG")
    rd = read_superoverlay(path)
    assert checksum_image(rd["pixels"][0]) == 30111


def test_superoverlay_utm_jpeg(tmp_path):
    # test_kmlsuperoverlay_3: utm.tif (NAD27 UTM 11N) -> JPEG pyramid;
    # root KML carries the WGS84-transformed bounds and the exact
    # 11-file layout
    data = open(f"{GD}/utm.tif", "rb").read()
    px, gt = decode_tiff(data)[:2]
    path = str(tmp_path / "tmp.kml")
    files = write_superoverlay(px[None], gt, tiff_epsg(data), path,
                               fmt="JPEG")
    rels = sorted(os.path.relpath(f, tmp_path) for f in files)
    assert rels == sorted([
        "0/0/0.jpg", "0/0/0.kml", "1/0/0.jpg", "1/0/0.kml",
        "1/0/1.jpg", "1/0/1.kml", "1/1/0.jpg", "1/1/0.kml",
        "1/1/1.jpg", "1/1/1.kml", "tmp.kml"])
    head = open(path).read()
    assert "<north>33.903" in head
    assert "<south>33.625" in head
    assert "<east>-117.309" in head
    assert "<west>-117.639" in head
    rd = read_superoverlay(path)
    assert rd["pixels"].shape == (1, 512, 512)
    assert len(rd["overviews"]) == 1
    assert rd["overviews"][0].shape == (1, 256, 256)


def test_superoverlay_overview_checksum(tmp_path):
    # test_kmlsuperoverlay_4: small_world upsampled 2x (VRT
    # SimpleSource nearest) -> PNG kmz; overview 0 must reproduce the
    # original band (cs 30111) and the full-res band the upsampled one
    px, _ = _small_world()
    up = px[:, np.floor((np.arange(400) + 0.5) * 0.5).astype(int)[:, None],
            np.floor((np.arange(800) + 0.5) * 0.5).astype(int)[None, :]]
    gt = (-180.0, 0.45, 0.0, 90.0, 0.0, -0.45)
    path = str(tmp_path / "t4.kmz")
    write_superoverlay(up, gt, 4326, path, fmt="PNG", name="myname",
                       description="mydescription", altitude=10,
                       altitude_mode="absolute")
    rd = read_superoverlay(path)
    assert rd["name"] == "myname"
    assert rd["description"] == "mydescription"
    assert len(rd["overviews"]) == 1
    assert checksum_image(rd["overviews"][0][0]) == 30111
    assert checksum_image(rd["pixels"][0]) == checksum_image(up[0])


def test_superoverlay_auto_format_nodata(tmp_path):
    # AUTO picks PNG for tiles containing nodata, JPEG otherwise;
    # nodata pixels get alpha 0 (GenerateTiles hadnoData path)
    rng = np.random.default_rng(7)
    px = rng.integers(1, 255, (3, 200, 400), dtype=np.uint8)
    px[:, :50, :50] = 0  # nodata corner
    path = str(tmp_path / "auto.kmz")
    files = write_superoverlay(px, (-180, 0.9, 0, 90, 0, -0.9), 4326, path,
                               fmt="AUTO", nodata=0)
    assert any(f.endswith(".png") for f in files)
    rd = read_superoverlay(path)
    assert (rd["pixels"][3, :50, :50] == 0).all()
    assert (rd["pixels"][3, 100:, 100:] == 255).all()
