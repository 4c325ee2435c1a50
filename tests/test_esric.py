"""Esri Compact Cache V2 / tpkx reader vs gdrivers/esric.py
goldens."""

import os
import tarfile

import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.esric import (parse_conf, read_esric_level,
                                    read_tpkx_level)

FIX = "/root/reference/autotest/gdrivers/data/esric/"
TMP = "/tmp/gdal_ray_fixtures/esric"


@pytest.fixture(scope="module")
def layers_conf():
    conf = os.path.join(TMP, "Layers/conf.xml")
    if not os.path.exists(conf):
        os.makedirs(TMP, exist_ok=True)
        with tarfile.open(FIX + "Layers.tar") as t:
            t.extractall(TMP)
    return conf


def test_esric_structure(layers_conf):
    """test_esric_2: 2048x2048, 4 LODs, 3857 gt."""
    c = parse_conf(layers_conf)
    assert (c["xsize"], c["ysize"]) == (2048, 2048)
    assert len(c["resolutions"]) == 4
    gt = c["gt"]
    assert gt[0] == pytest.approx(-20037508, abs=1)
    assert gt[1] == pytest.approx(20037508 / 1024, abs=1)
    assert gt[3] == pytest.approx(20037508, abs=1)
    assert gt[5] == pytest.approx(-20037508 / 1024, abs=1)


def test_esric_missing_level_black(layers_conf):
    """test_esric_3: base level has no tiles -> checksum 0."""
    base = read_esric_level(layers_conf, 0)
    assert checksum_image(base[:, :, 0]) == 0


def test_esric_level_checksum(layers_conf):
    """test_esric_4: 512x512 level, band 2 checksum 46857."""
    lvl = read_esric_level(layers_conf, 2)
    assert lvl.shape[:2] == (512, 512)
    assert checksum_image(lvl[:, :, 1]) == 46857


def test_tpkx_band_checksums():
    """test_tpkx_2/3: 8192x8192 RGBA with the reference's four band
    checksums (paletted-PNG tiles expanded)."""
    full = read_tpkx_level(FIX + "Usa.tpkx", 0)
    assert full.shape == (8192, 8192, 4)
    assert checksum_image(full[:, :, 0]) == 61275
    assert checksum_image(full[:, :, 1]) == 57672
    assert checksum_image(full[:, :, 2]) == 61542
    assert checksum_image(full[:, :, 3]) == 19476


def test_tpkx_overview():
    """test_tpkx_4: overview 1 (2048) band 2 checksum 53503."""
    ov = read_tpkx_level(FIX + "Usa.tpkx", 2)
    assert ov.shape[:2] == (2048, 2048)
    assert checksum_image(ov[:, :, 1]) == 53503
