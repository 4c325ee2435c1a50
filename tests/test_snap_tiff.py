"""SNAP GeoTIFF driver tests — expectations transcribed verbatim from
the reference autotest (autotest/gdrivers/snap_tiff.py) on its own
doubly-zipped truncated Sentinel-1 fixture."""
import os

import numpy as np
import pytest

from gdal_ray.sources.snap_tiff import (
    read_snap_tiff, snap_geoloc_arrays, snap_read_window,
)

FIX = ("/root/reference/autotest/gdrivers/data/snap_tiff/"
       "S1A_IW_GRDH_1SDV_20171009T141532_20171009T141557_018737_01F9E2"
       "_E974_tnr_empty_truncated.tif.zip.zip")

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="no reference fixture")


def test_snap_tiff_main():
    info = read_snap_tiff(FIX)
    assert info["width"] == 25548
    assert info["height"] == 16716
    assert info["dtype"] == "float32"
    assert info["epsg"] == 4326
    gcps = info["gcps"]
    assert len(gcps) == 4
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    assert gcps[0]["x"] == -121.18662152623274
    assert gcps[0]["y"] == 39.655540466308594
    assert gcps[3]["pixel"] == 25547.5 and gcps[3]["line"] == 16715.5
    assert gcps[3]["x"] == -124.43485147116212
    assert gcps[3]["y"] == 38.550738598352105
    assert info["nodata"] == 0
    assert info["band_name"] == "Intensity_VV"
    assert info["unit"] == "intensity"
    assert info["scale"] == 1
    assert info["offset"] == 0
    assert info["image_description"] == (
        "S1A_IW_GRDH_1SDV_20171009T141532_20171009T141557_018737_01F9E2"
        "_E974_tnr")
    assert info["pixel_step"] == 16.02697616060226
    assert info["line_step"] == 16.025886864813039
    assert info["dimap"].startswith("<?xml")


def test_snap_tiff_geolocation_subdataset():
    info = read_snap_tiff(FIX)
    assert info["geoloc_width"] == 1595
    assert info["geoloc_height"] == 1044
    lon, lat = snap_geoloc_arrays(FIX)
    assert lon.shape == (1044, 1595)
    # ComputeRasterMinMax with nodata 0 (autotest expectations)
    lonv, latv = lon[lon != 0], lat[lat != 0]
    assert (lonv.min(), lonv.max()) == (-124.43485147116212,
                                        -121.18662152623274)
    assert (latv.min(), latv.max()) == (38.15253672014443,
                                        40.05228536834884)


def test_snap_tiff_window_and_errors():
    win = snap_read_window(FIX, 0, 0, 16, 16)
    assert win.shape == (16, 16)
    assert np.all(win == 0)                       # "empty" product
    with pytest.raises(ValueError):
        read_snap_tiff(
            "/root/reference/autotest/gcore/data/byte.tif")
