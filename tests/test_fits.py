"""FITS driver conformance vs the reference's own autotest
(autotest/gdrivers/fits.py) fixtures and literal expectations."""

import ast
import os
import re

import numpy as np
import pytest

from gdal_ray.sources.fits import (
    fits_subdatasets,
    read_fits_image,
    read_fits_table,
)
from gdal_ray.sources.raster_open import open_raster

D = "/root/reference/autotest/gdrivers/data/fits/"
AUTOTEST = "/root/reference/autotest/gdrivers/fits.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(D + "byte_merc.fits"), reason="fixtures absent")


def test_georef_merc():
    """test_fits_read_georef_merc: gt + Mercator_Earth projection."""
    r = read_fits_image(open(D + "byte_merc.fits", "rb").read())
    exp = (-13095897.481058259, 72.23522015778646, 0.0,
           3991653.2130816197, 0.0, -72.23522015778646)
    assert r["gt"] == pytest.approx(exp, abs=1e-3)
    assert r["srs"]["projcs"] == "Mercator_Earth"
    assert r["srs"]["spheroid"][1] == 6378206.4
    assert r["srs"]["spheroid"][2] == pytest.approx(294.978698213898)
    assert r["pixels"].shape == (20, 20)


def test_offset_scale():
    """test_fits_read_offset_scale_no_georef."""
    r = read_fits_image(open(D + "offset_scale_no_georef.fits",
                             "rb").read())
    assert r["offset"] == -0.0039525691699605
    assert r["scale"] == 1.00395256917
    assert r["gt"] is None


def test_empty_primary_hdu_rejected():
    data = open(D + "empty_primary_hdu.fits", "rb").read()
    with pytest.raises(ValueError):
        read_fits_image(data)


def test_image_in_second_hdu():
    data = open(D + "image_in_second_hdu.fits", "rb").read()
    r = read_fits_image(data)
    assert r["pixels"].shape == (2, 1)
    assert r["metadata"] == {"BAR": "BAZ     ", "FOO": "BAR_override",
                             "FOO2": "BAR2    "}


def test_subdatasets_two_images():
    fn = D + "image_in_first_and_second_hdu.fits"
    data = open(fn, "rb").read()
    subs = fits_subdatasets(data, fn)
    assert len(subs) == 2
    assert subs[0][0] == f'FITS:"{fn}":1'
    assert subs[0][1] == "HDU 1 (1x2, 1 band), FIRST_IMAGE"
    assert subs[1][1] == "HDU 2 (1x3, 1 band)"
    r1 = open_raster(subs[0][0])
    assert r1["pixels"].shape == (2, 1)
    assert r1["metadata"] == {"EXTNAME": "FIRST_IMAGE"}
    r2 = open_raster(subs[1][0])
    assert r2["pixels"].shape == (3, 1)
    assert r2["metadata"] == {}


def test_image_and_table_mixed():
    fn = D + "image_in_second_and_fourth_hdu_table_in_third.fits"
    data = open(fn, "rb").read()
    subs = fits_subdatasets(data, fn)
    assert [s[0] for s in subs] == [f'FITS:"{fn}":2', f'FITS:"{fn}":4']
    r = read_fits_image(data, 2)
    assert r["metadata"] == {"EXTNAME": "FIRST_IMAGE", "FOO": "BAR     "}
    r = read_fits_image(data, 4)
    assert r["metadata"] == {"EXTNAME": "SECOND_IMAGE", "FOO": "BAR     "}


def _autotest_expected(name: str):
    src = open(AUTOTEST).read()
    return ast.literal_eval(
        re.search(rf"{name} = (\[.*?\n    \])", src, re.S).group(1))


def test_vector_schema():
    """test_fits_vector: field names/types/subtypes/widths 78/78."""
    t, defns, name = read_fits_table(
        open(D + "binary_table.fits", "rb").read())
    assert name == "MyTable"
    assert t.num_rows == 3
    exp = _autotest_expected("expected")
    got = [(n, f"ogr.{t_}", f"ogr.{st}", w) for n, t_, st, w in defns]
    assert got == exp
    assert t.column_names == [e[0] for e in exp]


def test_vector_values():
    """test_fits_vector: every field of features 1 and 2, + TNULL."""
    t, _, _ = read_fits_table(open(D + "binary_table.fits", "rb").read())
    for row, name in ((0, "expected_f1"), (1, "expected_f2")):
        exp = _autotest_expected(name)
        got = [t.column(i)[row].as_py() for i in range(t.num_columns)]
        assert got == exp, f"{name} mismatch"
    assert t.column("B")[2].as_py() is None  # TNULL18 = 3


def test_open_raster_probe():
    r = open_raster(D + "byte_merc.fits")
    assert r["driver"] == "FITS"
    assert r["pixels"].dtype == np.uint8
