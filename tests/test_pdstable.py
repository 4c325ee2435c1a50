"""OGR PDS3 TABLE driver vs reference autotest (ogr_pds.py)."""

import pytest

from gdal_ray.sources.pdstable import read_pds_table

FIX = "/root/reference/autotest/ogr/data/pds/"


def test_pds_ascii_table():
    """test_ogr_pds_1: RAMAPPING layer goldens."""
    t = read_pds_table(FIX + "ap01578l.lbl")
    assert t.num_rows == 74786
    rows = t.slice(0, 2).to_pylist()
    assert rows[0]["NOISE_COUNTS_1"] == 96
    assert rows[0]["wkt"] == "POINT (146.1325 -55.648)"
    assert rows[1]["MARS_RADIUS"] == 3385310.2


def test_pds_binary_items_table():
    """test_ogr_pds_2: IEEE_REAL + ITEMS expansion (NAME_1..NAME_n)."""
    t = read_pds_table(FIX + "virsvd_orb_11187_050618.lbl")
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["INCIDENCE_ANGLE"] == pytest.approx(3.56775538, abs=1e-7)
    assert r["TEMP_2"] == pytest.approx(28.1240005493164, abs=1e-7)
