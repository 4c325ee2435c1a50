"""Raster attribute tables: functions/rat.py (gcore/gdal_rat.cpp
re-derivation) + sources/hfa.py read_hfa_rat vs the reference's own
expectations (autotest/gcore/rat.py, autotest/gdrivers/hfa.py
:739-757, 1191-1219)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.rat import (GFT_Integer, GFT_Real, GFT_String,
                                    GFU_MinMax, GFU_PixelCount,
                                    RasterAttributeTable)
from gdal_ray.sources.hfa import read_hfa_rat

HFA = "/root/reference/autotest/gdrivers/data/hfa/i8u_c_i.img"


def make_test_rat():
    # autotest/gcore/rat.py test_rat fixture
    rat = RasterAttributeTable()
    rat.create_column("Value", GFT_Integer, GFU_MinMax)
    rat.create_column("Count", GFT_Integer, GFU_PixelCount)
    rat.set_row_count(3)
    for r, (v, n) in enumerate([(10, 100), (11, 200), (12, 90)]):
        rat.set_value(r, 0, v)
        rat.set_value(r, 1, n)
    return rat


def test_rat_1_clone_semantics():
    rat2 = make_test_rat().clone()
    assert len(rat2.columns) == 2
    assert rat2.row_count == 3
    assert rat2.columns[1].name == "Count"
    assert rat2.columns[1].usage == GFU_PixelCount
    assert rat2.columns[1].type == GFT_Integer
    assert rat2.get_row_of_value(11.0) == 1
    assert rat2.get_value(1, 1) == 200


def test_linear_binning_row_of_value():
    rat = RasterAttributeTable()
    rat.create_column("Count", GFT_Integer, GFU_PixelCount)
    rat.set_row_count(4)
    rat.set_linear_binning(0.0, 10.0)
    assert rat.get_row_of_value(0.0) == 0
    assert rat.get_row_of_value(9.9) == 0
    assert rat.get_row_of_value(10.0) == 1
    assert rat.get_row_of_value(39.9) == 3
    assert rat.get_row_of_value(40.0) == -1
    assert rat.get_row_of_value(-0.1) == -1


def test_hfa_rat_published_facts():
    # autotest/gdrivers/hfa.py test_hfa_write_rat expectations
    rat = read_hfa_rat(open(HFA, "rb").read())
    assert len(rat.columns) == 6
    assert rat.columns[0].name == "BinValues"
    assert rat.columns[0].type == GFT_Real
    assert rat.columns[0].usage == GFU_MinMax
    assert int(rat.get_value(2, 0)) == 4
    assert int(rat.get_value(4, 5)) == 656
    assert rat.row_count == 75


def test_hfa_rat_through_open_raster():
    from gdal_ray.sources.raster_open import open_raster

    r = open_raster(HFA)
    assert "rat" in r
    tab = r["rat"]
    assert isinstance(tab, pa.Table)
    assert tab.num_rows == 75
    assert tab.column_names[0] == "BinValues"
    assert int(tab["Histogram"][4].as_py()) == 656


def test_arrow_roundtrip_preserves_metadata():
    rat = make_test_rat()
    back = RasterAttributeTable.from_arrow(rat.to_arrow())
    assert [c.usage for c in back.columns] == \
        [c.usage for c in rat.columns]
    assert [c.type for c in back.columns] == [c.type for c in rat.columns]
    assert back.columns[0].values == [10, 11, 12]
    # string column survives too
    rat.create_column("Name", GFT_String, 2)
    rat.set_value(0, 2, "water")
    b2 = RasterAttributeTable.from_arrow(rat.to_arrow())
    assert b2.columns[2].values[0] == "water"


def test_byte_img_histogram_rat():
    # byte.img carries a 256-row Histogram-only descriptor table
    # (truncated 30-byte Edsc_BinFunction record tolerated)
    byte = "/root/reference/autotest/gcore/data/byte.img"
    rat = read_hfa_rat(open(byte, "rb").read())
    assert [c.name for c in rat.columns] == ["Histogram"]
    assert rat.columns[0].usage == GFU_PixelCount
    assert len(rat.columns[0].values) == 256
