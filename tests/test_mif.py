"""MapInfo MIF/MID driver vs the reference's own fixtures
(autotest/ogr/data/mitab, all_geoms.mif.golden.csv)."""

import csv

import pytest

from gdal_ray.sources.mif import read_mif

D = "/root/reference/autotest/ogr/data/mitab"

# rows of all_geoms whose WKT must be byte-equal to the golden CSV;
# RoundRect/Ellipse/Arc/Text (8-12) use documented interpolation and
# are type-checked only
EXACT_ROWS = [0, 1, 2, 3, 4, 5, 6, 7, 13, 14, 15]


@pytest.fixture(scope="module")
def all_geoms():
    with open(f"{D}/all_geoms.mif") as fh:
        tab = read_mif(fh.read())
    with open(f"{D}/all_geoms.mif.golden.csv") as fh:
        golden = [r["WKT"] for r in csv.DictReader(fh)]
    return tab["wkt"].to_pylist(), golden


def test_all_geoms_golden_exact(all_geoms):
    ours, golden = all_geoms
    assert len(ours) == len(golden) == 16
    for i in EXACT_ROWS:
        assert ours[i] == golden[i], f"row {i}"


def test_all_geoms_types(all_geoms):
    ours, golden = all_geoms
    for o, g in zip(ours, golden):
        assert o.split("(")[0].strip() == g.split("(")[0].strip()


def test_small_attributes():
    with open(f"{D}/small.mif") as fh, open(f"{D}/small.mid") as fm:
        t = read_mif(fh.read(), fm.read())
    assert t.num_rows == 2
    assert t["NAME"][0].as_py() == " S. 11th St."
    assert t["DATA"].to_pylist() == [4, 4]
    assert t["APPRAISED_VALUE"][0].as_py() == pytest.approx(56115.58)
    # doubled-quote escape
    assert '"Chucky"' in t["OWNER"][1].as_py()
    assert t["wkt"][0].as_py().startswith("POLYGON ((407131.721 ")


def test_multiline_mid_values():
    # quoted MID fields spanning lines keep their embedded newlines
    with open(f"{D}/multilinemid.mif") as fh, \
            open(f"{D}/multilinemid.mid") as fm:
        t = read_mif(fh.read(), fm.read())
    assert t["Notes"].to_pylist() == ["MULTI\n\nLINE", "MULTI\nLINE2"]


def test_empty_line_is_a_record():
    # single_field.mid has an empty middle line -> empty field value
    with open(f"{D}/single_field.mif") as fh, \
            open(f"{D}/single_field.mid") as fm:
        t = read_mif(fh.read(), fm.read())
    assert t["foo"].to_pylist() == ["1", "", "3"]
    assert t["wkt"].to_pylist() == ["GEOMETRYCOLLECTION EMPTY"] * 3


def test_nomid():
    with open(f"{D}/nomid.mif") as fh:
        t = read_mif(fh.read())
    assert t.num_rows == 2 and t.column_names == ["wkt"]


def test_tab_delimiter_empty_first_field():
    with open(f"{D}/empty_first_field_with_tab_delimiter.mif") as fh, \
            open(f"{D}/empty_first_field_with_tab_delimiter.mid") as fm:
        t = read_mif(fh.read(), fm.read())
    assert t.num_rows == 1
    assert t["field1"][0].as_py() == ""
