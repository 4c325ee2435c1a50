"""MapInfo TAB binary driver vs the reference's own fixtures
(autotest/ogr/data/mitab: all_geoms.tab vs all_geoms.mif.golden.csv,
all_possible_fields.tab vs the autotest's pinned values)."""

import csv
import re

import pytest

from gdal_ray.sources.mitab import read_tab

D = "/root/reference/autotest/ogr/data/mitab"

# Rows byte-equal to the golden CSV; rows 10-12 (arc x2, text) are
# numeric-equal (the golden's WKT formatter is %.15f-trimmed, ours
# %.15g); rows 8-9 (roundrect, ellipse) use documented stroking and
# are type-checked — same split as tests/test_mif.py.
EXACT_ROWS = [0, 1, 2, 3, 4, 5, 6, 7, 13, 14, 15]
NUMERIC_ROWS = [10, 11, 12]


def _nums(s):
    return [float(x)
            for x in re.findall(r"-?\d+\.?\d*(?:[eE]-?\d+)?", s)]


@pytest.fixture(scope="module")
def all_geoms():
    t = read_tab(f"{D}/all_geoms.tab")
    with open(f"{D}/all_geoms.mif.golden.csv") as fh:
        golden = [r["WKT"] for r in csv.DictReader(fh)]
    return t["wkt"].to_pylist(), golden


def test_all_geoms_exact(all_geoms):
    ours, golden = all_geoms
    assert len(ours) == len(golden) == 16
    for i in EXACT_ROWS:
        assert ours[i] == golden[i], f"row {i}"


def test_all_geoms_numeric(all_geoms):
    ours, golden = all_geoms
    for i in NUMERIC_ROWS:
        a, b = _nums(ours[i]), _nums(golden[i])
        assert len(a) == len(b), f"row {i}: {len(a)} vs {len(b)}"
        assert max(abs(x - y) for x, y in zip(a, b)) < 1e-12, f"row {i}"


def test_all_geoms_types(all_geoms):
    ours, golden = all_geoms
    for o, g in zip(ours, golden):
        assert o.split("(")[0].strip() == g.split("(")[0].strip()


def test_tab_matches_mif_driver(all_geoms):
    """TAB binary and MIF text reads of the same dataset agree
    numerically for every non-stroked row."""
    from gdal_ray.sources.mif import read_mif

    ours, _ = all_geoms
    with open(f"{D}/all_geoms.mif") as fh:
        mif = read_mif(fh.read())["wkt"].to_pylist()
    for i in EXACT_ROWS + [10, 11]:
        a, b = _nums(ours[i]), _nums(mif[i])
        assert len(a) == len(b), f"row {i}"
        assert max(abs(x - y) for x, y in zip(a, b)) < 1e-9, f"row {i}"


def test_all_possible_fields():
    """Attribute parity with the reference autotest's pinned values
    (ogr_mitab.py test_ogr_mitab_read_write_all_data_types)."""
    t = read_tab(f"{D}/all_possible_fields.tab")
    r = {n: t[n][0].as_py() for n in t.column_names}
    assert r["field1"] == "test"
    assert r["Field2"] == 120
    assert r["Field3"] == 12345
    assert r["Field4"] == 123456789012345
    assert r["Field5"] == 12.34
    assert r["Field6"] == 12.34
    assert r["Field7"] == "2022/12/31"
    assert r["Field8"] == "23:59:00"
    assert r["Field9"] == "2022/03/23 14:56:00"
    assert r["Field10"] is True
    assert t["Field10"][1].as_py() is False


def test_polygon_fixture():
    t = read_tab(f"{D}/poly_indexed.tab")
    assert t.num_rows == 10
    assert t["EAS_ID"].to_pylist() == [168, 179, 171, 173, 172, 169,
                                       166, 158, 165, 170]
    assert t["wkt"][0].as_py().startswith("POLYGON ((479819.85 ")


def test_aspatial_variants():
    # .map/.id present but all ids 0 -> NONE geometries
    t = read_tab(f"{D}/aspatial.tab")
    assert t.num_rows == 3
    assert set(t["wkt"].to_pylist()) == {"GEOMETRYCOLLECTION EMPTY"}
    # no .map/.id at all -> attributes only
    t = read_tab(f"{D}/aspatial-table.tab")
    assert t.num_rows == 2 and "wkt" not in t.column_names


def test_uppercase_siblings():
    t = read_tab(f"{D}/lambert93_francais.TAB")
    assert t.num_rows == 0 and t.column_names == ["foo"]


def test_open_vector_dispatch():
    from gdal_ray.sources.vector_open import open_vector

    layers = open_vector(f"{D}/all_geoms.tab")
    assert list(layers) == ["all_geoms"]
    assert layers["all_geoms"].num_rows == 16
