"""DGN v7 reader vs autotest/ogr/ogr_dgn.py goldens."""

import re

import pytest

from gdal_ray.sources.dgn import read_dgn

FIX = "/root/reference/autotest/ogr/data/dgn/"


@pytest.fixture(scope="module")
def tab():
    return read_dgn(FIX + "smalltest.dgn")


def test_text_feature(tab):
    """ogr_dgn_2: attributes, POINT, LABEL style."""
    r = tab.to_pylist()[0]
    assert r["Type"] == 17 and r["Level"] == 1
    assert r["Text"] == "Demo Text"
    assert r["wkt"] == "POINT (0.7365 4.2198)"
    assert r["style"] == \
        'LABEL(t:"Demo Text",c:#ffffff,s:1.000g,f:ENGINEERING)'


def test_circle_stroked(tab):
    """ogr_dgn_3: ellipse -> LINESTRING, >=15 points, envelope."""
    r = tab.to_pylist()[1]
    assert r["Type"] == 15 and r["Level"] == 2
    assert r["wkt"].startswith("LINESTRING")
    pts = [(float(a), float(b))
           for a, b in re.findall(r"(-?[\d.]+) (-?[\d.]+)", r["wkt"])]
    assert len(pts) >= 15
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    assert 0.328593 <= min(xs) <= 0.328594
    assert 9.68780 <= max(xs) <= 9.68781
    assert -0.09611 <= min(ys) <= -0.09610
    assert 9.26310 <= max(ys) <= 9.26311


def test_shape_and_line(tab):
    rows = tab.to_pylist()
    shape = rows[2]
    assert shape["Type"] == 6
    assert shape["wkt"].startswith("POLYGON ((4.5355 3.317,")
    line = rows[3]
    assert line["Type"] == 3
    assert line["wkt"] == "LINESTRING (2.5562 5.7218,2.5242 6.0709)"
