"""Arc/Info E00 reader vs autotest/ogr/ogr_avc.py goldens."""

import pytest

from gdal_ray.sources.avc import read_e00

FIX = "/root/reference/autotest/ogr/data/avc/"


def test_arc_layer():
    """ogr_avc_1 check_content: UserIDs 1..7 + first linestring."""
    L = read_e00(FIX + "test.e00")
    t = L["ARC"]
    assert t["UserID"].to_pylist() == [str(i) for i in range(1, 8)]
    import re

    pts = [(float(a), float(b)) for a, b in re.findall(
        r"(-?[\d.]+) (-?[\d.]+)", t.to_pylist()[0]["wkt"])]
    exp = [(340099.875, 4100200.0), (340400.0625, 4100399.5),
           (340900.125, 4100200.0), (340700.03125, 4100199.5)]
    for p, e in zip(pts, exp):
        assert abs(p[0] - e[0]) < 0.01 and abs(p[1] - e[1]) < 0.01


def test_point_coverage():
    """ogr_avc_4: 80 points, ValueId/WELLS-ID == 80 on the last."""
    L = read_e00(FIX + "testpoint.e00")
    t = L["LAB"]
    assert t.num_rows == 80
    last = t.to_pylist()[-1]
    assert last["ValueId"] == 80
    assert last["WELLS-ID"] == 80


def test_polygon_coverage():
    """ogr_avc_5: 3 polygons (universe skipped), ArcIds [-4,-5],
    AREA 9939.059, exact ring WKT."""
    L = read_e00(FIX + "testpoly.e00")
    t = L["PAL"]
    assert t.num_rows == 3
    last = t.to_pylist()[-1]
    assert last["ArcIds"] == [-4, -5]
    assert last["AREA"] == pytest.approx(9939.059, abs=1e-3)
    assert last["wkt"] == ("POLYGON ((340700.03 4100199.5,"
                           "340500.0 4100199.8,340599.97 4100100.2,"
                           "340700.03 4100199.5))")


def test_compressed_rejected():
    """ogr_avc_3: compressed E00 refused."""
    with pytest.raises(ValueError):
        read_e00(FIX + "compressed.e00")
