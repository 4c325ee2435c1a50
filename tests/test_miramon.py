"""MiraMon vector reader vs ogr_miramon_vector.py goldens."""

import pytest

from gdal_ray.sources.miramon import read_miramon

M = "/root/reference/autotest/ogr/data/miramon/"


def test_simple_points():
    t = read_miramon(M + "Points/SimplePoints/SimplePointsFile.pnt")
    assert t.num_rows == 3
    r = t.to_pylist()[0]
    assert r["wkt"] == "POINT (513.488106565226 848.806850618409)"
    assert r["ID_GRAFIC"] == 0
    assert r["ATT1"] == "A" and r["ATTRIBUTE_2"] == "B"
    assert r["LOGICALY"] is True and r["LOGICALN"] is False


def test_simple_arcs():
    t = read_miramon(M + "Arcs/SimpleArcs/SimpleArcFile.arc")
    assert t.num_rows == 4
    r = t.to_pylist()[0]
    assert r["wkt"] == ("LINESTRING (351.333967649907 610.58039961936,"
                        "474.450999048575 824.784015223546,"
                        "758.721217887776 838.797335870549,"
                        "1042.99143672698 610.58039961936,"
                        "1369.30161750719 562.534728829636)")
    assert r["N_VERTEXS"] == 5
    assert r["LONG_ARC"] == pytest.approx(1226.052754666, abs=1e-5)
    assert r["NODE_INI"] == 0 and r["NODE_FI"] == 1
    assert r["ATT1"] == "A" and r["ATT2"] == "B"


def test_simple_polygons():
    t = read_miramon(M + "Polygons/SimplePolygons/SimplePolFile.pol")
    assert t.num_rows == 3
    r0, r1, _ = t.to_pylist()
    assert r0["wkt"] == ("POLYGON ((335.318744053333 769.731684110321,"
                         "552.525214081877 856.814462416696,"
                         "775.737392959137 707.672692673594,"
                         "648.616555661325 493.469077069408,"
                         "386.367269267414 498.473834443337,"
                         "335.318744053333 769.731684110321))")
    assert r0["ID_GRAFIC"] == 1 and r0["N_VERTEXS"] == 6
    assert r0["PERIMETRE"] == pytest.approx(1289.866489495, abs=1e-5)
    assert r0["AREA"] == pytest.approx(112471.221989, abs=1e-5)
    assert r0["N_ARCS"] == 1 and r0["N_POLIG"] == 1
    assert r1["ID_GRAFIC"] == 2 and r1["N_VERTEXS"] == 8
    assert r1["ATT1"] == "C" and r1["ATT2"] == "D"


def test_3d_points_present():
    import os

    assert os.path.exists(M + "Points/3dpoints")
