"""DXF conformance vs the reference's OWN expectations
(autotest/ogr/ogr_dxf.py): the full 22-feature assorted.dxf walk
(tests 1-9), entities-only files (#3412), OCS LWPOLYLINE with bulges
(test 10), circle tessellation (test 21), 3DFACE (25), SOLID (26),
polyline_smooth (13), closed polyline with bulge (#10153)."""

import math
import re

import pytest

from gdal_ray.sources.dxf import read_dxf

D = "/root/reference/autotest/ogr/data/dxf"

SAMPLE_TEXT = 'Text Sample1¿λ\n"abc"'
SAMPLE_STYLE = 'Text Sample1¿λ\n\\"abc\\"'


def _pts(wkt):
    body = wkt[wkt.index("("):]
    return [tuple(float(v) for v in m.split())
            for m in re.findall(r"[-\d.e+]+(?: [-\d.e+]+)+", body)]


def _env_area(wkt):
    pts = _pts(wkt)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (max(xs) - min(xs)) * (max(ys) - min(ys))


@pytest.fixture(scope="module")
def assorted():
    return read_dxf(f"{D}/assorted.dxf")


def test_assorted_general(assorted):
    assert len(assorted) == 22
    f0 = assorted[0]
    assert f0["Layer"] == "0" and f0["PaperSpace"] is None
    assert f0["fid"] == 0
    assert f0["SubClasses"] == "AcDbEntity:AcDbEllipse"
    assert f0["EntityHandle"] == "43"
    assert f0["style"] == "PEN(c:#000000)"


def test_assorted_ellipses(assorted):
    w = assorted[0]["wkt"]
    assert w.startswith("LINESTRING Z ")
    assert _env_area(w) == pytest.approx(1596.12, abs=0.5)
    p0 = _pts(w)[0]
    assert p0[0] == pytest.approx(73.25, abs=0.001)
    assert p0[1] == pytest.approx(139.75, abs=0.001)
    w = assorted[1]["wkt"]
    assert _env_area(w) == pytest.approx(311.864, abs=0.5)
    p0 = _pts(w)[0]
    assert p0[0] == pytest.approx(61.133, abs=0.01)
    assert p0[1] == pytest.approx(103.592, abs=0.01)


def test_assorted_point_line_mtext(assorted):
    assert _pts(assorted[2]["wkt"])[0] == (83.5, 160.0, 0.0)
    assert assorted[2]["style"] == "PEN(c:#ffbeb8)"
    assert _pts(assorted[3]["wkt"]) == [(97.0, 159.5, 0.0),
                                        (108.5, 132.25, 0.0)]
    assert assorted[3]["wkt"].startswith("LINESTRING Z")  # kept 3D
    f4 = assorted[4]
    assert f4["wkt"] == "POINT (84 126)"  # kept 2D
    assert f4["style"] == \
        'LABEL(f:"Arial",t:"Test",a:30,s:5g,p:7,c:#000000)'


def test_assorted_partial_circle(assorted):
    w = assorted[5]["wkt"]
    assert _env_area(w) == pytest.approx(445.748, abs=0.5)
    p0 = _pts(w)[0]
    assert p0[0] == pytest.approx(115.258, abs=0.01)
    assert p0[1] == pytest.approx(107.791, abs=0.01)


def test_assorted_dimension(assorted):
    assert assorted[6]["PaperSpace"] == 1
    w = assorted[7]["wkt"]
    assert w.startswith("MULTILINESTRING ")
    want = [(63.8628719444825, 149.209935992088),
            (24.3419606685507, 111.934531038653),
            (72.3255686642474, 140.237438265109),
            (63.0051995752285, 150.119275371538),
            (32.8046573883157, 102.962033311673),
            (23.4842882992968, 112.843870418103)]
    got = _pts(w)
    for g, e in zip(got, want):
        assert g[0] == pytest.approx(e[0], abs=1e-8)
        assert g[1] == pytest.approx(e[1], abs=1e-8)
    # arrowheads
    a1 = _pts(assorted[8]["wkt"])
    assert assorted[8]["wkt"].startswith("POLYGON Z")
    assert a1[0][0] == pytest.approx(61.7583023958313, abs=1e-8)
    assert a1[0][1] == pytest.approx(147.797704380064, abs=1e-8)
    a2 = _pts(assorted[9]["wkt"])
    assert a2[0][0] == pytest.approx(26.4465302172018, abs=1e-8)
    # dimension text
    ft = assorted[10]
    p = _pts(ft["wkt"])[0]
    assert p[0] == pytest.approx(42.815907752635709, abs=1e-8)
    assert p[1] == pytest.approx(131.936242584545397, abs=1e-8)
    assert ft["style"] == \
        'LABEL(f:"Arial",t:"54.33",p:5,a:43.3,s:2.5g,c:#000000)'


def test_assorted_block(assorted):
    f = assorted[19]
    assert f["wkt"].startswith("MULTILINESTRING Z ")
    want = [(79.069506278985116, 121.003652476272777),
            (79.716898725419625, 118.892590150942851),
            (79.716898725419625, 118.892590150942851),
            (78.140638855839953, 120.440702522851453)]
    got = _pts(f["wkt"])
    for g, e in zip(got[:4], want):
        assert g[0] == pytest.approx(e[0], abs=1e-8)
        assert g[1] == pytest.approx(e[1], abs=1e-8)
    assert len(got) == 10  # five 2-point segments
    # MTEXTs from inside the block
    f20 = assorted[20]
    assert f20["Text"] == SAMPLE_TEXT
    assert f20["style"] == ('LABEL(f:"Arial",t:"' + SAMPLE_STYLE +
                            '",a:45,s:0.5g,p:5,c:#000000)')
    p = _pts(f20["wkt"])[0]
    assert p[0] == pytest.approx(77.602201427662891, abs=1e-8)
    f21 = assorted[21]
    assert f21["Text"] == "Second"
    assert f21["SubClasses"] == "AcDbEntity:AcDbMText"
    p = _pts(f21["wkt"])[0]
    assert p[0] == pytest.approx(79.977331629005178, abs=1e-8)
    assert p[1] == pytest.approx(119.698291706738644, abs=1e-8)


def test_entities_only():
    feats = read_dxf(f"{D}/entities_only.dxf")
    assert _pts(feats[0]["wkt"])[0] == (672500.0, 242000.0, 539.986)


def test_lwpolyline_ocs():
    feats = read_dxf(f"{D}/LWPOLYLINE-OCS.dxf")
    w = feats[1]["wkt"]
    assert w.startswith("LINESTRING Z")
    want = [(600325.567999998573214, 3153021.253000000491738,
             562.760000000052969),
            (600255.215999998385087, 3151973.98600000096485,
             536.950000000069849),
            (597873.927999997511506, 3152247.628000000491738,
             602.705000000089058)]
    for g, e in zip(_pts(w), want):
        assert g == pytest.approx(e, abs=1e-6)
    # OCS with bulge (giant expectation from test 10): check endpoints
    w = feats[12]["wkt"]
    pts = _pts(w)
    assert pts[0] == pytest.approx(
        (611415.459819656, 3139300.00002682, 1807.37309215522), abs=1e-6)
    assert pts[1] == pytest.approx(
        (611245.079665823, 3139720.59876424, 1807.37309215522), abs=1e-6)
    assert pts[-1] == pytest.approx(
        (610699.99993399, 3141066.17711854, 1792.31638281001), abs=1e-6)


def test_circle_exact():
    feats = read_dxf(f"{D}/circle.dxf")
    pts = _pts(feats[0]["wkt"])
    assert len(pts) == 91
    assert pts[0] == (5.0, 2.0, 3.0)
    assert pts[1] == pytest.approx(
        (4.990256201039297, 1.720974105023499, 3.0), abs=1e-12)
    assert pts[45] == pytest.approx((-3.0, 2.0, 3.0), abs=1e-12)
    assert pts[-1] == (5.0, 2.0, 3.0)


def test_3dface_and_solid():
    feats = read_dxf(f"{D}/3dface.dxf")
    assert _pts(feats[0]["wkt"]) == [(10, 20, 30), (11, 21, 31),
                                     (12, 22, 32), (10, 20, 30)]
    assert _pts(feats[1]["wkt"]) == [(10, 20, 30), (11, 21, 31),
                                     (12, 22, 32), (13, 23, 33),
                                     (10, 20, 30)]
    feats = read_dxf(f"{D}/solid.dxf")
    got = [p[:2] for p in _pts(feats[0]["wkt"])]
    assert got == [(2.716846, 2.762514), (2.393674, 1.647962),
                   (4.391042, 1.06881), (4.714214, 2.183362),
                   (2.716846, 2.762514)]


def test_polyline_smooth():
    feats = read_dxf(f"{D}/polyline_smooth.dxf")
    assert feats[0]["Layer"] == "1"
    w = feats[0]["wkt"]
    assert w.startswith("LINESTRING Z")
    pts = _pts(w)
    assert len(pts) == 146  # reference's pinned tessellation count
    assert pts[0][0] == pytest.approx(251297.8179, abs=0.001)
    assert pts[0][1] == pytest.approx(412226.8286, abs=0.001)
    assert _env_area(w) == pytest.approx(1350.43, abs=0.5)


def test_closed_polyline_with_bulge_exact():
    feats = read_dxf(f"{D}/closed_polyline_with_bulge.dxf")
    w = feats[0]["wkt"]
    pts = _pts(w)
    assert pts[0] == pts[-1]
    # the reference pins the whole tessellation; check the duplicated
    # junction vertices and a few exact interior points
    assert pts[1] == pts[2] == pytest.approx(
        (40585329.9256486, 3433998.44081707), abs=1e-6)
    assert pts[3] == pytest.approx(
        (40585328.5387678, 3434000.63680805), abs=1e-6)
    assert pts[-2] == pytest.approx(
        (40585366.9323928, 3433935.11979846), abs=1e-6)


def test_insert_only_count():
    feats = read_dxf(f"{D}/insert_only.dxf")
    # merged-block geometry mode: each INSERT -> one feature
    assert len(feats) >= 1
    assert all(f["wkt"] for f in feats)
