"""SQLite-dialect ST_* SQL functions (functions/sql_spatial.py) vs
the reference's own test matrix (autotest/ogr/ogr_sql_sqlite.py
:1770-1900, GEOS-backed expectations) and
ogrsqlitesqlfunctions.cpp:1188-1233 registration semantics."""

import numpy as np
import pyarrow as pa
import pytest

import gdal_ray.functions.sql_spatial  # noqa: F401  (registers)
from gdal_ray.functions.swq import _call

A = "POLYGON((0 0,0 1,1 1,1 0,0 0))"
B = "POLYGON((0.5 0.5,0.5 1.5,1.5 1.5,1.5 0.5,0.5 0.5))"   # overlap
C = "POLYGON((0.25 0.25,0.25 0.75,0.75 0.75,0.75 0.25,0.25 0.25))"
D = "POLYGON((1 0,1 1,2 1,2 0,1 0))"                        # edge touch


def g(wkt):
    return _call("ST_GEOMFROMTEXT", [wkt])


def one(name, *args):
    r = _call(name, list(args))
    return r[0].as_py() if isinstance(r, (pa.Array, pa.ChunkedArray)) else r


PREDS = ["Intersects", "Equals", "Disjoint", "Touches", "Crosses",
         "Within", "Contains", "Overlaps"]

# GEOS truth table from the reference's own matrix (A vs A/B/C/D)
TRUTH = {
    A: [1, 1, 0, 0, 0, 1, 1, 0],
    B: [1, 0, 0, 0, 0, 0, 0, 1],
    C: [1, 0, 0, 0, 0, 0, 1, 0],
    D: [1, 0, 0, 1, 0, 0, 0, 0],
}


@pytest.mark.parametrize("other", [A, B, C, D], ids=["eq", "ovl", "in",
                                                     "touch"])
def test_predicates_reference_matrix(other):
    got = [one("ST_" + p.upper(), g(A), g(other)) for p in PREDS]
    assert got == TRUTH[other]
    # bare aliases register too (REGISTER_ST_op registers both)
    got2 = [one(p.upper(), g(A), g(other)) for p in PREDS]
    assert got2 == TRUTH[other]


def test_area_null_and_invalid_blob():
    # ogr_sql_sqlite.py:1782: ST_Area(null) / ST_Area(x'00') -> NULL
    assert one("ST_AREA", g(A)) == pytest.approx(1.0, abs=1e-5)
    assert one("ST_AREA", None) is None
    assert one("ST_AREA", b"\x00") is None


def test_overlay_areas():
    inter = one("ST_AREA", one("ST_INTERSECTION", g(A), g(B)))
    union = one("ST_AREA", one("ST_UNION", g(A), g(B)))
    diff = one("ST_AREA", one("ST_DIFFERENCE", g(A), g(B)))
    sym = one("ST_AREA", one("ST_SYMDIFFERENCE", g(A), g(B)))
    assert inter == pytest.approx(0.25, abs=1e-6)
    assert union == pytest.approx(1.75, abs=1e-6)
    assert diff == pytest.approx(0.75, abs=1e-6)
    assert sym == pytest.approx(1.5, abs=1e-6)


def test_point_helpers():
    p = one("ST_MAKEPOINT", 3.5, 4.25)
    assert one("ST_X", p) == 3.5 and one("ST_Y", p) == 4.25
    assert one("ST_ASTEXT", p) == "POINT (3.5 4.25)"
    assert one("ST_SRID", p) == 0
    c = one("ST_CENTROID", g(A))
    assert one("ST_ASTEXT", c) == "POINT (0.5 0.5)"


def test_distance():
    pa_ = one("ST_MAKEPOINT", 0.0, 0.0)
    pb = one("ST_MAKEPOINT", 3.0, 4.0)
    assert one("ST_DISTANCE", pa_, pb) == pytest.approx(5.0)
    far = g("POLYGON((5 0,5 1,6 1,6 0,5 0))")
    assert one("ST_DISTANCE", g(A), far) == pytest.approx(4.0)
    assert one("ST_DISTANCE", g(A), g(D)) == 0.0
    # point on the polygon edge
    edge = one("ST_MAKEPOINT", 1.0, 0.5)
    assert one("ST_DISTANCE", g(A), edge) == 0.0
    assert one("ST_TOUCHES", edge, g(A)) == 1
    inside = one("ST_MAKEPOINT", 0.5, 0.5)
    assert one("ST_WITHIN", inside, g(A)) == 1
    assert one("ST_CONTAINS", g(A), inside) == 1


def test_validity_trio():
    # bowtie: IsValid/IsSimple false, like the reference matrix
    bow = g("POLYGON((0 0,1 1,0 1,1 0,0 0))")
    assert one("ST_ISVALID", bow) == 0
    assert one("ST_ISVALID", g(A)) == 1
    assert one("ST_ISEMPTY", g(A)) == 0
    assert one("ST_ISSIMPLE", g(A)) == 1


def test_buffer_area_formula():
    # 32-gon point buffer (quadsegs=8): area = n/2 * r^2 * sin(2pi/n)
    p = one("ST_MAKEPOINT", 10.0, 10.0)
    got = one("ST_AREA", one("ST_BUFFER", p, 0.5))
    assert got == pytest.approx(0.5 * 32 * 0.25 * np.sin(2 * np.pi / 32),
                                rel=1e-12)
    # polygon buffer of the unit square ~ A + P*d + arc area
    got2 = one("ST_AREA", one("ST_BUFFER", g(A), 0.1))
    assert got2 == pytest.approx(1 + 4 * 0.1
                                 + 0.5 * 32 * 0.01 * np.sin(2 * np.pi / 32),
                                 rel=1e-6)


def test_through_execute_sql(ray_session):
    from gdal_ray.functions.sql_exec import execute

    t = execute(
        "SELECT event_id, "
        "ST_WITHIN(ST_MAKEPOINT((value * 7.0) % 360.0 - 180.0, "
        "(value * 3.0) % 170.0 - 85.0), "
        "ST_GEOMFROMTEXT('POLYGON ((0 40, 10 40, 10 50, 0 50, 0 40))'))"
        " AS inside FROM events WHERE event_id < 64",
        "/root/testdata/sf0.001")
    assert t.num_rows == 64
    assert set(t["inside"].to_pylist()) <= {0, 1}


def test_srid_carried_in_ewkb():
    # ogr_sql_sqlite.py:1771: ST_SRID(ST_GeomFromText('POINT(0 0)',
    # 4326)) == 4326; srid-less construction reads 0
    assert one("ST_SRID", one("ST_GEOMFROMTEXT", "POINT(0 0)",
                              4326)) == 4326
    assert one("ST_SRID", g("POINT(0 0)")) == 0
    # geometry ops strip the EWKB header transparently
    p = one("ST_GEOMFROMTEXT", "POLYGON((0 0,0 2,2 2,2 0,0 0))", 31370)
    assert one("ST_AREA", p) == pytest.approx(4.0)
    assert one("ST_ASTEXT", one("ST_CENTROID", p)) == "POINT (1 1)"
