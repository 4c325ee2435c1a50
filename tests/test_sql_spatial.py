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


# ------------------------------------------------- vectorized fast paths


def _rand_poly_wkb(rng, nv, srid=0):
    from gdal_ray.functions.sql_spatial import _st_geomfromtext

    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = rng.uniform(1.0, 5.0, nv)
    cx, cy = rng.uniform(-50, 50, 2)
    pts = [(cx + ri * np.cos(a), cy + ri * np.sin(a))
           for a, ri in zip(ang, r)]
    pts.append(pts[0])
    wkt = "POLYGON((" + ",".join(f"{x!r} {y!r}" for x, y in pts) + "))"
    return _st_geomfromtext(wkt, srid or None)


def test_fast_paths_bit_identical_to_scalar():
    """VERDICT r4 directive #3: the vectorized column dispatch must
    reproduce the per-row scalar path bit-for-bit — areas/lengths on
    single-ring polygons (incl. >128-vertex rings where numpy's
    pairwise summation shape matters and EWKB SRID headers), X/Y on
    points, all eight predicates and ST_Distance for a point column
    against a literal polygon."""
    import pyarrow as pa

    from gdal_ray.functions.sql_spatial import (_FAST_PATHS, _scalar_fn,
                                                _st_area, _st_distance,
                                                _st_geomfromtext,
                                                _st_length, _st_makepoint,
                                                _st_x, _st_y, _geom,
                                                _predicate)

    rng = np.random.default_rng(42)
    polys = [_rand_poly_wkb(rng, nv, srid=(4326 if i % 3 == 0 else 0))
             for i, nv in enumerate([4, 7, 12, 150, 300, 5, 64])]
    polys.append(None)
    col = pa.array(polys, pa.binary())

    for fast_name, scalar in (("AREA", _st_area), ("LENGTH", _st_length)):
        got = _FAST_PATHS[fast_name](col)
        assert got is not None
        exp = _scalar_fn(scalar, pa.float64())(col)
        assert got.equals(exp), fast_name

    pts = [_st_makepoint(float(x), float(y))
           for x, y in rng.uniform(-20, 20, (200, 2))]
    pts.append(None)
    pcol = pa.array(pts, pa.binary())
    for fast_name, scalar in (("X", _st_x), ("Y", _st_y)):
        got = _FAST_PATHS[fast_name](pcol)
        assert got is not None
        exp = _scalar_fn(scalar, pa.float64())(pcol)
        assert got.equals(exp), fast_name

    lit = _st_geomfromtext("POLYGON((-10 -10,15 -10,15 12,-10 12,-10 -10))")
    larr = pa.array([lit], pa.binary())
    for op in ("INTERSECTS", "EQUALS", "DISJOINT", "TOUCHES", "CROSSES",
               "WITHIN", "CONTAINS", "OVERLAPS"):
        got = _FAST_PATHS[op](pcol, larr)
        assert got is not None
        exp = pa.array(
            [None if p is None else int(_predicate(op, _geom(p), _geom(lit)))
             for p in pts], pa.int64())
        assert got.equals(exp), f"{op} col-vs-lit"
        got2 = _FAST_PATHS[op](larr, pcol)
        exp2 = pa.array(
            [None if p is None else int(_predicate(op, _geom(lit), _geom(p)))
             for p in pts], pa.int64())
        assert got2.equals(exp2), f"{op} lit-vs-col"

    gotd = _FAST_PATHS["DISTANCE"](pcol, larr)
    assert gotd is not None
    expd = pa.array([None if p is None else _st_distance(p, lit)
                     for p in pts], pa.float64())
    assert gotd.equals(expd)

    # point literal
    plit = pa.array([_st_makepoint(3.0, 4.0)], pa.binary())
    gotp = _FAST_PATHS["DISTANCE"](pcol, plit)
    expp = pa.array([None if p is None else _st_distance(p, plit[0].as_py())
                     for p in pts], pa.float64())
    assert gotp.equals(expp)


def test_fast_path_falls_back_on_unsupported_layouts():
    import pyarrow as pa

    from gdal_ray.functions.sql_spatial import _FAST_PATHS, _st_geomfromtext

    # big-endian WKB point -> fast parse refuses, returns None
    import struct
    be_pt = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    col = pa.array([be_pt, be_pt], pa.binary())
    assert _FAST_PATHS["X"](col) is None
    # multi-ring polygon -> area fast path refuses
    hole = _st_geomfromtext(
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,3 2,3 3,2 3,2 2))")
    assert _FAST_PATHS["AREA"](pa.array([hole, hole], pa.binary())) is None


def test_fast_path_is_the_registered_surface():
    """The dispatched fast path is what the swq SQL surface actually
    calls (CUSTOM_FUNCS registration) — same values as the scalar
    wrapper, so q_sql_spatial hashes are unchanged by construction."""
    import pyarrow as pa

    from gdal_ray.functions.sql_spatial import _scalar_fn, _st_area
    from gdal_ray.functions.swq import CUSTOM_FUNCS

    wkbs = [_rand_poly_wkb(np.random.default_rng(i), 6) for i in range(50)]
    col = pa.chunked_array([pa.array(wkbs, pa.binary())])
    got = CUSTOM_FUNCS["ST_AREA"](col)
    exp = _scalar_fn(_st_area, pa.float64())(col)
    assert pa.chunked_array([got]).combine_chunks().equals(
        pa.chunked_array([exp]).combine_chunks())


def test_fast_area_refuses_zero_point_rings():
    """A polygon with a 0-point ring passes the layout header checks
    but would corrupt the segment-roll of the PREVIOUS row; the fast
    parse must refuse the column so the scalar loop answers
    (round-5 review finding)."""
    import struct

    import pyarrow as pa

    from gdal_ray.functions.sql_spatial import (_FAST_PATHS, _scalar_fn,
                                                _st_area,
                                                _st_geomfromtext)

    square = _st_geomfromtext(
        "POLYGON((10 20,14 20,14 24,10 24,10 20))")
    empty = (b"\x01" + struct.pack("<I", 3) + struct.pack("<I", 1)
             + struct.pack("<I", 0))
    tri = _st_geomfromtext("POLYGON((0 0,3 0,0 3,0 0))")
    col = pa.array([square, empty, tri], pa.binary())
    assert _FAST_PATHS["AREA"](col) is None  # falls back
    slow = _scalar_fn(_st_area, pa.float64())(col)
    assert slow[0].as_py() == 16.0


def test_fast_distance_literal_first_matches_scalar():
    """np.allclose's rtol scales the SECOND operand; the fast path
    must pick the same operand as the scalar path for both argument
    orders (round-5 review finding)."""
    import pyarrow as pa

    from gdal_ray.functions.sql_spatial import (_FAST_PATHS,
                                                _st_distance,
                                                _st_makepoint)

    lit = _st_makepoint(1.0, 0.0)
    near = _st_makepoint(1.0 + 1.00011e-5, 0.0)
    pcol = pa.array([near, near], pa.binary())
    larr = pa.array([lit], pa.binary())
    for a, b in ((larr, pcol), (pcol, larr)):
        got = _FAST_PATHS["DISTANCE"](a, b)
        assert got is not None
        sa = lit if a is larr else near
        sb = near if a is larr else lit
        exp = _st_distance(sa, sb)
        assert got[0].as_py() == exp, (got[0].as_py(), exp)
