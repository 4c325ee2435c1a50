"""SQLite-dialect ST_* SQL functions over the engine's geometry
kernels (VERDICT r3 directive #3).

Re-derives ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:124-675
(REGISTER_ST_op list at :1188-1233): every function is registered in
the swq custom-function table under BOTH its bare name and the ST_
prefix, so `SELECT ST_Area(geom) FROM zones WHERE
ST_Intersects(geom, ST_GeomFromText('...'))` runs through
functions/sql_exec.py exactly like the reference's SQLite dialect.

Semantics notes (matching the reference's GEOS-backed behavior on
its own test matrix, autotest/ogr/ogr_sql_sqlite.py:1780-1900):

- geometry values travel as WKB (binary arrays); NULL or undecodable
  blobs yield NULL, like OGR2SQLITE_GetGeom's nullptr path;
- predicates implement the GEOS truth table for the polygon/polygon
  and point/polygon cases the dialect is used for: Contains/Within
  via intersection-area equality, Overlaps via strict partial
  overlap, Touches via zero-area contact at the boundary, Crosses
  false for equal-dimension area pairs;
- ST_Area/ST_Length/ST_Centroid/ST_Buffer/ST_MakePoint/
  ST_Intersection/Union/Difference/SymDifference map straight onto
  the engine kernels (functions/geom.py, overlay.py,
  constructive.py).

Per-row scalar evaluation mirrors the reference's sqlite UDF shape;
bulk spatial work belongs in the dedicated operators
(pipelines/spatial_sql.py), not the SQL scalar surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .constructive import buffer_polygon
from .geom import geom_area, geom_centroid, geom_length
from .overlay import (polygon_difference, polygon_intersection,
                      polygon_intersection_area, polygon_union)
from .swq import register_function
from .wkb import Geom, geom_to_wkb, geom_to_wkt, wkb_to_geom, wkt_to_geom

_EPS = 1e-9


def _iter_args(args):
    """Broadcast scalar/array args to aligned python rows (length-1
    arrays — e.g. a ST_GeomFromText literal — broadcast like
    scalars)."""
    n = 1
    for a in args:
        if isinstance(a, (pa.Array, pa.ChunkedArray)):
            n = max(n, len(a))
    rows = []
    for a in args:
        if isinstance(a, (pa.Array, pa.ChunkedArray)):
            vals = a.to_pylist()
            rows.append(vals * n if len(vals) == 1 and n > 1 else vals)
        else:
            rows.append([a] * n)
    return zip(*rows), n


def _scalar_fn(fn, out_type):
    def wrapper(*args):
        it, _ = _iter_args(args)
        return pa.array([fn(*row) for row in it], out_type)

    return wrapper


def _strip_srid(v: bytes) -> bytes:
    """EWKB -> plain WKB (drop the 0x20000000 SRID flag + 4 bytes)."""
    if len(v) > 9 and v[0] == 1 and (v[4] & 0x20):
        import struct

        gtype = struct.unpack_from("<I", v, 1)[0] & ~0x20000000
        return v[:1] + struct.pack("<I", gtype) + v[9:]
    return v


def geom_srid(v) -> int:
    """SRID of an EWKB blob (0 when absent) — ST_SRID semantics."""
    if isinstance(v, (bytes, bytearray)) and len(v) > 9             and v[0] == 1 and (v[4] & 0x20):
        import struct

        return struct.unpack_from("<i", v, 5)[0]
    return 0


def _geom(v):
    if v is None:
        return None
    try:
        if isinstance(v, str):
            return wkt_to_geom(v)
        return wkb_to_geom(_strip_srid(bytes(v)))
    except (ValueError, IndexError, NotImplementedError, Exception):
        return None


def _ring(g: Geom) -> np.ndarray | None:
    return g.rings[0] if g.rings else None


def _area(g: Geom) -> float:
    return geom_area(g)


def _shared_boundary(a: Geom, b: Geom) -> bool:
    """Any point of a's rings within _EPS of b's rings (segment
    distance), for the Touches predicate."""
    for ra in a.rings:
        for rb in b.rings:
            if _min_ring_dist(ra, rb) <= 1e-7:
                return True
    return False


def _min_ring_dist(ra: np.ndarray, rb: np.ndarray) -> float:
    if len(ra) == 1 or len(rb) == 1:
        d = np.hypot(ra[:, 0][:, None] - rb[:, 0][None, :],
                     ra[:, 1][:, None] - rb[:, 1][None, :])
        base = float(d.min())
        # a single point vs a multi-vertex ring still needs the
        # point-to-segment distances
        if len(ra) == 1 and len(rb) > 1:
            return min(base, _pt_seg_dist(ra[0], rb))
        if len(rb) == 1 and len(ra) > 1:
            return min(base, _pt_seg_dist(rb[0], ra))
        return base
    best = np.inf
    for ring1, ring2 in ((ra, rb), (rb, ra)):
        px = ring1[:, 0][:, None]
        py = ring1[:, 1][:, None]
        x1, y1 = ring2[:-1, 0][None, :], ring2[:-1, 1][None, :]
        x2, y2 = ring2[1:, 0][None, :], ring2[1:, 1][None, :]
        dx, dy = x2 - x1, y2 - y1
        ll = dx * dx + dy * dy
        tt = np.where(ll > 0,
                      ((px - x1) * dx + (py - y1) * dy) / np.where(ll > 0, ll, 1),
                      0.0)
        tt = np.clip(tt, 0.0, 1.0)
        cx, cy = x1 + tt * dx, y1 + tt * dy
        d = np.hypot(px - cx, py - cy)
        best = min(best, float(d.min()) if d.size else np.inf)
        if ra.shape == rb.shape:
            break
    return best


def _pt_seg_dist(p: np.ndarray, ring: np.ndarray) -> float:
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    dx, dy = x2 - x1, y2 - y1
    ll = dx * dx + dy * dy
    tt = np.where(ll > 0,
                  ((p[0] - x1) * dx + (p[1] - y1) * dy)
                  / np.where(ll > 0, ll, 1), 0.0)
    tt = np.clip(tt, 0.0, 1.0)
    return float(np.hypot(p[0] - (x1 + tt * dx),
                          p[1] - (y1 + tt * dy)).min())


def _point_in(g: Geom, x: float, y: float) -> bool:
    from .geom import PreparedPolygon

    for r in g.rings:
        if PreparedPolygon(Geom(3, [r])).contains_points(
                np.array([x]), np.array([y]))[0]:
            return True
    return False


def _predicate(op: str, a: Geom, b: Geom) -> bool | None:
    if a is None or b is None:
        return None
    # point cases
    a_pt = a.kind in (1,)
    b_pt = b.kind in (1,)
    if a_pt and b_pt:
        pa_, pb_ = a.rings[0][0], b.rings[0][0]
        eq = bool(np.allclose(pa_, pb_, atol=_EPS))
        return {"INTERSECTS": eq, "EQUALS": eq, "DISJOINT": not eq,
                "TOUCHES": False, "CROSSES": False, "WITHIN": eq,
                "CONTAINS": eq, "OVERLAPS": False}[op]
    if a_pt or b_pt:
        pt = a if a_pt else b
        poly = b if a_pt else a
        x, y = pt.rings[0][0]
        inside = _point_in(poly, x, y)
        on_edge = any(_min_ring_dist(pt.rings[0][:1], r) <= 1e-7
                      for r in poly.rings)
        inter = inside or on_edge
        return {"INTERSECTS": inter, "EQUALS": False,
                "DISJOINT": not inter,
                "TOUCHES": on_edge and not inside, "CROSSES": False,
                "WITHIN": inside if a_pt else False,
                "CONTAINS": inside if b_pt else False,
                "OVERLAPS": False}[op]
    # polygon/polygon via intersection area (GEOS truth table on the
    # reference's own matrix: equal, partial-overlap, contained,
    # edge-touching rectangle pairs)
    area_a = _area(a)
    area_b = _area(b)
    inter = 0.0
    for ra in a.rings:
        for rb in b.rings:
            inter += polygon_intersection_area(ra, rb)
    # the overlay's degenerate-case perturbation is ~2.4e-9 per
    # coordinate; classify within 1e-6 relative so identical
    # polygons compare Equals (GEOS semantics on the reference matrix)
    tol = max(area_a, area_b, 1.0) * 1e-6
    equals = (abs(inter - area_a) <= tol and abs(inter - area_b) <= tol)
    contains = abs(inter - area_b) <= tol
    within = abs(inter - area_a) <= tol
    if inter > tol:
        return {"INTERSECTS": True, "EQUALS": equals, "DISJOINT": False,
                "TOUCHES": False, "CROSSES": False, "WITHIN": within,
                "CONTAINS": contains,
                "OVERLAPS": not within and not contains}[op]
    touches = _shared_boundary(a, b)
    return {"INTERSECTS": touches, "EQUALS": False,
            "DISJOINT": not touches, "TOUCHES": touches,
            "CROSSES": False, "WITHIN": False, "CONTAINS": False,
            "OVERLAPS": False}[op]


def _overlay(op: str, a: Geom, b: Geom) -> bytes | None:
    if a is None or b is None:
        return None
    ra, rb = _ring(a), _ring(b)
    if ra is None or rb is None:
        return None
    if op == "INTERSECTION":
        rings = polygon_intersection(ra, rb)
    elif op == "UNION":
        rings = polygon_union(ra, rb)
    elif op == "DIFFERENCE":
        rings = polygon_difference(ra, rb)
    else:  # SYMDIFFERENCE = (A-B) u (B-A)
        rings = polygon_difference(ra, rb) + polygon_difference(rb, ra)
    rings = [r for r in rings if len(r) >= 3]
    if not rings:
        return geom_to_wkb(Geom(3, []))
    if len(rings) == 1:
        return geom_to_wkb(Geom(3, rings))
    return geom_to_wkb(Geom(6, rings,
                            poly_ring_counts=[1] * len(rings)))


# --------------------------------------------------------- registrations

def _st_geomfromtext(wkt, srid=None):
    if wkt is None:
        return None
    try:
        wkb = geom_to_wkb(wkt_to_geom(wkt))
    except (ValueError, IndexError):
        return None
    if srid:
        # EWKB: set the SRID flag and splice the id in (the SQLite
        # dialect keeps the SRID with the geometry; ST_SRID reads it)
        import struct

        gtype = struct.unpack_from("<I", wkb, 1)[0] | 0x20000000
        wkb = (wkb[:1] + struct.pack("<I", gtype)
               + struct.pack("<i", int(srid)) + wkb[5:])
    return wkb


def _st_astext(v):
    g = _geom(v)
    return None if g is None else geom_to_wkt(g)


def _st_area(v):
    g = _geom(v)
    if g is None or g.kind not in (3, 6):
        return None
    return _area(g)


def _st_length(v):
    g = _geom(v)
    return None if g is None else geom_length(g)


def _st_centroid(v):
    g = _geom(v)
    if g is None:
        return None
    cx, cy = geom_centroid(g)
    return geom_to_wkb(Geom(1, [np.array([[cx, cy]])]))


def _st_x(v):
    g = _geom(v)
    return None if g is None or g.kind != 1 else float(g.rings[0][0, 0])


def _st_y(v):
    g = _geom(v)
    return None if g is None or g.kind != 1 else float(g.rings[0][0, 1])


def _st_makepoint(x, y, z=None):
    if x is None or y is None:
        return None
    return geom_to_wkb(Geom(1, [np.array([[float(x), float(y)]])]))


def _st_buffer(v, dist):
    g = _geom(v)
    if g is None or dist is None:
        return None
    if g.kind == 1:
        from .constructive import buffer_point

        x, y = g.rings[0][0]
        return geom_to_wkb(Geom(3, [buffer_point(float(x), float(y),
                                                 float(dist))]))
    r = _ring(g)
    if r is None:
        return None
    return geom_to_wkb(Geom(3, [buffer_polygon(r, float(dist))]))


def _st_distance(va, vb):
    a, b = _geom(va), _geom(vb)
    if a is None or b is None:
        return None
    if _predicate("INTERSECTS", a, b):
        return 0.0
    best = np.inf
    for ra in a.rings:
        for rb in b.rings:
            best = min(best, _min_ring_dist(ra, rb))
    return float(best)


def _st_isempty(v):
    g = _geom(v)
    return None if g is None else int(
        not g.rings or all(len(r) == 0 for r in g.rings))


def _st_isvalid(v):
    g = _geom(v)
    if g is None:
        return None
    if g.kind not in (3, 6):
        return 1
    # bowtie check: any self-intersecting ring is invalid
    from .overlay import _seg_intersect

    for r in g.rings:
        p = r if not np.array_equal(r[0], r[-1]) else r[:-1]
        n = len(p)
        for i in range(n):
            for j in range(i + 1, n):
                if abs(i - j) in (0, 1) or (i == 0 and j == n - 1):
                    continue
                hit = _seg_intersect(p[i], p[(i + 1) % n],
                                     p[j], p[(j + 1) % n])
                if hit is not None:
                    return 0
    return 1


def _st_issimple(v):
    return _st_isvalid(v)


def _st_srid(v):
    if v is None or _geom(v) is None:
        return None
    return geom_srid(v)


def _st_makevalid(v):
    g = _geom(v)
    if g is None:
        return None
    if g.kind not in (3, 6):
        return geom_to_wkb(g)
    from .constructive import make_valid_ring

    rings = []
    for r in g.rings:
        rings.extend(make_valid_ring(r))
    k = 3 if len(rings) <= 1 else 6
    return geom_to_wkb(Geom(k, rings))


def register_all() -> None:
    """Register every dialect function (idempotent)."""
    pairs = {
        "GEOMFROMTEXT": (_st_geomfromtext, pa.binary()),
        "GEOMFROMWKB": (lambda v, s=None: (
            None if _geom(v) is None else geom_to_wkb(_geom(v))),
            pa.binary()),
        "ASTEXT": (_st_astext, pa.string()),
        "ASBINARY": (lambda v: (None if _geom(v) is None
                                else geom_to_wkb(_geom(v))), pa.binary()),
        "AREA": (_st_area, pa.float64()),
        "LENGTH": (_st_length, pa.float64()),
        "CENTROID": (_st_centroid, pa.binary()),
        "BUFFER": (_st_buffer, pa.binary()),
        "MAKEPOINT": (_st_makepoint, pa.binary()),
        "MAKEVALID": (_st_makevalid, pa.binary()),
        "DISTANCE": (_st_distance, pa.float64()),
        "ISEMPTY": (_st_isempty, pa.int64()),
        "ISVALID": (_st_isvalid, pa.int64()),
        "ISSIMPLE": (_st_issimple, pa.int64()),
        "SRID": (_st_srid, pa.int64()),
        "X": (_st_x, pa.float64()),
        "Y": (_st_y, pa.float64()),
    }
    for op in ("INTERSECTS", "EQUALS", "DISJOINT", "TOUCHES", "CROSSES",
               "WITHIN", "CONTAINS", "OVERLAPS"):
        def mk(o):
            def f(a, b):
                r = _predicate(o, _geom(a), _geom(b))
                return None if r is None else int(r)

            return f

        pairs[op] = (mk(op), pa.int64())
    for op in ("INTERSECTION", "UNION", "DIFFERENCE", "SYMDIFFERENCE"):
        def mkov(o):
            return lambda a, b: _overlay(o, _geom(a), _geom(b))

        pairs[op] = (mkov(op), pa.binary())

    for name, (fn, typ) in pairs.items():
        wrapped = _scalar_fn(fn, typ)
        register_function("ST_" + name, wrapped)
        # bare alias, like REGISTER_ST_op registers both spellings —
        # except LENGTH, where the bare name must stay the swq string
        # length function (the reference has the same collision and
        # resolves it the same way)
        if name not in ("LENGTH",):
            register_function(name, wrapped)


register_all()
