"""WKB geometry codec (the engine's OGR geometry-factory stand-in).

Matches the subset of ISO WKB that OGR's Arrow interface emits for
layers (reference ogr/ogr_wkb.cpp, ogr/ogrgeometryfactory.cpp:4292;
GEOMETRY_ENCODING=WKB per apps/ogr2ogr_lib.cpp:4205): Point,
LineString, Polygon (with holes), MultiPoint, MultiLineString,
MultiPolygon — 2-D, little- or big-endian on read, little-endian on
write.

Decoded form: a ``Geom`` dataclass holding numpy ring arrays — the
in-memory unit the geometry kernels (geom.py) consume. Point columns
have a fast fully-vectorized path (``points_to_wkb``/
``wkb_to_points``) since points dominate the join workloads.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6
GEOMETRYCOLLECTION = 7
_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
          5: "MultiLineString", 6: "MultiPolygon",
          7: "GeometryCollection"}


@dataclass
class Geom:
    """Decoded 2-D geometry.

    ``rings``: list of (n, 2) float64 arrays. For Polygon the first
    ring is the shell and the rest are holes; for MultiPolygon,
    ``poly_ring_counts`` gives how many consecutive rings belong to
    each member polygon. For (Multi)LineString each array is one part;
    for (Multi)Point a single (n, 2) array.
    """

    kind: int
    rings: list[np.ndarray] = field(default_factory=list)
    poly_ring_counts: list[int] = field(default_factory=list)
    # Z values per ring, parallel to ``rings`` (None = 2-D) — the
    # 2.5-D OGR wkbPoint25D family (ogr/ogr_core.h wkb25DBit / ISO
    # 1000+k types; ogr2ogr -zfield sets these from an attribute)
    zs: list[np.ndarray] | None = None
    # GEOMETRYCOLLECTION members (kind 7 only; rings stays empty)
    members: list["Geom"] | None = None

    @property
    def name(self) -> str:
        return _NAMES[self.kind]

    def bbox(self) -> tuple[float, float, float, float]:
        xs = np.concatenate([r[:, 0] for r in self.rings])
        ys = np.concatenate([r[:, 1] for r in self.rings])
        return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


# ----------------------------------------------------------------- vectorized points
def points_to_wkb(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Vectorized little-endian WKB point column."""
    n = len(x)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    hdr = np.array([POINT], dtype="<u4").view(np.uint8)
    buf[:, 1:5] = hdr
    buf[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    return [b.tobytes() for b in buf]


def wkb_to_points(col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a column of WKB points (uniform 21-byte LE)."""
    arr = np.frombuffer(b"".join(col), dtype=np.uint8).reshape(len(col), 21)
    if not (arr[:, 0] == 1).all():
        raise ValueError("big-endian points in fast path")
    x = arr[:, 5:13].copy().view("<f8")[:, 0]
    y = arr[:, 13:21].copy().view("<f8")[:, 0]
    return x, y


def points_to_wkb_z(x: np.ndarray, y: np.ndarray,
                    z: np.ndarray) -> list[bytes]:
    """Vectorized little-endian ISO POINT Z column (type 1001) — the
    bulk form of the ogr2ogr -zfield promotion."""
    n = len(x)
    buf = np.empty((n, 29), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.array([1001], dtype="<u4").view(np.uint8)
    buf[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 21:29] = np.ascontiguousarray(z, dtype="<f8").view(np.uint8).reshape(n, 8)
    return [b.tobytes() for b in buf]


def wkb_to_points_z(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decode of a column of ISO WKB POINT Z (29-byte LE)."""
    arr = np.frombuffer(b"".join(col), dtype=np.uint8).reshape(len(col), 29)
    if not (arr[:, 0] == 1).all():
        raise ValueError("big-endian points in fast path")
    x = arr[:, 5:13].copy().view("<f8")[:, 0]
    y = arr[:, 13:21].copy().view("<f8")[:, 0]
    z = arr[:, 21:29].copy().view("<f8")[:, 0]
    return x, y, z


def snap_resolution(v: np.ndarray, res: float) -> np.ndarray:
    """std::round(v/res)*res — OGRGeomCoordinatePrecision snapping
    (half away from zero), shared by round_coordinates and the
    vectorized point path."""
    t = np.asarray(v, np.float64) / res
    return np.trunc(t + np.copysign(0.5, t)) * res


# ----------------------------------------------------------------- generic codec
def _rd_uint32(data, pos, little):
    return struct.unpack_from("<I" if little else ">I", data, pos)[0], pos + 4


def _rd_coords(data, pos, n, little, dims: int = 2):
    fmt = "<" if little else ">"
    arr = np.frombuffer(data, dtype=fmt + "f8", count=dims * n, offset=pos)
    arr = arr.reshape(n, dims).astype(np.float64)
    return arr, pos + 8 * dims * n


def _geom_flags(gtype: int) -> tuple[int, bool, bool]:
    """(base type, has_z, has_m) following OGRReadWKBGeometryType
    (ogr/ogrutils.cpp): EWKB Z (0x80000000, type cleaned to the low
    byte), PostGIS M bit (0x40000000), the 'Z flag in the 2nd byte'
    quirk (0x8000, the autotest 3d_broken_* fixtures), and the ISO
    1000/2000/3000 Z/M/ZM ranges.  M values are parsed and dropped
    (the engine's geometry model is XY[Z])."""
    has_z = False
    has_m = False
    if gtype & 0x40000000:  # PostGIS M bit
        gtype &= ~0x40000000
        has_m = True
    if gtype & 0x80000000:  # old-style 25D bit
        gtype &= 0x000000FF
        has_z = True
    if gtype & 0x8000:      # Z flag in the 2nd byte (broken encoders)
        gtype &= 0x000000FF
        has_z = True
    iso = gtype // 1000
    if iso == 1:
        has_z = True
    elif iso == 2:
        has_m = True
    elif iso == 3:
        has_z = has_m = True
    return gtype % 1000, has_z, has_m


def _parse(data: bytes, pos: int):
    border = data[pos]
    if border & 0x31 == border:   # DB2 v7.2 ASCII byte-order quirk
        border &= 0x1             # (ogr_core.h DB2_V72_FIX_BYTE_ORDER)
    if border not in (0, 1):
        raise ValueError(f"WKB: corrupt byte order {data[pos]}")
    little = border == 1
    pos += 1
    gtype, pos = _rd_uint32(data, pos, little)
    gtype, has_z, has_m = _geom_flags(gtype)
    dims = 2 + (1 if has_z else 0) + (1 if has_m else 0)

    def split(arr):
        return (arr[:, :2], arr[:, 2]) if has_z else (arr[:, :2], None)

    if gtype == POINT:
        c, pos = _rd_coords(data, pos, 1, little, dims)
        xy, z = split(c)
        return Geom(POINT, [xy], zs=[z] if has_z else None), pos
    if gtype == LINESTRING:
        n, pos = _rd_uint32(data, pos, little)
        c, pos = _rd_coords(data, pos, n, little, dims)
        xy, z = split(c)
        return Geom(LINESTRING, [xy], zs=[z] if has_z else None), pos
    if gtype == POLYGON:
        nrings, pos = _rd_uint32(data, pos, little)
        rings = []
        zs = [] if has_z else None
        for _ in range(nrings):
            n, pos = _rd_uint32(data, pos, little)
            c, pos = _rd_coords(data, pos, n, little, dims)
            xy, z = split(c)
            rings.append(xy)
            if has_z:
                zs.append(z)
        return Geom(POLYGON, rings, [nrings], zs=zs), pos
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        nparts, pos = _rd_uint32(data, pos, little)
        rings: list[np.ndarray] = []
        counts: list[int] = []
        pts: list[np.ndarray] = []
        zs: list[np.ndarray] = []
        any_z = False
        for _ in range(nparts):
            sub, pos = _parse(data, pos)
            any_z = any_z or sub.zs is not None
            if gtype == MULTIPOINT:
                pts.append(sub.rings[0])
                zs.extend(sub.zs or [np.zeros(len(sub.rings[0]))])
            else:
                rings.extend(sub.rings)
                zs.extend(sub.zs or [np.zeros(len(r)) for r in sub.rings])
                if gtype == MULTIPOLYGON:
                    counts.extend(sub.poly_ring_counts)
        if gtype == MULTIPOINT:
            return Geom(MULTIPOINT,
                        [np.concatenate(pts) if pts else np.empty((0, 2))],
                        zs=[np.concatenate(zs)] if any_z else None), pos
        return Geom(gtype, rings, counts, zs=zs if any_z else None), pos
    if gtype == GEOMETRYCOLLECTION:
        nparts, pos = _rd_uint32(data, pos, little)
        members = []
        for _ in range(nparts):
            sub, pos = _parse(data, pos)
            members.append(sub)
        return Geom(GEOMETRYCOLLECTION, [], members=members), pos
    raise NotImplementedError(f"WKB geometry type {gtype}")


def wkb_to_geom(data: bytes) -> Geom:
    return _parse(data, 0)[0]


def _w_coords(xy: np.ndarray) -> bytes:
    return np.ascontiguousarray(xy, dtype="<f8").tobytes()


def _w3(xy: np.ndarray, z: np.ndarray) -> bytes:
    c = np.empty((len(xy), 3))
    c[:, :2] = xy
    c[:, 2] = z
    return np.ascontiguousarray(c, dtype="<f8").tobytes()


def geom_to_wkb(g: Geom) -> bytes:
    """ISO WKB writer; 2.5-D geometries (``zs`` set) emit the ISO
    1000+k Z types (OGRGeometry::exportToWkb wkbVariantIso)."""
    zv = g.zs
    zoff = 1000 if zv is not None else 0
    h = lambda t: b"\x01" + struct.pack("<I", t + zoff)

    def coords(i: int, sl=None) -> bytes:
        r = g.rings[i] if sl is None else g.rings[i][sl]
        if zv is None:
            return _w_coords(r)
        z = zv[i] if sl is None else zv[i][sl]
        return _w3(r, z)

    if g.kind == POINT:
        return h(POINT) + coords(0, slice(0, 1))
    if g.kind == LINESTRING:
        return h(LINESTRING) + struct.pack("<I", len(g.rings[0])) + coords(0)
    if g.kind == POLYGON:
        out = h(POLYGON) + struct.pack("<I", len(g.rings))
        for i, r in enumerate(g.rings):
            out += struct.pack("<I", len(r)) + coords(i)
        return out
    if g.kind == MULTIPOINT:
        pts = g.rings[0]
        out = h(MULTIPOINT) + struct.pack("<I", len(pts))
        for j in range(len(pts)):
            out += h(POINT) + coords(0, slice(j, j + 1))
        return out
    if g.kind == MULTILINESTRING:
        out = h(MULTILINESTRING) + struct.pack("<I", len(g.rings))
        for i, r in enumerate(g.rings):
            out += h(LINESTRING) + struct.pack("<I", len(r)) + coords(i)
        return out
    if g.kind == MULTIPOLYGON:
        out = h(MULTIPOLYGON) + struct.pack("<I", len(g.poly_ring_counts))
        i = 0
        for cnt in g.poly_ring_counts:
            out += h(POLYGON) + struct.pack("<I", cnt)
            for k in range(i, i + cnt):
                out += struct.pack("<I", len(g.rings[k])) + coords(k)
            i += cnt
        return out
    if g.kind == GEOMETRYCOLLECTION:
        out = b"\x01" + struct.pack("<I", GEOMETRYCOLLECTION)
        out += struct.pack("<I", len(g.members or []))
        for sub in g.members or []:
            out += geom_to_wkb(sub)
        return out
    raise NotImplementedError(g.kind)


def set_z(g: Geom, z) -> Geom:
    """Constant-Z promotion — the ogr2ogr ``-zfield`` semantic: every
    vertex gets the feature's attribute value
    (apps/ogr2ogr_lib.cpp zField -> set3D + setZ)."""
    zf = float(z)
    return Geom(g.kind, g.rings, g.poly_ring_counts,
                zs=[np.full(len(r), zf) for r in g.rings])


def round_coordinates(g: Geom, xy_res: float, z_res: float | None = None) -> Geom:
    """OGRGeomCoordinatePrecision rounding (ogr2ogr -xyRes/-zRes;
    OGRGeometry::roundCoordinates, ogr/ogrgeometry.cpp): each
    coordinate snaps to the nearest multiple of the resolution with
    std::round (half away from zero) semantics."""
    rings = [snap_resolution(r, xy_res) for r in g.rings]
    zs = g.zs
    if zs is not None and z_res is not None:
        zs = [snap_resolution(z, z_res) for z in zs]
    return Geom(g.kind, rings, g.poly_ring_counts, zs=zs)


# ----------------------------------------------------------------- WKT codec
def geom_to_wkt(g: Geom, precision: int = 15) -> str:
    """ISO WKT writer (OGRGeometry::exportToWkt analog); 2.5-D
    geometries emit the ``<TYPE> Z (x y z)`` ISO form."""
    zv = g.zs

    def coords(r: np.ndarray, ri: int = 0, sl=None) -> str:
        if zv is not None:
            z = zv[ri] if sl is None else zv[ri][sl]
            return ", ".join(
                f"{x:.{precision}g} {y:.{precision}g} {zz:.{precision}g}"
                for (x, y), zz in zip(r, z))
        return ", ".join(f"{x:.{precision}g} {y:.{precision}g}" for x, y in r)

    zt = " Z" if zv is not None else ""
    if g.kind == POINT:
        return f"POINT{zt} ({coords(g.rings[0][:1], 0, slice(0, 1))})"
    if g.kind == LINESTRING:
        return f"LINESTRING{zt} ({coords(g.rings[0])})"
    if g.kind == POLYGON:
        rings = ", ".join(f"({coords(r, i)})" for i, r in enumerate(g.rings))
        return f"POLYGON{zt} ({rings})"
    if g.kind == MULTIPOINT:
        pts = ", ".join(
            f"({coords(g.rings[0][j:j + 1], 0, slice(j, j + 1))})"
            for j in range(len(g.rings[0])))
        return f"MULTIPOINT{zt} ({pts})"
    if g.kind == MULTILINESTRING:
        parts = ", ".join(f"({coords(r, i)})" for i, r in enumerate(g.rings))
        return f"MULTILINESTRING{zt} ({parts})"
    if g.kind == MULTIPOLYGON:
        out = []
        i = 0
        for cnt in g.poly_ring_counts:
            rings = ", ".join(f"({coords(g.rings[k], k)})"
                              for k in range(i, i + cnt))
            out.append(f"({rings})")
            i += cnt
        return f"MULTIPOLYGON{zt} ({', '.join(out)})"
    if g.kind == GEOMETRYCOLLECTION:
        subs = ", ".join(geom_to_wkt(sub, precision)
                         for sub in g.members or [])
        return f"GEOMETRYCOLLECTION ({subs})"
    raise NotImplementedError(g.kind)


def wkt_to_geom(wkt: str) -> Geom:
    """ISO WKT parser for the same subset (OGRGeometryFactory::
    createFromWkt analog; 2-D plus 2.5-D Z — 'POINT Z (x y z)' and the
    legacy bare 3-token 'POINT(x y z)' both set Geom.zs)."""
    import re as _re

    s = wkt.strip()
    m = _re.match(r"^([A-Za-z]+)\s*(?:\s(Z|M|ZM))?\s*\(", s,
                  _re.S | _re.I)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:40]!r}")
    kind = m.group(1).upper()
    qual = (m.group(2) or "").upper()
    # scan to the matching close paren; trailing characters beyond it
    # are ignored like OGRGeometryFactory::createFromWkt (the autotest
    # wkb_wkt/8.wkt fixture carries a stray ')')
    depth = 0
    start = m.end() - 1
    end = -1
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end < 0:
        raise ValueError(f"bad WKT: {wkt[:40]!r}")
    body = s[start + 1:end].strip()
    zcol: list[np.ndarray | None] = []

    def parse_coords(txt: str) -> np.ndarray:
        pts, zs = [], []
        had3 = False
        for pair in txt.split(","):
            toks = pair.split()
            pts.append((float(toks[0]), float(toks[1])))
            # mixed-dimension rings pad the missing z with 0 like
            # OGRGeometryFactory (autotest wkb_wkt/3d_1.wkt polygon)
            if len(toks) > 2 and qual != "M":
                zs.append(float(toks[2]))
                had3 = True
            else:
                zs.append(0.0)
        zcol.append(np.array(zs, np.float64)
                    if had3 or qual in ("Z", "ZM") else None)
        return np.array(pts, np.float64)

    def _zs():
        if not zcol or any(z is None for z in zcol):
            return None
        return list(zcol)

    def split_groups(txt: str) -> list[str]:
        out, depth, start = [], 0, None
        for i, c in enumerate(txt):
            if c == "(":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    out.append(txt[start:i])
        return out

    if kind == "POINT":
        return Geom(POINT, [parse_coords(body)], zs=_zs())
    if kind == "LINESTRING":
        return Geom(LINESTRING, [parse_coords(body)], zs=_zs())
    if kind == "POLYGON":
        rings = [parse_coords(g) for g in split_groups(body)]
        return Geom(POLYGON, rings, [len(rings)], zs=_zs())
    if kind == "MULTIPOINT":
        groups = split_groups(body)
        if groups:
            pts = np.vstack([parse_coords(g) for g in groups])
        else:
            pts = parse_coords(body)
        z = _zs()
        return Geom(MULTIPOINT, [pts],
                    zs=[np.concatenate(z)] if z else None)
    if kind == "MULTILINESTRING":
        rings = [parse_coords(g) for g in split_groups(body)]
        return Geom(MULTILINESTRING, rings, zs=_zs())
    if kind == "MULTIPOLYGON":
        rings: list[np.ndarray] = []
        counts: list[int] = []
        for poly in split_groups(body):
            rs = [parse_coords(g) for g in split_groups(poly)]
            rings.extend(rs)
            counts.append(len(rs))
        return Geom(MULTIPOLYGON, rings, counts)
    if kind == "GEOMETRYCOLLECTION":
        # split members at top-level commas (each member is a full
        # WKT geometry with its own parentheses)
        members = []
        depth = 0
        part_start = 0
        parts = []
        for i, c in enumerate(body):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 0:
                parts.append(body[part_start:i])
                part_start = i + 1
        if body.strip():
            parts.append(body[part_start:])
        for part in parts:
            members.append(wkt_to_geom(part.strip()))
        return Geom(GEOMETRYCOLLECTION, [], members=members)
    raise NotImplementedError(kind)


def rect_polygon(xmin: float, ymin: float, xmax: float, ymax: float) -> Geom:
    ring = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
        dtype=np.float64,
    )
    return Geom(POLYGON, [ring], [1])
