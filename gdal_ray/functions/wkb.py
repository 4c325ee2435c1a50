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
_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
          5: "MultiLineString", 6: "MultiPolygon"}


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


# ----------------------------------------------------------------- generic codec
def _rd_uint32(data, pos, little):
    return struct.unpack_from("<I" if little else ">I", data, pos)[0], pos + 4


def _rd_coords(data, pos, n, little):
    fmt = "<" if little else ">"
    arr = np.frombuffer(data, dtype=fmt + "f8", count=2 * n, offset=pos)
    return arr.reshape(n, 2).astype(np.float64), pos + 16 * n


def _parse(data: bytes, pos: int):
    little = data[pos] == 1
    pos += 1
    gtype, pos = _rd_uint32(data, pos, little)
    gtype = gtype & 0xFF  # strip 2.5D/SRID flags (1000/2000/0x80000000 handled upstream)
    if gtype == POINT:
        xy, pos = _rd_coords(data, pos, 1, little)
        return Geom(POINT, [xy]), pos
    if gtype == LINESTRING:
        n, pos = _rd_uint32(data, pos, little)
        xy, pos = _rd_coords(data, pos, n, little)
        return Geom(LINESTRING, [xy]), pos
    if gtype == POLYGON:
        nrings, pos = _rd_uint32(data, pos, little)
        rings = []
        for _ in range(nrings):
            n, pos = _rd_uint32(data, pos, little)
            xy, pos = _rd_coords(data, pos, n, little)
            rings.append(xy)
        return Geom(POLYGON, rings, [nrings]), pos
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        nparts, pos = _rd_uint32(data, pos, little)
        rings: list[np.ndarray] = []
        counts: list[int] = []
        pts: list[np.ndarray] = []
        for _ in range(nparts):
            sub, pos = _parse(data, pos)
            if gtype == MULTIPOINT:
                pts.append(sub.rings[0])
            elif gtype == MULTILINESTRING:
                rings.extend(sub.rings)
            else:
                rings.extend(sub.rings)
                counts.extend(sub.poly_ring_counts)
        if gtype == MULTIPOINT:
            return Geom(MULTIPOINT, [np.concatenate(pts) if pts else np.empty((0, 2))]), pos
        return Geom(gtype, rings, counts), pos
    raise NotImplementedError(f"WKB geometry type {gtype}")


def wkb_to_geom(data: bytes) -> Geom:
    return _parse(data, 0)[0]


def _w_coords(xy: np.ndarray) -> bytes:
    return np.ascontiguousarray(xy, dtype="<f8").tobytes()


def geom_to_wkb(g: Geom) -> bytes:
    h = lambda t: b"\x01" + struct.pack("<I", t)
    if g.kind == POINT:
        return h(POINT) + _w_coords(g.rings[0][:1])
    if g.kind == LINESTRING:
        return h(LINESTRING) + struct.pack("<I", len(g.rings[0])) + _w_coords(g.rings[0])
    if g.kind == POLYGON:
        out = h(POLYGON) + struct.pack("<I", len(g.rings))
        for r in g.rings:
            out += struct.pack("<I", len(r)) + _w_coords(r)
        return out
    if g.kind == MULTIPOINT:
        pts = g.rings[0]
        out = h(MULTIPOINT) + struct.pack("<I", len(pts))
        for p in pts:
            out += h(POINT) + _w_coords(p.reshape(1, 2))
        return out
    if g.kind == MULTILINESTRING:
        out = h(MULTILINESTRING) + struct.pack("<I", len(g.rings))
        for r in g.rings:
            out += h(LINESTRING) + struct.pack("<I", len(r)) + _w_coords(r)
        return out
    if g.kind == MULTIPOLYGON:
        out = h(MULTIPOLYGON) + struct.pack("<I", len(g.poly_ring_counts))
        i = 0
        for cnt in g.poly_ring_counts:
            out += h(POLYGON) + struct.pack("<I", cnt)
            for r in g.rings[i : i + cnt]:
                out += struct.pack("<I", len(r)) + _w_coords(r)
            i += cnt
        return out
    raise NotImplementedError(g.kind)


# ----------------------------------------------------------------- WKT codec
def geom_to_wkt(g: Geom, precision: int = 15) -> str:
    """ISO WKT writer (OGRGeometry::exportToWkt analog)."""
    def coords(r: np.ndarray) -> str:
        return ", ".join(f"{x:.{precision}g} {y:.{precision}g}" for x, y in r)

    if g.kind == POINT:
        return f"POINT ({coords(g.rings[0][:1])})"
    if g.kind == LINESTRING:
        return f"LINESTRING ({coords(g.rings[0])})"
    if g.kind == POLYGON:
        rings = ", ".join(f"({coords(r)})" for r in g.rings)
        return f"POLYGON ({rings})"
    if g.kind == MULTIPOINT:
        pts = ", ".join(f"({coords(p.reshape(1, 2))})" for p in g.rings[0])
        return f"MULTIPOINT ({pts})"
    if g.kind == MULTILINESTRING:
        parts = ", ".join(f"({coords(r)})" for r in g.rings)
        return f"MULTILINESTRING ({parts})"
    if g.kind == MULTIPOLYGON:
        out = []
        i = 0
        for cnt in g.poly_ring_counts:
            rings = ", ".join(f"({coords(r)})" for r in g.rings[i:i + cnt])
            out.append(f"({rings})")
            i += cnt
        return f"MULTIPOLYGON ({', '.join(out)})"
    raise NotImplementedError(g.kind)


def wkt_to_geom(wkt: str) -> Geom:
    """ISO WKT parser for the same subset (OGRGeometryFactory::
    createFromWkt analog; 2-D, no EMPTY)."""
    import re as _re

    s = wkt.strip()
    m = _re.match(r"^([A-Za-z]+)\s*\((.*)\)$", s, _re.S)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:40]!r}")
    kind = m.group(1).upper()
    body = m.group(2).strip()

    def parse_coords(txt: str) -> np.ndarray:
        pts = []
        for pair in txt.split(","):
            x, y = pair.split()[:2]
            pts.append((float(x), float(y)))
        return np.array(pts, np.float64)

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
        return Geom(POINT, [parse_coords(body)])
    if kind == "LINESTRING":
        return Geom(LINESTRING, [parse_coords(body)])
    if kind == "POLYGON":
        rings = [parse_coords(g) for g in split_groups(body)]
        return Geom(POLYGON, rings, [len(rings)])
    if kind == "MULTIPOINT":
        groups = split_groups(body)
        if groups:
            pts = np.vstack([parse_coords(g) for g in groups])
        else:
            pts = parse_coords(body)
        return Geom(MULTIPOINT, [pts])
    if kind == "MULTILINESTRING":
        return Geom(MULTILINESTRING, [parse_coords(g) for g in split_groups(body)])
    if kind == "MULTIPOLYGON":
        rings: list[np.ndarray] = []
        counts: list[int] = []
        for poly in split_groups(body):
            rs = [parse_coords(g) for g in split_groups(poly)]
            rings.extend(rs)
            counts.append(len(rs))
        return Geom(MULTIPOLYGON, rings, counts)
    raise NotImplementedError(kind)


def rect_polygon(xmin: float, ymin: float, xmax: float, ymax: float) -> Geom:
    ring = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
        dtype=np.float64,
    )
    return Geom(POLYGON, [ring], [1])
