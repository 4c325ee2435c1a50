"""MapInfo TAB binary vector driver (.tab + .dat/.id/.map).

Pure-Python re-derivation of the reference's mitab driver file layout
(ogr/ogrsf_frmts/mitab/):

- ``.tab``  — ASCII ``Definition Table`` with the true field types
  (mitab_tabfile.cpp ParseTABFileFields).
- ``.dat``  — xBase-shaped attribute file: 32-byte header (numRecords
  int32 @4, firstRecordPtr int16 @8, recordSize int16 @10), 32-byte
  field descriptors, then fixed-width records each starting with a
  1-byte delete flag.  Numeric fields are stored **binary
  little-endian** (mitab_datfile.cpp ReadIntegerField/ReadFloatField:
  Integer=int32, SmallInt=int16, LargeInt=int64, Float=double,
  Date=int16 year+byte month+byte day, Time=int32 ms,
  DateTime=date+time, Logical=1 byte, Decimal/Char=ASCII).
- ``.id``   — one int32 LE per feature: absolute byte offset of the
  feature's object record in the .map file (0 = no geometry).
- ``.map``  — 512-byte (or larger, header @0x106) block file.  Header
  block magic 42424242 @0x100 (mitab_mapheaderblock.cpp
  InitBlockFromData); int->coordsys transform is
  ``(n - displ)/scale`` with origin-quadrant sign flips and
  precision rounding (Int2Coordsys).  Object blocks (type 2) hold
  fixed-size object records (mitab_mapobjectblock.cpp
  TABMAPObj*::ReadObj); compressed object coords are int16 deltas
  from the object block's center (bytes 4..12).  Coordinate blocks
  (type 3) chain through the int32 next-pointer at byte 4 and hold
  vertex arrays + section headers (mitab_mapcoordblock.cpp
  ReadCoordSecHdrs: 24-byte V300 / 28-byte V450+ sections, data
  offsets counted as-if-uncompressed).

Geometry semantics follow mitab_feature.cpp ReadGeometryFromMAPFile:
regions group each outer ring with the ``numHoles`` sections that
follow it; arcs store tenth-of-degree angles with origin-quadrant
flips; ellipse/roundrect/arc are stroked with the same 2-degree
ladder as the MIF driver (sources/mif.py) so both drivers of the same
dataset emit identical WKT.

Conformance: all_geoms.tab equals the reference's own
all_geoms.mif.golden.csv rows (deterministic types exact at file
precision, stroked types type-equal), all_possible_fields.tab equals
the autotest's pinned values — tests/test_mitab.py.
"""
from __future__ import annotations

import math
import os
import struct

import pyarrow as pa

from .mif import _arc_points, _fmt, _pts_wkt, _ring_closed

HDR_MAGIC = 42424242

# TAB_GEOM_* object type codes (mitab_priv.h:84-131); _C = compressed
NONE = 0x00
SYMBOL_C, SYMBOL = 0x01, 0x02
LINE_C, LINE = 0x04, 0x05
PLINE_C, PLINE = 0x07, 0x08
ARC_C, ARC = 0x0A, 0x0B
REGION_C, REGION = 0x0D, 0x0E
TEXT_C, TEXT = 0x10, 0x11
RECT_C, RECT = 0x13, 0x14
ROUNDRECT_C, ROUNDRECT = 0x16, 0x17
ELLIPSE_C, ELLIPSE = 0x19, 0x1A
MULTIPLINE_C, MULTIPLINE = 0x25, 0x26
FONTSYMBOL_C, FONTSYMBOL = 0x28, 0x29
CUSTOMSYMBOL_C, CUSTOMSYMBOL = 0x2B, 0x2C
V450_REGION_C, V450_REGION = 0x2E, 0x2F
V450_MULTIPLINE_C, V450_MULTIPLINE = 0x31, 0x32
MULTIPOINT_C, MULTIPOINT = 0x34, 0x35
COLLECTION_C, COLLECTION = 0x37, 0x38
V800_REGION_C, V800_REGION = 0x3D, 0x3E
V800_MULTIPLINE_C, V800_MULTIPLINE = 0x40, 0x41
V800_MULTIPOINT_C, V800_MULTIPOINT = 0x43, 0x44
V800_COLLECTION_C, V800_COLLECTION = 0x46, 0x47

_REGIONS = (REGION, REGION_C, V450_REGION, V450_REGION_C,
            V800_REGION, V800_REGION_C)
_MULTIPLINES = (MULTIPLINE, MULTIPLINE_C, V450_MULTIPLINE,
                V450_MULTIPLINE_C, V800_MULTIPLINE, V800_MULTIPLINE_C)
_V800 = (V800_REGION, V800_REGION_C, V800_MULTIPLINE,
         V800_MULTIPLINE_C, V800_MULTIPOINT, V800_MULTIPOINT_C,
         V800_COLLECTION, V800_COLLECTION_C)


def _geom_version(t: int) -> int:
    # TAB_GEOM_GET_VERSION (mitab_priv.h:135)
    if t < V450_REGION_C:
        return 300
    if t < MULTIPOINT_C:
        return 450
    if t < 0x3A:
        return 650
    return 800


def _c_round(v: float) -> float:
    """C round(): half away from zero (Python round is banker's)."""
    return math.copysign(math.floor(abs(v) + 0.5), v)


class _MapHeader:
    """Header block fields needed for decoding (mitab_mapheaderblock
    InitBlockFromData)."""

    def __init__(self, buf: bytes):
        (magic,) = struct.unpack_from("<i", buf, 0x100)
        if magic != HDR_MAGIC:
            raise ValueError(f"not a MapInfo .map file (magic {magic})")
        self.version, self.block_size = struct.unpack_from("<hh", buf,
                                                           0x104)
        if self.block_size < 512:
            raise ValueError(f"bad .map block size {self.block_size}")
        (self.coord_precision, self.quadrant,
         self.reflect_x) = struct.unpack_from("<3B", buf, 0x160)
        (self.x_scale, self.y_scale, self.x_displ,
         self.y_displ) = struct.unpack_from("<4d", buf, 0x170)
        if self.x_scale == 0.0 or self.y_scale == 0.0:
            raise ValueError("null scale in .map header")
        if self.version <= 100:
            self.x_scale = self.y_scale = 10.0 ** self.coord_precision
            self.x_displ = self.y_displ = 0.0
        self.x_prec = 10.0 ** _c_round(math.log10(self.x_scale))
        self.y_prec = 10.0 ** _c_round(math.log10(self.y_scale))

    def int2coord(self, nx: int, ny: int) -> tuple[float, float]:
        # Int2Coordsys quadrant semantics (mitab_mapheaderblock.cpp:344)
        q = self.quadrant
        if q in (0, 2, 3):
            dx = -1.0 * (nx + self.x_displ) / self.x_scale
        else:
            dx = (nx - self.x_displ) / self.x_scale
        if q in (0, 3, 4):
            dy = -1.0 * (ny + self.y_displ) / self.y_scale
        else:
            dy = (ny - self.y_displ) / self.y_scale
        if self.x_prec > 0 and self.y_prec > 0:
            dx = _c_round(dx * self.x_prec) / self.x_prec
            dy = _c_round(dy * self.y_prec) / self.y_prec
        return dx, dy

    def int2dist(self, n: int) -> float:
        # Int2CoordsysDist: scale only, no displacement
        return n / self.x_scale


class _ObjCursor:
    """Sequential reader over one object record in an object block.
    Compressed coordinates are int16 deltas from the block center."""

    def __init__(self, data: bytes, pos: int, block_size: int):
        self.d = data
        self.p = pos
        base = (pos // block_size) * block_size
        self.cx, self.cy = struct.unpack_from("<ii", data, base + 4)

    def u8(self) -> int:
        v = self.d[self.p]
        self.p += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from("<h", self.d, self.p)
        self.p += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from("<i", self.d, self.p)
        self.p += 4
        return v

    def coord(self, compressed: bool) -> tuple[int, int]:
        if compressed:
            return self.i16() + self.cx, self.i16() + self.cy
        return self.i32(), self.i32()


class _CoordReader:
    """Reader over the chained coordinate blocks (type 3).  Each block:
    numDataBytes int16 @2 (excl. 8-byte header), next-block int32 @4,
    payload from byte 8 (mitab_mapcoordblock.cpp:34-56)."""

    def __init__(self, data: bytes, block_size: int, start: int):
        self.d = data
        self.bs = block_size
        self._goto(start)
        self.org_x = 0
        self.org_y = 0

    def _goto(self, pos: int) -> None:
        self.p = pos
        base = (pos // self.bs) * self.bs
        (ndata,) = struct.unpack_from("<h", self.d, base + 2)
        (self.next,) = struct.unpack_from("<i", self.d, base + 4)
        self.end = base + 8 + ndata

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            if self.p >= self.end:
                if self.next <= 0:
                    raise ValueError("coord block chain exhausted")
                self._goto(self.next + 8)
            take = min(n, self.end - self.p)
            out += self.d[self.p:self.p + take]
            self.p += take
            n -= take
        return out

    def i16(self) -> int:
        return struct.unpack("<h", self.read(2))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.read(4))[0]

    def coord(self, compressed: bool) -> tuple[int, int]:
        if compressed:
            return self.i16() + self.org_x, self.i16() + self.org_y
        return self.i32(), self.i32()

    def int_coords(self, compressed: bool, n: int) -> list[tuple[int,
                                                                 int]]:
        if compressed:
            raw = struct.unpack(f"<{2 * n}h", self.read(4 * n))
            return [(raw[i] + self.org_x, raw[i + 1] + self.org_y)
                    for i in range(0, 2 * n, 2)]
        raw = struct.unpack(f"<{2 * n}i", self.read(8 * n))
        return [(raw[i], raw[i + 1]) for i in range(0, 2 * n, 2)]

    def sec_hdrs(self, compressed: bool, version: int,
                 n_sections: int) -> list[dict]:
        """ReadCoordSecHdrs (mitab_mapcoordblock.cpp): per section
        numVertices (int16 V300 / int32 V450+), numHoles (int16 /
        int32 V800+), MBR, data offset counted as-if-uncompressed."""
        sec_size = 28 if version >= 450 else 24
        hdr_total = sec_size * n_sections
        out = []
        for _ in range(n_sections):
            nv = self.i32() if version >= 450 else self.i16()
            nh = self.i32() if version >= 800 else self.i16()
            self.coord(compressed)  # MBR min (unused)
            self.coord(compressed)  # MBR max
            off = self.i32()
            out.append({"nv": nv, "holes": nh,
                        "v0": (off - hdr_total) // 8})
        return out


def _sections_to_parts(cr: _CoordReader, hdrs: list[dict],
                       compressed: bool, header: _MapHeader):
    total = sum(h["nv"] for h in hdrs)
    xy = cr.int_coords(compressed, total)
    pts = [header.int2coord(x, y) for x, y in xy]
    return [pts[h["v0"]:h["v0"] + h["nv"]] for h in hdrs]


def _region_sections_wkt(parts: list[list], hdrs: list[dict]) -> str:
    """Outer ring + following numHoles holes (TABRegion::
    ReadGeometryFromMAPFile ring grouping)."""
    polys: list[list[str]] = []
    i = 0
    while i < len(parts):
        rings = [_ring_closed(parts[i])]
        for j in range(hdrs[i]["holes"]):
            if i + 1 + j < len(parts):
                rings.append(_ring_closed(parts[i + 1 + j]))
        i += 1 + hdrs[i]["holes"]
        polys.append([f"({_pts_wkt(r)})" for r in rings])
    if len(polys) == 1:
        return f"POLYGON ({','.join(polys[0])})"
    body = ",".join(f"({','.join(p)})" for p in polys)
    return f"MULTIPOLYGON ({body})"


class _MapFile:
    def __init__(self, data: bytes):
        self.d = data
        self.h = _MapHeader(data)

    def _pline_hdr(self, c: _ObjCursor, t: int) -> dict:
        """Shared PLINE/REGION/MULTIPLINE object layout
        (TABMAPObjPLine::ReadObj)."""
        compressed = t % 3 == 1  # _C codes are = 1 (mod 3)
        ptr = c.i32()
        size = c.i32()
        smooth = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        if t in (PLINE, PLINE_C):
            nsec = 1
        elif t in (V800_REGION, V800_REGION_C, V800_MULTIPLINE,
                   V800_MULTIPLINE_C):
            nsec = c.i32()
            c.p += 33
        else:
            nsec = c.i16()
        if compressed:
            c.p += 4  # label point (int16 pair)
            org = (c.i32(), c.i32())
            c.p += 8  # MBR int16 x4
        else:
            c.p += 8  # label point
            mnx, mny, mxx, mxy = c.i32(), c.i32(), c.i32(), c.i32()
            org = ((mnx + mxx) // 2, (mny + mxy) // 2)
        return {"ptr": ptr, "size": size, "nsec": nsec, "org": org,
                "compressed": compressed, "smooth": smooth}

    def read_object(self, offset: int) -> str:
        """Object record at absolute offset -> WKT (NONE-safe)."""
        h = self.h
        c = _ObjCursor(self.d, offset, h.block_size)
        t = c.u8()
        c.i32()  # object/feature id
        compressed = t % 3 == 1  # IsCompressedType(): _C codes = 1 (mod 3)

        if t == NONE:
            return "GEOMETRYCOLLECTION EMPTY"

        if t in (SYMBOL, SYMBOL_C):
            x, y = h.int2coord(*c.coord(compressed))
            return f"POINT ({_fmt(x)} {_fmt(y)})"
        if t in (FONTSYMBOL, FONTSYMBOL_C):
            # symbolid, pointsize, fontstyle i16, rgb, 3 unknown,
            # angle i16 (TABMAPObjFontPoint::ReadObj)
            c.p += 12
            x, y = h.int2coord(*c.coord(compressed))
            return f"POINT ({_fmt(x)} {_fmt(y)})"
        if t in (CUSTOMSYMBOL, CUSTOMSYMBOL_C):
            c.p += 2  # unknown, custom style
            x, y = h.int2coord(*c.coord(compressed))
            return f"POINT ({_fmt(x)} {_fmt(y)})"
        if t in (LINE, LINE_C):
            p1 = h.int2coord(*c.coord(compressed))
            p2 = h.int2coord(*c.coord(compressed))
            return f"LINESTRING ({_pts_wkt([p1, p2])})"

        if t in (PLINE, PLINE_C):
            ph = self._pline_hdr(c, t)
            cr = _CoordReader(self.d, h.block_size, ph["ptr"])
            cr.org_x, cr.org_y = ph["org"]
            n = ph["size"] // (4 if compressed else 8)
            pts = [h.int2coord(x, y)
                   for x, y in cr.int_coords(compressed, n)]
            return f"LINESTRING ({_pts_wkt(pts)})"

        if t in _MULTIPLINES:
            ph = self._pline_hdr(c, t)
            cr = _CoordReader(self.d, h.block_size, ph["ptr"])
            cr.org_x, cr.org_y = ph["org"]
            hdrs = cr.sec_hdrs(compressed, _geom_version(t), ph["nsec"])
            parts = _sections_to_parts(cr, hdrs, compressed, h)
            if len(parts) == 1:
                return f"LINESTRING ({_pts_wkt(parts[0])})"
            body = ",".join(f"({_pts_wkt(p)})" for p in parts)
            return f"MULTILINESTRING ({body})"

        if t in _REGIONS:
            ph = self._pline_hdr(c, t)
            cr = _CoordReader(self.d, h.block_size, ph["ptr"])
            cr.org_x, cr.org_y = ph["org"]
            hdrs = cr.sec_hdrs(compressed, _geom_version(t), ph["nsec"])
            parts = _sections_to_parts(cr, hdrs, compressed, h)
            return _region_sections_wkt(parts, hdrs)

        if t in (RECT, RECT_C):
            x1, y1 = h.int2coord(*c.coord(compressed))
            x2, y2 = h.int2coord(*c.coord(compressed))
            ring = [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]
            return f"POLYGON (({_pts_wkt(ring)}))"
        if t in (ROUNDRECT, ROUNDRECT_C, ELLIPSE, ELLIPSE_C):
            if t in (ROUNDRECT, ROUNDRECT_C):
                if compressed:
                    c.i16(), c.i16()
                else:
                    c.i32(), c.i32()  # corner width/height
            x1, y1 = h.int2coord(*c.coord(compressed))
            x2, y2 = h.int2coord(*c.coord(compressed))
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            rx, ry = abs(x2 - x1) / 2, abs(y2 - y1) / 2
            ring = _ring_closed(_arc_points(cx, cy, rx, ry, 0.0, 360.0))
            return f"POLYGON (({_pts_wkt(ring)}))"

        if t in (ARC, ARC_C):
            a_raw0, a_raw1 = c.i16(), c.i16()
            ex1, ey1 = h.int2coord(*c.coord(compressed))
            ex2, ey2 = h.int2coord(*c.coord(compressed))
            # angle quadrant flips (mitab_feature.cpp:5071-5117)
            q = h.quadrant
            if q in (0, 1, 3):
                a0, a1 = a_raw0 / 10.0, a_raw1 / 10.0
            else:
                a0, a1 = a_raw1 / 10.0, a_raw0 / 10.0
            if q in (0, 2, 3):
                a0 = (180.0 - a0) if a0 <= 180.0 else (540.0 - a0)
                a1 = (180.0 - a1) if a1 <= 180.0 else (540.0 - a1)
            if q in (0, 3, 4):
                a0, a1 = 360.0 - a0, 360.0 - a1
            if a1 < a0:
                a1 += 360.0
            if a1 == a0:
                a1 = a0 + 360.0
            cx, cy = (ex1 + ex2) / 2, (ey1 + ey2) / 2
            rx, ry = abs(ex2 - ex1) / 2, abs(ey2 - ey1) / 2
            pts = _arc_points(cx, cy, rx, ry, a0, a1)
            pts.append(pts[-1])  # TABGenerateArc re-adds the end point
            return f"LINESTRING ({_pts_wkt(pts)})"

        if t in (TEXT, TEXT_C):
            # string ptr/len, alignment, angle, fontstyle, fg/bg rgb
            c.p += 4 + 2 + 2 + 2 + 2 + 6
            c.coord(compressed)  # label line end
            c.p += 2 if compressed else 4  # text height
            c.u8()  # font id
            x1, y1 = h.int2coord(*c.coord(compressed))
            x2, y2 = h.int2coord(*c.coord(compressed))
            return (f"POINT ({_fmt((x1 + x2) / 2)} "
                    f"{_fmt(min(y1, y2))})")

        if t in (MULTIPOINT, MULTIPOINT_C, V800_MULTIPOINT,
                 V800_MULTIPOINT_C):
            ptr = c.i32()
            npts = c.i32()
            c.p += 15
            if t in (V800_MULTIPOINT, V800_MULTIPOINT_C):
                c.p += 33
            c.p += 2  # symbol id + unknown
            if compressed:
                c.p += 4
                org = (c.i32(), c.i32())
            else:
                c.p += 8
                mnx, mny, mxx, mxy = (c.i32(), c.i32(), c.i32(),
                                      c.i32())
                org = ((mnx + mxx) // 2, (mny + mxy) // 2)
            cr = _CoordReader(self.d, h.block_size, ptr)
            cr.org_x, cr.org_y = org
            pts = [h.int2coord(x, y)
                   for x, y in cr.int_coords(compressed, npts)]
            return f"MULTIPOINT ({_pts_wkt(pts)})"

        if t in (COLLECTION, COLLECTION_C, V800_COLLECTION,
                 V800_COLLECTION_C):
            return self._collection(c, t)

        raise NotImplementedError(f"TAB object type 0x{t:02x}")

    def _collection(self, c: _ObjCursor, t: int) -> str:
        """TABMAPObjCollection::ReadObj + TABCollection::
        ReadGeometryFromMAPFile: coord data = per-component
        [mini-header(label+MBR)] + sections/points, in region,
        pline, multipoint order."""
        h = self.h
        compressed = t % 3 == 1
        version = _geom_version(t)
        ptr = c.i32()
        n_mpoints = c.i32()
        c.i32()  # region data size (redundant for reading)
        c.i32()  # polyline data size
        if version < 800:
            n_reg = c.i16()
            n_pline = c.i16()
        else:
            n_reg = c.i32()
            n_pline = c.i32()
            c.u8()  # always 4
        c.p += 15  # zeros
        c.p += 5   # symbol/pen/brush ids + unknown
        if compressed:
            org = (c.i32(), c.i32())
        else:
            mnx, mny, mxx, mxy = c.i32(), c.i32(), c.i32(), c.i32()
            org = ((mnx + mxx) // 2, (mny + mxy) // 2)

        cr = _CoordReader(self.d, h.block_size, ptr)
        cr.org_x, cr.org_y = org
        parts_wkt = []

        def _mini_header():
            if version >= 800:
                cr.i32()  # copy of num_parts
            for _ in range(3):  # label + MBR = 3 coord pairs
                cr.coord(compressed)

        if n_reg > 0:
            _mini_header()
            hdrs = cr.sec_hdrs(compressed, version, n_reg)
            parts = _sections_to_parts(cr, hdrs, compressed, h)
            parts_wkt.append(_region_sections_wkt(parts, hdrs))
        if n_pline > 0:
            _mini_header()
            hdrs = cr.sec_hdrs(compressed, version, n_pline)
            parts = _sections_to_parts(cr, hdrs, compressed, h)
            if len(parts) == 1:
                parts_wkt.append(f"LINESTRING ({_pts_wkt(parts[0])})")
            else:
                body = ",".join(f"({_pts_wkt(p)})" for p in parts)
                parts_wkt.append(f"MULTILINESTRING ({body})")
        if n_mpoints > 0:
            _mini_header()
            pts = [h.int2coord(x, y)
                   for x, y in cr.int_coords(compressed, n_mpoints)]
            parts_wkt.append(f"MULTIPOINT ({_pts_wkt(pts)})")
        return f"GEOMETRYCOLLECTION ({','.join(parts_wkt)})"


# ---------------------------------------------------------------- .dat

_TAB_TYPES = ("char", "integer", "smallint", "largeint", "float",
              "decimal", "date", "time", "datetime", "logical")


def _parse_tab_fields(text: str) -> list[tuple[str, str, int, int]]:
    """Definition Table 'Fields n' section -> [(name, type, width,
    precision)] (mitab_tabfile.cpp ParseTABFileFields)."""
    lines = text.splitlines()
    fields = []
    n = 0
    for i, line in enumerate(lines):
        toks = line.split()
        if len(toks) >= 2 and toks[0].lower() == "fields":
            n = int(toks[1])
            j = i + 1
            while len(fields) < n and j < len(lines):
                t = lines[j].replace("(", " ( ").replace(
                    ")", " ) ").replace(",", " ").replace(";", "").split()
                j += 1
                if not t:
                    continue
                name, typ = t[0], t[1].lower()
                if typ not in _TAB_TYPES:
                    continue
                width = prec = 0
                if len(t) > 3 and t[2] == "(":
                    width = int(t[3])
                    if len(t) > 4 and t[4] != ")":
                        prec = int(t[4])
                fields.append((name, typ, width, prec))
            break
    return fields


def _read_dat(path: str,
              fields: list[tuple[str, str, int, int]]) -> dict:
    """Native .dat records -> {name: list} typed per the .tab field
    list (mitab_datfile.cpp layout; numbers binary LE)."""
    with open(path, "rb") as fh:
        d = fh.read()
    (num_rec,) = struct.unpack_from("<i", d, 4)
    first_rec, rec_size = struct.unpack_from("<hh", d, 8)
    num_fields = first_rec // 32 - 1
    widths = [struct.unpack_from("<B", d, 32 * (i + 1) + 16)[0]
              for i in range(num_fields)]
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    for r in range(num_rec):
        pos = first_rec + r * rec_size
        deleted = d[pos:pos + 1] != b" "
        pos += 1
        for i, (name, typ, _, _) in enumerate(fields):
            w = widths[i] if i < len(widths) else 0
            raw = d[pos:pos + w]
            pos += w
            if deleted:
                cols[name].append(None)
                continue
            if typ == "char":
                cols[name].append(
                    raw.rstrip(b"\x00 ").decode("latin-1"))
            elif typ == "integer":
                cols[name].append(struct.unpack("<i", raw)[0])
            elif typ == "smallint":
                cols[name].append(struct.unpack("<h", raw)[0])
            elif typ == "largeint":
                cols[name].append(struct.unpack("<q", raw)[0])
            elif typ == "float":
                cols[name].append(struct.unpack("<d", raw)[0])
            elif typ == "decimal":
                s = raw.strip(b"\x00 ").decode("latin-1")
                cols[name].append(float(s) if s else None)
            elif typ == "date":
                y, = struct.unpack("<h", raw[:2])
                m, dd = raw[2], raw[3]
                cols[name].append(f"{y:04d}/{m:02d}/{dd:02d}"
                                  if y else None)
            elif typ == "time":
                ms, = struct.unpack("<i", raw)
                if ms < 0 or ms > 86400000:
                    cols[name].append(None)
                else:
                    hh = ms // 3600000
                    mm = (ms // 1000 - hh * 3600) // 60
                    ss = ms // 1000 - hh * 3600 - mm * 60
                    cols[name].append(f"{hh:02d}:{mm:02d}:{ss:02d}")
            elif typ == "datetime":
                y, = struct.unpack("<h", raw[:2])
                m, dd = raw[2], raw[3]
                ms, = struct.unpack("<i", raw[4:8])
                hh = ms // 3600000
                mm = (ms // 1000 - hh * 3600) // 60
                ss = ms // 1000 - hh * 3600 - mm * 60
                cols[name].append(
                    f"{y:04d}/{m:02d}/{dd:02d} {hh:02d}:{mm:02d}:"
                    f"{ss:02d}" if y else None)
            elif typ == "logical":
                cols[name].append(raw[:1] in (b"T", b"t", b"\x01"))
    return cols


def _sibling(base: str, ext: str) -> str | None:
    for e in (ext, ext.upper()):
        p = base + e
        if os.path.exists(p):
            return p
    return None


def read_tab(path: str) -> pa.Table:
    """Read a MapInfo .tab dataset -> Arrow table (wkt + typed
    attribute columns, matching the MIF driver's shape)."""
    with open(path, encoding="latin-1") as fh:
        tab_text = fh.read()
    base = os.path.splitext(path)[0]
    fields = _parse_tab_fields(tab_text)

    dat = _sibling(base, ".dat")
    cols = _read_dat(dat, fields) if dat and fields else {}
    num_rows = len(next(iter(cols.values()))) if cols else 0

    idp = _sibling(base, ".id")
    mapp = _sibling(base, ".map")
    wkts: list[str] = []
    if idp and mapp:
        with open(idp, "rb") as fh:
            raw = fh.read()
        offsets = struct.unpack(f"<{len(raw) // 4}i", raw)
        with open(mapp, "rb") as fh:
            mf = _MapFile(fh.read())
        for off in offsets:
            wkts.append(mf.read_object(off) if off > 0
                        else "GEOMETRYCOLLECTION EMPTY")
        num_rows = max(num_rows, len(wkts))

    out: dict[str, pa.Array] = {}
    if wkts:
        wkts += ["GEOMETRYCOLLECTION EMPTY"] * (num_rows - len(wkts))
        out["wkt"] = pa.array(wkts, pa.string())
    for (name, typ, _, _) in fields:
        vals = cols.get(name, [])
        vals = vals + [None] * (num_rows - len(vals))
        if typ in ("integer", "smallint", "largeint"):
            out[name] = pa.array(vals, pa.int64())
        elif typ in ("float", "decimal"):
            out[name] = pa.array(vals, pa.float64())
        elif typ == "logical":
            out[name] = pa.array(vals, pa.bool_())
        else:
            out[name] = pa.array(vals, pa.string())
    return pa.table(out)


def tab_dataset(path: str):
    """TAB layer as a Ray Dataset (single parse task: the .map spatial
    index is a driver-sized B-tree; big layers should convert to
    parquet/FGB for sharded reads, same as the MIF guidance)."""
    import ray.data

    return ray.data.from_arrow(read_tab(path))
