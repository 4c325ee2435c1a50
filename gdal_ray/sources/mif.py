"""MapInfo MIF/MID vector driver (reference ogr/ogrsf_frmts/mitab,
mitab_mapfile/mif parsing in mitab_miffile.cpp).

MIF grammar handled: header (Version/Charset/Delimiter/CoordSys/
Columns), then geometry records — Point, Line, Pline [MULTIPLE],
Region (first ring outer, contained rings holes), MultiPoint, Rect
(corner polygon), RoundRect/Ellipse/Arc (2-degree-step interpolation,
matching the reference's all_geoms golden spacing for Arc), Text
(anchor point), Collection, None. Style clauses (Pen/Brush/Symbol/
Font/Smooth/Angle/Justify/Spacing/Label) are skipped. MID rows are
delimiter-separated with doubled-quote escapes, typed by Columns.

Conformance: core-geometry WKTs equal the reference's own
all_geoms.mif.golden.csv rows; small.mif/mid attribute parity —
tests/test_mif.py.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _fmt(v: float) -> str:
    return f"{float(v):.15g}"


def _pts_wkt(pts) -> str:
    return ",".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)


class _Lines:
    def __init__(self, text: str):
        self.lines = text.splitlines()
        self.i = 0

    def peek(self):
        while self.i < len(self.lines):
            s = self.lines[self.i].strip()
            if s:
                return s
            self.i += 1
        return None

    def next(self):
        s = self.peek()
        if s is not None:
            self.i += 1
        return s


_STYLE_WORDS = ("pen", "brush", "symbol", "font", "smooth", "angle",
                "justify", "spacing", "label", "center")


def _is_style(s: str) -> bool:
    w = s.split("(")[0].split()[0].lower()
    return w in _STYLE_WORDS


def _skip_style(lx: _Lines):
    while True:
        s = lx.peek()
        if s is None or not _is_style(s):
            return
        lx.next()


def _read_points(lx: _Lines, n: int):
    pts = []
    while len(pts) < n:
        toks = lx.next().split()
        for j in range(0, len(toks), 2):
            pts.append((float(toks[j]), float(toks[j + 1])))
    return pts


def _arc_points(cx, cy, rx, ry, a0, a1, step=2.0):
    """2-degree-step arc like the reference golden (cos/sin ladder)."""
    n = int(math.ceil(abs(a1 - a0) / step))
    pts = []
    for k in range(n + 1):
        a = math.radians(min(a0 + k * step, a1))
        pts.append((cx + rx * math.cos(a), cy + ry * math.sin(a)))
    return pts


def _ring_closed(pts):
    return pts + [pts[0]] if pts[0] != pts[-1] else pts


def _point_in_ring(pt, ring) -> bool:
    x, y = pt
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        if (y1 > y) != (y2 > y) and \
                x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _region_wkt(rings) -> str:
    """First ring starts a polygon; later rings become holes of the
    polygon that contains them, else new outers (mitab containment)."""
    polys: list[list[list]] = []
    for ring in rings:
        ring = _ring_closed(ring)
        placed = False
        for poly in polys:
            if _point_in_ring(ring[0], poly[0]):
                poly.append(ring)
                placed = True
                break
        if not placed:
            polys.append([ring])
    if len(polys) == 1:
        body = ",".join(f"({_pts_wkt(r)})" for r in polys[0])
        return f"POLYGON ({body})"
    parts = []
    for poly in polys:
        body = ",".join(f"({_pts_wkt(r)})" for r in poly)
        parts.append(f"({body})")
    return f"MULTIPOLYGON ({','.join(parts)})"


def _parse_geometry(lx: _Lines) -> str | None:
    s = lx.next()
    if s is None:
        return None
    toks = s.split()
    kw = toks[0].upper()
    if kw == "POINT":
        wkt = f"POINT ({_fmt(float(toks[1]))} {_fmt(float(toks[2]))})"
    elif kw == "LINE":
        x1, y1, x2, y2 = map(float, toks[1:5])
        wkt = f"LINESTRING ({_pts_wkt([(x1, y1), (x2, y2)])})"
    elif kw == "PLINE":
        rest = [t for t in toks[1:]]
        if rest and rest[0].upper() == "MULTIPLE":
            nsec = int(rest[1])
            secs = []
            for _ in range(nsec):
                n = int(lx.next())
                secs.append(_read_points(lx, n))
            body = ",".join(f"({_pts_wkt(p)})" for p in secs)
            wkt = f"MULTILINESTRING ({body})"
        else:
            n = int(rest[0]) if rest else int(lx.next())
            wkt = f"LINESTRING ({_pts_wkt(_read_points(lx, n))})"
    elif kw == "REGION":
        nring = int(toks[1])
        rings = []
        for _ in range(nring):
            n = int(lx.next())
            rings.append(_read_points(lx, n))
        wkt = _region_wkt(rings)
    elif kw == "MULTIPOINT":
        n = int(toks[1])
        wkt = f"MULTIPOINT ({_pts_wkt(_read_points(lx, n))})"
    elif kw == "RECT":
        x1, y1, x2, y2 = map(float, toks[1:5])
        ring = [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]
        wkt = f"POLYGON (({_pts_wkt(ring)}))"
    elif kw in ("ROUNDRECT", "ELLIPSE"):
        x1, y1, x2, y2 = map(float, toks[1:5])
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        rx, ry = abs(x2 - x1) / 2, abs(y2 - y1) / 2
        ring = _ring_closed(_arc_points(cx, cy, rx, ry, 0.0, 360.0))
        wkt = f"POLYGON (({_pts_wkt(ring)}))"
    elif kw == "ARC":
        x1, y1, x2, y2 = map(float, toks[1:5])
        if len(toks) >= 7:
            a0, a1 = float(toks[5]), float(toks[6])
        else:
            a0, a1 = map(float, lx.next().split()[:2])
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        rx, ry = abs(x2 - x1) / 2, abs(y2 - y1) / 2
        pts = _arc_points(cx, cy, rx, ry, a0, a1)
        pts.append(pts[-1])  # TABGenerateArc re-adds the end point
        wkt = f"LINESTRING ({_pts_wkt(pts)})"
    elif kw == "TEXT":
        # anchor: the text box's (center-x, min-y) like the golden row
        if len(toks) > 1 and toks[1].startswith('"'):
            coords = lx.next().split()
        else:
            lx.next()  # text string on its own line
            coords = lx.next().split()
        x1, y1, x2, y2 = map(float, coords[:4])
        wkt = f"POINT ({_fmt((x1 + x2) / 2)} {_fmt(min(y1, y2))})"
    elif kw == "COLLECTION":
        nparts = int(toks[1])
        parts = [_parse_geometry(lx) for _ in range(nparts)]
        wkt = f"GEOMETRYCOLLECTION ({','.join(parts)})"
    elif kw == "NONE":
        wkt = "GEOMETRYCOLLECTION EMPTY"
    else:
        raise NotImplementedError(f"MIF geometry keyword {kw}")
    _skip_style(lx)
    return wkt


def _parse_mid(text: str, delim: str) -> list[list[str]]:
    """MID records: newline outside quotes ends a record (an empty
    line IS a record with one empty field); quoted fields may span
    lines and escape quotes by doubling."""
    records: list[list[str]] = []
    cur: list[str] = []
    fields: list[str] = []
    q = False
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if q:
            if c == '"':
                if i + 1 < n and text[i + 1] == '"':
                    cur.append('"')
                    i += 1
                else:
                    q = False
            else:
                cur.append(c)
        elif c == '"':
            q = True
        elif c == delim:
            fields.append("".join(cur))
            cur = []
        elif c in "\r\n":
            if c == "\r" and i + 1 < n and text[i + 1] == "\n":
                i += 1
            fields.append("".join(cur))
            records.append(fields)
            cur, fields = [], []
        else:
            cur.append(c)
        i += 1
    if cur or fields:
        fields.append("".join(cur))
        records.append(fields)
    return records


def read_mif(mif_text: str, mid_text: str | None = None) -> pa.Table:
    """MIF (+ optional MID) -> Arrow table: wkt + typed columns."""
    lx = _Lines(mif_text)
    delim = "\t"
    columns: list[tuple[str, str]] = []
    while True:
        s = lx.peek()
        if s is None:
            raise ValueError("MIF: no Data section")
        kw = s.split()[0].lower()
        if kw == "data":
            lx.next()
            break
        lx.next()
        if kw == "delimiter":
            delim = s.split('"')[1]
        elif kw == "columns":
            for _ in range(int(s.split()[1])):
                c = lx.next().split()
                columns.append((c[0], c[1].lower()))

    wkts = []
    while lx.peek() is not None:
        wkts.append(_parse_geometry(lx))

    cols: dict[str, object] = {"wkt": pa.array(wkts, pa.string())}
    if mid_text is not None and columns:
        rows = _parse_mid(mid_text, delim)
        rows = rows[:len(wkts)]
        for j, (name, typ) in enumerate(columns):
            vals = [r[j] if j < len(r) else "" for r in rows]
            if typ.startswith("integer") or typ.startswith("smallint"):
                cols[name] = pa.array(
                    [int(v) if v.strip() else None for v in vals],
                    pa.int64())
            elif typ.startswith(("float", "decimal")):
                cols[name] = pa.array(
                    [float(v) if v.strip() else None for v in vals],
                    pa.float64())
            else:
                cols[name] = pa.array(vals, pa.string())
    return pa.table(cols)


def mif_dataset(path: str, parallelism: int = 4):
    """MIF layer as a Ray Dataset. MIF is a sequential text format, so
    the file is parsed once (single metadata-sized read task) and the
    resulting rows become a Dataset; big layers should convert to
    parquet/FGB for sharded reads (same guidance as the reference's
    mitab -> GPKG migration path)."""
    import os

    import ray.data

    with open(path) as fh:
        mif_text = fh.read()
    mid_text = None
    for ext in (".mid", ".MID"):
        p = os.path.splitext(path)[0] + ext
        if os.path.exists(p):
            with open(p) as fh:
                mid_text = fh.read()
            break
    tab = read_mif(mif_text, mid_text)
    return ray.data.from_arrow(tab)
