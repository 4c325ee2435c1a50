"""MapML vector driver, read + write (reference
ogr/ogrsf_frmts/mapml, conformance ogr_mapml.py).

MapML (https://maps4html.org) is an XHTML-like document:
``<mapml->/<map-body>`` holds ``<map-feature id="layer.fid"
class="layer">`` elements; properties are an HTML table
(``<th scope="row">NAME</th><td itemprop="NAME">value</td>``) and
geometry uses ``<map-point>/<map-linestring>/<map-polygon>/
<map-multipoint>/<map-multilinestring>/<map-multipolygon>/
<map-geometrycollection>`` with space-separated ``<map-coordinates>``.
The writer (like the reference) forces polygon exterior rings CCW and
interior rings CW, flattens nested geometry collections, and assigns
sequential FIDs starting at 1 to features without one.  The reader
groups features into layers by their ``class`` attribute."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pyarrow as pa

_XHTML = "{http://www.w3.org/1999/xhtml}"


def _fmt(v: float) -> str:
    return "%.15g" % v


# ------------------------------------------------------ tiny WKT model
# geometry = (kind, payload); payload: POINT -> (x, y); LINESTRING ->
# [pts]; POLYGON -> [[pts]]; MULTIPOINT -> [pts]; MULTILINESTRING ->
# [[pts]]; MULTIPOLYGON -> [[[pts]]]; GEOMETRYCOLLECTION -> [geoms]

def _split_groups(txt: str) -> list[str]:
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


def _split_top(txt: str) -> list[str]:
    out, depth, start = [], 0, 0
    for i, c in enumerate(txt):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(txt[start:i])
            start = i + 1
    out.append(txt[start:])
    return [s for s in (x.strip() for x in out) if s]


def _pts(txt: str) -> list[tuple[float, float]]:
    return [(float(p.split()[0]), float(p.split()[1]))
            for p in txt.split(",") if p.strip()]


def parse_wkt(wkt: str):
    s = wkt.strip()
    m = re.match(r"^([A-Za-z]+)\s*\((.*)\)$", s, re.S)
    if not m:
        raise ValueError(wkt[:40])
    kind, body = m.group(1).upper(), m.group(2).strip()
    if kind == "POINT":
        return (kind, _pts(body)[0])
    if kind == "LINESTRING":
        return (kind, _pts(body))
    if kind == "POLYGON":
        return (kind, [_pts(g) for g in _split_groups(body)])
    if kind == "MULTIPOINT":
        g = _split_groups(body)
        return (kind, [p for grp in g for p in _pts(grp)] if g
                else _pts(body))
    if kind == "MULTILINESTRING":
        return (kind, [_pts(g) for g in _split_groups(body)])
    if kind == "MULTIPOLYGON":
        return (kind, [[_pts(r) for r in _split_groups(p)]
                       for p in _split_groups(body)])
    if kind == "GEOMETRYCOLLECTION":
        return (kind, [parse_wkt(g) for g in _split_top(body)])
    raise ValueError(kind)


def to_wkt(g) -> str:
    kind, pl = g

    def c(pts):
        return ",".join("%s %s" % (_fmt(x), _fmt(y)) for x, y in pts)

    if kind == "POINT":
        return "POINT (%s %s)" % (_fmt(pl[0]), _fmt(pl[1]))
    if kind == "LINESTRING":
        return "LINESTRING (%s)" % c(pl)
    if kind == "POLYGON":
        return "POLYGON (%s)" % ",".join("(%s)" % c(r) for r in pl)
    if kind == "MULTIPOINT":
        return "MULTIPOINT (%s)" % c(pl)
    if kind == "MULTILINESTRING":
        return "MULTILINESTRING (%s)" % ",".join(
            "(%s)" % c(p) for p in pl)
    if kind == "MULTIPOLYGON":
        return "MULTIPOLYGON (%s)" % ",".join(
            "(%s)" % ",".join("(%s)" % c(r) for r in p) for p in pl)
    if kind == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (%s)" % ",".join(
            to_wkt(sub) for sub in pl)
    raise ValueError(kind)


def _ring_area(pts) -> float:
    a = 0.0
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        a += x1 * y2 - x2 * y1
    return a / 2


def _fix_winding(rings):
    """Exterior CCW, interiors CW (the reference writer's layout)."""
    out = []
    for i, r in enumerate(rings):
        a = _ring_area(r)
        if (i == 0 and a < 0) or (i > 0 and a > 0):
            r = r[::-1]
        out.append(r)
    return out


def _flatten_gc(geoms):
    out = []
    for g in geoms:
        if g[0] == "GEOMETRYCOLLECTION":
            out.extend(_flatten_gc(g[1]))
        else:
            out.append(g)
    return out


# --------------------------------------------------------------- write
def _geom_xml(g) -> str:
    kind, pl = g

    def c(pts):
        return " ".join("%s %s" % (_fmt(x), _fmt(y)) for x, y in pts)

    if kind == "POINT":
        return ("<map-point><map-coordinates>%s %s</map-coordinates>"
                "</map-point>") % (_fmt(pl[0]), _fmt(pl[1]))
    if kind == "LINESTRING":
        return ("<map-linestring><map-coordinates>%s</map-coordinates>"
                "</map-linestring>") % c(pl)
    if kind == "POLYGON":
        rings = _fix_winding(pl)
        return "<map-polygon>%s</map-polygon>" % "".join(
            "<map-coordinates>%s</map-coordinates>" % c(r)
            for r in rings)
    if kind == "MULTIPOINT":
        return ("<map-multipoint><map-coordinates>%s</map-coordinates>"
                "</map-multipoint>") % c(pl)
    if kind == "MULTILINESTRING":
        return "<map-multilinestring>%s</map-multilinestring>" % "".join(
            "<map-coordinates>%s</map-coordinates>" % c(p) for p in pl)
    if kind == "MULTIPOLYGON":
        polys = []
        for p in pl:
            rings = _fix_winding(p)
            polys.append("<map-polygon>%s</map-polygon>" % "".join(
                "<map-coordinates>%s</map-coordinates>" % c(r)
                for r in rings))
        return "<map-multipolygon>%s</map-multipolygon>" % "".join(polys)
    if kind == "GEOMETRYCOLLECTION":
        subs = _flatten_gc(pl)
        return ("<map-geometrycollection>%s"
                "</map-geometrycollection>") % "".join(
            _geom_xml(s) for s in subs)
    raise ValueError(kind)


def write_mapml(path: str, layers: list[tuple[str, pa.Table]]) -> None:
    """layers: (name, table) with optional ``wkt`` and ``fid``
    columns; remaining columns become properties."""
    parts = ['<mapml- xmlns="http://www.w3.org/1999/xhtml">',
             "<map-head></map-head>", "<map-body>"]
    next_fid = 1
    for lname, tab in layers:
        cols = [c for c in tab.column_names if c not in ("wkt", "fid")]
        fids = tab["fid"].to_pylist() if "fid" in tab.column_names \
            else [None] * tab.num_rows
        wkts = tab["wkt"].to_pylist() if "wkt" in tab.column_names \
            else [None] * tab.num_rows
        for i in range(tab.num_rows):
            fid = fids[i]
            if fid is None:
                fid = next_fid
            next_fid = max(next_fid, fid) + 1 if fid == next_fid \
                else next_fid + 1
            parts.append('<map-feature id="%s.%d" class="%s">'
                         % (lname, fid, lname))
            rows = []
            for cname in cols:
                v = tab[cname][i].as_py()
                if v is None:
                    continue
                if isinstance(v, float) and v == int(v):
                    v = "%d" % int(v) if abs(v) < 1e15 else _fmt(v)
                rows.append(
                    '<tr><th scope="row">%s</th>'
                    '<td itemprop="%s">%s</td></tr>' % (cname, cname, v))
            if rows:
                parts.append("<map-properties><table><tbody>%s</tbody>"
                             "</table></map-properties>" % "".join(rows))
            if wkts[i]:
                parts.append("<map-geometry>%s</map-geometry>"
                             % _geom_xml(parse_wkt(wkts[i])))
            parts.append("</map-feature>")
    parts.append("</map-body></mapml->")
    with open(path, "w") as f:
        f.write("".join(parts))


# ---------------------------------------------------------------- read
def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _read_geom(el):
    t = _local(el.tag)

    def coords(e):
        txt = []
        for sub in e.iter():
            if _local(sub.tag) == "map-coordinates":
                txt.append(sub.text or "")
        return txt

    def pts(txt):
        v = txt.split()
        return [(float(v[i]), float(v[i + 1]))
                for i in range(0, len(v), 2)]

    if t == "map-point":
        return ("POINT", pts(coords(el)[0])[0])
    if t == "map-linestring":
        return ("LINESTRING", pts(coords(el)[0]))
    if t == "map-polygon":
        return ("POLYGON", [pts(c) for c in coords(el)])
    if t == "map-multipoint":
        return ("MULTIPOINT", pts(coords(el)[0]))
    if t == "map-multilinestring":
        return ("MULTILINESTRING", [pts(c) for c in coords(el)])
    if t == "map-multipolygon":
        polys = []
        for sub in el:
            if _local(sub.tag) == "map-polygon":
                polys.append([pts(c) for c in coords(sub)])
        return ("MULTIPOLYGON", polys)
    if t == "map-geometrycollection":
        subs = [_read_geom(sub) for sub in el
                if _read_geom_supported(sub)]
        return ("GEOMETRYCOLLECTION", subs)
    return None


def _read_geom_supported(el) -> bool:
    return _local(el.tag) in (
        "map-point", "map-linestring", "map-polygon", "map-multipoint",
        "map-multilinestring", "map-multipolygon",
        "map-geometrycollection")


def read_mapml(path: str) -> dict[str, pa.Table]:
    """Layers keyed by feature ``class`` (features without one land in
    a ``mapml`` layer), preserving first-seen order."""
    root = ET.parse(path).getroot()
    body = None
    for el in root.iter():
        if _local(el.tag) == "map-body":
            body = el
            break
    if body is None:
        raise ValueError("missing <map-body>")

    per_layer: dict[str, list[dict]] = {}
    nfeat = 0
    for feat in body.iter():
        if _local(feat.tag) != "map-feature":
            continue
        nfeat += 1
        lname = feat.get("class") or "mapml"
        rec: dict = {}
        fid = feat.get("id", "")
        m = re.match(r".*\.(\d+)$", fid)
        if m:
            rec["fid"] = int(m.group(1))
        for el in feat.iter():
            t = _local(el.tag)
            if t == "map-properties":
                names, vals = [], []
                for sub in el.iter():
                    st = _local(sub.tag)
                    if st == "th" and sub.get("scope") == "row":
                        names.append((sub.text or "").strip())
                    elif st == "td" and sub.get("itemprop"):
                        vals.append((sub.text or "").strip())
                for n, v in zip(names, vals):
                    rec[n] = v
            elif t == "map-geometry":
                for sub in el:
                    g = _read_geom(sub)
                    if g:
                        rec["wkt"] = to_wkt(g)
        per_layer.setdefault(lname, []).append(rec)
    if nfeat == 0:
        raise ValueError("no <map-feature>")

    out = {}
    for lname, recs in per_layer.items():
        cols: list[str] = []
        for r in recs:
            for k in r:
                if k not in cols and k not in ("fid", "wkt"):
                    cols.append(k)
        names, arrays = [], []
        names.append("fid")
        arrays.append(pa.array([r.get("fid") for r in recs], pa.int64()))
        for cname in cols:
            vals = [r.get(cname) for r in recs]
            nn = [v for v in vals if v not in (None, "")]
            if nn and all(re.match(r"^-?\d+$", v) for v in nn):
                arrays.append(pa.array(
                    [int(v) if v not in (None, "") else None
                     for v in vals], pa.int64()))
            elif nn and all(re.match(r"^-?\d+(\.\d+)?([eE][-+]?\d+)?$",
                                     v) for v in nn):
                arrays.append(pa.array(
                    [float(v) if v not in (None, "") else None
                     for v in vals], pa.float64()))
            else:
                arrays.append(pa.array(
                    [v if v not in (None, "") else None for v in vals],
                    pa.string()))
            names.append(cname)
        names.append("wkt")
        arrays.append(pa.array([r.get("wkt") for r in recs],
                               pa.string()))
        out[lname] = pa.table(arrays, names=names)
    return out
