"""GeoRSS (RSS 2.0) vector driver (reference
ogr/ogrsf_frmts/georss/ogrgeorsslayer.cpp).

Items of the channel become features: simple-encoding geometries
(``georss:point`` "lat lon", ``georss:line``/``georss:polygon``
lat-lon pair lists, ``georss:box`` two corners -> rectangle ring
(lon1 lat1, lon1 lat2, lon2 lat2, lon2 lat1)), ``georss:where`` GML
payloads parsed with the engine's GML grammar (lat/lon axis order),
and item metadata (title/author/link/description); ``pubDate``
RFC-822 text renders as OGR datetime "YYYY/MM/DD HH:MM:SS+TZ";
repeated ``category`` elements become category/category2/... with
``_domain`` companions, like the reference's field naming."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pyarrow as pa

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
     "Oct", "Nov", "Dec"])}


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _pubdate(txt: str) -> str:
    m = re.match(r"\s*(?:\w+,\s*)?(\d+)\s+(\w+)\s+(\d+)\s+"
                 r"(\d+):(\d+)(?::(\d+))?\s*([+-]\d{4}|GMT|UT|Z)?", txt)
    if not m:
        return txt
    d, mon, y = int(m.group(1)), _MONTHS.get(m.group(2), 1), int(m.group(3))
    h, mi, s = int(m.group(4)), int(m.group(5)), int(m.group(6) or 0)
    tz = m.group(7) or ""
    if tz in ("GMT", "UT", "Z"):
        tz = "+00"
    elif tz:
        tz = tz[:3] if tz.endswith("00") else tz[:3] + ":" + tz[3:]
    return "%04d/%02d/%02d %02d:%02d:%02d%s" % (y, mon, d, h, mi, s, tz)


def _pairs(txt):
    vals = [float(v) for v in txt.split()]
    return [(vals[i + 1], vals[i]) for i in range(0, len(vals) - 1, 2)]


def _geom_wkt(el) -> str | None:
    t = _local(el.tag)
    if t == "point":
        p = _pairs(el.text or "")
        if not p:
            return None
        return "POINT (%.10g %.10g)" % p[0]
    if t == "line":
        p = _pairs(el.text or "")
        return "LINESTRING (%s)" % ",".join("%.10g %.10g" % q for q in p)
    if t == "polygon":
        p = _pairs(el.text or "")
        return "POLYGON ((%s))" % ",".join("%.10g %.10g" % q for q in p)
    if t == "box":
        p = _pairs(el.text or "")
        if len(p) != 2:
            return None
        (x1, y1), (x2, y2) = p
        ring = [(x1, y1), (x1, y2), (x2, y2), (x2, y1), (x1, y1)]
        return "POLYGON ((%s))" % ",".join("%.10g %.10g" % q for q in ring)
    if t == "where":
        from .gml import _parse_gml_geom
        from ..functions.wkb import geom_to_wkt

        for g in el:
            if _local(g.tag) == "Envelope":
                lo = hi = None
                for c in g:
                    if _local(c.tag) == "lowerCorner":
                        lo = [float(v) for v in (c.text or "").split()]
                    elif _local(c.tag) == "upperCorner":
                        hi = [float(v) for v in (c.text or "").split()]
                if lo and hi:
                    # lat lon order
                    x1, y1, x2, y2 = lo[1], lo[0], hi[1], hi[0]
                    ring = [(x1, y1), (x1, y2), (x2, y2), (x2, y1),
                            (x1, y1)]
                    return "POLYGON ((%s))" % ",".join(
                        "%.10g %.10g" % q for q in ring)
                return None
            try:
                geom = _parse_gml_geom(g, "urn:ogc:def:crs:EPSG::4326")
            except Exception:
                return None
            if geom is not None:
                return geom_to_wkt(geom, precision=12).replace(", ", ",")
    return None


def read_georss(path: str) -> pa.Table:
    root = ET.parse(path).getroot()
    items = [el for el in root.iter() if _local(el.tag) in ("item", "entry")]
    rows = []
    for item in items:
        row: dict = {}
        wkt = None
        ncat = 0
        for child in item:
            t = _local(child.tag)
            if t in ("point", "line", "polygon", "box", "where"):
                w = _geom_wkt(child)
                if w:
                    wkt = w
            elif t == "category":
                ncat += 1
                key = "category" if ncat == 1 else "category%d" % ncat
                row[key] = (child.text or "").strip()
                if child.get("domain"):
                    row[key + "_domain"] = child.get("domain")
            elif t == "pubDate":
                row["pubDate"] = _pubdate(child.text or "")
            elif child.text and child.text.strip():
                row[t] = child.text.strip()
        row["wkt"] = wkt
        rows.append(row)

    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    arrays = [pa.array([None if r.get(c) is None else str(r.get(c))
                        for r in rows], pa.string()) for c in cols]
    return pa.table(arrays, names=cols)
