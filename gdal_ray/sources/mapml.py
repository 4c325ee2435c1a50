"""MapML vector driver (reference ogr/ogrsf_frmts/mapml/
ogrmapmldataset.cpp).

MapML is the W3C Maps-for-HTML vector format: an XHTML-flavoured XML
document whose ``map-body`` holds ``map-feature`` elements.  Layers
are the distinct ``class`` attributes of the features (default layer
name = the file basename, ogrmapmldataset.cpp:240); attributes live
in a ``map-properties`` HTML table (``th scope=row`` name / ``td
itemprop`` value rows) and are type-sniffed with the reference's
merge lattice (Integer -> Integer64 -> Real, date/time via the
"%04d/%02d/%02d %02d:%02d:%02d" scans, ogrmapmldataset.cpp:378-445);
geometry is a ``map-geometry`` child tree of map-point /
map-linestring / map-polygon / map-multipoint / map-multilinestring /
map-multipolygon / map-geometrycollection elements whose
``map-coordinates`` text is "x y" pairs (ParseGeometry,
ogrmapmldataset.cpp:502-660).

The writer mirrors OGRMapMLWriterLayer::ICreateFeature
(ogrmapmldataset.cpp:1278-1380): feature id = "<layer>.<fid>",
properties table with the two-column header row, polygon shells
emitted counter-clockwise and holes clockwise (writePolygon ring
reversal, :1135-1155), nested geometry collections flattened
(:1252-1262), coordinates "%.8f %.8f" for geographic CRS and
"%.2f %.2f" for projected (:1040), and the closing head map-meta
projection/cs/extent elements with the %.2f extent content
(:760-806).  Known CRSs: WGS84=4326, OSMTILE=3857 (CBMTILE/APSTILE
polar schemes are outside the engine's CRS registry and raise).
"""
from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..functions.wkb import (
    Geom, geom_to_wkb, geom_to_wkt, wkb_to_geom, wkt_to_geom,
)

_KNOWN_CRS = {"WGS84": 4326, "OSMTILE": 3857,
              "CBMTILE": 3978, "APSTILE": 5936}

_DT_RE = re.compile(r"^\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}$")
_D_RE = re.compile(r"^\d{4}/\d{2}/\d{2}$")
_T_RE = re.compile(r"^\d{2}:\d{2}:\d{2}$")
_INT_RE = re.compile(r"^[+-]?\d+$")
_REAL_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


# --------------------------------------------------------------- geometry
def _coords(txt: str) -> np.ndarray:
    vals = [float(v) for v in (txt or "").split()]
    n = len(vals) // 2
    return np.asarray(vals[:n * 2], np.float64).reshape(n, 2)


def _parse_geom_wkb(el) -> bytes | None:
    """One map-* geometry element -> WKB (ParseGeometry analog)."""
    t = _local(el.tag)
    if t == "map-point":
        c = _find(el, "map-coordinates")
        xy = _coords(c.text if c is not None else "")
        if len(xy) != 1:
            return None
        return geom_to_wkb(Geom(1, [xy]))
    if t == "map-linestring":
        c = _find(el, "map-coordinates")
        return geom_to_wkb(Geom(2, [_coords(c.text if c is not None else "")]))
    if t == "map-polygon":
        rings = [_coords(c.text or "") for c in el
                 if _local(c.tag) == "map-coordinates"]
        return geom_to_wkb(Geom(3, rings, [len(rings)]))
    if t == "map-multipoint":
        c = _find(el, "map-coordinates")
        return geom_to_wkb(Geom(4, [_coords(c.text if c is not None else "")]))
    if t == "map-multilinestring":
        parts = [_coords(c.text or "") for c in el
                 if _local(c.tag) == "map-coordinates"]
        return geom_to_wkb(Geom(5, parts))
    if t == "map-multipolygon":
        rings: list[np.ndarray] = []
        counts: list[int] = []
        for c in el:
            if _local(c.tag) == "map-polygon":
                sub = [_coords(cc.text or "") for cc in c
                       if _local(cc.tag) == "map-coordinates"]
                rings.extend(sub)
                counts.append(len(sub))
        return geom_to_wkb(Geom(6, rings, counts))
    if t == "map-geometrycollection":
        kids = []
        for c in el:
            if _local(c.tag) != "map-geometrycollection":
                w = _parse_geom_wkb(c)
                if w is not None:
                    kids.append(w)
        return (b"\x01" + struct.pack("<II", 7, len(kids)) + b"".join(kids))
    return None


def _wkb_end(data: bytes, pos: int) -> int:
    """Byte offset just past the geometry starting at ``pos``
    (GEOMETRYCOLLECTION-aware, unlike the engine's Geom parser)."""
    gtype = struct.unpack_from("<I", data, pos + 1)[0] % 1000
    if gtype == 7:
        n = struct.unpack_from("<I", data, pos + 5)[0]
        end = pos + 9
        for _ in range(n):
            end = _wkb_end(data, end)
        return end
    from ..functions.wkb import _parse

    return _parse(data, pos)[1]


def _gc_parts(wkb: bytes) -> list[bytes]:
    """Split a GEOMETRYCOLLECTION WKB into child WKBs."""
    n = struct.unpack_from("<I", wkb, 5)[0]
    parts, pos = [], 9
    for _ in range(n):
        end = _wkb_end(wkb, pos)
        parts.append(wkb[pos:end])
        pos = end
    return parts


def wkb_to_wkt_mapml(wkb: bytes) -> str:
    """WKT incl. GEOMETRYCOLLECTION (which the engine Geom lacks)."""
    gtype = struct.unpack_from("<I", wkb, 1)[0]
    if gtype % 1000 == 7:
        inner = ", ".join(wkb_to_wkt_mapml(p) for p in _gc_parts(wkb))
        return f"GEOMETRYCOLLECTION ({inner})" if inner \
            else "GEOMETRYCOLLECTION EMPTY"
    return geom_to_wkt(wkb_to_geom(wkb))


# --------------------------------------------------------------- reader
def _sniff_type(v: str) -> str:
    if _INT_RE.match(v):
        return "int" if -2**31 <= int(v) < 2**31 else "int64"
    if _REAL_RE.match(v):
        return "real"
    if _DT_RE.match(v):
        return "datetime"
    if _D_RE.match(v):
        return "date"
    if _T_RE.match(v):
        return "time"
    return "string"


def _merge_type(old: str, new: str) -> str:
    if old == new:
        return old
    if new == "int64" and old == "int":
        return "int64"
    if new == "real" and old in ("int", "int64"):
        return "real"
    if new in ("int", "int64") and old in ("int64", "real"):
        return old
    return "string"


def read_mapml(path_or_text: str) -> dict[str, pa.Table]:
    """Read a MapML document -> {layer: table(fid, fields..., geometry)}.

    Layer split on the ``class`` attribute, default = file basename;
    field types per the reference's sniff lattice; FIDs parsed from
    ``id="<layer>.<n>"`` when present.
    """
    if os.path.exists(path_or_text):
        text = open(path_or_text, "rb").read().decode("utf-8")
        default_layer = os.path.splitext(os.path.basename(path_or_text))[0]
    else:
        text = path_or_text
        default_layer = "mapml"
    root = ET.fromstring(text)
    if _local(root.tag) != "mapml-":
        raise ValueError("not a MapML document (no <mapml-> root)")
    body = _find(root, "map-body")
    if body is None:
        raise ValueError("MapML document has no <map-body>")

    head = _find(root, "map-head")
    epsg = None
    if head is not None:
        for meta in head:
            if (_local(meta.tag) == "map-meta"
                    and meta.get("name") == "projection"):
                epsg = _KNOWN_CRS.get(meta.get("content", ""))

    feats = [el for el in body if _local(el.tag) == "map-feature"]
    if not feats:
        raise ValueError("MapML document has no <map-feature>")
    layers = sorted({f.get("class", default_layer) for f in feats})

    out: dict[str, pa.Table] = {}
    for layer in layers:
        fields: list[str] = []
        ftypes: dict[str, str] = {}
        rows = []
        next_fid = 1
        for f in feats:
            if f.get("class", default_layer) != layer:
                continue
            fid = next_fid
            fid_attr = f.get("id")
            if fid_attr and fid_attr.lower().startswith(layer.lower() + "."):
                try:
                    fid = int(fid_attr[len(layer) + 1:])
                except ValueError:
                    pass
            next_fid += 1
            props: dict[str, str] = {}
            pnode = _find(f, "map-properties")
            tbody = None
            if pnode is not None:
                div = _find(pnode, "div")
                tab = _find(div, "table") if div is not None else None
                tbody = _find(tab, "tbody") if tab is not None else None
            if tbody is not None:
                for tr in tbody:
                    if _local(tr.tag) != "tr":
                        continue
                    td = _find(tr, "td")
                    if td is None:
                        continue
                    name, val = td.get("itemprop"), td.text
                    if name is None or val is None:
                        continue
                    props[name] = val
                    ty = _sniff_type(val)
                    if name not in ftypes:
                        fields.append(name)
                        ftypes[name] = ty
                    else:
                        ftypes[name] = _merge_type(ftypes[name], ty)
            wkb = None
            gnode = _find(f, "map-geometry")
            if gnode is not None:
                for c in gnode:
                    wkb = _parse_geom_wkb(c)
                    break
            rows.append((fid, props, wkb))

        cols: dict[str, pa.Array] = {
            "fid": pa.array([r[0] for r in rows], pa.int64())}
        for name in fields:
            vals = [r[1].get(name) for r in rows]
            ty = ftypes[name]
            if ty == "int":
                cols[name] = pa.array(
                    [int(v) if v is not None else None for v in vals],
                    pa.int32())
            elif ty == "int64":
                cols[name] = pa.array(
                    [int(v) if v is not None else None for v in vals],
                    pa.int64())
            elif ty == "real":
                cols[name] = pa.array(
                    [float(v) if v is not None else None for v in vals],
                    pa.float64())
            else:
                cols[name] = pa.array(vals, pa.string())
        cols["geometry"] = pa.array([r[2] for r in rows], pa.binary())
        t = pa.table(cols)
        if epsg is not None:
            t = t.replace_schema_metadata({b"mapml_epsg": str(epsg).encode()})
        out[layer] = t
    return out


# --------------------------------------------------------------- writer
def _is_clockwise(ring: np.ndarray) -> bool:
    # OGRLinearRing::isClockwise shoelace sign
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0.0


def _fmt_pairs(xy: np.ndarray, fmt: str) -> str:
    return " ".join(fmt % (x, y) for x, y in xy)


def _write_polygon(g: Geom, start: int, nrings: int, fmt: str,
                   parts: list[str]) -> None:
    parts.append("<map-polygon>")
    for i in range(nrings):
        ring = g.rings[start + i]
        rev = _is_clockwise(ring) if i == 0 else not _is_clockwise(ring)
        parts.append("<map-coordinates>%s</map-coordinates>"
                     % _fmt_pairs(ring[::-1] if rev else ring, fmt))
    parts.append("</map-polygon>")


def _write_geom(wkb: bytes, fmt: str, parts: list[str],
                in_gc: bool = False) -> tuple | None:
    gtype = struct.unpack_from("<I", wkb, 1)[0] % 1000
    if gtype == 7:
        if not in_gc:
            parts.append("<map-geometrycollection>")
        env = None
        for sub in _gc_parts(wkb):
            e = _write_geom(sub, fmt, parts, in_gc=True)
            env = _merge_env(env, e)
        if not in_gc:
            parts.append("</map-geometrycollection>")
        return env
    g = wkb_to_geom(wkb)
    env = g.bbox() if g.rings and sum(len(r) for r in g.rings) else None
    env = (env[0], env[1], env[2], env[3]) if env else None
    if g.kind == 1:
        parts.append("<map-point><map-coordinates>%s</map-coordinates>"
                     "</map-point>" % _fmt_pairs(g.rings[0], fmt))
    elif g.kind == 2:
        parts.append("<map-linestring><map-coordinates>%s</map-coordinates>"
                     "</map-linestring>" % _fmt_pairs(g.rings[0], fmt))
    elif g.kind == 3:
        _write_polygon(g, 0, len(g.rings), fmt, parts)
    elif g.kind == 4:
        parts.append("<map-multipoint><map-coordinates>%s</map-coordinates>"
                     "</map-multipoint>" % _fmt_pairs(g.rings[0], fmt))
    elif g.kind == 5:
        parts.append("<map-multilinestring>")
        for r in g.rings:
            parts.append("<map-coordinates>%s</map-coordinates>"
                         % _fmt_pairs(r, fmt))
        parts.append("</map-multilinestring>")
    elif g.kind == 6:
        parts.append("<map-multipolygon>")
        start = 0
        for n in g.poly_ring_counts:
            _write_polygon(g, start, n, fmt, parts)
            start += n
        parts.append("</map-multipolygon>")
    else:
        return None
    return env


def _merge_env(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return (min(a[0], b[0]), min(a[1], b[1]),
            max(a[2], b[2]), max(a[3], b[3]))


def _field_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, float):
        s = "%.15g" % v
        return s
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_mapml(path: str, layers: dict[str, pa.Table],
                extent_units: str | None = None,
                src_epsg: int | str = 4326) -> None:
    """Write layers (fid?, fields..., geometry WKB) to a MapML file.

    ``extent_units`` forces the target CRS (WGS84/OSMTILE); otherwise
    WGS84.  Geometries are reprojected from ``src_epsg`` like the
    reference writer's per-layer coordinate transformation
    (ogrmapmldataset.cpp:1063 OGRCreateCoordinateTransformation).
    """
    from ..functions.crs import Transformer, _parse_epsg

    units = extent_units or "WGS84"
    if units not in ("WGS84", "OSMTILE"):
        raise ValueError(f"Unsupported EXTENT_UNITS {units}")
    dst_epsg = _KNOWN_CRS[units]
    geographic = dst_epsg == 4326
    fmt = "%.8f %.8f" if geographic else "%.2f %.2f"
    ct = (Transformer(src_epsg, dst_epsg)
          if _parse_epsg(src_epsg) != dst_epsg else None)

    body: list[str] = []
    env = None
    for layer, t in layers.items():
        cols = [c for c in t.column_names if c not in ("fid", "geometry")]
        fids = (t["fid"].to_pylist() if "fid" in t.column_names
                else list(range(1, t.num_rows + 1)))
        geoms = (t["geometry"].to_pylist()
                 if "geometry" in t.column_names else [None] * t.num_rows)
        data = {c: t[c].to_pylist() for c in cols}
        for i in range(t.num_rows):
            fid = fids[i]
            osfid = f"{layer}.{fid}"
            body.append(f'<map-feature id="{osfid}" class="{layer}">')
            if cols:
                body.append(
                    '<map-properties><div class="table-container" '
                    f'aria-labelledby="caption-{osfid}"><table>'
                    f'<caption id="caption-{osfid}">Feature properties'
                    "</caption><tbody>"
                    '<tr><th role="columnheader" scope="col">Property name'
                    '</th><th role="columnheader" scope="col">Property value'
                    "</th></tr>")
                for c in cols:
                    s = _field_str(data[c][i])
                    if s is None:
                        continue
                    body.append(
                        f'<tr><th scope="row">{_esc(c)}</th>'
                        f'<td itemprop="{_esc(c)}">{_esc(s)}</td></tr>')
                body.append("</tbody></table></div></map-properties>")
            if geoms[i] is not None:
                wkb = geoms[i]
                if ct is not None:
                    wkb = _transform_wkb(wkb, ct)
                gparts: list[str] = []
                e = _write_geom(wkb, fmt, gparts)
                if gparts:
                    body.append("<map-geometry>%s</map-geometry>"
                                % "".join(gparts))
                    env = _merge_env(env, e)
            body.append("</map-feature>")

    x_ax = "longitude" if geographic else "easting"
    y_ax = "latitude" if geographic else "northing"
    e = env or (0.0, 0.0, 0.0, 0.0)
    extent = ("top-left-%s=%.2f, top-left-%s=%.2f, bottom-right-%s=%.2f, "
              "bottom-right-%s=%.2f"
              % (x_ax, e[0], y_ax, e[3], x_ax, e[2], y_ax, e[1]))
    head = (
        f'<map-meta name="projection" content="{units}"></map-meta>'
        f'<map-meta name="cs" content="{"gcrs" if geographic else "pcrs"}">'
        "</map-meta>"
        f'<map-meta name="extent" content="{extent}"></map-meta>')
    doc = ('<mapml- xmlns="http://www.w3.org/1999/xhtml">'
           f"<map-head>{head}</map-head>"
           f'<map-body>{"".join(body)}</map-body></mapml->')
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)


def _transform_wkb(wkb: bytes, ct) -> bytes:
    gtype = struct.unpack_from("<I", wkb, 1)[0] % 1000
    if gtype == 7:
        kids = [_transform_wkb(p, ct) for p in _gc_parts(wkb)]
        return (b"\x01" + struct.pack("<II", 7, len(kids)) + b"".join(kids))
    g = wkb_to_geom(wkb)
    rings = []
    for r in g.rings:
        x, y = ct.transform(r[:, 0], r[:, 1])
        rings.append(np.column_stack([x, y]))
    return geom_to_wkb(Geom(g.kind, rings, g.poly_ring_counts))
