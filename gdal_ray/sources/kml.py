"""KML vector driver (reference ogr/ogrsf_frmts/kml/: each Folder of
Placemarks is a layer; fields are Name, description plus
ExtendedData Data/SimpleData entries; geometries are Point/
LineString/Polygon/MultiGeometry with lon,lat[,alt] coordinate
tuples — altitude makes features 2.5-D, matching the reference's
``POINT (x y z)`` expectations in autotest/ogr/ogr_kml.py).

Namespace-agnostic stdlib ElementTree parse (KML files ship under
several xmlns variants). Placemarks outside any Folder form a layer
named after the Document. MultiGeometry of mixed member types is a
documented fence (the Geom model has no GeometryCollection).

Reading one KML file is a single-XML-document parse — at engine
scale files ride the per-file map_batches path (one task per file),
like the other single-document formats.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..functions.wkb import Geom, geom_to_wkb, wkb_to_geom

_MULTI = {1: 4, 2: 5, 3: 6}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def _findall(el, name):
    return [c for c in el if _local(c.tag) == name]


def _text(el, name, default=""):
    c = _find(el, name)
    return (c.text or "").strip() if c is not None and c.text else default


def _coords(el) -> tuple[np.ndarray, np.ndarray]:
    """<coordinates> 'lon,lat[,alt]' tuples -> ((n,2) xy, (n,) z)."""
    txt = (el.text or "").strip()
    xy, z = [], []
    for tup in txt.split():
        parts = tup.split(",")
        xy.append((float(parts[0]), float(parts[1])))
        z.append(float(parts[2]) if len(parts) > 2 else 0.0)
    return np.array(xy, np.float64).reshape(-1, 2), np.array(z, np.float64)


def _ring(el_container) -> tuple[np.ndarray, np.ndarray] | None:
    """LinearRing coordinates, or None for the degenerate shapes of
    the reference's geometries.kml matrix (empty Polygon, missing
    LinearRing, empty <coordinates/>)."""
    if el_container is None:
        return None
    lr = _find(el_container, "LinearRing")
    if lr is None:
        return None
    c = _find(lr, "coordinates")
    if c is None or not (c.text or "").strip():
        return None
    return _coords(c)


def _parse_geom(el) -> Geom | None:
    name = _local(el.tag)
    if name in ("Point", "LineString", "LinearRing"):
        c = _find(el, "coordinates")
        if c is None or not (c.text or "").strip():
            return None
        xy, z = _coords(c)
        if len(xy) == 0:
            return None
        return Geom(1 if name == "Point" else 2, [xy], zs=[z])
    if name == "Polygon":
        rings, zs = [], []
        got = _ring(_find(el, "outerBoundaryIs"))
        if got is not None:
            rings.append(got[0])
            zs.append(got[1])
        for inner in _findall(el, "innerBoundaryIs"):
            got = _ring(inner)
            if got is not None:
                rings.append(got[0])
                zs.append(got[1])
        if not rings:
            return None
        return Geom(3, rings, poly_ring_counts=[len(rings)], zs=zs)
    if name == "MultiGeometry":
        members = [_parse_geom(c) for c in el]
        members = [m for m in members if m is not None]
        if not members:
            return None
        kinds = {m.kind for m in members}
        if len(kinds) != 1 or members[0].kind not in _MULTI:
            # heterogeneous members -> GeometryCollection (matches
            # the reference's wkbGeometryCollection output)
            from ..functions.wkb import GEOMETRYCOLLECTION

            return Geom(GEOMETRYCOLLECTION, [], members=members)
        base = members[0].kind
        rings = [r for m in members for r in m.rings]
        zs = [z for m in members for z in (m.zs or [])]
        prc = ([c for m in members for c in m.poly_ring_counts]
               if base == 3 else [])
        return Geom(_MULTI[base], rings, poly_ring_counts=prc,
                    zs=zs or None)
    return None


def _placemark_row(pm) -> tuple[str, str, dict, bytes | None]:
    name = _text(pm, "name")
    desc = _text(pm, "description")
    extra: dict[str, str] = {}
    ext = _find(pm, "ExtendedData")
    if ext is not None:
        for d in _findall(ext, "Data"):
            extra[d.attrib.get("name", "")] = _text(d, "value")
        for sd in _findall(ext, "SchemaData"):
            for s in _findall(sd, "SimpleData"):
                extra[s.attrib.get("name", "")] = (s.text or "").strip()
    geom = None
    for c in pm:
        g = _parse_geom(c)
        if g is not None:
            geom = g
            break
    return name, desc, extra, geom_to_wkb(geom) if geom else None


def read_kml(path_or_bytes) -> dict[str, pa.Table]:
    """-> {layer_name: Arrow table (Name, description, [extras...],
    geometry WKB)} — one layer per Folder, plus the Document layer
    for loose placemarks (the reference's layer model)."""
    if isinstance(path_or_bytes, bytes):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        if "junk after document element" not in str(e):
            raise
        # content after the closing </kml> is ignored like the
        # reference's expat loop (junk_content_after_valid_doc.kml)
        parser = ET.XMLPullParser(["start", "end"])
        root = None
        depth = 0
        done = False
        for off in range(0, len(data), 1024):
            failed = False
            try:
                parser.feed(data[off:off + 1024])
            except ET.ParseError:
                failed = True
            it = parser.read_events()
            while True:
                try:
                    ev, el = next(it)
                except StopIteration:
                    break
                except ET.ParseError:
                    failed = True
                    break
                if ev == "start":
                    depth += 1
                    if root is None:
                        root = el
                else:
                    depth -= 1
                    if depth == 0:
                        done = True
            if done or failed:
                break
        if root is None or not done:
            raise
    doc = _find(root, "Document")
    if doc is None:
        doc = root
    doc_name = _text(doc, "name", "doc") or "doc"

    layers: dict[str, list] = {}

    def collect(container, layer_name):
        rows = layers.setdefault(layer_name, [])
        for c in container:
            t = _local(c.tag)
            if t == "Placemark":
                rows.append(_placemark_row(c))
            elif t == "Folder":
                collect(c, _text(c, "name", layer_name) or layer_name)
            elif t == "Document":
                collect(c, _text(c, "name", layer_name) or layer_name)

    collect(doc, doc_name)

    out: dict[str, pa.Table] = {}
    for lname, rows in layers.items():
        if not rows:
            continue
        extra_keys: list[str] = []
        for _, _, ex, _ in rows:
            for k in ex:
                if k not in extra_keys:
                    extra_keys.append(k)
        cols = {
            "Name": pa.array([r[0] for r in rows], pa.string()),
            "description": pa.array([r[1] for r in rows], pa.string()),
        }
        for k in extra_keys:
            cols[k] = pa.array([r[2].get(k) for r in rows], pa.string())
        cols["geometry"] = pa.array([r[3] for r in rows], pa.binary())
        out[lname] = pa.table(cols)
    return out


def _coord_str(xy: np.ndarray, z: np.ndarray | None, precision: int) -> str:
    zz = z if z is not None else np.zeros(len(xy))
    return " ".join(f"{x:.{precision}g},{y:.{precision}g},{v:.{precision}g}"
                    for (x, y), v in zip(xy, zz))


def _geom_xml(g: Geom, precision: int) -> str:
    zs = g.zs or [None] * len(g.rings)
    if g.kind == 1:
        return (f"<Point><coordinates>{_coord_str(g.rings[0], zs[0], precision)}"
                "</coordinates></Point>")
    if g.kind == 2:
        return ("<LineString><coordinates>"
                f"{_coord_str(g.rings[0], zs[0], precision)}"
                "</coordinates></LineString>")
    if g.kind == 3:
        parts = ["<Polygon>"]
        for i, r in enumerate(g.rings):
            tag = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            parts.append(f"<{tag}><LinearRing><coordinates>"
                         f"{_coord_str(r, zs[i], precision)}"
                         f"</coordinates></LinearRing></{tag}>")
        parts.append("</Polygon>")
        return "".join(parts)
    # multi kinds -> MultiGeometry of members
    inv = {v: k for k, v in _MULTI.items()}
    if g.kind in inv:
        base = inv[g.kind]
        parts = ["<MultiGeometry>"]
        if base == 3:
            at = 0
            for cnt in g.poly_ring_counts:
                sub = Geom(3, g.rings[at:at + cnt], [cnt],
                           zs=(g.zs[at:at + cnt] if g.zs else None))
                parts.append(_geom_xml(sub, precision))
                at += cnt
        else:
            for i, r in enumerate(g.rings):
                parts.append(_geom_xml(
                    Geom(base, [r], zs=([zs[i]] if g.zs else None)),
                    precision))
        parts.append("</MultiGeometry>")
        return "".join(parts)
    raise NotImplementedError(f"KML write for geometry kind {g.kind}")


def _esc(s: str) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_kml(path: str, table: pa.Table, *, layer_name: str = "layer",
              name_col: str | None = "Name",
              desc_col: str | None = "description",
              precision: int = 15) -> None:
    """Arrow layer (WKB geometry) -> KML Folder of Placemarks with
    ExtendedData for the remaining columns."""
    cols = [c for c in table.column_names
            if c not in ("geometry", name_col, desc_col)]
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<kml xmlns="http://www.opengis.net/kml/2.2">',
             "<Document>", f"<Folder><name>{_esc(layer_name)}</name>"]
    data = {c: table[c].to_pylist() for c in table.column_names}
    for i in range(table.num_rows):
        parts.append("<Placemark>")
        if name_col and name_col in data:
            parts.append(f"<name>{_esc(data[name_col][i])}</name>")
        if desc_col and desc_col in data:
            parts.append(
                f"<description>{_esc(data[desc_col][i])}</description>")
        if cols:
            parts.append("<ExtendedData>")
            for c in cols:
                parts.append(f'<Data name="{_esc(c)}"><value>'
                             f"{_esc(data[c][i])}</value></Data>")
            parts.append("</ExtendedData>")
        if "geometry" in data and data["geometry"][i] is not None:
            parts.append(_geom_xml(wkb_to_geom(data["geometry"][i]),
                                   precision))
        parts.append("</Placemark>")
    parts += ["</Folder>", "</Document>", "</kml>"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))


# ------------------------------------------------------- libkml subset
# (VERDICT r3 directive #9: StyleMap / NetworkLink / Schema — the
# libkml-driver features beyond the basic KML layer model; reference
# ogr/ogrsf_frmts/libkml, conformance anchors autotest/ogr/
# ogr_libkml.py:1216-1330 (StyleMap resolution), :1652-1728
# (NetworkLink element set + defaults), r22127 (Schema typing).)

_STYLE_PARTS = ("IconStyle", "LineStyle", "PolyStyle", "LabelStyle",
                "BalloonStyle")


def _parse_style(el) -> dict:
    out: dict[str, dict] = {}
    for part in el:
        pname = _local(part.tag)
        if pname not in _STYLE_PARTS:
            continue
        d: dict[str, str] = {}
        for sub in part.iter():
            t = _local(sub.tag)
            if t in (pname, "Icon"):
                continue
            if sub.text and sub.text.strip():
                d[t] = sub.text.strip()
        out[pname] = d
    return out


def read_kml_styles(path_or_bytes, key: str = "normal") -> dict:
    """Document style table with StyleMap resolution: every
    ``<StyleMap id=X>`` resolves its ``<Pair>`` whose ``<key>``
    matches (normal/highlight — the LIBKML_STYLEMAP_KEY config of the
    reference) to a concrete style — inline ``<Style>`` or a
    ``#styleUrl`` lookup — and the result replaces the map under the
    map's own id (ogr_libkml.py resolved_stylemap semantics)."""
    if isinstance(path_or_bytes, bytes):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    root = ET.fromstring(data)
    styles: dict[str, dict] = {}
    maps = []
    for el in root.iter():
        t = _local(el.tag)
        if t == "Style" and el.attrib.get("id"):
            styles[el.attrib["id"]] = _parse_style(el)
        elif t == "StyleMap" and el.attrib.get("id"):
            maps.append(el)
    # second pass: Style elements nested inside StyleMap Pairs are
    # NOT standalone entries
    for m in maps:
        for pair in m:
            st = _find(pair, "Style")
            if st is not None and st.attrib.get("id") in styles:
                del styles[st.attrib["id"]]
    for m in maps:
        resolved = None
        for pair in m:
            if _local(pair.tag) != "Pair":
                continue
            if (_text(pair, "key", "normal") or "normal") != key:
                continue
            inline = _find(pair, "Style")
            if inline is not None:
                resolved = _parse_style(inline)
            else:
                url = _text(pair, "styleUrl", "") or ""
                resolved = styles.get(url.lstrip("#"))
        if resolved is not None:
            styles[m.attrib["id"]] = resolved
    return styles


_NL_FIELDS = ("refreshVisibility", "flyToView", "refreshMode",
              "refreshInterval", "viewRefreshMode", "viewRefreshTime",
              "viewBoundScale", "viewFormat", "httpQuery")


def read_kml_networklinks(path_or_bytes) -> list[dict]:
    """NetworkLink features: name, href (from Link/Url) + the Link
    refresh/view fields."""
    if isinstance(path_or_bytes, bytes):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    root = ET.fromstring(data)
    out = []
    for el in root.iter():
        if _local(el.tag) != "NetworkLink":
            continue
        row: dict = {"name": _text(el, "name")}
        link = _find(el, "Link") or _find(el, "Url")
        row["href"] = _text(link, "href") if link is not None else None
        for f in ("refreshVisibility", "flyToView"):
            row[f] = _text(el, f)
        if link is not None:
            for f in _NL_FIELDS[2:]:
                row[f] = _text(link, f)
        out.append(row)
    return out


def write_kml_networklinks(rows: list[dict]) -> str:
    """LIBKML NetworkLink writer semantics incl. the implied-mode
    defaults: a refreshInterval without refreshMode writes
    ``onInterval``; a viewRefreshTime without viewRefreshMode writes
    ``onStop`` (ogr_libkml.py write_networklink expectations)."""
    parts = ['<?xml version="1.0" encoding="utf-8"?>',
             '<kml xmlns="http://www.opengis.net/kml/2.2">',
             "<Document>"]
    for r in rows:
        parts.append("<NetworkLink>")
        if r.get("name"):
            parts.append(f"<name>{r['name']}</name>")
        for f in ("refreshVisibility", "flyToView"):
            if r.get(f) is not None:
                parts.append(f"<{f}>{int(r[f])}</{f}>")
        parts.append("<Link>")
        parts.append(f"<href>{r['href']}</href>")
        mode = r.get("refreshMode")
        if mode is None and r.get("refreshInterval") is not None:
            mode = "onInterval"
        if mode:
            parts.append(f"<refreshMode>{mode}</refreshMode>")
        if r.get("refreshInterval") is not None:
            parts.append("<refreshInterval>%g</refreshInterval>"
                         % r["refreshInterval"])
        vmode = r.get("viewRefreshMode")
        if vmode is None and r.get("viewRefreshTime") is not None:
            vmode = "onStop"
        if vmode:
            parts.append(f"<viewRefreshMode>{vmode}</viewRefreshMode>")
        if r.get("viewRefreshTime") is not None:
            parts.append("<viewRefreshTime>%g</viewRefreshTime>"
                         % r["viewRefreshTime"])
        if r.get("viewBoundScale") is not None:
            parts.append("<viewBoundScale>%g</viewBoundScale>"
                         % r["viewBoundScale"])
        if r.get("viewFormat"):
            parts.append(f"<viewFormat>{r['viewFormat']}</viewFormat>")
        if r.get("httpQuery"):
            parts.append(f"<httpQuery>{r['httpQuery']}</httpQuery>")
        parts.append("</Link>")
        parts.append("</NetworkLink>")
    parts += ["</Document>", "</kml>"]
    return "\n".join(parts)


_SCHEMA_CAST = {"int": pa.int32(), "uint": pa.uint32(),
                "short": pa.int16(), "ushort": pa.uint16(),
                "float": pa.float32(), "double": pa.float64(),
                "bool": pa.bool_(), "string": pa.string()}


def read_kml_schemas(path_or_bytes) -> dict[str, dict[str, str]]:
    """``<Schema>`` declarations: {schema id/name: {field: kml type}}
    (the libkml driver types layer fields from these)."""
    if isinstance(path_or_bytes, bytes):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    root = ET.fromstring(data)
    out: dict[str, dict[str, str]] = {}
    for el in root.iter():
        if _local(el.tag) != "Schema":
            continue
        fields = {}
        for sf in el:
            if _local(sf.tag) == "SimpleField":
                fields[sf.attrib.get("name", "")] = \
                    sf.attrib.get("type", "string")
        sid = el.attrib.get("id") or el.attrib.get("name") or "schema"
        out[sid] = fields
    return out


def apply_kml_schema(table: pa.Table, fields: dict[str, str]) -> pa.Table:
    """Cast SchemaData string columns to their declared KML types."""
    import pyarrow.compute as pc2

    for name, kt in fields.items():
        if name not in table.column_names:
            continue
        want = _SCHEMA_CAST.get(kt, pa.string())
        if want == pa.string():
            continue
        col = table[name]
        if pa.types.is_boolean(want):
            lowered = pc2.utf8_lower(col)
            cast = pc2.is_in(lowered, value_set=pa.array(["1", "true"]))
            cast = pc2.if_else(pc2.is_null(col),
                               pa.nulls(len(table), pa.bool_()), cast)
        elif pa.types.is_integer(want):
            # int-typed SimpleFields may carry float-formatted strings
            # ("1.0"); go through float64 so the cast doesn't raise
            try:
                cast = col.cast(want)
            except pa.ArrowInvalid:
                try:
                    cast = col.cast(pa.float64()).cast(want)
                except pa.ArrowInvalid:
                    continue  # leave as string rather than fail the read
        else:
            cast = col.cast(want)
        table = table.set_column(
            table.column_names.index(name), name, cast)
    return table
