"""GML vector driver (reference ogr/ogrsf_frmts/gml/): OGR-style
FeatureCollections of featureMember elements, one layer per feature
element name, scalar property children as fields, geometry from the
property holding a gml:* geometry element.

Geometry support: Point (gml:pos / gml:coordinates), LineString
(gml:posList / gml:coordinates), Polygon (GML3 exterior/interior and
GML2 outerBoundaryIs/innerBoundaryIs LinearRings), MultiPoint /
MultiLineString / MultiPolygon / MultiSurface / MultiCurve via their
member elements. ``urn:ogc:def:crs:EPSG::...`` srsNames trigger the
GML3 lat/lon axis order swap (the reference's axis-order handling in
gml2ogrgeometry.cpp); plain ``EPSG:...`` srsNames stay x/y.

Field types autodetect Integer64 -> Real -> String per column (the
driver's behavior without a .xsd). Single-document XML parse — files
ride the per-file map_batches path at engine scale.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..functions.wkb import Geom, geom_to_wkb, wkb_to_geom

_GEOM_TAGS = {"Point", "LineString", "Polygon", "Curve", "MultiPoint",
              "MultiLineString", "MultiPolygon", "MultiSurface",
              "MultiCurve", "MultiGeometry"}
_MULTI_BASE = {"MultiPoint": (1, 4), "MultiLineString": (2, 5),
               "MultiCurve": (2, 5), "MultiPolygon": (3, 6),
               "MultiSurface": (3, 6)}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _is_urn(srs: str | None) -> bool:
    return bool(srs) and srs.lower().startswith("urn:")


def _pairs_from_poslist(txt: str, swap: bool) -> np.ndarray:
    vals = np.array(txt.split(), np.float64)
    if vals.size % 2:
        raise ValueError("odd posList length (only 2-D GML supported)")
    xy = vals.reshape(-1, 2)
    return xy[:, ::-1] if swap else xy


def _pairs_from_coordinates(txt: str) -> np.ndarray:
    """<gml:coordinates>: normally 'x,y x,y' (cs="," ts=" ") but some
    producers emit 'x y,x y' — GDAL detects which separator splits
    tuples (gml2ogrgeometry.cpp coordinate parsing)."""
    txt = txt.strip()
    toks = txt.split()
    if toks and all("," in t for t in toks):
        pts = []
        for tup in toks:
            parts = tup.split(",")
            pts.append((float(parts[0]), float(parts[1])))
        return np.array(pts, np.float64).reshape(-1, 2)
    # comma-separated tuples with space inside
    pts = []
    for tup in txt.split(","):
        parts = tup.split()
        if len(parts) >= 2:
            pts.append((float(parts[0]), float(parts[1])))
    return np.array(pts, np.float64).reshape(-1, 2)


def _ring_coords(el, swap: bool) -> np.ndarray:
    for c in el.iter():
        t = _local(c.tag)
        if t in ("posList", "pos"):
            return _pairs_from_poslist(c.text or "", swap)
        if t == "coordinates":
            return _pairs_from_coordinates(c.text or "")
    raise ValueError("no coordinates in GML ring")


def _parse_gml_geom(el, default_srs: str | None = None) -> Geom:
    tag = _local(el.tag)
    srs = el.attrib.get("srsName", default_srs)
    swap = _is_urn(srs)
    if tag == "Point":
        return Geom(1, [_ring_coords(el, swap)])
    if tag in ("LineString", "LinearRing", "Curve"):
        return Geom(2, [_ring_coords(el, swap)])
    if tag == "Polygon":
        rings = []
        for c in el:
            t = _local(c.tag)
            if t in ("exterior", "outerBoundaryIs"):
                rings.insert(0, _ring_coords(c, swap))
            elif t in ("interior", "innerBoundaryIs"):
                rings.append(_ring_coords(c, swap))
        return Geom(3, rings, poly_ring_counts=[len(rings)])
    if tag in _MULTI_BASE:
        base, multi = _MULTI_BASE[tag]
        rings, prc = [], []
        for member in el.iter():
            t = _local(member.tag)
            if t in ("Point", "LineString", "Polygon", "Curve"):
                g = _parse_gml_geom(member, srs)
                rings.extend(g.rings)
                if base == 3:
                    prc.append(len(g.rings))
        return Geom(multi, rings, poly_ring_counts=prc)
    raise NotImplementedError(f"GML geometry {tag!r}")


def _sniff_column(vals: list) -> pa.Array:
    present = [v for v in vals if v is not None]
    try:
        ints = [int(v) for v in present]
        if all(str(i) == v.strip() for i, v in zip(ints, present)):
            return pa.array([int(v) if v is not None else None
                             for v in vals], pa.int64())
    except ValueError:
        pass
    try:
        [float(v) for v in present]
        return pa.array([float(v) if v is not None else None for v in vals],
                        pa.float64())
    except ValueError:
        return pa.array(vals, pa.string())


def read_gml(path_or_bytes) -> dict[str, pa.Table]:
    """-> {layer_name: Arrow table (gml_id, fields..., geometry WKB)}."""
    if isinstance(path_or_bytes, bytes):
        root = ET.fromstring(path_or_bytes)
    else:
        root = ET.parse(path_or_bytes).getroot()

    # collection default srs from the top boundedBy envelope
    default_srs = None
    for c in root.iter():
        if _local(c.tag) == "Envelope" and "srsName" in c.attrib:
            default_srs = c.attrib["srsName"]
            break

    layers: dict[str, list] = {}
    for fm in root:
        if _local(fm.tag) not in ("featureMember", "featureMembers",
                                  "member"):
            continue
        for feat in fm:
            lname = _local(feat.tag)
            gml_id = next((v for k, v in feat.attrib.items()
                           if _local(k) in ("id", "fid")), None)
            fields: dict[str, str] = {}
            geom = None
            for prop in feat:
                pt = _local(prop.tag)
                if pt == "boundedBy":
                    continue
                child_geom = next((c for c in prop
                                   if _local(c.tag) in _GEOM_TAGS), None)
                if child_geom is not None:
                    geom = _parse_gml_geom(child_geom, default_srs)
                elif _local(prop.tag) in _GEOM_TAGS:
                    geom = _parse_gml_geom(prop, default_srs)
                else:
                    fields[pt] = (prop.text or "").strip()
            layers.setdefault(lname, []).append(
                (gml_id, fields, geom_to_wkb(geom) if geom else None))

    out: dict[str, pa.Table] = {}
    for lname, rows in layers.items():
        keys: list[str] = []
        for _, f, _ in rows:
            for k in f:
                if k not in keys:
                    keys.append(k)
        cols: dict = {"gml_id": pa.array([r[0] for r in rows], pa.string())}
        for k in keys:
            cols[k] = _sniff_column([r[1].get(k) for r in rows])
        cols["geometry"] = pa.array([r[2] for r in rows], pa.binary())
        out[lname] = pa.table(cols)
    return out


def _fmt_poslist(xy: np.ndarray, precision: int) -> str:
    return " ".join(f"{x:.{precision}g} {y:.{precision}g}" for x, y in xy)


def _geom_gml(g: Geom, precision: int) -> str:
    if g.kind == 1:
        return (f"<gml:Point><gml:pos>{_fmt_poslist(g.rings[0], precision)}"
                "</gml:pos></gml:Point>")
    if g.kind == 2:
        return (f"<gml:LineString><gml:posList>"
                f"{_fmt_poslist(g.rings[0], precision)}"
                "</gml:posList></gml:LineString>")
    if g.kind == 3:
        parts = ["<gml:Polygon>"]
        for i, r in enumerate(g.rings):
            tag = "exterior" if i == 0 else "interior"
            parts.append(f"<gml:{tag}><gml:LinearRing><gml:posList>"
                         f"{_fmt_poslist(r, precision)}"
                         f"</gml:posList></gml:LinearRing></gml:{tag}>")
        parts.append("</gml:Polygon>")
        return "".join(parts)
    if g.kind == 4:
        return ("<gml:MultiPoint>" + "".join(
            f"<gml:pointMember>{_geom_gml(Geom(1, [r]), precision)}"
            "</gml:pointMember>" for r in g.rings) + "</gml:MultiPoint>")
    if g.kind == 5:
        return ("<gml:MultiLineString>" + "".join(
            f"<gml:lineStringMember>{_geom_gml(Geom(2, [r]), precision)}"
            "</gml:lineStringMember>" for r in g.rings)
            + "</gml:MultiLineString>")
    if g.kind == 6:
        parts = ["<gml:MultiPolygon>"]
        at = 0
        for cnt in g.poly_ring_counts:
            sub = Geom(3, g.rings[at:at + cnt], [cnt])
            parts.append(f"<gml:polygonMember>{_geom_gml(sub, precision)}"
                         "</gml:polygonMember>")
            at += cnt
        parts.append("</gml:MultiPolygon>")
        return "".join(parts)
    raise NotImplementedError(f"GML write for kind {g.kind}")


def _esc(s) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_gml(path: str, table: pa.Table, *, layer_name: str = "layer",
              precision: int = 15) -> None:
    """Arrow layer -> OGR-style GML3 FeatureCollection (the
    expected_gml_gml3.gml shape: ogr: feature namespace, gml:pos /
    posList geometry, x/y axis order — no urn srsName emitted)."""
    cols = [c for c in table.column_names if c != "geometry"]
    parts = ['<?xml version="1.0" encoding="utf-8" ?>',
             "<ogr:FeatureCollection"
             ' xmlns:ogr="http://ogr.maptools.org/"'
             ' xmlns:gml="http://www.opengis.net/gml">']
    data = {c: table[c].to_pylist() for c in table.column_names}
    for i in range(table.num_rows):
        parts.append("<gml:featureMember>")
        parts.append(f'<ogr:{layer_name} gml:id="{layer_name}.{i}">')
        if "geometry" in data and data["geometry"][i] is not None:
            g = wkb_to_geom(data["geometry"][i])
            parts.append(f"<ogr:geometryProperty>{_geom_gml(g, precision)}"
                         "</ogr:geometryProperty>")
        for c in cols:
            v = data[c][i]
            if v is not None:
                parts.append(f"<ogr:{c}>{_esc(v)}</ogr:{c}>")
        parts.append(f"</ogr:{layer_name}>")
        parts.append("</gml:featureMember>")
    parts.append("</ogr:FeatureCollection>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))


def read_fgd_gml(path: str) -> dict[str, pa.Table]:
    """Japanese GSI FGD GML profile (reference
    ogr/ogrsf_frmts/gml GFS-less FGD handling; autotest
    ogr_gml_fgd_read.py): the <Dataset> root holds features
    directly (ElevPt, BldA, ...); geometry children (pos/area/loc)
    wrap gml geometries in JGD2011 lat/lon axis order (swapped to
    x=lon like the reference); scalar children become fields,
    date-like children flatten their gml:timePosition."""
    import xml.etree.ElementTree as ET

    from ..functions.wkb import geom_to_wkt

    root = ET.parse(path).getroot()
    layers: dict[str, list] = {}
    for feat in root:
        tag = _local(feat.tag)
        if tag in ("description", "name") or not list(feat):
            continue
        row: dict = {}
        wkt = None
        for child in feat:
            ctag = _local(child.tag)
            kids = list(child)
            geom_kid = next((k for k in kids
                             if _local(k.tag) in (
                                 "Point", "Curve", "Surface", "Polygon",
                                 "LineString", "MultiSurface")), None)
            if geom_kid is not None:
                wkt = _fgd_geom_wkt(geom_kid)
                continue
            tp = next((k for k in kids
                       if _local(k.tag) == "timePosition"), None)
            if tp is not None:
                row[ctag] = (tp.text or "").strip()
            elif child.text and child.text.strip():
                row[ctag] = child.text.strip()
        row["wkt"] = wkt
        layers.setdefault(tag, []).append(row)

    out = {}
    for name, rows in layers.items():
        cols: list[str] = []
        for r in rows:
            for k in r:
                if k not in cols:
                    cols.append(k)
        arrays = [pa.array([None if r.get(c) is None else str(r.get(c))
                            for r in rows], pa.string()) for c in cols]
        out[name] = pa.table(arrays, names=cols)
    return out


def _fgd_geom_wkt(el):
    """FGD geometries: gml:Point/pos, or gml:Surface with
    PolygonPatch rings of Curve/LineStringSegment posLists —
    fguuid:jgd2011.bl is lat/lon order, swapped to x=lon."""
    import xml.etree.ElementTree as ET

    tag = _local(el.tag)

    def swap_pairs(txt):
        vals = [float(v) for v in txt.split()]
        return [(vals[i + 1], vals[i]) for i in range(0, len(vals) - 1, 2)]

    def fmt(p):
        return "%.15g %.15g" % p

    if tag == "Point":
        for k in el.iter():
            if _local(k.tag) in ("pos", "coordinates"):
                pts = swap_pairs(k.text or "")
                if pts:
                    return "POINT (%s)" % fmt(pts[0])
        return None
    if tag in ("Surface", "Polygon"):
        rings = []
        for ring_tag in ("exterior", "interior"):
            for ring in el.iter():
                if _local(ring.tag) != ring_tag:
                    continue
                pts = []
                for pl in ring.iter():
                    if _local(pl.tag) in ("posList", "coordinates"):
                        pts.extend(swap_pairs(pl.text or ""))
                if len(pts) >= 4:
                    rings.append(pts)
        if rings:
            return "POLYGON (%s)" % ",".join(
                "(%s)" % ",".join(fmt(p) for p in r) for r in rings)
        return None
    if tag in ("Curve", "LineString"):
        pts = []
        for pl in el.iter():
            if _local(pl.tag) in ("posList", "coordinates"):
                pts.extend(swap_pairs(pl.text or ""))
        if len(pts) >= 2:
            return "LINESTRING (%s)" % ",".join(fmt(p) for p in pts)
    return None
