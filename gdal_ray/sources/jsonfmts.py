"""ESRIJSON (ArcGIS REST featureset) and TopoJSON vector drivers
(reference ogr/ogrsf_frmts/geojson — OGRESRIJSONReader /
OGRTopoJSONReader; both formats are publicly specified).

ESRIJSON: fields typed by esriFieldType* (OID/SmallInteger ->
Integer, Integer, Single/Double -> Real, String, Date -> epoch-ms
rendered "YYYY/MM/DD HH:MM:SS[.mmm]+00"); geometries: point x/y,
multipoint points, polyline paths, polygon rings (outer by ring
orientation), optional z.

TopoJSON: a Topology with shared ``arcs``; with a ``transform`` the
arc positions are delta-encoded quantized integers
(pos = cumsum * scale + translate) and Point/MultiPoint coordinates
scale the same way, without one they are absolute.  Geometry arc
indexes use ~i for reversed arcs; adjacent arcs in a ring/line share
their join vertex.  ``objects`` may be a dict (each
GeometryCollection becomes a layer named by its key, everything else
pools into a "TopoJSON" layer with id/name fields) or an array
(GeometryCollections with an id become their own layer); geometry
entries whose arcs/coordinates attribute is not a JSON array are
skipped, array-typed but invalid ones yield EMPTY geometries —
matching the reference's autotest matrix row for row."""

from __future__ import annotations

import json

import pyarrow as pa


# ---------------------------------------------------------------------------
# ESRIJSON


def _esri_date(ms) -> str | None:
    if ms is None:
        return None
    from .spreadsheet import _civil_from_unix

    secs, frac = divmod(int(ms), 1000)
    y, mo, d, h, mi, se = _civil_from_unix(secs)
    out = "%04d/%02d/%02d %02d:%02d:%02d" % (y, mo, d, h, mi, se)
    if frac:
        out += ".%03d" % frac
    return out + "+00"


def read_esrijson(path_or_text: str) -> pa.Table:
    import os

    if os.path.exists(path_or_text):
        with open(path_or_text, encoding="utf-8") as f:
            doc = json.load(f)
    else:
        doc = json.loads(path_or_text)

    fields = doc.get("fields") or []
    ftypes = {f["name"]: f.get("type", "") for f in fields}
    rows = []
    wkts = []
    gtype = doc.get("geometryType", "")
    for feat in doc.get("features", []):
        attrs = dict(feat.get("attributes") or {})
        for k, v in list(attrs.items()):
            if ftypes.get(k) == "esriFieldTypeDate":
                attrs[k] = _esri_date(v)
        rows.append(attrs)
        g = feat.get("geometry") or {}
        wkts.append(_esri_geom_wkt(g, gtype))

    names = [f["name"] for f in fields] if fields else sorted(
        {k for r in rows for k in r})
    arrays = []
    for name in names:
        vals = [r.get(name) for r in rows]
        t = ftypes.get(name, "")
        if t in ("esriFieldTypeOID", "esriFieldTypeSmallInteger",
                 "esriFieldTypeInteger"):
            arrays.append(pa.array(vals, pa.int32()))
        elif t in ("esriFieldTypeSingle", "esriFieldTypeDouble"):
            arrays.append(pa.array(
                [float(v) if v is not None else None for v in vals],
                pa.float64()))
        else:
            arrays.append(pa.array(
                [None if v is None else str(v) for v in vals], pa.string()))
    names = names + ["wkt"]
    arrays.append(pa.array(wkts, pa.string()))
    return pa.table(arrays, names=names)


def _fmt_xy(p, has_z=False):
    if has_z and len(p) >= 3:
        return "%.10g %.10g %.10g" % (p[0], p[1], p[2])
    return "%.10g %.10g" % (p[0], p[1])


def _esri_geom_wkt(g: dict, gtype: str) -> str | None:
    if "x" in g:
        if g.get("x") is None:
            return "POINT EMPTY"
        if "z" in g:
            return "POINT Z (%s)" % _fmt_xy([g["x"], g["y"], g["z"]], True)
        return "POINT (%s)" % _fmt_xy([g["x"], g["y"]])
    if "points" in g:
        pts = [p for p in (g.get("points") or [])
               if isinstance(p, list) and len(p) >= 2]
        if not pts:
            return "MULTIPOINT EMPTY"
        has_z = bool(g.get("hasZ")) or (len(pts[0]) >= 3
                                        and not g.get("hasM"))
        body = ",".join("(%s)" % _fmt_xy(p, has_z) for p in pts)
        return "MULTIPOINT %s(%s)" % ("Z " if has_z else "", body)
    if "paths" in g:
        parts = [[p for p in path if isinstance(p, list) and len(p) >= 2]
                 for path in (g.get("paths") or [])]
        parts = [p for p in parts if len(p) >= 2]
        if not parts:
            return "MULTILINESTRING EMPTY"
        has_z = bool(g.get("hasZ")) or (
            "hasZ" not in g and len(parts[0][0]) >= 3 and not g.get("hasM"))
        if len(parts) == 1:
            return "LINESTRING %s(%s)" % (
                "Z " if has_z else "",
                ",".join(_fmt_xy(p, has_z) for p in parts[0]))
        return "MULTILINESTRING %s(%s)" % (
            "Z " if has_z else "", ",".join(
                "(%s)" % ",".join(_fmt_xy(p, has_z) for p in part)
                for part in parts))
    if "rings" in g:
        rings = [[p for p in r if isinstance(p, list) and len(p) >= 2]
                 for r in (g.get("rings") or [])]
        rings = [r for r in rings if len(r) >= 4]
        if not rings:
            return "POLYGON EMPTY"
        has_z = bool(g.get("hasZ"))
        return "POLYGON %s(%s)" % ("Z " if has_z else "", ",".join(
            "(%s)" % ",".join(_fmt_xy(p, has_z) for p in r)
            for r in rings))
    return None


# ---------------------------------------------------------------------------
# TopoJSON


def _topo_arcs(doc):
    arcs = []
    tr = doc.get("transform") or None
    sx, sy = (tr["scale"] if tr else (1.0, 1.0))
    tx, ty = (tr["translate"] if tr else (0.0, 0.0))
    for arc in doc.get("arcs") or []:
        pts = []
        if isinstance(arc, list):
            cx = cy = 0.0
            for p in arc:
                if not isinstance(p, list) or len(p) < 2 or \
                        p[0] is None or p[1] is None:
                    continue
                if tr:
                    cx += p[0]
                    cy += p[1]
                    pts.append((cx * sx + tx, cy * sy + ty))
                else:
                    pts.append((float(p[0]), float(p[1])))
        arcs.append(pts)
    return arcs, (sx, sy, tx, ty, tr is not None)


def _chain(arc_idxs, arcs):
    pts = []
    for idx in arc_idxs:
        if not isinstance(idx, int):
            continue
        real = idx if idx >= 0 else ~idx
        if real < 0 or real >= len(arcs):
            continue
        seg = arcs[real]
        if idx < 0:
            seg = list(reversed(seg))
        if len(seg) < 2:
            continue
        if pts and pts[-1] == seg[0]:
            pts.extend(seg[1:])
        else:
            pts.extend(seg)
    return pts


def _topo_geom_wkt(g, arcs, tf):
    sx, sy, tx, ty, has_tr = tf
    t = g.get("type")

    def pt(p):
        if not isinstance(p, list) or len(p) < 2 or p[0] is None \
                or p[1] is None:
            return None
        if has_tr:
            return (p[0] * sx + tx, p[1] * sy + ty)
        return (float(p[0]), float(p[1]))

    def fm(p):
        return "%.10g %.10g" % p

    if t == "Point":
        c = g.get("coordinates")
        if not isinstance(c, list):
            return None
        p = pt(c)
        return "POINT (%s)" % fm(p) if p else "POINT EMPTY"
    if t == "MultiPoint":
        c = g.get("coordinates")
        if not isinstance(c, list):
            return None
        pts = [pt(p) for p in c]
        pts = [p for p in pts if p]
        if not pts:
            return "MULTIPOINT EMPTY"
        return "MULTIPOINT (%s)" % ",".join(fm(p) for p in pts)
    if t == "LineString":
        a = g.get("arcs")
        if not isinstance(a, list):
            return None
        pts = _chain(a, arcs)
        if len(pts) < 2:
            return "LINESTRING EMPTY"
        return "LINESTRING (%s)" % ",".join(fm(p) for p in pts)
    if t == "MultiLineString":
        a = g.get("arcs")
        if not isinstance(a, list):
            return None
        parts = []
        for sub in a:
            if not isinstance(sub, list):
                continue
            pts = _chain(sub, arcs)
            if len(pts) >= 2:
                parts.append(pts)
        if not parts:
            return "MULTILINESTRING EMPTY"
        return "MULTILINESTRING (%s)" % ",".join(
            "(%s)" % ",".join(fm(p) for p in pts) for pts in parts)
    if t == "Polygon":
        a = g.get("arcs")
        if not isinstance(a, list):
            return None
        rings = []
        for sub in a:
            if not isinstance(sub, list):
                continue
            pts = _chain(sub, arcs)
            if len(pts) >= 4:
                rings.append(pts)
        if not rings:
            return "POLYGON EMPTY"
        return "POLYGON (%s)" % ",".join(
            "(%s)" % ",".join(fm(p) for p in pts) for pts in rings)
    if t == "MultiPolygon":
        a = g.get("arcs")
        if not isinstance(a, list):
            return None
        polys = []
        for poly in a:
            if not isinstance(poly, list):
                continue
            rings = []
            for sub in poly:
                if not isinstance(sub, list):
                    continue
                pts = _chain(sub, arcs)
                if len(pts) >= 4:
                    rings.append(pts)
            if rings:
                polys.append(rings)
        if not polys:
            return "MULTIPOLYGON EMPTY"
        return "MULTIPOLYGON (%s)" % ",".join(
            "(%s)" % ",".join(
                "(%s)" % ",".join(fm(p) for p in r) for r in rings)
            for rings in polys)
    return None


def read_topojson(path_or_text: str) -> dict[str, pa.Table]:
    import os

    if os.path.exists(path_or_text):
        with open(path_or_text, encoding="utf-8") as f:
            text = f.read()
    else:
        text = path_or_text
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # the reference's json-c parser tolerates trailing commas
        # (autotest topojson1 uses them)
        import re

        doc = json.loads(re.sub(r",(\s*[\]}])", r"\1", text))
    arcs, tf = _topo_arcs(doc)

    layers: dict[str, list] = {}

    def feat_row(g):
        props = g.get("properties")
        name = None
        if isinstance(props, dict) and props.get("name") is not None:
            name = str(props["name"])
        gid = g.get("id")
        if gid is None and isinstance(props, dict) and \
                props.get("id") is not None:
            gid = props["id"]
        return {"id": None if gid is None else str(gid), "name": name,
                "wkt": _topo_geom_wkt(g, arcs, tf)}

    def add_gc(layer_name, gc):
        geoms = gc.get("geometries")
        if not isinstance(geoms, list):
            return
        for g in geoms:
            if not isinstance(g, dict):
                continue
            row = feat_row(g)
            if row["wkt"] is None and g.get("type") not in (
                    "Point", "MultiPoint", "LineString", "MultiLineString",
                    "Polygon", "MultiPolygon"):
                continue
            if row["wkt"] is None:
                continue
            layers.setdefault(layer_name, []).append(row)

    objects = doc.get("objects")
    items = (objects.items() if isinstance(objects, dict)
             else enumerate(objects or []))
    for key, obj in items:
        if not isinstance(obj, dict):
            continue
        t = obj.get("type")
        if t == "GeometryCollection":
            lname = obj.get("id") if not isinstance(objects, dict) else key
            if lname is None:
                if isinstance(obj.get("geometries"), list) and \
                        obj["geometries"]:
                    add_gc("TopoJSON", obj)
                continue
            add_gc(str(lname), obj)
        elif isinstance(t, str):
            row = feat_row(obj)
            if row["wkt"] is not None:
                layers.setdefault("TopoJSON", []).append(row)

    out = {}
    for lname, rows in layers.items():
        out[lname] = pa.table({
            "id": pa.array([r["id"] for r in rows], pa.string()),
            "name": pa.array([r["name"] for r in rows], pa.string()),
            "wkt": pa.array([r["wkt"] for r in rows], pa.string())})
    return out
