"""OGC Features & Geometries JSON (JSON-FG) vector driver
(reference ogr/ogrsf_frmts/geojson/ogrjsonfg*).

JSON-FG extends GeoJSON: a ``coordRefSys`` ("[EPSG:NNNN]" or a full
URI) at collection or feature level declares the CRS of the
``place`` geometry; the plain ``geometry`` member stays the WGS84
fallback.  The active layer geometry is ``place`` when present
(in the declared CRS) else ``geometry`` (EPSG:4326), like the
reference.  Features whose ``featureType`` differs split into
separate layers; ``time`` members surface as ``time`` (date or
timestamp) fields.  3-D prisms/pylon extrusions keep their base
geometry."""

from __future__ import annotations

import json
import re

import pyarrow as pa


def _epsg_of(crs) -> int | None:
    if crs is None:
        return None
    if isinstance(crs, dict):
        crs = crs.get("href") or crs.get("uri") or ""
    m = re.search(r"EPSG[:/](\d+)\]?$", str(crs))
    return int(m.group(1)) if m else None


def _geojson_wkt(g) -> str | None:
    if not isinstance(g, dict):
        return None
    t = g.get("type")
    c = g.get("coordinates")

    def fm(p):
        out = " ".join("%.10g" % v for v in p[:3])
        return out

    if t == "Point":
        if not c:
            return "POINT EMPTY"
        return "POINT %s(%s)" % ("Z " if len(c) >= 3 else "", fm(c))
    if t == "MultiPoint":
        return "MULTIPOINT (%s)" % ",".join("(%s)" % fm(p) for p in c or [])
    if t == "LineString":
        return "LINESTRING (%s)" % ",".join(fm(p) for p in c or [])
    if t == "MultiLineString":
        return "MULTILINESTRING (%s)" % ",".join(
            "(%s)" % ",".join(fm(p) for p in part) for part in c or [])
    if t == "Polygon":
        z = "Z " if c and c[0] and len(c[0][0]) >= 3 else ""
        return "POLYGON %s(%s)" % (z, ",".join(
            "(%s)" % ",".join(fm(p) for p in ring) for ring in c or []))
    if t == "MultiPolygon":
        return "MULTIPOLYGON (%s)" % ",".join(
            "(%s)" % ",".join(
                "(%s)" % ",".join(fm(p) for p in ring) for ring in poly)
            for poly in c or [])
    if t == "Polyhedron":
        return None
    return None


def read_jsonfg(path_or_text: str) -> dict[str, pa.Table]:
    import os

    if os.path.exists(path_or_text):
        with open(path_or_text, encoding="utf-8") as f:
            doc = json.load(f)
    else:
        doc = json.loads(path_or_text)

    if doc.get("type") == "Feature":
        feats = [doc]
    else:
        feats = doc.get("features") or []
    fc_epsg = _epsg_of(doc.get("coordRefSys"))

    layers: dict[str, list] = {}
    for f in feats:
        ftype = f.get("featureType") or "features"
        if isinstance(ftype, list):
            ftype = ftype[0] if ftype else "features"
        feat_epsg = _epsg_of(f.get("coordRefSys"))
        place = f.get("place")
        geometry = f.get("geometry")
        # place-level coordRefSys can also sit inside the place object
        place_epsg = _epsg_of(place.get("coordRefSys")) \
            if isinstance(place, dict) else None
        if place is not None:
            wkt = _geojson_wkt(place)
            epsg = place_epsg or feat_epsg or fc_epsg or 4326
        else:
            wkt = _geojson_wkt(geometry)
            epsg = 4326 if geometry is not None else \
                (feat_epsg or fc_epsg)
        row = {"fid": f.get("id"), "epsg": epsg, "wkt": wkt}
        t = f.get("time")
        if isinstance(t, dict):
            if "date" in t:
                row["time"] = t["date"]
            elif "timestamp" in t:
                row["time"] = t["timestamp"]
            if "interval" in t and isinstance(t["interval"], list) \
                    and len(t["interval"]) == 2:
                row["time_start"], row["time_end"] = t["interval"]
        props = f.get("properties") or {}
        for k, v in props.items():
            row[k] = v
        layers.setdefault(str(ftype), []).append(row)

    out = {}
    for lname, rows in layers.items():
        cols: list[str] = []
        for r in rows:
            for k in r:
                if k not in cols:
                    cols.append(k)
        arrays = []
        for c in cols:
            vals = [r.get(c) for r in rows]
            if c == "epsg":
                arrays.append(pa.array(vals, pa.int32()))
            elif all(v is None or isinstance(v, (int, bool))
                     for v in vals) and any(
                    isinstance(v, int) for v in vals):
                arrays.append(pa.array(vals, pa.int64()))
            elif any(isinstance(v, float) for v in vals):
                arrays.append(pa.array(
                    [float(v) if v is not None else None for v in vals],
                    pa.float64()))
            else:
                arrays.append(pa.array(
                    [None if v is None else str(v) for v in vals],
                    pa.string()))
        out[lname] = pa.table(arrays, names=cols)
    return out
