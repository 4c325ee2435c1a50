"""GPX vector driver (reference ogr/ogrsf_frmts/gpx/): the five
fixed layers of the OGR model — ``waypoints`` (one POINT per <wpt>),
``routes`` (one LINESTRING per <rte> over its <rtept>s), and
``route_points`` (one POINT per <rtept> with route_fid /
route_point_id back-references), ``tracks`` (one MULTILINESTRING per
<trk>, one part per <trkseg>), ``track_points`` (per <trkpt> with
track_fid / track_seg_id / track_seg_point_id).

Point-ish fields follow ogr_gpx.py's checked subset: ele (float),
time (ISO string), name/cmt/desc/src/sym/type, and the flattened
link1_/link2_ href/text/type triplets; routes/tracks carry
name/cmt/desc/src/number/type. Geometry is always 2-D (lat/lon
attributes; <ele> stays a field, matching the reference's
``POINT (1 0)`` expectations).

Namespace-agnostic ElementTree parse; one GPX document = one parse
task at engine scale (same per-file map_batches path as KML/GML).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..functions.wkb import LINESTRING, POINT, Geom, geom_to_wkb

_PT_FIELDS = ("ele", "time", "name", "cmt", "desc", "src", "sym", "type",
              "link1_href", "link1_text", "link1_type",
              "link2_href", "link2_text", "link2_type")
_SEQ_FIELDS = ("name", "cmt", "desc", "src", "number", "type")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _kids(el, name):
    return [c for c in el if _local(c.tag) == name]


def _text(el, name):
    for c in el:
        if _local(c.tag) == name and c.text is not None:
            return c.text.strip()
    return None


def _point_row(el) -> dict:
    row = {}
    for f in ("ele", "time", "name", "cmt", "desc", "src", "sym", "type"):
        row[f] = _text(el, f)
    for i, link in enumerate(_kids(el, "link")[:2], start=1):
        row[f"link{i}_href"] = link.get("href")
        row[f"link{i}_text"] = _text(link, "text")
        row[f"link{i}_type"] = _text(link, "type")
    return row


def _pt_wkb(el) -> bytes:
    c = np.array([[float(el.get("lon")), float(el.get("lat"))]])
    return geom_to_wkb(Geom(POINT, [c]))


def _line_wkb(pts, multi_parts=None) -> bytes:
    if multi_parts is not None:
        rings = [np.array([[float(p.get("lon")), float(p.get("lat"))]
                           for p in part]).reshape(-1, 2)
                 for part in multi_parts]
        rings = [r for r in rings if len(r)]
        return geom_to_wkb(Geom(5, rings))  # MultiLineString
    c = np.array([[float(p.get("lon")), float(p.get("lat"))]
                  for p in pts]).reshape(-1, 2)
    return geom_to_wkb(Geom(LINESTRING, [c]))


def read_gpx(path_or_bytes) -> dict[str, pa.Table]:
    """-> {layer_name: Arrow table} for the five OGR GPX layers
    (layers with no features are omitted, like OGR's empty layers)."""
    if isinstance(path_or_bytes, bytes):
        root = ET.fromstring(path_or_bytes)
    else:
        root = ET.parse(path_or_bytes).getroot()

    way_rows, rte_rows, rtep_rows, trk_rows, trkp_rows = [], [], [], [], []
    for el in root:
        t = _local(el.tag)
        if t == "wpt":
            way_rows.append((_point_row(el), _pt_wkb(el)))
        elif t == "rte":
            fid = len(rte_rows)
            pts = _kids(el, "rtept")
            meta = {f: _text(el, f) for f in _SEQ_FIELDS}
            rte_rows.append((meta, _line_wkb(pts)))
            for i, p in enumerate(pts):
                r = _point_row(p)
                r["route_fid"] = fid
                r["route_point_id"] = i
                rtep_rows.append((r, _pt_wkb(p)))
        elif t == "trk":
            fid = len(trk_rows)
            segs = [_kids(s, "trkpt") for s in _kids(el, "trkseg")]
            meta = {f: _text(el, f) for f in _SEQ_FIELDS}
            trk_rows.append((meta, _line_wkb(None, multi_parts=segs)))
            for si, seg in enumerate(segs):
                for i, p in enumerate(seg):
                    r = _point_row(p)
                    r["track_fid"] = fid
                    r["track_seg_id"] = si
                    r["track_seg_point_id"] = i
                    trkp_rows.append((r, _pt_wkb(p)))

    def pt_table(rows, id_fields=()) -> pa.Table:
        cols = {}
        for f in id_fields:
            cols[f] = pa.array([r[0][f] for r in rows], pa.int32())
        cols["ele"] = pa.array(
            [None if r[0]["ele"] is None else float(r[0]["ele"])
             for r in rows], pa.float64())
        for f in _PT_FIELDS[1:]:
            cols[f] = pa.array([r[0].get(f) for r in rows], pa.string())
        cols["geometry"] = pa.array([r[1] for r in rows], pa.binary())
        return pa.table(cols)

    def seq_table(rows) -> pa.Table:
        cols = {}
        for f in _SEQ_FIELDS:
            if f == "number":
                cols[f] = pa.array(
                    [None if r[0][f] is None else int(r[0][f])
                     for r in rows], pa.int32())
            else:
                cols[f] = pa.array([r[0][f] for r in rows], pa.string())
        cols["geometry"] = pa.array([r[1] for r in rows], pa.binary())
        return pa.table(cols)

    out: dict[str, pa.Table] = {}
    if way_rows:
        out["waypoints"] = pt_table(way_rows)
    if rte_rows:
        out["routes"] = seq_table(rte_rows)
    if rtep_rows:
        out["route_points"] = pt_table(
            rtep_rows, ("route_fid", "route_point_id"))
    if trk_rows:
        out["tracks"] = seq_table(trk_rows)
    if trkp_rows:
        out["track_points"] = pt_table(
            trkp_rows, ("track_fid", "track_seg_id", "track_seg_point_id"))
    return out


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_gpx(waypoints: pa.Table | None = None,
              tracks: pa.Table | None = None) -> str:
    """GPX 1.1 text from a waypoints table (POINT WKB + optional ele/
    time/name fields) and/or a tracks table (MULTILINESTRING WKB +
    optional name). Mirrors the reference writer's layer model."""
    from ..functions.wkb import wkb_to_geom

    parts = ['<?xml version="1.0"?>',
             '<gpx version="1.1" creator="gdal_ray" '
             'xmlns="http://www.topografix.com/GPX/1/1">']
    if waypoints is not None:
        names = set(waypoints.column_names)
        for r in waypoints.to_pylist():
            g = wkb_to_geom(r["geometry"])
            x, y = g.rings[0][0]
            parts.append(f'<wpt lat="{y!r}" lon="{x!r}">')
            for f in ("ele", "time", "name", "cmt", "desc", "src"):
                if f in names and r.get(f) is not None:
                    parts.append(f"  <{f}>{_esc(str(r[f]))}</{f}>")
            parts.append("</wpt>")
    if tracks is not None:
        names = set(tracks.column_names)
        for r in tracks.to_pylist():
            parts.append("<trk>")
            if "name" in names and r.get("name") is not None:
                parts.append(f"  <name>{_esc(str(r['name']))}</name>")
            g = wkb_to_geom(r["geometry"])
            for ring in g.rings:
                parts.append("  <trkseg>")
                for x, y in ring:
                    parts.append(f'    <trkpt lat="{y!r}" lon="{x!r}"/>')
                parts.append("  </trkseg>")
            parts.append("</trk>")
    parts.append("</gpx>")
    return "\n".join(parts) + "\n"
