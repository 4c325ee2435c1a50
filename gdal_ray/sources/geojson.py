"""GeoJSON (RFC 7946) + GeoJSONSeq reader/writer on stdlib json.

Second real vector file format (after GeoPackage, ``sources/gpkg.py``).
Layers round-trip between the engine's OGR-layer-shaped Arrow tables
(WKB ``geometry`` column + ``bbox_*`` pruning columns) and

- a ``FeatureCollection`` document (classic ``.geojson`` — one JSON
  object, inherently whole-file parse, fine for small layers), and
- newline-delimited features (``.geojsonl`` / GeoJSONSeq, reference
  driver ``ogr/ogrsf_frmts/geojson/ogrgeojsonseqdriver.cpp`` — it
  accepts both LF-separated and RS 0x1e-separated streams, :27).

Writer semantics follow the reference's RFC7946 mode
(``ogr/ogrgeojsonwriter.cpp:87`` SetRFC7946Settings): XY coordinate
precision defaults to 7 decimals (:90-91), a layer-level ``bbox``
member is emitted (:89), coordinates are long/lat WGS84.

Scale note: the GeoJSONSeq path is the one that matters at 100 TB.
``geojsonl_dataset`` plans byte ranges on the driver (one ``stat``)
and fans them out as a Ray Dataset; each task opens the file, seeks,
aligns to the next newline (the canonical split-text contract: a
shard owns every record whose first byte lies inside its range), and
parses its lines with the C ``json`` scanner — feature decode, the
expensive part, is fully distributed. The classic FeatureCollection
reader is deliberately driver-side whole-document (matching the
reference, which DOM-parses the collection,
``ogrgeojsonreader.cpp``); use GeoJSONSeq for big layers.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..functions.wkb import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
    geom_to_wkb,
    wkb_to_geom,
)

_GJ_NAMES = {POINT: "Point", LINESTRING: "LineString", POLYGON: "Polygon",
             MULTIPOINT: "MultiPoint", MULTILINESTRING: "MultiLineString",
             MULTIPOLYGON: "MultiPolygon"}
_GJ_KINDS = {v: k for k, v in _GJ_NAMES.items()}


# ------------------------------------------------------------- geometry codec

def geom_to_geojson(g: Geom, precision: int = 7) -> dict:
    """Geom -> GeoJSON geometry dict (2-D, rounded per RFC7946 mode)."""
    def ring(r: np.ndarray) -> list:
        rr = np.round(r, precision)
        return [[float(x), float(y)] for x, y in rr]

    if g.kind == POINT:
        x, y = g.rings[0][0]
        return {"type": "Point",
                "coordinates": [round(float(x), precision),
                                round(float(y), precision)]}
    if g.kind == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": ring(g.rings[0])}
    if g.kind == LINESTRING:
        return {"type": "LineString", "coordinates": ring(g.rings[0])}
    if g.kind == MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [ring(r) for r in g.rings]}
    if g.kind == POLYGON:
        return {"type": "Polygon", "coordinates": [ring(r) for r in g.rings]}
    if g.kind == MULTIPOLYGON:
        out, i = [], 0
        for cnt in g.poly_ring_counts:
            out.append([ring(r) for r in g.rings[i:i + cnt]])
            i += cnt
        return {"type": "MultiPolygon", "coordinates": out}
    raise ValueError(f"unsupported geometry kind {g.kind}")


def geojson_to_geom(obj: dict) -> Geom:
    """GeoJSON geometry dict -> Geom (z values, if present, dropped —
    the engine is 2-D throughout, like the reference's default
    promotion rules)."""
    t = obj["type"]
    if t == "GeometryCollection":
        from ..functions.wkb import GEOMETRYCOLLECTION

        members = [geojson_to_geom(g)
                   for g in (obj.get("geometries") or [])
                   if g is not None]
        members = [m for m in members if m is not None]
        return Geom(GEOMETRYCOLLECTION, [], members=members)
    c = obj.get("coordinates")
    if c is None:
        return None   # degenerate geometry (ogr_geojson_14 matrix)

    def arr2(pts):
        if pts is None:
            return None
        clean = [p[:2] for p in pts
                 if isinstance(p, (list, tuple)) and len(p) >= 2
                 and p[0] is not None and p[1] is not None]
        if not clean:
            return None
        return np.asarray(clean, np.float64).reshape(-1, 2)
    if t == "Point":
        a = arr2([c])
        return Geom(POINT, [a]) if a is not None else None
    if t == "MultiPoint":
        a = arr2(c)
        return Geom(MULTIPOINT, [a]) if a is not None else None
    if t == "LineString":
        a = arr2(c)
        return Geom(LINESTRING, [a]) if a is not None else None
    if t == "MultiLineString":
        parts = [a for a in (arr2(r) for r in c) if a is not None]
        return Geom(MULTILINESTRING, parts) if parts else None
    if t == "Polygon":
        rings = [a for a in (arr2(r) for r in c) if a is not None]
        return Geom(POLYGON, rings, [len(rings)]) if rings else None
    if t == "MultiPolygon":
        rings, counts = [], []
        for poly in c:
            if poly is None:
                continue
            rs = [a for a in (arr2(r) for r in poly) if a is not None]
            if rs:
                rings.extend(rs)
                counts.append(len(rs))
        return Geom(MULTIPOLYGON, rings, counts) if rings else None
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


# ------------------------------------------------------------- table <-> json

def _promote_array(vals: list) -> pa.Array:
    """OGR field-type promotion (ogrgeojsonreader.cpp
    OGRGeoJSONSchemaOpt): mixed bool/int -> int, +float -> real,
    +string -> string; list/dict values serialize as JSON strings
    (the reference's JSON-typed string fields)."""
    try:
        return pa.array(vals)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        pass
    if any(isinstance(v, (list, dict)) for v in vals):
        return pa.array([json.dumps(v) if isinstance(v, (list, dict))
                         else (None if v is None else str(v))
                         for v in vals], pa.string())
    if any(isinstance(v, str) for v in vals):
        return pa.array([None if v is None else str(v) for v in vals],
                        pa.string())
    if any(isinstance(v, float) for v in vals):
        return pa.array([None if v is None else float(v) for v in vals],
                        pa.float64())
    return pa.array([None if v is None else int(v) for v in vals],
                    pa.int64())


def _features_to_table(feats: list[dict], columns: list[str] | None = None,
                       with_bbox: bool = True) -> pa.Table:
    """Feature dicts -> OGR-layer-shaped Arrow table. Property keys are
    unioned across features (missing -> null), matching the reference
    reader's field-gathering pass (ogrgeojsonreader.cpp
    GenerateFeatureDefnSchema)."""
    keys: list[str] = []
    seen = set()
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in seen:
                seen.add(k)
                keys.append(k)
    if columns is not None:
        keys = [k for k in keys if k in columns]
    want_geom = columns is None or "geometry" in columns

    cols: dict[str, list] = {k: [] for k in keys}
    fids, wkbs = [], []
    bx0, by0, bx1, by1 = [], [], [], []
    for i, f in enumerate(feats):
        props = f.get("properties") or {}
        for k in keys:
            cols[k].append(props.get(k))
        fids.append(f.get("id"))
        if want_geom or with_bbox:
            gj = f.get("geometry")
            g = geojson_to_geom(gj) if gj is not None else None
            if want_geom:
                # null geometry -> empty WKB (OGR's NULL geometry)
                wkbs.append(geom_to_wkb(g) if g is not None else b"")
            if with_bbox:
                if g is not None and g.rings and len(g.rings[0]):
                    xmin, ymin, xmax, ymax = g.bbox()
                else:
                    xmin = ymin = xmax = ymax = float("nan")
                bx0.append(xmin); by0.append(ymin)
                bx1.append(xmax); by1.append(ymax)

    # feature ids: integers become the FID (null -> sequential); any
    # non-integer id moves to an 'id' string field and FIDs stay
    # sequential (ogrgeojsonreader.cpp id handling)
    if any(v is not None and not isinstance(v, int) for v in fids):
        if "id" not in keys:
            keys = ["id"] + keys
            cols["id"] = [None if v is None else str(v) for v in fids]
        fid_arr = pa.array(range(len(fids)), pa.int64())
    else:
        fid_arr = pa.array(
            [i if v is None else v for i, v in enumerate(fids)],
            pa.int64())
    out: dict[str, pa.Array] = {"fid": fid_arr}
    if want_geom:
        out["geometry"] = pa.array(wkbs, pa.binary())
    for k in keys:
        out[k] = _promote_array(cols[k])
    if with_bbox:
        out["bbox_xmin"] = pa.array(bx0, pa.float64())
        out["bbox_ymin"] = pa.array(by0, pa.float64())
        out["bbox_xmax"] = pa.array(bx1, pa.float64())
        out["bbox_ymax"] = pa.array(by1, pa.float64())
    return pa.table(out)


_LAYER_COLS = ("fid", "geometry", "wkt", "bbox_xmin", "bbox_ymin",
               "bbox_xmax", "bbox_ymax")


def _row_to_feature(row: dict, precision: int) -> dict:
    props = {k: v for k, v in row.items() if k not in _LAYER_COLS}
    for k, v in props.items():
        if isinstance(v, np.generic):
            props[k] = v.item()
    geom = None
    if row.get("geometry") is not None:
        geom = geom_to_geojson(wkb_to_geom(row["geometry"]), precision)
    elif row.get("wkt"):
        from ..functions.wkb import wkt_to_geom
        geom = geom_to_geojson(wkt_to_geom(row["wkt"]), precision)
    feat = {"type": "Feature", "geometry": geom, "properties": props}
    if row.get("fid") is not None:
        feat["id"] = int(row["fid"])
    return feat


def table_to_featurecollection(table: pa.Table, precision: int = 7) -> dict:
    feats = [_row_to_feature(r, precision) for r in table.to_pylist()]
    fc: dict = {"type": "FeatureCollection", "features": feats}
    if {"bbox_xmin", "bbox_ymax"} <= set(table.column_names):
        import pyarrow.compute as pc
        fc["bbox"] = [  # RFC7946 layer bbox (ogrgeojsonwriter.cpp:89,495)
            round(pc.min(table["bbox_xmin"]).as_py(), precision),
            round(pc.min(table["bbox_ymin"]).as_py(), precision),
            round(pc.max(table["bbox_xmax"]).as_py(), precision),
            round(pc.max(table["bbox_ymax"]).as_py(), precision),
        ]
    return fc


def write_geojson(path: str, table: pa.Table, precision: int = 7) -> None:
    """Classic FeatureCollection document."""
    with open(path, "w") as f:
        json.dump(table_to_featurecollection(table, precision), f)


def read_geojson(path_or_obj, columns: list[str] | None = None) -> pa.Table:
    """FeatureCollection (path, JSON text, or parsed dict) -> table."""
    if isinstance(path_or_obj, dict):
        obj = path_or_obj
    elif isinstance(path_or_obj, str) and path_or_obj.lstrip()[:1] == "{":
        obj = _loads_lenient(path_or_obj)
    else:
        # utf-8-sig strips a UTF-8 BOM (point_with_utf8bom.json)
        with open(path_or_obj, encoding="utf-8-sig") as f:
            obj = _loads_lenient(f.read())
    typ = obj.get("type")
    if typ == "Feature":
        return _features_to_table([obj], columns)
    if typ in ("Point", "MultiPoint", "LineString", "MultiLineString",
               "Polygon", "MultiPolygon", "GeometryCollection"):
        # bare geometry documents open as one geometry-only feature
        # (OGRGeoJSONReadGeometry path)
        return _features_to_table(
            [{"type": "Feature", "properties": {}, "geometry": obj}],
            columns)
    if typ != "FeatureCollection":
        raise ValueError("not a GeoJSON FeatureCollection")
    return _features_to_table(obj["features"], columns)


def _loads_lenient(text: str):
    """json.loads with json-c's trailing-comma tolerance (the
    reference parses stac_item.json's ",]" without complaint)."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # single pass: drop commas directly followed by ] or }
        # (string-aware)
        out = []
        in_str = False
        esc = False
        n = len(text)
        for i, ch in enumerate(text):
            if in_str:
                out.append(ch)
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
                out.append(ch)
                continue
            if ch == ",":
                j = i + 1
                while j < n and text[j] in " \t\r\n":
                    j += 1
                if j < n and text[j] in "]}":
                    continue    # trailing comma: drop
            out.append(ch)
        return json.loads("".join(out))


# ------------------------------------------------------------- GeoJSONSeq

RS = "\x1e"  # optional record separator (ogrgeojsonseqdriver.cpp:27)


def write_geojsonl(path: str, table: pa.Table, precision: int = 7) -> None:
    """One feature per LF-terminated line (GeoJSONSeq)."""
    with open(path, "w") as f:
        for r in table.to_pylist():
            f.write(json.dumps(_row_to_feature(r, precision)))
            f.write("\n")


def _parse_lines(chunk: str, columns: list[str] | None) -> pa.Table:
    feats = [json.loads(ln.lstrip(RS)) for ln in chunk.splitlines()
             if ln.strip(RS).strip()]
    return _features_to_table(feats, columns)


def _read_shard(path: str, start: int, end: int, size: int) -> bytes:
    """Byte range -> the raw text of the lines this shard owns.

    Split-text ownership contract (the classic one): a shard with
    start > 0 discards through the first newline in its range, then
    ALWAYS reads past ``end`` through the next newline — so a line
    starting at byte p belongs to the shard with start < p <= end
    (shard 0 also owns p = 0). A range containing no newline at all
    emits nothing (the spanning record is read by an earlier shard's
    extension)."""
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
        if start > 0:
            nl = data.find(b"\n")
            if nl < 0:
                return b""
            data = data[nl + 1:]
        if end < size:
            tail = bytearray()
            while True:
                b = f.read(1 << 16)
                if not b:
                    break
                nl = b.find(b"\n")
                if nl >= 0:
                    tail += b[:nl]
                    break
                tail += b
            data += bytes(tail)
    return data


def geojsonl_dataset(path: str, columns: list[str] | None = None,
                     num_shards: int = 8):
    """GeoJSONSeq file -> Ray Dataset, byte-range sharded so JSON parse
    + WKB encode run distributed (one task per shard)."""
    import ray
    import ray.data

    size = os.path.getsize(path)
    num_shards = max(1, min(num_shards, max(1, size // (1 << 16))))
    bounds = np.linspace(0, size, num_shards + 1).astype(np.int64)
    shards = [{"path": path, "start": int(bounds[i]), "end": int(bounds[i + 1]),
               "size": size} for i in range(num_shards)]

    def load(batch: pa.Table) -> pa.Table:
        tabs = []
        for row in batch.to_pylist():
            raw = _read_shard(row["path"], row["start"], row["end"], row["size"])
            if raw:
                tabs.append(_parse_lines(raw.decode("utf-8"), columns))
        if not tabs:
            return _features_to_table([], columns)
        return pa.concat_tables(tabs, promote_options="default")

    return (ray.data.from_items(shards, override_num_blocks=num_shards)
            .map_batches(load, batch_format="pyarrow", batch_size=1))


_GEOM_TYPES = {"Point", "LineString", "Polygon", "MultiPoint",
               "MultiLineString", "MultiPolygon", "GeometryCollection"}


def read_geojsonseq(path_or_text: str,
                    columns: list[str] | None = None) -> pa.Table:
    """GeoJSONSeq reader with full reference semantics
    (ogr_geojsonseq.py): LF- or RS-(0x1e)-separated records, RS
    records may be pretty-printed across lines; a sequence of bare
    geometries becomes geometry-only features; unparseable records
    are skipped."""
    if "\n" in path_or_text or path_or_text.lstrip()[:1] in ("{", RS):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()

    chunks = text.split(RS) if RS in text else text.splitlines()
    feats = []
    for ch in chunks:
        ch = ch.strip()
        if not ch:
            continue
        try:
            obj = json.loads(ch)
        except json.JSONDecodeError:
            continue
        if not isinstance(obj, dict):
            continue
        if obj.get("type") == "Feature":
            feats.append(obj)
        elif obj.get("type") in _GEOM_TYPES:
            feats.append({"type": "Feature", "properties": {},
                          "geometry": obj})
    return _features_to_table(feats, columns)


def write_geojsonseq(path: str, table: pa.Table, rs: bool = False,
                     precision: int = 7) -> None:
    """RS=False writes LF-delimited (one feature per line); RS=True
    prefixes each record with 0x1e like the reference's RS=YES."""
    with open(path, "w") as f:
        for r in table.to_pylist():
            if rs:
                f.write(RS)
            f.write(json.dumps(_row_to_feature(r, precision)))
            f.write("\n")
