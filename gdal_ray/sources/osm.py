"""OpenStreetMap PBF reader (reference ogr/ogrsf_frmts/osm: osm2osm
core `osm_parser.cpp` + layer semantics `ogrosmdatasource.cpp` with
the default `data/osmconf.ini`).

File model: length-prefixed (int32 BE) BlobHeader protobufs
("OSMHeader"/"OSMData") each followed by a Blob (raw or zlib);
OSMData blobs hold PrimitiveBlocks: a string table, granularity
(default 100, coords = 1e-9 * (offset + granularity*value)) and
primitive groups of dense/plain nodes, ways (delta-coded node refs)
and relations (delta-coded member ids).  The protobuf wire decode is
implemented directly (varint/zigzag/length-delimited) — no protobuf
dependency.

The five OGR layers, matching osmconf.ini defaults and the
reference's autotest (ogr_osm.py test_ogr_osm_1):

- ``points``: nodes with at least one significant tag (unsignificant:
  created_by/converted_by/source/time/ele/attribution);
- ``lines``: tagged ways that are not polygon-like (closed +
  closed_ways_are_polygons tag match or area=yes), with the computed
  ``z_order`` (the osmconf z_order_sql formula: highway class +
  bridge/tunnel/railway/layer terms); ways with <2 resolvable nodes
  are skipped, unresolvable refs are dropped from the line;
- ``multipolygons``: type=multipolygon relations (outer/inner rings
  assembled from member ways, features keyed ``osm_id``; relations
  with only a ``type`` tag inherit the outer way's tags) plus
  standalone closed polygon-like ways (keyed ``osm_way_id``); member
  ways of emitted multipolygon relations are consumed; relations with
  missing member ways are skipped;
- ``multilinestrings``: type=route relations;
- ``other_relations``: remaining typed relations as
  GEOMETRYCOLLECTION of member node points + way linestrings.

``other_tags`` carries the non-schema tags in document order as
hstore text (``"k"=>"v",...``).

At 100-TB scale the blob index is the shard list (`osm_blob_ranges` +
`osm_dataset`): each Ray task decodes its blob range; node->coord
resolution is a hash-partitioned join of the ways' ref lists against
the nodes table on ref id (the in-process reader materializes the
node dict, which is only valid for driver-sized extracts)."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# protobuf wire primitives


def _varint(buf, pos):
    val = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            return val, pos
        shift += 7


def _zigzag(v):
    return (v >> 1) ^ -(v & 1)


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _varint(buf, pos)
        elif wt == 1:
            v = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def _packed_varints(buf, signed=False):
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(_zigzag(v) if signed else v)
    return out


# ---------------------------------------------------------------------------
# PBF block iteration


def osm_blob_ranges(path: str) -> list[tuple[int, int, str]]:
    """(offset, end, type) for every blob — the Ray shard list."""
    out = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        while f.tell() < size:
            start = f.tell()
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">i", raw)[0]
            header = f.read(hlen)
            btype, dsize = "", 0
            for fn, _wt, v in _fields(header):
                if fn == 1:
                    btype = v.decode()
                elif fn == 3:
                    dsize = v
            f.seek(dsize, 1)
            out.append((start, f.tell(), btype))
    return out


def _blob_payload(data: bytes) -> bytes:
    raw = zdata = None
    for fn, _wt, v in _fields(data):
        if fn == 1:
            raw = v
        elif fn == 3:
            zdata = v
    if raw is not None:
        return raw
    return zlib.decompress(zdata)


def _parse_primitive_block(payload: bytes):
    """-> (strings, nodes{id:(lon,lat,tags)}, ways[], relations[])"""
    strings: list[str] = []
    groups = []
    gran, lat_off, lon_off = 100, 0, 0
    for fn, _wt, v in _fields(payload):
        if fn == 1:
            strings = [s.decode("utf-8")
                       for f2, _w, s in _fields(v) if f2 == 1]
        elif fn == 2:
            groups.append(v)
        elif fn == 17:
            gran = v
        elif fn == 19:
            lat_off = v
        elif fn == 20:
            lon_off = v

    def coord(off, g, val):
        return 1e-9 * (off + g * val)

    nodes = {}
    ways = []
    rels = []
    for grp in groups:
        for fn, _wt, v in _fields(grp):
            if fn == 1:  # plain Node
                nid = lat = lon = 0
                keys = vals = []
                for f2, _w, x in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(x) if isinstance(x, int) else x
                    elif f2 == 2:
                        keys = _packed_varints(x)
                    elif f2 == 3:
                        vals = _packed_varints(x)
                    elif f2 == 8:
                        lat = _zigzag(x)
                    elif f2 == 9:
                        lon = _zigzag(x)
                tags = [(strings[k], strings[w]) for k, w in zip(keys, vals)]
                nodes[nid] = (coord(lon_off, gran, lon),
                              coord(lat_off, gran, lat), tags)
            elif fn == 2:  # DenseNodes
                ids = lats = lons = []
                kv = []
                for f2, _w, x in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(x, signed=True)
                    elif f2 == 8:
                        lats = _packed_varints(x, signed=True)
                    elif f2 == 9:
                        lons = _packed_varints(x, signed=True)
                    elif f2 == 10:
                        kv = _packed_varints(x)
                cid = clat = clon = 0
                ki = 0
                for i in range(len(ids)):
                    cid += ids[i]
                    clat += lats[i]
                    clon += lons[i]
                    tags = []
                    while ki < len(kv) and kv[ki] != 0:
                        tags.append((strings[kv[ki]], strings[kv[ki + 1]]))
                        ki += 2
                    ki += 1
                    nodes[cid] = (coord(lon_off, gran, clon),
                                  coord(lat_off, gran, clat), tags)
            elif fn == 3:  # Way
                wid = 0
                keys = vals = refs = []
                for f2, _w, x in _fields(v):
                    if f2 == 1:
                        wid = x
                    elif f2 == 2:
                        keys = _packed_varints(x)
                    elif f2 == 3:
                        vals = _packed_varints(x)
                    elif f2 == 8:
                        refs = list(np.cumsum(
                            _packed_varints(x, signed=True)))
                tags = [(strings[k], strings[w]) for k, w in zip(keys, vals)]
                ways.append((wid, [int(r) for r in refs], tags))
            elif fn == 4:  # Relation
                rid = 0
                keys = vals = roles = memids = types = []
                for f2, _w, x in _fields(v):
                    if f2 == 1:
                        rid = x
                    elif f2 == 2:
                        keys = _packed_varints(x)
                    elif f2 == 3:
                        vals = _packed_varints(x)
                    elif f2 == 8:
                        roles = _packed_varints(x)
                    elif f2 == 9:
                        memids = list(np.cumsum(
                            _packed_varints(x, signed=True)))
                    elif f2 == 10:
                        types = _packed_varints(x)
                tags = [(strings[k], strings[w]) for k, w in zip(keys, vals)]
                members = [(int(m), ("node", "way", "relation")[ty],
                            strings[r])
                           for m, ty, r in zip(memids, types, roles)]
                rels.append((rid, members, tags))
    return nodes, ways, rels


def parse_osm_pbf(path: str):
    """Whole-file parse -> (nodes, ways, relations)."""
    nodes, ways, rels = {}, [], []
    with open(path, "rb") as f:
        data = f.read()
    for start, end, btype in osm_blob_ranges(path):
        if btype != "OSMData":
            continue
        pos = start
        hlen = struct.unpack(">i", data[pos:pos + 4])[0]
        blob = data[pos + 4 + hlen:end]
        n, w, r = _parse_primitive_block(_blob_payload(blob))
        nodes.update(n)
        ways.extend(w)
        rels.extend(r)
    return nodes, ways, rels


# ---------------------------------------------------------------------------
# OSM XML (the reference parses both; autotest test.osm ≡ test.pbf)


def parse_osm_xml(path_or_text: str):
    import xml.etree.ElementTree as ET

    if os.path.exists(path_or_text):
        root = ET.parse(path_or_text).getroot()
    else:
        root = ET.fromstring(path_or_text)
    nodes, ways, rels = {}, [], []
    for el in root:
        if el.tag == "node":
            tags = [(t.get("k"), t.get("v")) for t in el.findall("tag")]
            nodes[int(el.get("id"))] = (float(el.get("lon")),
                                        float(el.get("lat")), tags)
        elif el.tag == "way":
            refs = [int(nd.get("ref")) for nd in el.findall("nd")]
            tags = [(t.get("k"), t.get("v")) for t in el.findall("tag")]
            ways.append((int(el.get("id")), refs, tags))
        elif el.tag == "relation":
            members = [(int(m.get("ref")), m.get("type"), m.get("role", ""))
                       for m in el.findall("member")]
            tags = [(t.get("k"), t.get("v")) for t in el.findall("tag")]
            rels.append((int(el.get("id")), members, tags))
    return nodes, ways, rels


# ---------------------------------------------------------------------------
# osmconf.ini defaults (ogr/ogrsf_frmts/osm/data/osmconf.ini)

UNSIGNIFICANT = {"created_by", "converted_by", "source", "time", "ele",
                 "attribution"}
IGNORE = {"created_by", "converted_by", "source", "time", "ele", "note",
          "todo", "fixme", "FIXME"}
CLOSED_WAYS_ARE_POLYGONS = {
    "aeroway", "amenity", "boundary", "building", "craft", "geological",
    "historic", "landuse", "leisure", "military", "natural", "office",
    "place", "shop", "sport", "tourism"}
CLOSED_WAYS_KV = {("highway", "platform"), ("public_transport", "platform")}

POINT_ATTRS = ["name", "barrier", "highway", "ref", "address", "is_in",
               "place", "man_made"]
LINE_ATTRS = ["name", "highway", "waterway", "aerialway", "barrier",
              "man_made", "railway"]
MPOLY_ATTRS = ["name", "type", "aeroway", "amenity", "admin_level",
               "barrier", "boundary", "building", "craft", "geological",
               "historic", "land_area", "landuse", "leisure", "man_made",
               "military", "natural", "office", "place", "shop", "sport",
               "tourism"]
REL_ATTRS = ["name", "type"]

_ZORDER_HW = {"minor": 3, "road": 3, "unclassified": 3, "residential": 3,
              "tertiary_link": 4, "tertiary": 4,
              "secondary_link": 6, "secondary": 6,
              "primary_link": 7, "primary": 7,
              "trunk_link": 8, "trunk": 8,
              "motorway_link": 9, "motorway": 9}


def _z_order(tags: dict) -> int:
    z = _ZORDER_HW.get(tags.get("highway", ""), 0)
    if tags.get("bridge") in ("yes", "true", "1"):
        z += 10
    if tags.get("tunnel") in ("yes", "true", "1"):
        z -= 10
    if "railway" in tags:
        z += 5
    if "layer" in tags:
        try:
            z += 10 * int(tags["layer"])
        except ValueError:
            pass
    return z


def _hstore(tags, attrs, extra_ignore=()) -> str | None:
    ig = IGNORE | set(extra_ignore)
    out = []
    for k, v in tags:
        if k in attrs or k in ig or k.startswith(("openGeoDB:",)):
            continue
        out.append('"%s"=>"%s"'
                   % (k.replace('"', r'\"'), v.replace('"', r'\"')))
    return ",".join(out) if out else None


def _is_polygon_way(refs, tags: dict) -> bool:
    if len(refs) < 4 or refs[0] != refs[-1]:
        return False
    if tags.get("area") == "yes":
        return True
    if tags.get("area") == "no":
        return False
    for k, v in tags.items():
        if k in CLOSED_WAYS_ARE_POLYGONS or (k, v) in CLOSED_WAYS_KV:
            return True
    return False


def read_osm_layers(path: str) -> dict[str, pa.Table]:
    """Parse a .pbf / .osm file into the five OGR layers."""
    from ..functions.wkb import (LINESTRING, MULTILINESTRING, MULTIPOLYGON,
                                 POINT, Geom, geom_to_wkb, geom_to_wkt)

    if path.endswith(".osm") or path.endswith(".xml"):
        nodes, ways, rels = parse_osm_xml(path)
    else:
        nodes, ways, rels = parse_osm_pbf(path)

    way_by_id = {w[0]: w for w in ways}

    # --- relations first: mark consumed multipolygon member ways
    consumed: set[int] = set()
    mpoly_rows, mline_rows, other_rows = [], [], []
    for rid, members, tag_list in rels:
        tags = dict(tag_list)
        rtype = tags.get("type")
        if rtype == "multipolygon" or rtype == "boundary":
            mways = [(m, role) for m, ty, role in members if ty == "way"]
            if any(m not in way_by_id for m, _ in mways) or not mways:
                continue  # missing member way: whole relation skipped
            rings = []
            ok = True
            for m, role in mways:
                refs = way_by_id[m][1]
                pts = [nodes[r][:2] for r in refs if r in nodes]
                if len(pts) < 4:
                    ok = False
                    break
                rings.append((np.array(pts), role))
            if not ok:
                continue
            # tag inheritance: relation with only type tag takes the
            # outer way's tags (ogrosmdatasource.cpp "promote" path)
            eff = [(k, v) for k, v in tag_list if k != "type"]
            if not eff:
                outer = next((m for m, role in mways if role == "outer"),
                             mways[0][0])
                eff = [(k, v) for k, v in way_by_id[outer][2]]
                tags = dict(eff + [("type", rtype)])
                tag_list = eff + [("type", rtype)]
            for m, _role in mways:
                consumed.add(m)
            arrs = [r for r, _ in rings]
            counts = []
            i = 0
            # group: each outer starts a polygon, following inners
            # attach to it (members are ordered outer,inner,...)
            for r, role in rings:
                if role != "inner" or not counts:
                    counts.append(1)
                else:
                    counts[-1] += 1
            g = Geom(MULTIPOLYGON, arrs, poly_ring_counts=counts)
            mpoly_rows.append((rid, None, tags, tag_list, g))
        elif rtype == "route":
            parts = []
            for m, ty, _role in members:
                if ty == "way" and m in way_by_id:
                    pts = [nodes[r][:2]
                           for r in way_by_id[m][1] if r in nodes]
                    if len(pts) >= 2:
                        parts.append(np.array(pts))
            g = Geom(MULTILINESTRING, parts)
            mline_rows.append((rid, tags, tag_list, g))
        elif rtype:
            geoms = []
            for m, ty, _role in members:
                if ty == "node" and m in nodes:
                    geoms.append(Geom(POINT, [np.array([nodes[m][:2]])]))
                elif ty == "way" and m in way_by_id:
                    pts = [nodes[r][:2]
                           for r in way_by_id[m][1] if r in nodes]
                    if len(pts) >= 2:
                        geoms.append(Geom(LINESTRING, [np.array(pts)]))
            other_rows.append((rid, tags, tag_list, geoms))

    # --- nodes -> points
    pt_rows = []
    for nid, (lon, lat, tag_list) in sorted(nodes.items()):
        if not any(k not in UNSIGNIFICANT for k, _ in tag_list):
            continue
        pt_rows.append((nid, dict(tag_list), tag_list,
                        Geom(POINT, [np.array([[lon, lat]])])))

    # --- ways -> lines / standalone polygons
    line_rows = []
    for wid, refs, tag_list in ways:
        if not tag_list:
            continue
        tags = dict(tag_list)
        pts = [nodes[r][:2] for r in refs if r in nodes]
        if _is_polygon_way(refs, tags):
            if wid in consumed:
                continue
            if len(pts) >= 4:
                g = Geom(MULTIPOLYGON, [np.array(pts)], poly_ring_counts=[1])
                mpoly_rows.append((None, wid, tags, tag_list, g))
        else:
            if len(pts) >= 2:
                line_rows.append((wid, tags, tag_list,
                                  Geom(LINESTRING, [np.array(pts)])))

    def build(rows, attrs, extra_ignore=(), with_way_id=False,
              z_order=False, collection=False):
        cols = {"osm_id": []}
        if with_way_id:
            cols["osm_way_id"] = []
        for a in attrs:
            cols[a] = []
        if z_order:
            cols["z_order"] = []
        cols["other_tags"] = []
        wkbs, wkts = [], []
        for row in rows:
            if with_way_id:
                oid, wid, tags, tag_list, g = row
                cols["osm_id"].append(str(oid) if oid is not None else None)
                cols["osm_way_id"].append(
                    str(wid) if wid is not None else None)
            else:
                oid, tags, tag_list, g = row
                cols["osm_id"].append(str(oid))
            for a in attrs:
                cols[a].append(tags.get(a))
            if z_order:
                cols["z_order"].append(_z_order(tags))
            cols["other_tags"].append(
                _hstore(tag_list, set(attrs), extra_ignore))
            if collection:
                wkbs.append(None)
                wkts.append("GEOMETRYCOLLECTION (%s)" % ",".join(
                    geom_to_wkt(x) for x in g) if g else None)
            else:
                wkbs.append(geom_to_wkb(g))
                wkts.append(geom_to_wkt(g))
        arrays, names = [], []
        for k, v in cols.items():
            names.append(k)
            arrays.append(pa.array(
                v, pa.int32() if k == "z_order" else pa.string()))
        names += ["geometry", "wkt"]
        arrays += [pa.array(wkbs, pa.binary()), pa.array(wkts, pa.string())]
        return pa.table(arrays, names=names)

    return {
        "points": build(pt_rows, POINT_ATTRS),
        "lines": build(line_rows, LINE_ATTRS, z_order=True),
        "multipolygons": build(mpoly_rows, MPOLY_ATTRS,
                               extra_ignore=("area",), with_way_id=True),
        "multilinestrings": build(mline_rows, REL_ATTRS,
                                  extra_ignore=("area",)),
        "other_relations": build(other_rows, REL_ATTRS,
                                 extra_ignore=("area",), collection=True),
    }


def osm_dataset(path: str, layer: str = "points", shards: int = 8):
    """Blob-range-sharded Ray read: each task parses its own blob
    span.  Node-coordinate resolution inside a task only sees its
    span, so this surface serves the points layer (self-contained per
    blob); line/polygon assembly at scale is the documented
    ways⋈nodes hash join."""
    import ray.data

    ranges = [r for r in osm_blob_ranges(path) if r[2] == "OSMData"]
    per = max(1, -(-len(ranges) // max(1, shards)))
    chunks = [ranges[i:i + per] for i in range(0, len(ranges), per)]

    def load(batch: pa.Table) -> pa.Table:
        out_ids, out_lon, out_lat, out_tags = [], [], [], []
        with open(path, "rb") as f:
            data = f.read()
        for rec in batch.to_pylist():
            for start, end in zip(rec["starts"], rec["ends"]):
                hlen = struct.unpack(">i", data[start:start + 4])[0]
                blob = data[start + 4 + hlen:end]
                nodes, _w, _r = _parse_primitive_block(_blob_payload(blob))
                for nid, (lon, lat, tags) in nodes.items():
                    if any(k not in UNSIGNIFICANT for k, _ in tags):
                        out_ids.append(nid)
                        out_lon.append(lon)
                        out_lat.append(lat)
                        out_tags.append(_hstore(tags, set(POINT_ATTRS)))
        return pa.table({"osm_id": pa.array(out_ids, pa.int64()),
                         "lon": pa.array(out_lon, pa.float64()),
                         "lat": pa.array(out_lat, pa.float64()),
                         "other_tags": pa.array(out_tags, pa.string())})

    items = [{"starts": [c[0] for c in ch], "ends": [c[1] for c in ch]}
             for ch in chunks]
    ds = ray.data.from_items(items)
    return ds.map_batches(load, batch_format="pyarrow", batch_size=1)
