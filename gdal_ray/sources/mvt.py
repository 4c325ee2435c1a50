"""Mapbox Vector Tiles reader (reference ogr/ogrsf_frmts/mvt).

A tile is a protobuf ``Tile`` message: repeated ``layer`` (field 3)
with version/name/extent, string ``keys``, typed ``values`` (string/
float/double/int/uint/sint/bool) and ``features`` carrying id, even
(key,value) tag indexes, a geometry type and a command stream —
u32s of ``(id & 7, count = id >> 3)``: MoveTo(1)/LineTo(2) consume
``count`` zigzag (dx,dy) pairs, ClosePath(7) closes the ring.

Tile-local integer units map to EPSG:3857 like the reference
(ogrmvtdataset.cpp): for tile (z,x,y) the tile spans
``size = 2*pi*R / 2^z`` metres from the top-left mercator origin,
so ``X = -origin + (x + px/extent)*size``,
``Y = origin - (y + py/extent)*size``.

With a ``metadata.json`` (tilejson) the reference promotes
geometries to MULTI; polygons classify rings by the sign of the
shoelace area in tile space (y-down: positive = outer), holes attach
to the last outer.  A zoom directory (``<dir>/<z>/<x>/<y>.pbf``)
reads as one layer set with features of every tile."""

from __future__ import annotations

import json
import math
import os
import struct

import numpy as np
import pyarrow as pa

from .osm import _fields, _packed_varints, _varint, _zigzag

MERC_ORIGIN = 20037508.342789244


def _parse_value(buf: bytes):
    for fn, wt, v in _fields(buf):
        if fn == 1:
            return v.decode("utf-8")
        if fn == 2:
            return struct.unpack("<f", v)[0]
        if fn == 3:
            return struct.unpack("<d", v)[0]
        if fn == 4:
            return v if v < 2**63 else v - 2**64  # int64
        if fn == 5:
            return v
        if fn == 6:
            return _zigzag(v)
        if fn == 7:
            return bool(v)
    return None


def _decode_geometry(cmds: list[int], gtype: int):
    """-> list of parts, each an (n,2) int array (tile units)."""
    parts = []
    cur = []
    x = y = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        op, count = cmd & 7, cmd >> 3
        i += 1
        if op == 1:  # MoveTo
            for _ in range(count):
                if cur and gtype != 1:
                    parts.append(cur)
                    cur = []
                x += _zigzag(cmds[i])
                y += _zigzag(cmds[i + 1])
                i += 2
                cur.append((x, y))
        elif op == 2:  # LineTo
            for _ in range(count):
                x += _zigzag(cmds[i])
                y += _zigzag(cmds[i + 1])
                i += 2
                cur.append((x, y))
        elif op == 7:  # ClosePath
            if cur:
                cur.append(cur[0])
                parts.append(cur)
                cur = []
        else:
            break
    if cur:
        parts.append(cur)
    return [np.array(p, np.float64) for p in parts]


def _tile_to_merc(parts, z, tx, ty, extent):
    size = 2 * MERC_ORIGIN / (1 << z)
    out = []
    for p in parts:
        xs = -MERC_ORIGIN + (tx + p[:, 0] / extent) * size
        ys = MERC_ORIGIN - (ty + p[:, 1] / extent) * size
        out.append(np.column_stack([xs, ys]))
    return out


def _geom_wkt(parts, gtype, multi=True) -> str | None:
    from ..functions.wkb import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                                 MULTIPOLYGON, POINT, POLYGON, Geom,
                                 geom_to_wkt)

    if not parts:
        return None
    if gtype == 1:
        xy = np.vstack(parts)
        g = Geom(MULTIPOINT, [xy]) if (multi or len(xy) > 1) \
            else Geom(POINT, [xy])
        return geom_to_wkt(g, precision=15)
    if gtype == 2:
        if multi or len(parts) > 1:
            return geom_to_wkt(Geom(MULTILINESTRING, parts), precision=15)
        return geom_to_wkt(Geom(LINESTRING, parts), precision=15)
    # polygons: ring sign (tile space y-down -> after mercator flip,
    # outer rings are CW in y-up == positive shoelace in y-down).
    def area(r):
        x, y = r[:, 0], r[:, 1]
        return 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)

    groups = []
    for r in parts:
        if area(r) < 0 or not groups:
            groups.append([r])
        else:
            groups[-1].append(r)
    rings = [r for g in groups for r in g]
    counts = [len(g) for g in groups]
    if multi or len(groups) > 1:
        return geom_to_wkt(Geom(MULTIPOLYGON, rings,
                                poly_ring_counts=counts), precision=15)
    return geom_to_wkt(Geom(POLYGON, rings), precision=15)


def _parse_tile(data: bytes, z: int, tx: int, ty: int, multi=True):
    """-> {layer_name: list of (mvt_id, {attr: val}, wkt)}."""
    out: dict[str, list] = {}
    for fn, _wt, layer_buf in _fields(data):
        if fn != 3:
            continue
        name = ""
        extent = 4096
        keys: list[str] = []
        values: list = []
        feats = []
        for f2, _w, v in _fields(layer_buf):
            if f2 == 1:
                name = v.decode("utf-8")
            elif f2 == 3:
                keys.append(v.decode("utf-8"))
            elif f2 == 4:
                values.append(_parse_value(v))
            elif f2 == 5:
                extent = v
            elif f2 == 2:
                feats.append(v)
        rows = out.setdefault(name, [])
        for fbuf in feats:
            fid = None
            tags: list[int] = []
            gtype = 0
            cmds: list[int] = []
            for f3, _w, v in _fields(fbuf):
                if f3 == 1:
                    fid = v
                elif f3 == 2:
                    tags = _packed_varints(v)
                elif f3 == 3:
                    gtype = v
                elif f3 == 4:
                    cmds = _packed_varints(v)
            attrs = {}
            for i in range(0, len(tags) - 1, 2):
                if tags[i] < len(keys) and tags[i + 1] < len(values):
                    attrs[keys[tags[i]]] = values[tags[i + 1]]
            parts = _decode_geometry(cmds, gtype)
            parts = _tile_to_merc(parts, z, tx, ty, extent)
            wkt = _geom_wkt(parts, gtype, multi=multi)
            rows.append((fid, attrs, wkt))
    return out


def read_mvt(path: str, z: int | None = None, x: int | None = None,
             y: int | None = None, multi: bool | None = None
             ) -> dict[str, pa.Table]:
    """Read a single .pbf tile or a zoom directory tree.

    For ``<base>/<z>/<x>/<y>.pbf`` paths the z/x/y come from the path
    when not given.  ``multi`` defaults to True when a metadata.json
    sits beside the tree (the reference's layer-schema promotion)."""
    tiles: list[tuple[str, int, int, int]] = []
    if os.path.isfile(path):
        parts = os.path.normpath(path).split(os.sep)
        try:
            ty = int(os.path.splitext(parts[-1])[0])
            tx = int(parts[-2])
            tz = int(parts[-3])
        except (ValueError, IndexError):
            tz, tx, ty = 0, 0, 0
        if z is not None:
            tz, tx, ty = z, x or 0, y or 0
        tiles.append((path, tz, tx, ty))
        meta_dir = os.path.dirname(os.path.dirname(os.path.dirname(path)))
    else:
        # a zoom directory: path = <base>/<z>
        tz = int(os.path.basename(path))
        for xdir in sorted(os.listdir(path)):
            xp = os.path.join(path, xdir)
            if not os.path.isdir(xp):
                continue
            for yf in sorted(os.listdir(xp)):
                if yf.endswith(".pbf"):
                    tiles.append((os.path.join(xp, yf), tz, int(xdir),
                                  int(os.path.splitext(yf)[0])))
        meta_dir = os.path.dirname(path)
    if multi is None:
        multi = os.path.exists(os.path.join(meta_dir, "metadata.json"))

    merged: dict[str, list] = {}
    for tp, tz, tx, ty in tiles:
        with open(tp, "rb") as f:
            data = f.read()
        if data[:2] == b"\x1f\x8b":
            import gzip

            data = gzip.decompress(data)
        for lname, rows in _parse_tile(data, tz, tx, ty, multi).items():
            merged.setdefault(lname, []).extend(rows)

    out: dict[str, pa.Table] = {}
    for lname, rows in merged.items():
        cols: dict[str, list] = {}
        for _fid, attrs, _w in rows:
            for k in attrs:
                cols.setdefault(k, [])
        ids, wkts = [], []
        for fid, attrs, wkt in rows:
            ids.append(fid)
            wkts.append(wkt)
            for k in cols:
                cols[k].append(attrs.get(k))
        arrays = [pa.array(ids, pa.int64())]
        names = ["mvt_id"]
        for k, vals in cols.items():
            names.append(k)
            if any(isinstance(v, bool) for v in vals):
                arrays.append(pa.array(vals, pa.bool_()))
            elif any(isinstance(v, float) for v in vals):
                arrays.append(pa.array(
                    [float(v) if v is not None else None for v in vals],
                    pa.float64()))
            elif any(isinstance(v, int) for v in vals):
                arrays.append(pa.array(vals, pa.int64()))
            else:
                arrays.append(pa.array(
                    [None if v is None else str(v) for v in vals],
                    pa.string()))
        names.append("wkt")
        arrays.append(pa.array(wkts, pa.string()))
        out[lname] = pa.table(arrays, names=names)
    return out
