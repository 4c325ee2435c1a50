"""ADBC/DuckDB vector driver (reference ogr/ogrsf_frmts/adbc).

GDAL's ADBC driver opens DuckDB databases (and Parquet files through
DuckDB) and exposes each user table as a layer; an ``SQL=`` open
option replaces the table list with one ``RESULTSET`` layer
(ogradbcdataset.cpp:209,430).  This module uses the in-process
``duckdb`` package as the ADBC transport and converts DuckDB-spatial
GEOMETRY columns to standard WKB.

DuckDB-spatial geometry serialization (reverse-derived from the
public duckdb-spatial format against the reference's own
``data/duckdb/poly.duckdb`` fixture, cross-checked ring-for-ring vs
poly.shp through the engine's shapefile reader):

  header   byte0 = type enum (0 point, 1 line, 2 polygon, 3 mpoint,
           4 mline, 5 mpolygon, 6 collection), byte1 = property flags
           (0x01 Z, 0x02 M, 0x04 bbox), bytes2-3 unused, bytes4-7 pad
  bbox     4 x float32 (xmin ymin xmax ymax) when flag 0x04
  body     recursive: u32 type, then per type —
           point/line: u32 count, align(8), count x dims doubles
           polygon:    u32 nrings, nrings x u32 counts, align(8),
                       ring vertices consecutively
           multi/coll: u32 count, children (each 8-aligned body)

Companion ``<name>_bbox`` STRUCT columns are consumed as the spatial
index (like the GeoParquet bbox convention) and not exposed as
fields.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import Geom, geom_to_wkb

_MULTI = {3: 4, 4: 5, 5: 6}              # duckdb enum -> OGR wkb kind


def _align8(pos: int) -> int:
    return (pos + 7) & ~7


def _read_body(b: bytes, pos: int, dims: int):
    """-> (kind, rings, poly_ring_counts, zs, new_pos)."""
    (gtype,) = struct.unpack_from("<I", b, pos)
    pos += 4
    if gtype in (0, 1):                  # point / linestring
        (n,) = struct.unpack_from("<I", b, pos)
        pos = _align8(pos + 4)
        coords = np.frombuffer(b, "<f8", count=n * dims, offset=pos)
        coords = coords.reshape(-1, dims)
        pos += n * dims * 8
        zs = [coords[:, 2].copy()] if dims > 2 and n else None
        return gtype + 1, [coords[:, :2].copy()], [], zs, pos
    if gtype == 2:                       # polygon
        (nrings,) = struct.unpack_from("<I", b, pos)
        pos += 4
        counts = struct.unpack_from(f"<{nrings}I", b, pos)
        pos = _align8(pos + 4 * nrings)
        rings, zs = [], []
        for n in counts:
            coords = np.frombuffer(b, "<f8", count=n * dims, offset=pos)
            coords = coords.reshape(-1, dims)
            rings.append(coords[:, :2].copy())
            if dims > 2:
                zs.append(coords[:, 2].copy())
            pos += n * dims * 8
        return 3, rings, [], (zs if dims > 2 else None), pos
    if gtype in (3, 4, 5, 6):            # multi / collection
        (n,) = struct.unpack_from("<I", b, pos)
        pos = _align8(pos + 4)
        rings, prc, zs = [], [], []
        kind = _MULTI.get(gtype, 6)
        for _ in range(n):
            k, r, sub_prc, sub_z, pos = _read_body(b, pos, dims)
            rings.extend(r)
            if gtype == 5:               # multipolygon ring grouping
                prc.append(len(r))
            if sub_z is not None:
                zs.extend(sub_z)
        return kind, rings, prc, (zs if dims > 2 and zs else None), pos
    raise ValueError(f"duckdb geometry type {gtype}")


def duckdb_geom_to_wkb(blob: bytes) -> bytes | None:
    if blob is None:
        return None
    flags = blob[1]
    dims = 2 + bool(flags & 0x01)
    pos = 8
    if flags & 0x04:
        pos += 16 + (8 if flags & 0x01 else 0)
    kind, rings, prc, zs, _ = _read_body(blob, pos, dims)
    return geom_to_wkb(Geom(kind, rings, prc, zs))


def read_duckdb(path: str, sql: str | None = None) -> dict[str, pa.Table]:
    """DuckDB database -> {layer: Arrow table(fields..., geometry WKB)}.

    ``sql`` mirrors the driver's SQL= open option: the result set is
    the only layer, named RESULTSET (ogradbcdataset.cpp:209)."""
    import duckdb

    con = duckdb.connect(path, read_only=True)
    try:
        if sql is not None:
            return {"RESULTSET": _layer(con, sql)}
        tables = [r[0] for r in con.execute(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = 'main' ORDER BY table_name"
        ).fetchall()]
        return {t: _layer(con, f'SELECT * FROM "{t}"') for t in tables}
    finally:
        con.close()


def _layer(con, sql: str) -> pa.Table:
    cols = con.execute(f"DESCRIBE {sql}").fetchall()
    geom_cols = [c[0] for c in cols if c[1] == "GEOMETRY"]
    bbox_cols = {f"{g}_bbox" for g in geom_cols}
    t = con.execute(sql).arrow()
    out_cols: dict[str, pa.Array] = {}
    for name in t.column_names:
        if name in bbox_cols:
            continue                     # spatial-index companion
        col = t[name].combine_chunks()
        if name in geom_cols:
            wkb = [None if v is None else duckdb_geom_to_wkb(v)
                   for v in col.to_pylist()]
            out_cols[name] = pa.array(wkb, pa.binary())
        elif pa.types.is_decimal(col.type):
            out_cols[name] = col.cast(pa.float64())
        else:
            out_cols[name] = col
    return pa.table(out_cols)
