"""SQLite / SpatiaLite vector driver (reference
ogr/ogrsf_frmts/sqlite/): layers discovered through the
``geometry_columns`` metadata table (both the legacy text-typed
SpatiaLite 2/3 schema and the integer-typed SpatiaLite 4 schema),
geometry decoded from the SpatiaLite binary blob:

    00 | endian | srid (4) | MBR (4 doubles) | 7C | class geometry | FE

Class codes 1..7 are the WKB 2-D types with the same layout (no
per-geometry endian byte — the header's applies); 1000000+k are the
SpatiaLite COMPRESSED variants where every ring/linestring stores its
first vertex as doubles and subsequent vertices as float32 deltas
from the previous vertex; collection members are each prefixed by a
0x69 entity marker + class code. Z variants (1000+k / compressed
3000000+k) carry a Z double (delta float32 when compressed).

Plain-SQLite tables whose geometry blobs are raw WKB (the OGR
"SQLite without SpatiaLite" flavor) decode through the WKB fall-
through. The writer emits uncompressed SpatiaLite blobs plus the
minimal spatial_ref_sys / geometry_columns metadata, so files open
in both this engine and real SpatiaLite stacks.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import wkb_to_geom

_WKB_NDIGITS = None


def _rd_pts_compressed(b: bytes, pos: int, n: int, little: bool,
                       has_z: bool):
    # spatialite gg_geometries.c: FIRST and LAST vertices are full
    # doubles; the ones between are float32 deltas from the previous
    e = "<" if little else ">"
    dims = 3 if has_z else 2
    out = np.empty((n, dims), np.float64)
    out[0] = struct.unpack_from(e + "d" * dims, b, pos)
    pos += 8 * dims
    for i in range(1, n - 1):
        d = struct.unpack_from(e + "f" * dims, b, pos)
        pos += 4 * dims
        out[i] = out[i - 1] + np.asarray(d)
    if n > 1:
        out[n - 1] = struct.unpack_from(e + "d" * dims, b, pos)
        pos += 8 * dims
    return out, pos


def _rd_pts(b: bytes, pos: int, n: int, little: bool, has_z: bool):
    e = "<" if little else ">"
    dims = 3 if has_z else 2
    flat = struct.unpack_from(e + "d" * (dims * n), b, pos)
    return (np.asarray(flat, np.float64).reshape(n, dims),
            pos + 8 * dims * n)


def _sl_geometry(b: bytes, pos: int, little: bool) -> tuple[bytes, int]:
    """Decode one class geometry at ``pos`` -> (standard WKB, newpos)."""
    e = "<" if little else ">"
    (cls,) = struct.unpack_from(e + "I", b, pos)
    pos += 4
    compressed = cls >= 1000000 and cls < 2000000 or cls >= 3000000
    base = cls % 1000000
    has_z = base >= 1000 and base < 2000
    kind = base % 1000
    bo = b"\x01" if little else b"\x00"
    wkb_type = kind + (1000 if has_z else 0)
    head = bo + struct.pack(e + "I", wkb_type)
    rd = (_rd_pts_compressed if compressed and kind != 1 else _rd_pts)

    def pack_pts(pts: np.ndarray) -> bytes:
        return pts.astype(e + "f8").tobytes()

    if kind == 1:  # point (never compressed)
        pts, pos = _rd_pts(b, pos, 1, little, has_z)
        return head + pack_pts(pts), pos
    if kind == 2:  # linestring
        (n,) = struct.unpack_from(e + "I", b, pos)
        pos += 4
        pts, pos = rd(b, pos, n, little, has_z)
        return head + struct.pack(e + "I", n) + pack_pts(pts), pos
    if kind == 3:  # polygon
        (nr,) = struct.unpack_from(e + "I", b, pos)
        pos += 4
        out = head + struct.pack(e + "I", nr)
        for _ in range(nr):
            (n,) = struct.unpack_from(e + "I", b, pos)
            pos += 4
            pts, pos = rd(b, pos, n, little, has_z)
            out += struct.pack(e + "I", n) + pack_pts(pts)
        return out, pos
    if kind in (4, 5, 6, 7):  # multi* / collection
        (ng,) = struct.unpack_from(e + "I", b, pos)
        pos += 4
        out = head + struct.pack(e + "I", ng)
        for _ in range(ng):
            if b[pos] != 0x69:  # entity marker
                raise ValueError("bad SpatiaLite entity marker")
            sub, pos = _sl_geometry(b, pos + 1, little)
            out += sub
        return out, pos
    raise NotImplementedError(f"SpatiaLite class {cls}")


def spatialite_to_wkb(blob: bytes) -> tuple[bytes, int]:
    """SpatiaLite blob -> (standard WKB, srid). Raw-WKB blobs pass
    through with srid 0 (plain OGR-SQLite layers)."""
    if not blob:
        raise ValueError("empty geometry blob")
    if blob[0] in (0, 1) and len(blob) > 1 and blob[1] in (0, 1) \
            and blob[0] == 0:
        little = blob[1] == 1
        e = "<" if little else ">"
        (srid,) = struct.unpack_from(e + "i", blob, 2)
        if blob[38] != 0x7C:
            raise ValueError("bad SpatiaLite MBR separator")
        wkb, _pos = _sl_geometry(blob, 39, little)
        return wkb, srid
    if blob[0] in (0, 1):  # raw WKB
        return bytes(blob), 0
    raise ValueError("unrecognized geometry blob")


def wkb_to_spatialite(wkb: bytes, srid: int = 4326) -> bytes:
    """Standard WKB -> uncompressed SpatiaLite blob (writer path)."""
    g = wkb_to_geom(wkb)
    xmin, ymin, xmax, ymax = g.bbox()
    little = wkb[0] == 1
    e = "<" if little else ">"
    head = (b"\x00" + (b"\x01" if little else b"\x00")
            + struct.pack(e + "i", srid)
            + struct.pack(e + "4d", xmin, ymin, xmax, ymax) + b"\x7c")
    # class geometry = WKB body without its leading endian byte,
    # with collection members gaining the 0x69 marker
    body = _wkb_to_class(wkb)
    return head + body + b"\xfe"


def _wkb_to_class(wkb: bytes) -> bytes:
    little = wkb[0] == 1
    e = "<" if little else ">"
    (t,) = struct.unpack_from(e + "I", wkb, 1)
    kind = t % 1000
    if kind in (1, 2, 3):
        return wkb[1:]
    if kind in (4, 5, 6, 7):
        (ng,) = struct.unpack_from(e + "I", wkb, 5)
        out = wkb[1:9]
        pos = 9
        for _ in range(ng):
            sub_len = _wkb_len(wkb, pos, e)
            out += b"\x69" + wkb[pos + 1: pos + sub_len]
            pos += sub_len
        return out
    raise NotImplementedError(f"wkb type {t}")


def _wkb_len(b: bytes, pos: int, e: str) -> int:
    (t,) = struct.unpack_from(e + "I", b, pos + 1)
    has_z = (t % 10000) >= 1000
    step = 24 if has_z else 16
    kind = t % 1000
    if kind == 1:
        return 5 + step
    if kind == 2:
        (n,) = struct.unpack_from(e + "I", b, pos + 5)
        return 9 + n * step
    if kind == 3:
        (nr,) = struct.unpack_from(e + "I", b, pos + 5)
        ln = 9
        for _ in range(nr):
            (n,) = struct.unpack_from(e + "I", b, pos + ln)
            ln += 4 + n * step
        return ln
    raise NotImplementedError(f"nested wkb type {t}")


def list_layers(path: str) -> list[tuple[str, str, int]]:
    """-> [(table, geometry_column, srid)] from geometry_columns."""
    con = sqlite3.connect(path)
    try:
        cols = [r[1] for r in con.execute("PRAGMA table_info(geometry_columns)")]
        rows = list(con.execute("SELECT * FROM geometry_columns"))
        it = cols.index("f_table_name")
        ic = cols.index("f_geometry_column")
        isr = cols.index("srid")
        return [(r[it], r[ic], int(r[isr])) for r in rows]
    finally:
        con.close()


def read_sqlite_layer(path: str, layer: str | None = None,
                      fid_range: tuple[int, int] | None = None) -> pa.Table:
    """One layer -> Arrow table with standard-WKB ``geometry``; the
    optional rowid range makes Dataset shard reads possible."""
    metas = list_layers(path)
    if layer is None:
        layer = metas[0][0]
    gcol = next((m[1] for m in metas if m[0] == layer), None)
    if gcol is None:
        raise KeyError(layer)
    con = sqlite3.connect(path)
    try:
        where = ""
        if fid_range is not None:
            where = f" WHERE rowid >= {int(fid_range[0])}" \
                    f" AND rowid < {int(fid_range[1])}"
        cur = con.execute(f'SELECT rowid AS _fid_, * FROM "{layer}"{where}')
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    low = [n.lower() for n in names]
    gi = low.index(gcol.lower())  # sqlite names are case-insensitive
    keep = [(i, n) for i, n in enumerate(names)
            if i != gi and n.lower() not in ("_fid_", "geometry")
            and not n.upper().startswith("OGC_FID")]
    fid_name = "fid" if all(n != "fid" for _i, n in keep) else "_rowid_"
    cols: dict[str, list] = {fid_name: [], "geometry": []}
    for _i, n in keep:
        cols[n] = []
    for r in rows:
        cols[fid_name].append(r[0])
        blob = r[gi]
        cols["geometry"].append(
            spatialite_to_wkb(blob)[0] if blob is not None else None)
        for i, n in keep:
            cols[n].append(r[i])
    out: dict[str, pa.Array] = {fid_name: pa.array(cols[fid_name],
                                                   pa.int64())}
    for _i, n in keep:
        out[n] = pa.array(cols[n])
    out["geometry"] = pa.array(cols["geometry"], pa.binary())
    return pa.table(out)


def write_sqlite(path: str, layers: dict[str, pa.Table],
                 srid: int = 4326) -> None:
    """SpatiaLite-flavored database: minimal spatial_ref_sys +
    geometry_columns (legacy text schema) + one table per layer with
    uncompressed SpatiaLite geometry blobs."""
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("CREATE TABLE IF NOT EXISTS spatial_ref_sys ("
                    "srid INTEGER PRIMARY KEY, auth_name TEXT, "
                    "auth_srid INTEGER, ref_sys_name TEXT, proj4text TEXT)")
        cur.execute("INSERT OR REPLACE INTO spatial_ref_sys VALUES "
                    "(?, 'epsg', ?, ?, '')",
                    (srid, srid, f"EPSG:{srid}"))
        cur.execute("CREATE TABLE IF NOT EXISTS geometry_columns ("
                    "f_table_name TEXT, f_geometry_column TEXT, "
                    "type TEXT, coord_dimension TEXT, srid INTEGER, "
                    "spatial_index_enabled INTEGER)")
        for name, tbl in layers.items():
            fields = [f for f in tbl.column_names if f != "geometry"]
            defs = ", ".join(
                f'"{f}" {_sql_type(tbl.schema.field(f).type)}'
                for f in fields)
            cur.execute(f'CREATE TABLE "{name}" (OGC_FID INTEGER PRIMARY '
                        f'KEY AUTOINCREMENT, GEOMETRY BLOB'
                        + (", " + defs if defs else "") + ")")
            gtype = "GEOMETRY"
            if tbl.num_rows:
                first = next(g for g in tbl["geometry"].to_pylist()
                             if g is not None)
                gtype = wkb_to_geom(first).name.upper()
            cur.execute("INSERT INTO geometry_columns VALUES "
                        "(?, 'GEOMETRY', ?, 'XY', ?, 0)",
                        (name, gtype, srid))
            ph = ", ".join(["?"] * (1 + len(fields)))
            data = []
            geoms = tbl["geometry"].to_pylist()
            fcols = [tbl[f].to_pylist() for f in fields]
            for i in range(tbl.num_rows):
                blob = (wkb_to_spatialite(geoms[i], srid)
                        if geoms[i] is not None else None)
                data.append((blob, *(fc[i] for fc in fcols)))
            cur.executemany(
                f'INSERT INTO "{name}" (GEOMETRY'
                + ("".join(f', "{f}"' for f in fields)) + f") VALUES ({ph})",
                data)
        con.commit()
    finally:
        con.close()


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t):
        return "BLOB"
    return "TEXT"


def sqlite_dataset(path: str, layer: str | None = None,
                   shard_rows: int = 65536):
    """Lazy Dataset over rowid shards (one read task per shard) —
    the same keyed-range pattern as the GPKG reader."""
    import ray.data

    metas = list_layers(path)
    if layer is None:
        layer = metas[0][0]
    con = sqlite3.connect(path)
    try:
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{layer}"').fetchone()
    finally:
        con.close()
    if lo is None:
        return ray.data.from_arrow(read_sqlite_layer(path, layer))
    bounds = list(range(lo, hi + 2, shard_rows))
    if bounds[-1] != hi + 1:
        bounds.append(hi + 1)
    items = [{"lo": a, "hi": b} for a, b in zip(bounds, bounds[1:])]

    def load(b: pa.Table) -> pa.Table:
        outs = [read_sqlite_layer(path, layer, (r["lo"], r["hi"]))
                for r in b.to_pylist()]
        return pa.concat_tables(outs)

    return ray.data.from_items(items).map_batches(
        load, batch_format="pyarrow", batch_size=1)
