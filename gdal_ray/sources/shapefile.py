"""ESRI Shapefile reader/writer (pure Python, stdlib struct + numpy).

The reference's single most-used vector format
(ogr/ogrsf_frmts/shape/ — shpopen.c for .shp/.shx record framing,
dbfopen.c for dBase III attributes, shape2ogr.cpp for the
shape<->OGR geometry mapping). Format semantics follow the published
ESRI Shapefile Technical Description (July 1998 whitepaper):

- .shp: 100-byte header (big-endian file code 9994 + file length in
  16-bit words; little-endian version 1000, shape type, 8-double
  bbox), then records of (BE record number, BE content words) +
  little-endian shape payload.
- .shx: same header, then (BE offset words, BE content words) per
  record — the record index that makes byte-range sharded reads
  possible without scanning.
- .dbf: dBase III — 32-byte file header, 32-byte field descriptors
  (name 11s, type C/N/F/L/D, length, decimals), 0x0D terminator,
  fixed-width ASCII records each prefixed by a deletion flag.

Geometry mapping (shape2ogr.cpp semantics):

- Point(1) -> wkbPoint; PolyLine(3) -> LineString when one part else
  MultiLineString; Polygon(5) -> rings split by winding (outer =
  clockwise = negative shoelace area in map coords, holes = CCW),
  holes assigned to the containing outer by point-in-ring; one outer
  -> Polygon, several -> MultiPolygon; MultiPoint(8) -> MultiPoint.
- Null(0) -> null geometry row.

Scale note: like the GPKG reader, the driver reads only the .shx
index (8 bytes/record) to plan shards; feature decode fans out as a
Ray Dataset over record ranges, each task range-reading .shp and the
fixed-width .dbf slice. Multi-node needs the files on shared storage.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                             MULTIPOLYGON, POINT, POLYGON, Geom, geom_to_wkb,
                             wkb_to_geom)

SHP_NULL, SHP_POINT, SHP_POLYLINE, SHP_POLYGON, SHP_MULTIPOINT = 0, 1, 3, 5, 8


# ------------------------------------------------------------------ geometry

def _ring_area(xy: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    x, y = xy[:, 0], xy[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    """Even-odd crossing test (first vertex of a hole vs an outer)."""
    x, y = float(pt[0]), float(pt[1])
    xs, ys = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    cross = ((ys > y) != (y2 > y)) & (
        x < xs + (y - ys) * (x2 - xs) / np.where(y2 != ys, y2 - ys, 1.0))
    return bool(np.count_nonzero(cross) % 2)


_ZM_BASE = {11: SHP_POINT, 13: SHP_POLYLINE, 15: SHP_POLYGON,
            18: SHP_MULTIPOINT,       # ...Z (XY block + Z [+ M])
            21: SHP_POINT, 23: SHP_POLYLINE, 25: SHP_POLYGON,
            28: SHP_MULTIPOINT}       # ...M (XY block + M)


def _shape_to_geom(shape_type: int, payload: bytes) -> Geom | None:
    """One .shp record payload (after the LE shape-type int) -> Geom."""
    if shape_type == SHP_NULL:
        return None
    if shape_type == 31:
        # MultiPatch: parts carry a part-type array (strip/fan/ring
        # kinds); the reference maps it to TIN / GeometryCollection
        # (OGRCreateFromMultiPatch) — here strips/fans triangulate
        # and ring parts stay rings, emitted as one MultiPolygonZ.
        nparts, npts = struct.unpack_from("<ii", payload, 32)
        parts = np.frombuffer(payload, "<i4", nparts, 40)
        ptypes = np.frombuffer(payload, "<i4", nparts, 40 + 4 * nparts)
        xyoff = 40 + 8 * nparts
        xy = np.frombuffer(payload, "<f8", 2 * npts, xyoff).reshape(npts, 2)
        z = np.frombuffer(payload, "<f8", npts, xyoff + 16 * npts + 16)
        bounds = list(parts) + [npts]
        rings, zs, counts = [], [], []
        for i in range(nparts):
            pxy = xy[bounds[i]:bounds[i + 1]].astype(np.float64)
            pz = z[bounds[i]:bounds[i + 1]].astype(np.float64)
            pt = int(ptypes[i])
            if pt in (0, 1):        # triangle strip / fan
                for j in range(len(pxy) - 2):
                    a = 0 if pt == 1 else j
                    tri = np.array([pxy[a], pxy[j + 1], pxy[j + 2], pxy[a]])
                    rings.append(tri)
                    zs.append(np.array([pz[a], pz[j + 1], pz[j + 2], pz[a]]))
                    counts.append(1)
            else:                   # ring kinds (2..5)
                rings.append(pxy)
                zs.append(pz)
                if pt in (3,) and counts:   # inner ring joins previous
                    counts[-1] += 1
                else:
                    counts.append(1)
        if not rings:
            return None
        return Geom(MULTIPOLYGON, rings, counts, zs=zs)
    if shape_type in _ZM_BASE:
        # Z/M shapes: the XY layout is the base shape's; Z values (if
        # a ...Z type) follow as zmin,zmax,z[n] right after the XY
        # block; M is parsed past (the engine's model is XY[Z]) —
        # ESRI whitepaper pp. 9-22, shpopen.c SHPReadObject
        base = _ZM_BASE[shape_type]
        has_z = shape_type in (11, 13, 15, 18)
        if base == SHP_POINT:
            g = _shape_to_geom(base, payload)
            if has_z:
                z = np.frombuffer(payload, "<f8", 1, 16)
                g = Geom(g.kind, g.rings, g.poly_ring_counts,
                         zs=[z.astype(np.float64)])
            return g
        if base == SHP_MULTIPOINT:
            g = _shape_to_geom(base, payload)
            if g is not None and has_z:
                n = struct.unpack_from("<i", payload, 32)[0]
                z = np.frombuffer(payload, "<f8", n, 36 + 16 * n + 16)
                g = Geom(g.kind, g.rings, g.poly_ring_counts,
                         zs=[z.astype(np.float64)])
            return g
        nparts, npts = struct.unpack_from("<ii", payload, 32)
        if nparts == 0 or npts == 0:
            return None
        parts = np.frombuffer(payload, "<i4", nparts, 40)
        xy = np.frombuffer(payload, "<f8", 2 * npts,
                           40 + 4 * nparts).reshape(npts, 2)
        z = None
        if has_z:
            zoff = 40 + 4 * nparts + 16 * npts + 16
            z = np.frombuffer(payload, "<f8", npts, zoff)
        bounds = list(parts) + [npts]
        pairs = [(xy[bounds[i]:bounds[i + 1]].astype(np.float64),
                  None if z is None else
                  z[bounds[i]:bounds[i + 1]].astype(np.float64))
                 for i in range(nparts)]
        if base == SHP_POLYLINE:
            kind = LINESTRING if len(pairs) == 1 else MULTILINESTRING
            return Geom(kind, [r for r, _ in pairs],
                        zs=[zv for _, zv in pairs] if has_z else None)
        outers = [p for p in pairs if _ring_area(p[0]) <= 0]
        holes = [p for p in pairs if _ring_area(p[0]) > 0]
        if not outers:
            outers, holes = pairs, []
        groups = [[o] for o in outers]
        for hp in holes:
            hit = next((grp for grp in groups
                        if _point_in_ring(hp[0][0], grp[0][0])),
                       groups[0])
            hit.append(hp)
        flat = [p for grp in groups for p in grp]
        zs = [zv for _, zv in flat] if has_z else None
        if len(groups) == 1:
            return Geom(POLYGON, [r for r, _ in flat],
                        [len(flat)], zs=zs)
        return Geom(MULTIPOLYGON, [r for r, _ in flat],
                    [len(g_) for g_ in groups], zs=zs)
    if shape_type == SHP_POINT:
        xy = np.frombuffer(payload, "<f8", 2).reshape(1, 2)
        return Geom(POINT, [xy.astype(np.float64)])
    if shape_type == SHP_MULTIPOINT:
        n = struct.unpack_from("<i", payload, 32)[0]
        if n == 0:      # emptymultipoint.shp -> null geometry
            return None
        xy = np.frombuffer(payload, "<f8", 2 * n, 36).reshape(n, 2)
        return Geom(MULTIPOINT, [xy.astype(np.float64)])
    if shape_type in (SHP_POLYLINE, SHP_POLYGON):
        nparts, npts = struct.unpack_from("<ii", payload, 32)
        if nparts == 0 or npts == 0:    # emptymulti{line,poly}.shp
            return None
        parts = np.frombuffer(payload, "<i4", nparts, 40)
        xy = np.frombuffer(payload, "<f8", 2 * npts,
                           40 + 4 * nparts).reshape(npts, 2)
        bounds = list(parts) + [npts]
        rings = [xy[bounds[i]:bounds[i + 1]].astype(np.float64)
                 for i in range(nparts)]
        if shape_type == SHP_POLYLINE:
            if len(rings) == 1:
                return Geom(LINESTRING, rings)
            return Geom(MULTILINESTRING, rings)
        # polygon: outer rings are clockwise (negative shoelace)
        outers = [r for r in rings if _ring_area(r) <= 0]
        holes = [r for r in rings if _ring_area(r) > 0]
        if not outers:  # degenerate: treat everything as outers
            outers, holes = rings, []
        groups: list[list[np.ndarray]] = [[o] for o in outers]
        for h in holes:
            hit = next((g for g in groups
                        if _point_in_ring(h[0], g[0])), groups[0])
            hit.append(h)
        if len(groups) == 1:
            return Geom(POLYGON, groups[0], [len(groups[0])])
        flat = [r for g in groups for r in g]
        return Geom(MULTIPOLYGON, flat, [len(g) for g in groups])
    raise NotImplementedError(f"shapefile shape type {shape_type}")


def _geom_to_shape(g: Geom) -> tuple[int, bytes]:
    """Geom -> (shape_type, LE payload after the shape-type int)."""
    if g.kind == POINT:
        return SHP_POINT, g.rings[0].astype("<f8").tobytes()
    if g.kind == MULTIPOINT:
        xy = g.rings[0].astype("<f8")
        return SHP_MULTIPOINT, (_bbox_bytes(g) +
                                struct.pack("<i", len(xy)) + xy.tobytes())
    if g.kind in (LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON):
        rings = list(g.rings)
        if g.kind in (POLYGON, MULTIPOLYGON):
            # enforce shapefile winding: outer CW, holes CCW
            fixed, i = [], 0
            for cnt in (g.poly_ring_counts or [len(rings)]):
                for j in range(cnt):
                    r = rings[i + j]
                    cw = _ring_area(r) <= 0
                    want_cw = j == 0
                    fixed.append(r if cw == want_cw else r[::-1])
                i += cnt
            rings = fixed
            stype = SHP_POLYGON
        else:
            stype = SHP_POLYLINE
        npts = sum(len(r) for r in rings)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        xy = np.concatenate(rings).astype("<f8")
        return stype, (_bbox_bytes(g) +
                       struct.pack("<ii", len(rings), npts) +
                       parts.tobytes() + xy.tobytes())
    raise NotImplementedError(f"cannot write {g.name} to shapefile")


def _bbox_bytes(g: Geom) -> bytes:
    x0, y0, x1, y1 = g.bbox()
    return struct.pack("<4d", x0, y0, x1, y1)


# ----------------------------------------------------------------------- dbf

def _dbf_fields(table: pa.Table) -> list[tuple[str, bytes, int, int]]:
    """(name, type, length, decimals) per attribute column."""
    out = []
    for name in table.column_names:
        if name in ("geometry", "fid") or name.startswith("bbox_"):
            continue
        t = table.schema.field(name).type
        if pa.types.is_integer(t):
            out.append((name, b"N", 18, 0))
        elif pa.types.is_floating(t):
            out.append((name, b"N", 24, 8))
        elif pa.types.is_boolean(t):
            out.append((name, b"L", 1, 0))
        else:
            vals = table[name].to_pylist()
            ln = max([len(str(v).encode()) for v in vals if v is not None],
                     default=1)
            out.append((name, b"C", min(max(ln, 1), 254), 0))
    return out


def _write_dbf(path: str, table: pa.Table,
               fields: list[tuple[str, bytes, int, int]]) -> None:
    nrec = table.num_rows
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 0x03, 95, 1, 1, nrec,
                            hdr_size, rec_size))
        for name, ftype, ln, dec in fields:
            f.write(struct.pack("<11s1B4xBB14x", name.encode()[:10],
                                ftype[0], ln, dec))
        f.write(b"\x0d")
        cols = {n: table[n].to_pylist() for n, *_ in fields}
        for i in range(nrec):
            f.write(b" ")
            for name, ftype, ln, dec in fields:
                v = cols[name][i]
                if ftype == b"L":
                    s = b"?" if v is None else (b"T" if v else b"F")
                elif v is None:
                    s = b" " * ln
                elif ftype == b"N":
                    s = (f"{v:.{dec}f}" if dec else str(int(v))
                         ).encode().rjust(ln)[:ln]
                else:
                    s = str(v).encode()[:ln].ljust(ln)
                f.write(s)
        f.write(b"\x1a")


def _read_dbf_meta(path: str):
    with open(path, "rb") as f:
        hdr = f.read(32)
        nrec, hdr_size, rec_size = struct.unpack_from("<IHH", hdr, 4)
        fields = []
        while True:
            fd = f.read(32)
            if fd[0:1] == b"\x0d" or len(fd) < 32:
                break
            name = fd[:11].split(b"\x00")[0].decode("latin-1")
            fields.append((name, fd[11:12], fd[16], fd[17]))
    return nrec, hdr_size, rec_size, fields


def _read_dbf_rows(path: str, lo: int, hi: int) -> dict[str, list]:
    """Decode dbf records [lo, hi) into per-field python lists."""
    nrec, hdr_size, rec_size, fields = _read_dbf_meta(path)
    hi = min(hi, nrec)
    with open(path, "rb") as f:
        f.seek(hdr_size + lo * rec_size)
        buf = f.read((hi - lo) * rec_size)
    out: dict[str, list] = {n: [] for n, *_ in fields}
    for i in range(hi - lo):
        rec = buf[i * rec_size:(i + 1) * rec_size]
        pos = 1  # deletion flag
        for name, ftype, ln, dec in fields:
            raw = rec[pos:pos + ln]
            pos += ln
            s = raw.decode("ascii", "replace").strip()
            if ftype == b"L":
                out[name].append(None if s in ("?", "") else s in "TtYy")
            elif ftype in (b"N", b"F"):
                if not s or s.strip("*") == "":
                    # all-asterisk = dBase numeric overflow -> NULL
                    out[name].append(None)
                elif dec or ftype == b"F" or "." in s:
                    out[name].append(float(s))
                else:
                    out[name].append(int(s))
            else:
                out[name].append(s if s else None)
    return out


# ----------------------------------------------------------------- .shp/.shx

def write_shapefile(base: str, table: pa.Table) -> None:
    """Engine-shaped Arrow table (WKB ``geometry`` + attributes) ->
    ``base``.shp/.shx/.dbf. All rows must share one shape family."""
    geoms = [None if b is None else wkb_to_geom(b)
             for b in (v.as_py() for v in table["geometry"])]
    shapes = [(SHP_NULL, b"") if g is None else _geom_to_shape(g)
              for g in geoms]
    stype = max((s for s, _ in shapes), default=SHP_POINT)
    if any(s not in (SHP_NULL, stype) for s, _ in shapes):
        raise ValueError("mixed shape types in one shapefile layer")
    live = [g for g in geoms if g is not None]
    if live:
        bb = np.array([g.bbox() for g in live])
        bbox = (bb[:, 0].min(), bb[:, 1].min(), bb[:, 2].max(), bb[:, 3].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    recs, index = [], []
    offset = 50  # header, in 16-bit words
    for i, (st, payload) in enumerate(shapes):
        content = struct.pack("<i", st) + payload
        words = len(content) // 2
        recs.append(struct.pack(">ii", i + 1, words) + content)
        index.append(struct.pack(">ii", offset, words))
        offset += 4 + words
    def header(total_words: int) -> bytes:
        return (struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, total_words)
                + struct.pack("<ii", 1000, stype)
                + struct.pack("<8d", *bbox, 0.0, 0.0, 0.0, 0.0))
    with open(base + ".shp", "wb") as f:
        f.write(header(offset))
        for r in recs:
            f.write(r)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + 4 * len(index)))
        for r in index:
            f.write(r)
    _write_dbf(base + ".dbf", table, _dbf_fields(table))


def _read_shx(base: str) -> np.ndarray:
    """(n, 2) int64 array of (byte offset, byte length) per record."""
    with open(base + ".shx", "rb") as f:
        f.seek(24)
        total_words = struct.unpack(">i", f.read(4))[0]
        f.seek(100)
        raw = np.frombuffer(f.read(total_words * 2 - 100), ">i4")
    return np.stack([raw[0::2].astype(np.int64) * 2,
                     raw[1::2].astype(np.int64) * 2], axis=1)


def _scan_shp_index(base: str) -> np.ndarray:
    """Rebuild the (offset, length) record index by walking .shp
    record headers — the reference regenerates .shx the same way
    when it is absent (shpopen.c SHPRestoreSHX)."""
    with open(base + ".shp", "rb") as f:
        data = f.read()
    idx, off = [], 100
    while off + 8 <= len(data):
        words = struct.unpack_from(">i", data, off + 4)[0]
        if words <= 0 or off + 8 + words * 2 > len(data):
            break
        idx.append((off, words * 2))
        off += 8 + words * 2
    return np.array(idx, np.int64).reshape(-1, 2)


def read_shapefile(base: str, rec_range: tuple[int, int] | None = None,
                   columns: list[str] | None = None) -> pa.Table:
    """``base``{.shp,.shx,.dbf} -> engine-shaped Arrow table (WKB
    ``geometry`` + ``bbox_*`` + ``fid`` + attributes)."""
    base = base[:-4] if base.endswith(".shp") else base
    if os.path.exists(base + ".shx"):
        idx = _read_shx(base)
    else:
        idx = _scan_shp_index(base)     # .shx missing: scan .shp records
    lo, hi = rec_range or (0, len(idx))
    hi = min(hi, len(idx))
    wkbs, bx = [], []
    with open(base + ".shp", "rb") as f:
        for off, ln in idx[lo:hi]:
            f.seek(off + 8)  # skip BE record header
            content = f.read(ln)
            try:
                st = struct.unpack_from("<i", content)[0]
                g = _shape_to_geom(st, content[4:])
            except (ValueError, struct.error):
                # truncated / corrupt record payload: the reference
                # errors per-feature but keeps the layer open — map
                # to a null-geometry row (buggy*.shp fixtures)
                g = None
            if g is None:
                wkbs.append(None)
                bx.append((None,) * 4)
            else:
                wkbs.append(geom_to_wkb(g))
                bx.append(g.bbox())
    data: dict[str, pa.Array] = {
        "fid": pa.array(np.arange(lo, hi, dtype=np.int64) + 1),
        "geometry": pa.array(wkbs, pa.binary()),
    }
    attrs = (_read_dbf_rows(base + ".dbf", lo, hi)
             if os.path.exists(base + ".dbf") else {})
    for name, vals in attrs.items():
        if columns is not None and name not in columns:
            continue
        data[name] = pa.array(vals)
    for j, n in enumerate(("bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax")):
        data[n] = pa.array([b[j] for b in bx], pa.float64())
    return pa.table(data)


def shapefile_dataset(base: str, columns: list[str] | None = None,
                      num_shards: int = 8):
    """Shapefile layer as a Ray Dataset: the driver reads only the
    .shx index (8 bytes/record) to plan record-range shards; tasks
    decode their range in parallel (shared FS on multi-node)."""
    import ray.data

    base = base[:-4] if base.endswith(".shp") else base
    n = len(_read_shx(base))
    if n == 0:
        return ray.data.from_arrow(read_shapefile(base, columns=columns))
    bounds = np.linspace(0, n, min(num_shards, n) + 1).astype(np.int64)
    shards = pa.table({"lo": bounds[:-1], "hi": bounds[1:]})

    def _read(batch: pa.Table) -> pa.Table:
        tables = [read_shapefile(base, (int(a), int(b)), columns)
                  for a, b in zip(batch["lo"].to_pylist(),
                                  batch["hi"].to_pylist())]
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    ds = ray.data.from_arrow(shards).repartition(shards.num_rows)
    return ds.map_batches(_read, batch_format="pyarrow", batch_size=None)
