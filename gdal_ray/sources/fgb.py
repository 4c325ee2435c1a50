"""FlatGeobuf reader/writer (pure Python, no flatbuffers dependency).

Third real vector file format. File layout per the published FGB spec
and the reference driver (`ogr/ogrsf_frmts/flatgeobuf/`):

- 8 magic bytes 66 67 62 03 66 67 62 00 ("fgb", version 3,
  ogrflatgeobufdataset.cpp:44),
- size-prefixed flatbuffer **Header** (name, envelope, geometry_type,
  columns, features_count, index_node_size — vtable slots per
  header_generated.h:521-534),
- optional **packed Hilbert R-tree**: numNodes 40-byte NodeItem
  records (4 doubles + uint64 offset, packedrtree.h:35), levels
  stored root-first, leaves last, built bottom-up with node fan-out
  ``index_node_size`` (generateLevelBounds / generateNodes,
  packedrtree.cpp); leaf offsets are feature byte offsets relative to
  the feature section; items Hilbert-sorted on a 16-bit grid over the
  extent (packedrtree.cpp hilbert(), ported below),
- size-prefixed flatbuffer **Feature**s (geometry table with
  ends/xy/type/parts per feature_generated.h:32-39; properties as a
  (uint16 column-index, value) byte stream per
  ogrflatgeobuflayer.cpp:1187-1368).

The flatbuffers wire format (uoffset/soffset/vtable) is implemented
from the published format spec: a table starts with an int32 pointing
back to its vtable (uint16 vtable size, uint16 table size, uint16
field offsets per even slot id); strings/vectors are uint32-length-
prefixed payloads referenced by forward uint32 offsets.

Scale path: ``fgb_dataset`` reads the header + R-tree leaf offsets on
the driver (one bounded read: 40 bytes per feature), optionally prunes
leaves against a bbox THROUGH the index, then fans feature-range
decodes out as a Ray Dataset — feature flatbuffer parse + WKB encode
(the expensive part) run distributed, exactly like the GPKG/GeoJSONSeq
readers. Unindexed files fall back to one sequential scan of the
size prefixes on the driver (metadata-only) to plan ranges.
"""

from __future__ import annotations

import os
import struct

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

MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00])

# ColumnType (header_generated.h:107-125)
CT_BOOL, CT_INT, CT_LONG, CT_DOUBLE, CT_STRING = 2, 5, 7, 10, 11
# full ColumnType enum (flatgeobuf header.fbs)
CT_BYTE, CT_UBYTE, CT_SHORT, CT_USHORT = 0, 1, 3, 4
CT_UINT, CT_ULONG, CT_FLOAT, CT_JSON = 6, 8, 9, 12
CT_DATETIME, CT_BINARY = 13, 14

_ARROW_TO_CT = {
    pa.bool_(): CT_BOOL, pa.int32(): CT_INT, pa.int64(): CT_LONG,
    pa.float64(): CT_DOUBLE, pa.string(): CT_STRING,
}
_CT_TO_ARROW = {v: k for k, v in _ARROW_TO_CT.items()}
# read-side types for the rest of the enum (OGR's width promotions:
# ULong falls back to Real like OGRFieldDefn, ogr_flatgeobuf.py
# test_ogr_flatgeobuf_alldatatypes expects float(2**64-1))
_CT_TO_ARROW.update({
    CT_BYTE: pa.int32(), CT_UBYTE: pa.int32(), CT_SHORT: pa.int32(),
    CT_USHORT: pa.int32(), CT_UINT: pa.int64(), CT_ULONG: pa.float64(),
    CT_FLOAT: pa.float32(), CT_JSON: pa.string(),
    CT_DATETIME: pa.string(), CT_BINARY: pa.binary(),
})


def _norm_fgb_datetime(v: str) -> str:
    """OGR datetime normalization ('2019/10/15 12:34:56.789+00')."""
    v = v.replace("-", "/").replace("T", " ")
    if v.endswith("Z"):
        v = v[:-1] + "+00"
    return v


# ===================================================== minimal flatbuffers

class _FB:
    """Back-to-front flatbuffer builder (offsets measured from the
    buffer END, like the official builders; children written before
    parents so uoffsets stay forward/unsigned)."""

    def __init__(self):
        self.b = bytearray()

    def _pad_for(self, size: int, align: int) -> None:
        pad = (-(len(self.b) + size)) % align
        if pad:
            self.b[:0] = b"\x00" * pad

    def vector(self, fmt: str, items, elem_size: int, elem_align: int) -> int:
        data = struct.pack(f"<{len(items)}{fmt}", *items)
        self._pad_for(len(data), max(elem_align, 4))
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", len(items))
        return len(self.b)

    def offset_vector(self, offsets: list[int]) -> int:
        """Vector of uoffsets to already-written tables."""
        self._pad_for(4 * len(offsets), 4)
        for off in reversed(offsets):
            rel = (len(self.b) + 4) - off
            self.b[:0] = struct.pack("<I", rel)
        self.b[:0] = struct.pack("<I", len(offsets))
        return len(self.b)

    def string(self, s: str) -> int:
        data = s.encode() + b"\x00"
        self._pad_for(len(data), 4)
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", len(s.encode()))
        return len(self.b)

    def byte_vector(self, data: bytes) -> int:
        self._pad_for(len(data), 4)
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", len(data))
        return len(self.b)

    def table(self, fields: list[tuple]) -> int:
        """fields: (slot, kind, value) with kind one of
        'offset' (value = child offset-from-end) or a struct format
        char ('B','H','I','Q','d','b'...). Written in given order
        (callers list big-alignment fields first)."""
        obj_end = len(self.b)
        pos = {}
        for slot, kind, value in fields:
            if kind == "offset":
                self._pad_for(4, 4)
                rel = (len(self.b) + 4) - value
                self.b[:0] = struct.pack("<I", rel)
            else:
                size = struct.calcsize(kind)
                self._pad_for(size, size)
                self.b[:0] = struct.pack("<" + kind, value)
            pos[slot] = len(self.b)
        # soffset placeholder at table start (align 4)
        self._pad_for(4, 4)
        self.b[:0] = b"\x00" * 4
        table_start = len(self.b)
        max_slot = max(pos) if pos else 2
        n_slots = (max_slot - 4) // 2 + 1 if pos else 0
        vt = [4 + 2 * n_slots, table_start - obj_end]
        for slot in range(4, max_slot + 1, 2):
            vt.append(table_start - pos[slot] if slot in pos else 0)
        self._pad_for(2 * len(vt), 2)
        self.b[:0] = struct.pack(f"<{len(vt)}H", *vt)
        vt_start = len(self.b)
        soff = vt_start - table_start  # vtable_pos = table_pos - soffset
        i = len(self.b) - table_start
        self.b[i:i + 4] = struct.pack("<i", soff)
        return table_start

    def finish(self, root: int, size_prefixed: bool = True) -> bytes:
        self._pad_for(4, 8)  # keep 8-byte payloads 8-aligned end-relative
        rel = (len(self.b) + 4) - root
        self.b[:0] = struct.pack("<I", rel)
        out = bytes(self.b)
        return struct.pack("<I", len(out)) + out if size_prefixed else out


class _FBTable:
    """Reader for one flatbuffer table."""

    __slots__ = ("buf", "pos", "vt", "vt_size")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        soff = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soff
        self.vt_size = struct.unpack_from("<H", buf, self.vt)[0]

    def _field(self, slot: int) -> int:
        if slot + 2 > self.vt_size:
            return 0
        return struct.unpack_from("<H", self.buf, self.vt + slot)[0]

    def scalar(self, slot: int, fmt: str, default):
        off = self._field(slot)
        if off == 0:
            return default
        return struct.unpack_from("<" + fmt, self.buf, self.pos + off)[0]

    def _indirect(self, slot: int) -> int | None:
        off = self._field(slot)
        if off == 0:
            return None
        p = self.pos + off
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, slot: int) -> str | None:
        t = self._indirect(slot)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        return self.buf[t + 4:t + 4 + n].decode()

    def vector(self, slot: int, fmt: str, size: int):
        t = self._indirect(slot)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        return np.frombuffer(self.buf, dtype=np.dtype(fmt).newbyteorder("<"),
                             count=n, offset=t + 4)

    def bytes_vector(self, slot: int) -> bytes | None:
        t = self._indirect(slot)
        if t is None:
            return None
        n = struct.unpack_from("<I", self.buf, t)[0]
        return self.buf[t + 4:t + 4 + n]

    def table_vector(self, slot: int) -> list["_FBTable"]:
        t = self._indirect(slot)
        if t is None:
            return []
        n = struct.unpack_from("<I", self.buf, t)[0]
        out = []
        for i in range(n):
            p = t + 4 + 4 * i
            out.append(_FBTable(self.buf, p + struct.unpack_from("<I", self.buf, p)[0]))
        return out

    def table(self, slot: int) -> "_FBTable | None":
        t = self._indirect(slot)
        return None if t is None else _FBTable(self.buf, t)


def _root(buf: bytes) -> _FBTable:
    return _FBTable(buf, struct.unpack_from("<I", buf, 0)[0])


# ===================================================== geometry <-> FGB

def _geom_to_fb(fb: _FB, g: Geom) -> int:
    """Geom -> FGB Geometry table offset. ends are cumulative POINT
    counts; single-ring polygons omit ends (geometrywriter.cpp:84-95);
    MultiPolygon nests Polygon parts (:99-104)."""
    if g.kind == MULTIPOLYGON:
        parts = []
        i = 0
        for cnt in g.poly_ring_counts:
            parts.append(_geom_to_fb(
                fb, Geom(POLYGON, g.rings[i:i + cnt], [cnt])))
            i += cnt
        pv = fb.offset_vector(parts)
        return fb.table([(18, "offset", pv), (16, "B", MULTIPOLYGON)])
    xy = np.concatenate([r.ravel() for r in g.rings])
    fields = []
    if g.kind in (POLYGON, MULTILINESTRING) and len(g.rings) > 1:
        ends = np.cumsum([len(r) for r in g.rings]).astype(np.uint32)
        ev = fb.vector("I", ends.tolist(), 4, 4)
        fields.append((4, "offset", ev))
    xv = fb.vector("d", xy.tolist(), 8, 8)
    fields.append((6, "offset", xv))
    fields.append((16, "B", g.kind))
    return fb.table(fields)


def _fb_to_geom(t: _FBTable, kind_hint: int = 0) -> Geom:
    kind = t.scalar(16, "B", 0) or kind_hint
    if kind == MULTIPOLYGON:
        rings, counts = [], []
        for part in t.table_vector(18):
            pg = _fb_to_geom(part, POLYGON)
            rings.extend(pg.rings)
            counts.append(len(pg.rings))
        return Geom(MULTIPOLYGON, rings, counts)
    xy = t.vector(6, "f8", 8)
    pts = xy.reshape(-1, 2).astype(np.float64)
    ends = t.vector(4, "u4", 4)
    if ends is None or len(ends) == 0:
        rings = [pts]
    else:
        rings, prev = [], 0
        for e in ends:
            rings.append(pts[prev:int(e)])
            prev = int(e)
    if kind == POLYGON:
        return Geom(POLYGON, rings, [len(rings)])
    return Geom(kind, rings)


# ===================================================== properties codec

def _encode_props(row: dict, cols: list[tuple[str, int]]) -> bytes:
    out = bytearray()
    for i, (name, ct) in enumerate(cols):
        v = row[name]
        if v is None:
            continue
        out += struct.pack("<H", i)
        if ct == CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ct == CT_INT:
            out += struct.pack("<i", int(v))
        elif ct == CT_LONG:
            out += struct.pack("<q", int(v))
        elif ct == CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ct == CT_STRING:
            enc = str(v).encode()
            out += struct.pack("<I", len(enc)) + enc
        else:
            raise ValueError(f"unsupported FGB column type {ct}")
    return bytes(out)


def _decode_props(data: bytes, cols: list[tuple[str, int]]) -> dict:
    out: dict = {}
    off = 0
    n = len(data)
    while off + 2 <= n:
        (i,) = struct.unpack_from("<H", data, off)
        off += 2
        name, ct = cols[i]
        if ct == CT_BOOL:
            out[name] = bool(data[off]); off += 1
        elif ct == CT_INT:
            (out[name],) = struct.unpack_from("<i", data, off); off += 4
        elif ct == CT_LONG:
            (out[name],) = struct.unpack_from("<q", data, off); off += 8
        elif ct == CT_DOUBLE:
            (out[name],) = struct.unpack_from("<d", data, off); off += 8
        elif ct in (CT_STRING, CT_JSON, CT_DATETIME):
            (ln,) = struct.unpack_from("<I", data, off); off += 4
            s = data[off:off + ln].decode(); off += ln
            out[name] = _norm_fgb_datetime(s) if ct == CT_DATETIME else s
        elif ct == CT_BINARY:
            (ln,) = struct.unpack_from("<I", data, off); off += 4
            out[name] = data[off:off + ln]; off += ln
        elif ct == CT_BYTE:
            (out[name],) = struct.unpack_from("<b", data, off); off += 1
        elif ct == CT_UBYTE:
            out[name] = data[off]; off += 1
        elif ct == CT_SHORT:
            (out[name],) = struct.unpack_from("<h", data, off); off += 2
        elif ct == CT_USHORT:
            (out[name],) = struct.unpack_from("<H", data, off); off += 2
        elif ct == CT_UINT:
            (out[name],) = struct.unpack_from("<I", data, off); off += 4
        elif ct == CT_ULONG:
            (v,) = struct.unpack_from("<Q", data, off); off += 8
            out[name] = float(v)
        elif ct == CT_FLOAT:
            (out[name],) = struct.unpack_from("<f", data, off); off += 4
        else:
            raise ValueError(f"unsupported FGB column type {ct}")
    return out


# ===================================================== packed Hilbert R-tree

NODE_BYTES = 40  # 4 doubles + uint64 (packedrtree.h:35)
HILBERT_MAX = (1 << 16) - 1


def _hilbert_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 16-bit Hilbert d-index (packedrtree.cpp hilbert(),
    the flatbush fast path)."""
    x = x.astype(np.uint32); y = y.astype(np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1); B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = C ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = D ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = C ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = D ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = D ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
                  (1, 0x55555555)):
        i0 = (i0 | (i0 << sh)) & np.uint32(m)
        i1 = (i1 | (i1 << sh)) & np.uint32(m)
    return (i1 << 1) | i0


def hilbert_order(bx0, by0, bx1, by1) -> np.ndarray:
    """Sort order of bbox items along the Hilbert curve over their
    extent (descending, matching hilbertSort, packedrtree.h:93-110)."""
    minx, miny = bx0.min(), by0.min()
    w = max(bx1.max() - minx, 1e-300)
    h = max(by1.max() - miny, 1e-300)
    hx = np.floor(HILBERT_MAX * ((bx0 + bx1) / 2 - minx) / w)
    hy = np.floor(HILBERT_MAX * ((by0 + by1) / 2 - miny) / h)
    hv = _hilbert_u32(hx.astype(np.uint32), hy.astype(np.uint32))
    return np.argsort(-hv.astype(np.int64), kind="stable")


def _level_bounds(num_items: int, node_size: int) -> list[tuple[int, int]]:
    """generateLevelBounds (packedrtree.cpp): per-level [start, end)
    node ranges, leaves first in the list, root-first in storage."""
    level_num = [num_items]
    n = num_items
    while True:   # do-while: a single item still gets a root level
        n = -(-n // node_size)
        level_num.append(n)
        if n == 1:
            break
    total = sum(level_num)
    bounds, acc = [], total
    for sz in level_num:
        acc -= sz
        bounds.append((acc, acc + sz))
    return bounds


def build_packed_rtree(leaf_boxes: np.ndarray, leaf_offsets: np.ndarray,
                       node_size: int = 16) -> bytes:
    """leaf_boxes (n,4) Hilbert-sorted, leaf_offsets feature byte
    offsets -> packed tree bytes (root-first node array)."""
    bounds = _level_bounds(len(leaf_boxes), node_size)
    total = bounds[0][1]
    nodes = np.zeros((total, 4), np.float64)
    offs = np.zeros(total, np.uint64)
    lo, hi = bounds[0]
    nodes[lo:hi] = leaf_boxes
    offs[lo:hi] = leaf_offsets
    for lev in range(len(bounds) - 1):
        pos, end = bounds[lev]
        newpos = bounds[lev + 1][0]
        while pos < end:
            j = min(pos + node_size, end)
            nodes[newpos, 0] = nodes[pos:j, 0].min()
            nodes[newpos, 1] = nodes[pos:j, 1].min()
            nodes[newpos, 2] = nodes[pos:j, 2].max()
            nodes[newpos, 3] = nodes[pos:j, 3].max()
            offs[newpos] = pos  # first-child node index (generateNodes)
            newpos += 1
            pos = j
    out = bytearray()
    for i in range(total):
        out += struct.pack("<4dQ", *nodes[i], int(offs[i]))
    return bytes(out)


def rtree_size(num_items: int, node_size: int) -> int:
    return _level_bounds(num_items, node_size)[0][1] * NODE_BYTES


def read_rtree_leaves(tree: bytes, num_items: int, node_size: int,
                      bbox: tuple | None = None) -> np.ndarray:
    """Leaf feature offsets, optionally only those whose box intersects
    ``bbox`` — the reader-side use of the index (packedrtree.cpp
    streamSearch semantics, evaluated vectorized on the leaf level)."""
    bounds = _level_bounds(num_items, node_size)
    lo, hi = bounds[0]
    rec = np.frombuffer(tree, dtype=np.dtype(
        [("x0", "<f8"), ("y0", "<f8"), ("x1", "<f8"), ("y1", "<f8"),
         ("off", "<u8")]))
    leaves = rec[lo:hi]
    if bbox is None:
        return leaves["off"].astype(np.int64)
    x0, y0, x1, y1 = bbox
    m = ((leaves["x0"] <= x1) & (leaves["x1"] >= x0)
         & (leaves["y0"] <= y1) & (leaves["y1"] >= y0))
    return leaves["off"][m].astype(np.int64)


# ===================================================== writer

_LAYER_COLS = ("fid", "geometry", "bbox_xmin", "bbox_ymin",
               "bbox_xmax", "bbox_ymax")


def write_fgb(path: str, table: pa.Table, name: str = "layer",
              index_node_size: int = 16) -> None:
    """OGR-layer-shaped Arrow table -> .fgb. Features are Hilbert-
    sorted and a packed R-tree is written unless index_node_size=0."""
    cols: list[tuple[str, int]] = []
    for f in table.schema:
        if f.name in _LAYER_COLS:
            continue
        if f.type not in _ARROW_TO_CT:
            continue  # like the GPKG writer: unsupported types skipped
        cols.append((f.name, _ARROW_TO_CT[f.type]))

    geoms = [wkb_to_geom(w) for w in table["geometry"].to_pylist()]
    kinds = {g.kind for g in geoms}
    gtype = kinds.pop() if len(kinds) == 1 else 0  # Unknown if mixed

    boxes = np.array([g.bbox() for g in geoms], np.float64).reshape(-1, 4)
    rows = table.to_pylist()
    order = (hilbert_order(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
             if index_node_size else np.arange(len(rows)))

    feats, sizes = [], []
    for i in order:
        fb = _FB()
        g_off = _geom_to_fb(fb, geoms[i])
        props = _encode_props(rows[i], cols)
        fields = [(4, "offset", g_off)]
        if props:
            fields.append((6, "offset", fb.byte_vector(props)))
        buf = fb.finish(fb.table(fields))
        feats.append(buf)
        sizes.append(len(buf))

    # header
    hb = _FB()
    col_offs = []
    for cname, ct in cols:
        n_off = hb.string(cname)
        col_offs.append(hb.table([(4, "offset", n_off), (6, "B", ct)]))
    cols_vec = hb.offset_vector(col_offs)
    env = hb.vector("d", [float(boxes[:, 0].min()), float(boxes[:, 1].min()),
                          float(boxes[:, 2].max()), float(boxes[:, 3].max())],
                    8, 8)
    name_off = hb.string(name)
    header = hb.finish(hb.table([
        (20, "Q", len(rows)),        # features_count
        (6, "offset", env),          # envelope
        (18, "offset", cols_vec),    # columns
        (4, "offset", name_off),     # name
        (8, "B", gtype),             # geometry_type
        (22, "H", index_node_size),  # index_node_size (0 = no index)
    ]))

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        if index_node_size:
            offsets = np.zeros(len(feats), np.int64)
            acc = 0
            for i, s in enumerate(sizes):
                offsets[i] = acc
                acc += s
            f.write(build_packed_rtree(boxes[order], offsets,
                                       index_node_size))
        for buf in feats:
            f.write(buf)


# ===================================================== reader

def _read_header(f) -> dict:
    if f.read(8) != MAGIC:
        raise ValueError("not a FlatGeobuf file (bad magic)")
    (hsize,) = struct.unpack("<I", f.read(4))
    hdr = _root(f.read(hsize))
    cols = [(c.string(4), c.scalar(6, "B", 0)) for c in hdr.table_vector(18)]
    return {
        "name": hdr.string(4),
        "envelope": (None if hdr.vector(6, "f8", 8) is None
                     else tuple(hdr.vector(6, "f8", 8))),
        "geometry_type": hdr.scalar(8, "B", 0),
        "columns": cols,
        "features_count": hdr.scalar(20, "Q", 0),
        "index_node_size": hdr.scalar(22, "H", 16),
        "feature_base": 12 + hsize,  # + index size if indexed
    }


def read_fgb_info(path: str) -> dict:
    with open(path, "rb") as f:
        info = _read_header(f)
    if info["index_node_size"]:
        info["index_size"] = rtree_size(info["features_count"],
                                        info["index_node_size"])
    else:
        info["index_size"] = 0
    info["feature_base"] += info["index_size"]
    return info


def _decode_features(buf: bytes, cols, fid_start: int,
                     columns: list[str] | None,
                     geom_type: int = 0) -> pa.Table:
    """Concatenated size-prefixed feature buffers -> layer table."""
    want_geom = columns is None or "geometry" in columns
    names = [n for n, _ in cols]
    keep = names if columns is None else [n for n in names if n in columns]
    out: dict[str, list] = {n: [] for n in keep}
    fids, wkbs = [], []
    bx0, by0, bx1, by1 = [], [], [], []
    off, n = 0, len(buf)
    i = fid_start
    while off + 4 <= n:
        (fsize,) = struct.unpack_from("<I", buf, off)
        feat = _root(buf[off + 4:off + 4 + fsize])
        off += 4 + fsize
        gt = feat.table(4)
        g = _fb_to_geom(gt, geom_type) if gt is not None else None
        props = _decode_props(feat.bytes_vector(6) or b"", cols)
        for k in keep:
            out[k].append(props.get(k))
        fids.append(i)
        i += 1
        if want_geom:
            wkbs.append(geom_to_wkb(g) if g is not None else b"")
        if g is not None and len(g.rings) and len(g.rings[0]):
            xmin, ymin, xmax, ymax = g.bbox()
        else:
            xmin = ymin = xmax = ymax = float("nan")
        bx0.append(xmin); by0.append(ymin); bx1.append(xmax); by1.append(ymax)
    res: dict = {"fid": pa.array(fids, pa.int64())}
    if want_geom:
        res["geometry"] = pa.array(wkbs, pa.binary())
    for k in keep:
        ct = dict(cols)[k]
        res[k] = pa.array(out[k], _CT_TO_ARROW[ct])
    res["bbox_xmin"] = pa.array(bx0, pa.float64())
    res["bbox_ymin"] = pa.array(by0, pa.float64())
    res["bbox_xmax"] = pa.array(bx1, pa.float64())
    res["bbox_ymax"] = pa.array(by1, pa.float64())
    return pa.table(res)


def read_fgb(path: str, columns: list[str] | None = None,
             bbox: tuple | None = None) -> pa.Table:
    """Whole-file read (driver-side; use fgb_dataset for scale). fid is
    the storage order (Hilbert order when indexed), matching the
    reference's FID semantics for unsorted readbacks."""
    info = read_fgb_info(path)
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if bbox is not None and info["index_size"]:
            f.seek(info["feature_base"] - info["index_size"])
            tree = f.read(info["index_size"])
            offs = np.sort(read_rtree_leaves(
                tree, info["features_count"], info["index_node_size"], bbox))
            tabs = []
            for o in offs:
                f.seek(info["feature_base"] + int(o))
                (fsize,) = struct.unpack("<I", f.read(4))
                f.seek(-4, 1)
                buf = f.read(4 + fsize)
                tabs.append(_decode_features(buf, info["columns"], 0, columns,
                                             info["geometry_type"]))
            if not tabs:
                return _decode_features(b"", info["columns"], 0, columns)
            t = pa.concat_tables(tabs)
            return t.set_column(0, "fid", pa.array(range(len(t)), pa.int64()))
        f.seek(info["feature_base"])
        buf = f.read(size - info["feature_base"])
    t = _decode_features(buf, info["columns"], 0, columns,
                         info["geometry_type"])
    if bbox is not None:
        # no index: full scan + bbox intersect (the reference's
        # unindexed SetSpatialFilterRect path)
        x0, y0, x1, y1 = bbox
        m = ((t["bbox_xmax"].to_numpy(zero_copy_only=False) >= x0) &
             (t["bbox_xmin"].to_numpy(zero_copy_only=False) <= x1) &
             (t["bbox_ymax"].to_numpy(zero_copy_only=False) >= y0) &
             (t["bbox_ymin"].to_numpy(zero_copy_only=False) <= y1))
        t = t.filter(pa.array(m))
    return t


def fgb_dataset(path: str, columns: list[str] | None = None,
                bbox: tuple | None = None, num_shards: int = 8):
    """.fgb -> Ray Dataset. The driver reads header + R-tree leaf
    offsets only (40 B/feature); feature decode fans out per shard.
    ``bbox`` prunes shards through the packed index before any feature
    byte is read."""
    import ray
    import ray.data

    info = read_fgb_info(path)
    size = os.path.getsize(path)
    n_feat = info["features_count"]
    if info["index_size"]:
        with open(path, "rb") as f:
            f.seek(info["feature_base"] - info["index_size"])
            tree = f.read(info["index_size"])
        offs = np.sort(read_rtree_leaves(
            tree, n_feat, info["index_node_size"], bbox))
    else:  # sequential size-prefix scan (metadata-only)
        offs = np.zeros(n_feat, np.int64)
        with open(path, "rb") as f:
            f.seek(info["feature_base"])
            acc = 0
            for i in range(n_feat):
                offs[i] = acc
                (fsize,) = struct.unpack("<I", f.read(4))
                acc += 4 + fsize
                f.seek(fsize, 1)
    if len(offs) == 0:
        import ray.data
        return ray.data.from_arrow(
            _decode_features(b"", info["columns"], 0, columns))

    ends = np.append(offs[1:], size - info["feature_base"]) if bbox is None \
        else None
    num_shards = max(1, min(num_shards, len(offs)))
    shard_ix = np.array_split(np.arange(len(offs)), num_shards)
    shards = []
    for ix in shard_ix:
        if len(ix) == 0:
            continue
        if bbox is None:
            lo = int(offs[ix[0]])
            hi = int(ends[ix[-1]])
            shards.append({"path": path, "ranges": [[lo, hi]],
                           "fid0": int(ix[0])})
        else:
            shards.append({"path": path,
                           "ranges": [[int(offs[i]), -1] for i in ix],
                           "fid0": int(ix[0])})

    cols = info["columns"]
    base = info["feature_base"]

    def load(batch: pa.Table) -> pa.Table:
        tabs = []
        for row in batch.to_pylist():
            with open(row["path"], "rb") as f:
                bufs = []
                for lo, hi in row["ranges"]:
                    if hi < 0:
                        f.seek(base + lo)
                        (fsize,) = struct.unpack("<I", f.read(4))
                        f.seek(-4, 1)
                        bufs.append(f.read(4 + fsize))
                    else:
                        f.seek(base + lo)
                        bufs.append(f.read(hi - lo))
            tabs.append(_decode_features(b"".join(bufs), cols,
                                         row["fid0"], columns))
        return pa.concat_tables(tabs, promote_options="default")

    return (ray.data.from_items(shards, override_num_blocks=len(shards))
            .map_batches(load, batch_format="pyarrow", batch_size=1))
