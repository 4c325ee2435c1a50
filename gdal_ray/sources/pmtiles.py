"""PMTiles v3 single-file tile archive reader (reference
ogr/ogrsf_frmts/pmtiles; the format spec is public:
github.com/protomaps/PMTiles).

Layout: a 127-byte header (magic ``PMTiles`` + version 3, then
little-endian u64 offsets/lengths for the root directory, JSON
metadata, leaf directories and tile data, compression bytes
(1=none, 2=gzip) for directories/metadata and tiles, tile type
(1 = MVT), min/max zoom, bounds).  Directories are gzip'd
varint-encoded column blocks: entry count, delta-coded tile ids,
run lengths, byte lengths, offsets (0 meaning previous offset +
length); entries whose run_length is 0 point at leaf directories.
Tile ids enumerate the zoom pyramid on a Hilbert curve:
``id = (4^z - 1)/3 + hilbert(x, y, z)``.

Tiles are MVT payloads decoded with sources/mvt.py into EPSG:3857
feature tables; the default layer set is the max-zoom level like the
reference."""

from __future__ import annotations

import gzip
import json
import struct

import pyarrow as pa

from .osm import _varint


def _hilbert_d2xy(z: int, d: int) -> tuple[int, int]:
    n = 1 << z
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _tileid_to_zxy(tid: int) -> tuple[int, int, int]:
    z = 0
    acc = 0
    while True:
        n = 1 << (2 * z)
        if tid < acc + n:
            x, y = _hilbert_d2xy(z, tid - acc)
            return z, x, y
        acc += n
        z += 1


def _read_directory(data: bytes):
    """-> list of (tile_id, offset, length, run_length)."""
    pos = 0
    n, pos = _varint(data, pos)
    ids = []
    tid = 0
    for _ in range(n):
        d, pos = _varint(data, pos)
        tid += d
        ids.append(tid)
    runs = []
    for _ in range(n):
        r, pos = _varint(data, pos)
        runs.append(r)
    lengths = []
    for _ in range(n):
        ln, pos = _varint(data, pos)
        lengths.append(ln)
    offsets = []
    last_off = last_len = 0
    for i in range(n):
        o, pos = _varint(data, pos)
        if o == 0 and i > 0:
            off = last_off + last_len
        else:
            off = o - 1
        offsets.append(off)
        last_off, last_len = off, lengths[i]
    return list(zip(ids, offsets, lengths, runs))


class PmtilesFile:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.data = f.read()
        hdr = self.data[:127]
        if hdr[:7] != b"PMTiles" or hdr[7] != 3:
            raise ValueError("not a PMTiles v3 file")
        (self.root_off, self.root_len, self.meta_off, self.meta_len,
         self.leaf_off, self.leaf_len, self.tile_off, self.tile_len) = \
            struct.unpack_from("<8Q", hdr, 8)
        self.n_addressed, self.n_entries, self.n_contents = \
            struct.unpack_from("<3Q", hdr, 72)
        self.clustered = hdr[96]
        self.internal_compression = hdr[97]
        self.tile_compression = hdr[98]
        self.tile_type = hdr[99]
        self.min_zoom = hdr[100]
        self.max_zoom = hdr[101]

    def _maybe_gunzip(self, raw: bytes, compression: int) -> bytes:
        if compression == 2 or raw[:2] == b"\x1f\x8b":
            return gzip.decompress(raw)
        return raw

    @property
    def metadata(self) -> dict:
        raw = self.data[self.meta_off:self.meta_off + self.meta_len]
        if not raw:
            return {}
        return json.loads(self._maybe_gunzip(raw,
                                             self.internal_compression))

    def tiles(self):
        """Yield (z, x, y, payload bytes) for every addressed tile."""
        root = self._maybe_gunzip(
            self.data[self.root_off:self.root_off + self.root_len],
            self.internal_compression)
        stack = [_read_directory(root)]
        while stack:
            entries = stack.pop()
            for tid, off, ln, run in entries:
                if run == 0:
                    leaf = self._maybe_gunzip(
                        self.data[self.leaf_off + off:
                                  self.leaf_off + off + ln],
                        self.internal_compression)
                    stack.append(_read_directory(leaf))
                else:
                    payload = self.data[self.tile_off + off:
                                        self.tile_off + off + ln]
                    payload = self._maybe_gunzip(payload,
                                                 self.tile_compression)
                    for i in range(run):
                        z, x, y = _tileid_to_zxy(tid + i)
                        yield z, x, y, payload


def read_pmtiles(path: str, zoom: int | None = None) -> dict[str, pa.Table]:
    """-> {layer: Arrow table} of the requested (default max) zoom."""
    from .mvt import _parse_tile

    pf = PmtilesFile(path)
    if zoom is None:
        zoom = pf.max_zoom
    merged: dict[str, list] = {}
    for z, x, y, payload in pf.tiles():
        if z != zoom:
            continue
        for lname, rows in _parse_tile(payload, z, x, y, True).items():
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
