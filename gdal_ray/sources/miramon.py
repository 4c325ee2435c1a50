"""MiraMon vector driver (reference ogr/ogrsf_frmts/miramon
mm_rdlayr.c / mm_wrlayr.c; the format is publicly documented by
CREAF).

All files share a 48-byte v1.1 top header (MMReadHeader,
mm_wrlayr.c:154): 3-char type + " 1.1" version + flag byte, bounding
box as minX,maxX,minY,maxY doubles, u32 element count + 4 reserved.

- ``.pnt``: (x, y) double pairs straight after the header;
- ``.arc``: 56-byte arc headers (bbox, n-vertices, file offset,
  first/last node ids, length double) pointing at (x, y) vertex
  runs;
- ``.pol``: an 8-byte-per-arc PS section, then 64-byte polygon
  headers (bbox, n-arcs, n-external-rings, n-rings, PAL offset,
  perimeter, area) whose PAL lists are (VFG flag byte + u32 arc id):
  VFG bit 0x01 exterior side, 0x02 ring end, 0x04 reverse the arc —
  rings chain the referenced ``.arc`` geometry accordingly; polygon
  0 is the universe (skipped like the reference).

Attributes come from the sidecar dBase tables (``<name>T.dbf`` /
``A.dbf`` / ``P.dbf``), read with the engine's dBase reader
(ID_GRAFIC joins by record order)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa


def _read_top_header(data: bytes):
    ftype = data[0:3].decode("ascii")
    version = data[3:5].decode("ascii")
    sub = chr(data[6])
    flag = data[7]
    minx, maxx, miny, maxy = struct.unpack_from("<4d", data, 8)
    count = struct.unpack_from("<I", data, 40)[0]
    return {"type": ftype, "version": version.strip() + "." + sub,
            "flag": flag, "bbox": (minx, miny, maxx, maxy),
            "count": count, "header_size": 48}


def _read_dbf_attrs(path_base: str, suffix: str):
    """MiraMon extended-dBase reader (marker 0x90): standard 32-byte
    descriptors, with >10-char field names stored after the 0x0D
    terminator (per-field extended-name size at descriptor byte 24)
    and boolean 'L' fields."""
    path = None
    for cand in (path_base + suffix + ".dbf", path_base + suffix + ".DBF"):
        if os.path.exists(cand):
            path = cand
    if path is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    nrec = struct.unpack_from("<I", data, 4)[0]
    hdr_size, rec_size = struct.unpack_from("<HH", data, 8)
    fields = []
    p = 32
    while p + 32 <= hdr_size and data[p] != 0x0D:
        name = data[p:p + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(data[p + 11])
        # standard u8 length at rel 16, else the extended u32 at
        # rel 21 (MiraMon reserved_2 area)
        ln = data[p + 16]
        if ln == 0:
            ln = struct.unpack_from("<I", data, p + 21)[0]
        dec = data[p + 17]
        # extended long name: file offset u32 at rel 25, size at 29
        ext_off = struct.unpack_from("<I", data, p + 25)[0]
        ext_len = data[p + 29]
        if ext_off and ext_len:
            name = data[ext_off:ext_off + ext_len].decode("latin-1")
        fields.append([name, ftype, ln, dec, ext_len])
        p += 32
    out = {f[0]: [] for f in fields}
    for i in range(nrec):
        rec = data[hdr_size + i * rec_size:hdr_size + (i + 1) * rec_size]
        pos = 1
        for name, ftype, ln, dec, _e in fields:
            s = rec[pos:pos + ln].decode("latin-1").strip()
            pos += ln
            if ftype == "L":
                out[name].append(None if s in ("?", "") else s in "TtYy")
            elif ftype in ("N", "F"):
                if not s:
                    out[name].append(None)
                elif dec or "." in s:
                    out[name].append(float(s))
                else:
                    out[name].append(int(s))
            else:
                out[name].append(s if s else None)
    return out


def _fmt(v: float) -> str:
    return "%.15g" % v


def read_miramon_pnt(path: str) -> pa.Table:
    with open(path, "rb") as f:
        data = f.read()
    hdr = _read_top_header(data)
    pts = np.frombuffer(data, "<f8", hdr["count"] * 2, 48).reshape(-1, 2)
    wkts = ["POINT (%s %s)" % (_fmt(x), _fmt(y)) for x, y in pts]
    base = os.path.splitext(path)[0]
    attrs = _read_dbf_attrs(base, "T") or {}
    cols = {k: v[:len(wkts)] for k, v in attrs.items()}
    cols["wkt"] = wkts
    return pa.table(cols)


def _read_arcs(path: str):
    with open(path, "rb") as f:
        data = f.read()
    hdr = _read_top_header(data)
    arcs = []
    p = 48
    for _ in range(hdr["count"]):
        bbox = struct.unpack_from("<4d", data, p)
        nelem, offset, n0, n1 = struct.unpack_from("<4I", data, p + 32)
        length = struct.unpack_from("<d", data, p + 48)[0]
        pts = np.frombuffer(data, "<f8", nelem * 2, offset).reshape(-1, 2)
        arcs.append({"pts": pts, "node_ini": n0, "node_fi": n1,
                     "length": length})
        p += 56
    return hdr, arcs


def read_miramon_arc(path: str) -> pa.Table:
    hdr, arcs = _read_arcs(path)
    wkts = ["LINESTRING (%s)" % ",".join(
        "%s %s" % (_fmt(x), _fmt(y)) for x, y in a["pts"]) for a in arcs]
    base = os.path.splitext(path)[0]
    attrs = _read_dbf_attrs(base, "A") or {}
    cols = {k: v[:len(wkts)] for k, v in attrs.items()}
    cols["wkt"] = wkts
    return pa.table(cols)


def read_miramon_pol(path: str) -> pa.Table:
    with open(path, "rb") as f:
        data = f.read()
    hdr = _read_top_header(data)
    base = os.path.splitext(path)[0]
    arc_path = None
    for cand in (base + ".arc", base + ".ARC"):
        if os.path.exists(cand):
            arc_path = cand
    _, arcs = _read_arcs(arc_path)

    # PH records start after the PS section (8 bytes per arc, v1.1)
    p = 48 + 8 * len(arcs)
    polys = []
    for _ in range(hdr["count"]):
        bbox = struct.unpack_from("<4d", data, p)
        narcs, next_rings, nrings, offset = struct.unpack_from(
            "<4I", data, p + 32)
        perimeter, area = struct.unpack_from("<2d", data, p + 48)
        polys.append({"narcs": narcs, "nrings": nrings,
                      "offset": offset, "perimeter": perimeter,
                      "area": area})
        p += 64

    wkts = []
    for i, ph in enumerate(polys):
        if i == 0:
            continue  # universe polygon
        rings = []
        ring_pts: list = []
        q = ph["offset"]
        for _ in range(ph["narcs"]):
            vfg = data[q]
            arc_id = struct.unpack_from("<I", data, q + 1)[0]
            q += 5
            pts = arcs[arc_id]["pts"]
            if vfg & 0x04:  # reverse
                pts = pts[::-1]
            if ring_pts and tuple(ring_pts[-1]) == tuple(pts[0]):
                ring_pts.extend(map(tuple, pts[1:]))
            else:
                ring_pts.extend(map(tuple, pts))
            if vfg & 0x02:  # ring end
                if ring_pts[0] != ring_pts[-1]:
                    ring_pts.append(ring_pts[0])
                rings.append(ring_pts)
                ring_pts = []
        if ring_pts:
            if ring_pts[0] != ring_pts[-1]:
                ring_pts.append(ring_pts[0])
            rings.append(ring_pts)
        wkts.append("POLYGON (%s)" % ",".join(
            "(%s)" % ",".join("%s %s" % (_fmt(x), _fmt(y)) for x, y in r)
            for r in rings))

    attrs = _read_dbf_attrs(base, "P") or {}
    # P table row 0 is the universe polygon's record
    cols = {k: v[1:1 + len(wkts)] for k, v in attrs.items()}
    cols["wkt"] = wkts
    return pa.table(cols)


def read_miramon(path: str) -> pa.Table:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pnt":
        return read_miramon_pnt(path)
    if ext == ".arc":
        return read_miramon_arc(path)
    if ext == ".pol":
        return read_miramon_pol(path)
    raise ValueError(f"not a MiraMon vector file: {path}")
