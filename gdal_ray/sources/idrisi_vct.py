"""Idrisi vector (.vct/.vdc) reader (reference
ogr/ogrsf_frmts/idrisi/ogridrisilayer.cpp, ogridrisidatasource.cpp;
conformance autotest/ogr/ogr_idrisi.py).

Layout: 1 type byte, uint32-LE feature count, data at 0x105
(ogridrisilayer.cpp ResetReading). Per feature:
- point:   id f8, x f8, y f8                        (:262-292)
- line:    id f8, minX maxX minY maxY f8, nNodes u4, (x,y) f8 pairs
- polygon: id f8, bbox f8 x4, nParts u4, nTotalNodes u4,
           per-part node counts u4[nParts], all (x,y) pairs — first
           part is the shell, the rest holes (:388-520)

The .vdc documents the object type / extent / ref. system; the
optional .adc ("IDRISI Values A.1") declares attribute fields whose
tab-separated values live in the .avl, joined positionally with the
binary ids (Detect_AVL_ADC / ReadAVLLine)."""
from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import (LINESTRING, POINT, POLYGON, Geom,
                             geom_to_wkb)


def _read_vdc(path: str) -> dict[str, str]:
    out = {}
    with open(path, encoding="latin-1") as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                out[k.strip()] = v.strip()
    return out


def _sidecar(path: str, ext: str) -> str | None:
    base = os.path.splitext(path)[0]
    for e in (ext, ext.upper()):
        p = base + "." + e
        if os.path.exists(p):
            return p
    return None


def _utm_params(ref: str) -> dict | None:
    """'utm-31n' -> Transverse Mercator parameters (the reference's
    .ref lookup for the builtin UTM systems)."""
    import re

    m = re.match(r"^utm-(\d+)([ns])$", ref.strip().lower())
    if not m:
        return None
    zone, hemi = int(m.group(1)), m.group(2)
    return {
        "projection": "Transverse_Mercator",
        "latitude_of_origin": 0.0,
        "central_meridian": zone * 6 - 183,
        "scale_factor": 0.9996,
        "false_easting": 500000.0,
        "false_northing": 0.0 if hemi == "n" else 10000000.0,
        "epsg": (32600 if hemi == "n" else 32700) + zone,
    }


def _read_avl_adc(path: str):
    """-> (field_defs, rows) or (None, None); field 0 must be an
    integer ID (Detect_AVL_ADC)."""
    adc = _sidecar(path, "adc")
    avl = _sidecar(path, "avl")
    if adc is None or avl is None:
        return None, None
    kv = _read_vdc(adc)
    if kv.get("file format") != "IDRISI Values A.1":
        return None, None
    try:
        nfields = int(kv.get("fields", ""))
    except ValueError:
        return None, None
    # the .adc repeats "data type" per field; re-scan pairwise
    defs: list[tuple[str, str]] = []
    cur_name = None
    with open(adc, encoding="latin-1") as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = (s.strip() for s in line.split(":", 1))
            if k.startswith("field "):
                cur_name = v
            elif k == "data type" and cur_name is not None:
                defs.append((cur_name, v))
                cur_name = None
    if len(defs) != nfields or not defs or defs[0][1] != "integer":
        return None, None
    rows = []
    with open(avl, encoding="latin-1") as f:
        for line in f:
            line = line.rstrip("\n\r")
            if line:
                rows.append(line.split("\t"))
    return defs, rows


def read_vct(path: str) -> dict:
    """-> {'table': pa.Table (fid, geometry, id, AVL fields...),
    'geom_type', 'extent', 'ref_system', 'srs' (UTM params or None)}"""
    vdc = _sidecar(path, "vdc")
    meta = _read_vdc(vdc) if vdc else {}
    obj_type = meta.get("object type", "point").lower()
    data = open(path, "rb").read()
    count = struct.unpack_from("<I", data, 1)[0]
    pos = 0x105

    ids: list[float] = []
    wkbs: list[bytes] = []
    if obj_type == "point":
        for _ in range(count):
            did, x, y = struct.unpack_from("<3d", data, pos)
            pos += 24
            ids.append(did)
            wkbs.append(geom_to_wkb(
                Geom(POINT, [np.array([[x, y]], np.float64)])))
    elif obj_type == "line":
        for _ in range(count):
            vals = struct.unpack_from("<5d", data, pos)
            pos += 40
            (n,) = struct.unpack_from("<I", data, pos)
            pos += 4
            pts = np.frombuffer(data, "<f8", n * 2, pos).reshape(-1, 2)
            pos += n * 16
            ids.append(vals[0])
            wkbs.append(geom_to_wkb(Geom(LINESTRING, [pts.copy()])))
    elif obj_type in ("polygon", "poly"):
        for _ in range(count):
            vals = struct.unpack_from("<5d", data, pos)
            pos += 40
            nparts, ntotal = struct.unpack_from("<2I", data, pos)
            pos += 8
            counts = np.frombuffer(data, "<u4", nparts, pos)
            pos += 4 * nparts
            pts = np.frombuffer(data, "<f8", ntotal * 2,
                                pos).reshape(-1, 2)
            pos += ntotal * 16
            rings, off = [], 0
            for c in counts:
                rings.append(pts[off:off + c].copy())
                off += int(c)
            ids.append(vals[0])
            wkbs.append(geom_to_wkb(
                Geom(POLYGON, rings, [len(rings)])))
    else:
        raise ValueError(f"unsupported Idrisi object type {obj_type!r}")

    cols: dict = {
        "fid": pa.array(range(1, count + 1), pa.int64()),
        "geometry": pa.array(wkbs, pa.binary()),
        "id": pa.array(ids, pa.float64()),
    }
    defs, rows = _read_avl_adc(path)
    if defs and rows:
        for i, (name, typ) in enumerate(defs[1:], start=1):
            vals = [r[i] if i < len(r) else None for r in rows]
            if typ == "integer":
                arr = pa.array([None if v is None else int(v)
                                for v in vals], pa.int64())
            elif typ == "real":
                arr = pa.array([None if v is None else float(v)
                                for v in vals], pa.float64())
            else:
                arr = pa.array(vals, pa.string())
            cols[name] = arr

    extent = None
    try:
        extent = (float(meta["min. X"]), float(meta["max. X"]),
                  float(meta["min. Y"]), float(meta["max. Y"]))
    except (KeyError, ValueError):
        pass
    return {
        "table": pa.table(cols),
        "geom_type": {"point": "Point", "line": "LineString",
                      "polygon": "Polygon", "poly": "Polygon"}[obj_type],
        "extent": extent,
        "ref_system": meta.get("ref. system"),
        "srs": _utm_params(meta.get("ref. system", "")),
    }
