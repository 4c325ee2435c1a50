"""PDS3 TABLE vector driver (reference ogr/ogrsf_frmts/pds).

A PDS3 label (``.lbl``) points at a fixed-length table
(``^TABLE = ("FILE", start_record)``) whose columns come from the
inline TABLE object or a ``^STRUCTURE`` .fmt include: OBJECT=COLUMN
blocks with NAME / DATA_TYPE / START_BYTE / BYTES and optional
SCALING_FACTOR / OFFSET.  ASCII_* columns parse the fixed-width
text; MSB_INTEGER / MSB_UNSIGNED_INTEGER / IEEE_REAL decode
big-endian binary.  LONGITUDE/LATITUDE columns become POINT
geometry, like the reference layer."""

from __future__ import annotations

import os
import re
import struct

import numpy as np
import pyarrow as pa


def _parse_columns(text: str):
    cols = []
    cur = None
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"OBJECT\s*=\s*COLUMN", s)
        if m:
            cur = {}
            continue
        if s.startswith("END_OBJECT") and cur is not None:
            if "NAME" in cur and "START_BYTE" in cur:
                cols.append(cur)
            cur = None
            continue
        if cur is not None and "=" in s:
            k, _, v = s.partition("=")
            cur[k.strip()] = v.strip().strip('"')
    return cols


def _kv(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        s = line.strip()
        if "=" in s and not s.startswith(("OBJECT", "END_OBJECT", "/*")):
            k, _, v = s.partition("=")
            k = k.strip()
            if k not in out:
                out[k] = v.strip().strip('"')
    return out


def read_pds_table(lbl_path: str) -> pa.Table:
    with open(lbl_path, errors="replace") as f:
        label = f.read()
    kv = _kv(label)
    d = os.path.dirname(os.path.abspath(lbl_path))

    m = re.search(r"\^TABLE\s*=\s*\(\s*\"?([^\",]+)\"?\s*,\s*(\d+)",
                  label)
    if m:
        data_file, start_rec = m.group(1), int(m.group(2))
    else:
        m = re.search(r"\^TABLE\s*=\s*\"?([^\"\s]+)\"?", label)
        data_file, start_rec = m.group(1), 1
    record_bytes = int(kv.get("RECORD_BYTES", "0"))
    nrows = int(kv.get("FILE_RECORDS", kv.get("ROWS", "0")))
    interchange = "ASCII"
    mt = re.search(r"INTERCHANGE_FORMAT\s*=\s*\"?(\w+)", label)
    if mt:
        interchange = mt.group(1).upper()
    mrows = re.search(r"^\s*ROWS\s*=\s*(\d+)", label, re.M)
    if mrows:
        nrows = int(mrows.group(1))

    cols = _parse_columns(label)
    ms = re.search(r"\^STRUCTURE\s*=\s*\"?([^\"\s]+)\"?", label)
    if ms:
        fmt_name = ms.group(1)
        fmt_path = None
        for cand in (fmt_name, fmt_name.lower(), fmt_name.upper()):
            p = os.path.join(d, cand)
            if os.path.exists(p):
                fmt_path = p
        if fmt_path:
            with open(fmt_path, errors="replace") as f:
                cols = cols + _parse_columns(f.read())

    path = None
    for cand in (data_file, data_file.lower(), data_file.upper()):
        p = os.path.join(d, cand)
        if os.path.exists(p):
            path = p
    with open(path, "rb") as f:
        data = f.read()
    off0 = (start_rec - 1) * record_bytes

    out: dict[str, list] = {}
    lons = lats = None
    expanded = []
    for col in cols:
        items = int(col.get("ITEMS", "0") or 0)
        if items > 1:
            # ITEMS arrays expand to NAME_1..NAME_N sub-columns like
            # the reference (ogrpdslayer.cpp)
            item_bytes = int(col.get("ITEM_BYTES",
                                     int(col.get("BYTES", 0)) // items))
            sb0 = int(col["START_BYTE"])
            for k in range(items):
                sub = dict(col)
                sub["NAME"] = "%s_%d" % (col["NAME"], k + 1)
                sub["START_BYTE"] = str(sb0 + k * item_bytes)
                sub["BYTES"] = str(item_bytes)
                sub.pop("ITEMS", None)
                expanded.append(sub)
        else:
            expanded.append(col)
    for col in expanded:
        name = col["NAME"]
        dt = col.get("DATA_TYPE", "ASCII_REAL").upper()
        sb = int(col["START_BYTE"]) - 1
        nb = int(col.get("BYTES", "0"))
        scale = float(col.get("SCALING_FACTOR", "1") or 1)
        offset = float(col.get("OFFSET", "0") or 0)
        vals: list = []
        for r in range(nrows):
            base = off0 + r * record_bytes + sb
            raw = data[base:base + nb]
            if dt.startswith("ASCII"):
                s = raw.decode("ascii", "replace").strip().rstrip(",")
                if not s:
                    vals.append(None)
                elif "INTEGER" in dt:
                    try:
                        vals.append(int(s))
                    except ValueError:
                        vals.append(None)
                elif "REAL" in dt:
                    try:
                        vals.append(float(s))
                    except ValueError:
                        vals.append(None)
                else:
                    vals.append(s)
            elif dt in ("MSB_INTEGER", "INTEGER"):
                v = int.from_bytes(raw, "big", signed=True)
                vals.append(v * scale + offset if (scale != 1 or offset)
                            else v)
            elif dt in ("MSB_UNSIGNED_INTEGER", "UNSIGNED_INTEGER"):
                v = int.from_bytes(raw, "big")
                vals.append(v * scale + offset if (scale != 1 or offset)
                            else v)
            elif dt in ("IEEE_REAL", "FLOAT", "REAL"):
                v = struct.unpack(">f" if nb == 4 else ">d", raw)[0]
                vals.append(v * scale + offset)
            else:
                vals.append(raw.hex())
        out[name] = vals
        if name == "LONGITUDE":
            lons = vals
        elif name == "LATITUDE":
            lats = vals

    arrays = []
    names = []
    for k, v in out.items():
        names.append(k)
        if all(x is None or isinstance(x, int) for x in v) and \
                any(isinstance(x, int) for x in v):
            arrays.append(pa.array(v, pa.int64()))
        elif any(isinstance(x, float) for x in v):
            arrays.append(pa.array(
                [float(x) if x is not None else None for x in v],
                pa.float64()))
        else:
            arrays.append(pa.array(
                [None if x is None else str(x) for x in v], pa.string()))
    if lons is not None and lats is not None:
        wkts = ["POINT (%.10g %.10g)" % (lo, la)
                if lo is not None and la is not None else None
                for lo, la in zip(lons, lats)]
        names.append("wkt")
        arrays.append(pa.array(wkts, pa.string()))
    return pa.table(arrays, names=names)
