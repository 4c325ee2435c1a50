"""IHO S-57 ENC reader on a generic ISO/IEC 8211 parser.

Reference: frmts/iso8211 (DDF* classes) for the container and
ogr/ogrsf_frmts/s57/s57reader.cpp for the feature model.

ISO 8211: every record has a 24-byte leader (record length [0:5],
field-area base [12:17], entry sizes [20],[21],[23]), a directory of
(tag, length, position) entries terminated by 0x1E, then the field
area.  The first record (DDR) defines each field: field controls,
name, ``!``-separated subfield labels (leading ``*`` = repeated
group) and format controls like ``(b11,b14,3b11,2b14,A,A(8))`` —
``b1N``/``b2N`` are N-byte unsigned/signed little-endian binaries,
``A``/``A(n)`` variable (0x1F-terminated) / fixed strings,
``I(n)``/``R(n)`` ASCII numerics, ``B(n)`` an n-bit opaque field.
Data records decode their field bytes against those formats.

S-57 model (s57reader.cpp): DSPM carries COMF/SOMF coordinate
divisors; vector records VRID (RCNM 110 isolated node / 120
connected node / 130 edge) hold SG2D/SG3D coordinate lists and VRPT
pointers (edge begin/end nodes); feature records FRID
(PRIM point/line/area, OBJL class code) hold ATTF attributes and
FSPT pointers into the vector records.  Line geometry concatenates
each referenced edge as begin-node + vertices + end-node honouring
FSPT orientation (2 = reversed); area geometry chains the edges into
closed rings.  LNAM is ``AGEN(4)FIDN(8)FIDS(4)`` hex.  Object class
acronyms / attribute acronyms + list-types come from the reference's
own s57objectclasses.csv / s57attributes.csv (read as data, like the
autotest fixtures)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

S57_DATA_DIR = "/root/reference/ogr/ogrsf_frmts/s57/data"

UT = 0x1F  # unit terminator
FT = 0x1E  # field terminator


# ---------------------------------------------------------------------------
# ISO 8211


def _parse_formats(spec: str) -> list[tuple[str, int]]:
    """'(b11,b14,3b11,A,A(8),B(40))' -> [(kind, size), ...] where
    kind in {ub, sb, A, Afix, I, R, B}."""
    spec = spec.strip()
    if spec.startswith("(") and spec.endswith(")"):
        spec = spec[1:-1]
    out: list[tuple[str, int]] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        rep = 1
        i = 0
        while i < len(part) and part[i].isdigit():
            i += 1
        if i:
            rep = int(part[:i])
            part = part[i:]
        if part.startswith("b"):
            signed = part[1] == "2"
            size = int(part[2:])
            item = ("sb" if signed else "ub", size)
        elif part.startswith("B(") :
            bits = int(part[2:-1])
            item = ("B", bits // 8)
        elif part.startswith("A(") :
            item = ("Afix", int(part[2:-1]))
        elif part == "A":
            item = ("A", 0)
        elif part.startswith("I("):
            item = ("I", int(part[2:-1]))
        elif part.startswith("R("):
            item = ("R", int(part[2:-1]))
        else:
            item = ("A", 0)
        out.extend([item] * rep)
    return out


class Iso8211File:
    def __init__(self, data: bytes):
        self.data = data
        # fields whose variable strings are UCS-2 (S-57 national
        # attributes at lexical level 2)
        self.ll2_tags = {"NATF"}
        self.fields: dict[str, tuple[list[str], list, bool]] = {}
        self.records: list[dict] = []
        pos = 0
        first = True
        while pos + 24 <= len(data):
            if not data[pos:pos + 5].isdigit():
                break  # trailing pad bytes (SRP files fill with '^')
            reclen = int(data[pos:pos + 5])
            if reclen <= 0:
                break
            base = int(data[pos + 12:pos + 17])
            szlen = int(data[pos + 20:pos + 21])
            szpos = int(data[pos + 21:pos + 22])
            sztag = int(data[pos + 23:pos + 24])
            p = pos + 24
            entries = []
            while data[p] != FT:
                tag = data[p:p + sztag].decode("ascii")
                ln = int(data[p + sztag:p + sztag + szlen])
                off = int(data[p + sztag + szlen:p + sztag + szlen + szpos])
                entries.append((tag, ln, off))
                p += sztag + szlen + szpos
            area = data[pos + base:pos + reclen]
            if first:
                for tag, ln, off in entries:
                    raw = area[off:off + ln]
                    if tag in ("0000", "0001"):
                        continue
                    body = raw.rstrip(b"\x1e")
                    parts = body.split(b"\x1f")
                    labels = []
                    fmts = []
                    rep = False
                    if len(parts) >= 3:
                        lab = parts[1].decode("ascii", "replace")
                        if lab.startswith("*"):
                            rep = True
                            lab = lab[1:]
                        labels = lab.split("!") if lab else []
                        fmts = _parse_formats(
                            parts[2].decode("ascii", "replace"))
                    self.fields[tag] = (labels, fmts, rep)
                first = False
            else:
                rec: dict[str, list] = {}
                for tag, ln, off in entries:
                    raw = area[off:off + ln]
                    if tag == "0001":
                        continue
                    rec.setdefault(tag, []).append(self._decode(tag, raw))
                self.records.append(rec)
            pos += reclen

    def _decode(self, tag: str, raw: bytes):
        labels, fmts, rep = self.fields.get(tag, ([], [], False))
        raw = raw.rstrip(b"\x1e")
        if not labels or not fmts:
            return raw
        out_groups = []
        p = 0
        while True:
            group = {}
            for label, (kind, size) in zip(labels, fmts):
                if p > len(raw):
                    break
                if kind == "ub":
                    group[label] = int.from_bytes(raw[p:p + size], "little")
                    p += size
                elif kind == "sb":
                    group[label] = int.from_bytes(raw[p:p + size], "little",
                                                  signed=True)
                    p += size
                elif kind == "B":
                    group[label] = raw[p:p + size]
                    p += size
                elif kind == "Afix":
                    group[label] = raw[p:p + size].decode("latin-1")
                    p += size
                elif kind == "A":
                    if tag in self.ll2_tags:
                        # lexical level 2: UCS-2 text, 2-byte unit
                        # terminator 0x1F 0x00 at even offset (a bare
                        # 0x1F can be the low byte of e.g. U+041F)
                        end = p
                        while end + 1 < len(raw) and not (
                                raw[end] == UT and raw[end + 1] == 0):
                            end += 2
                        group[label] = raw[p:end].decode(
                            "utf-16-le", "replace")
                        p = end + 2
                    else:
                        end = raw.find(UT, p)
                        if end < 0:
                            end = len(raw)
                        group[label] = raw[p:end].decode("latin-1")
                        p = end + 1
                elif kind in ("I", "R"):
                    txt = raw[p:p + size].decode("latin-1").strip()
                    try:
                        group[label] = (int(txt) if kind == "I"
                                        else float(txt))
                    except ValueError:
                        group[label] = txt
                    p += size
            out_groups.append(group)
            if not rep or p >= len(raw):
                break
        return out_groups if rep else out_groups[0]


# ---------------------------------------------------------------------------
# S-57 dictionaries


def _load_classes(data_dir=S57_DATA_DIR) -> dict[int, tuple[str, list[str]]]:
    import csv

    out = {}
    path = os.path.join(data_dir, "s57objectclasses.csv")
    with open(path, newline="", encoding="utf-8", errors="replace") as f:
        rd = csv.reader(f)
        next(rd)
        for row in rd:
            if len(row) >= 6:
                attrs = [a for a in (row[3] + row[4] + row[5]).split(";") if a]
                out[int(row[0])] = (row[2], attrs)
    return out


def _load_attrs(data_dir=S57_DATA_DIR) -> dict[int, tuple[str, str]]:
    import csv

    out = {}
    path = os.path.join(data_dir, "s57attributes.csv")
    with open(path, newline="", encoding="utf-8", errors="replace") as f:
        rd = csv.reader(f)
        next(rd)
        for row in rd:
            if len(row) >= 4:
                out[int(row[0])] = (row[2], row[3])
    return out


# ---------------------------------------------------------------------------
# feature assembly


def read_s57(path: str, data_dir: str = S57_DATA_DIR) -> dict[str, pa.Table]:
    """-> {layer acronym: Arrow table} with fid/RCID/PRIM/OBJL/AGEN/
    FIDN/FIDS/LNAM + class attributes + wkt (the DSID layer carries
    the data-set identification subfields)."""
    from ..functions.wkb import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                                 POINT, POLYGON, Geom, geom_to_wkt)

    with open(path, "rb") as f:
        iso = Iso8211File(f.read())

    classes = _load_classes(data_dir)
    attrdict = _load_attrs(data_dir)

    comf, somf = 1.0, 1.0
    dsid_row = None
    vectors: dict[tuple[int, int], dict] = {}
    features = []
    for rec in iso.records:
        if "DSID" in rec:
            dsid_row = dict(rec["DSID"][0])
            if "DSSI" in rec:
                dsid_row.update(rec["DSSI"][0])
        if "DSPM" in rec:
            comf = float(rec["DSPM"][0].get("COMF", 1) or 1)
            somf = float(rec["DSPM"][0].get("SOMF", 1) or 1)
        if "VRID" in rec:
            vr = rec["VRID"][0]
            key = (vr["RCNM"], vr["RCID"])
            coords = []
            for sg in rec.get("SG2D", []):
                for g in sg:
                    coords.append((g["XCOO"], g["YCOO"], None))
            for sg in rec.get("SG3D", []):
                for g in sg:
                    coords.append((g["XCOO"], g["YCOO"], g["VE3D"]))
            vrpt = [g for grp in rec.get("VRPT", []) for g in grp]
            vectors[key] = {"coords": coords, "vrpt": vrpt}
        if "FRID" in rec:
            fr = rec["FRID"][0]
            foid = rec.get("FOID", [{}])[0]
            attf = [g for grp in rec.get("ATTF", []) for g in grp]
            natf = [g for grp in rec.get("NATF", []) for g in grp]
            fspt = [g for grp in rec.get("FSPT", []) for g in grp]
            features.append((fr, foid, attf, natf, fspt))

    def node_coords(key):
        v = vectors.get(key)
        return v["coords"] if v else []

    def edge_points(key, ornt):
        """begin node + vertices + end node (s57reader
        FetchLine semantics)."""
        v = vectors.get(key)
        if v is None:
            return []
        begin = end = None
        for p in v["vrpt"]:
            topi = p.get("TOPI")
            nm = p.get("NAME", b"")
            nkey = (nm[0], int.from_bytes(nm[1:5], "little")) \
                if len(nm) >= 5 else None
            if topi == 1 and begin is None:
                begin = nkey
            elif topi == 2:
                end = nkey
        pts = []
        if begin and node_coords(begin):
            x, y, _ = node_coords(begin)[0]
            pts.append((x, y))
        pts.extend((c[0], c[1]) for c in v["coords"])
        if end and node_coords(end):
            x, y, _ = node_coords(end)[0]
            pts.append((x, y))
        if ornt == 2:
            pts.reverse()
        return pts

    layers: dict[str, dict] = {}

    def emit(acr, row, wkt):
        lay = layers.setdefault(acr, {"rows": [], "wkts": []})
        lay["rows"].append(row)
        lay["wkts"].append(wkt)

    for fr, foid, attf, natf, fspt in features:
        objl = fr.get("OBJL", 0)
        acr, class_attrs = classes.get(objl, ("OBJL%d" % objl, []))
        agen = foid.get("AGEN", 0)
        fidn = foid.get("FIDN", 0)
        fids = foid.get("FIDS", 0)
        row = {
            "RCID": fr.get("RCID"), "PRIM": fr.get("PRIM"),
            "GRUP": fr.get("GRUP"), "OBJL": objl, "RVER": fr.get("RVER"),
            "AGEN": agen, "FIDN": fidn, "FIDS": fids,
            "LNAM": "%04X%08X%04X" % (agen, fidn, fids),
        }
        for a in attf:
            code = a.get("ATTL")
            if code in attrdict:
                name, atype = attrdict[code]
                val = a.get("ATVL", "")
                row[name] = (val.split(",") if atype == "L"
                             else val)
        for a in natf:
            # national attributes (decoded from UCS-2 by the LL2 path)
            code = a.get("ATTL")
            if code in attrdict:
                name, _atype = attrdict[code]
                row[name] = a.get("ATVL", "")
        prim = fr.get("PRIM")
        wkt = None
        if prim == 1:
            pts2, pts3 = [], []
            for p in fspt:
                nm = p.get("NAME", b"")
                key = (nm[0], int.from_bytes(nm[1:5], "little"))
                for x, y, z in node_coords(key):
                    if z is None:
                        pts2.append((x / comf, y / comf))
                    else:
                        pts3.append((x / comf, y / comf, z / somf))
            if pts3:
                xy = np.array([(p[0], p[1]) for p in pts3])
                zs = np.array([p[2] for p in pts3])
                g = Geom(MULTIPOINT, [xy], zs=[zs])
                wkt = geom_to_wkt(g, precision=12)
            elif pts2:
                g = Geom(POINT, [np.array(pts2[:1])])
                wkt = geom_to_wkt(g, precision=12)
        elif prim == 2:
            parts = []
            for p in fspt:
                nm = p.get("NAME", b"")
                key = (nm[0], int.from_bytes(nm[1:5], "little"))
                pts = edge_points(key, p.get("ORNT"))
                if pts:
                    parts.append([(x / comf, y / comf) for x, y in pts])
            # merge consecutive parts sharing endpoints
            merged = []
            for pt in parts:
                if merged and merged[-1][-1] == pt[0]:
                    merged[-1].extend(pt[1:])
                else:
                    merged.append(list(pt))
            if len(merged) == 1:
                g = Geom(LINESTRING, [np.array(merged[0])])
            else:
                g = Geom(MULTILINESTRING, [np.array(m) for m in merged])
            wkt = geom_to_wkt(g, precision=12) if merged else None
        elif prim == 3:
            segs = []
            for p in fspt:
                nm = p.get("NAME", b"")
                key = (nm[0], int.from_bytes(nm[1:5], "little"))
                pts = edge_points(key, p.get("ORNT"))
                if pts:
                    segs.append([(x / comf, y / comf) for x, y in pts])
            rings = _assemble_rings(segs)
            if rings:
                g = Geom(POLYGON, [np.array(r) for r in rings])
                wkt = geom_to_wkt(g, precision=12)
        row["wkt"] = wkt
        emit(acr, row, wkt)

    out: dict[str, pa.Table] = {}
    if dsid_row is not None:
        out["DSID"] = pa.table(
            {k: pa.array([v if not isinstance(v, bytes) else v.hex()])
             for k, v in dsid_row.items()})
    for acr in sorted(layers):
        rows = layers[acr]["rows"]
        cols: dict[str, list] = {}
        for r in rows:
            for k in r:
                cols.setdefault(k, [])
        for r in rows:
            for k in cols:
                cols[k].append(r.get(k))
        arrays, names = [], []
        for k, v in cols.items():
            names.append(k)
            if any(isinstance(x, list) for x in v):
                arrays.append(pa.array(
                    [x if x is None or isinstance(x, list) else [x]
                     for x in v], pa.list_(pa.string())))
            else:
                arrays.append(pa.array(v))
        out[acr] = pa.table(arrays, names=names)
    return out


def _assemble_rings(segs):
    """Chain edge segments into closed rings by endpoint matching
    (OGRBuildPolygonFromEdges equivalent for well-formed input)."""
    segs = [list(s) for s in segs if len(s) >= 2]
    rings = []
    while segs:
        ring = segs.pop(0)
        changed = True
        while changed and ring[0] != ring[-1]:
            changed = False
            for i, s in enumerate(segs):
                if s[0] == ring[-1]:
                    ring.extend(s[1:])
                    segs.pop(i)
                    changed = True
                    break
                if s[-1] == ring[-1]:
                    ring.extend(reversed(s[:-1]))
                    segs.pop(i)
                    changed = True
                    break
        if ring[0] == ring[-1] and len(ring) >= 4:
            rings.append(ring)
    return rings
