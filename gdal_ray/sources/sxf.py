"""Panorama SXF v3/v4 vector driver + RSC classifier (reference
ogr/ogrsf_frmts/sxf/ogrsxfdatasource.cpp, ogrsxflayer.cpp,
org_sxf_defs.h; conformance autotest/ogr/ogr_sxf.py).

SXF layout: 16-byte header (SXF\\0, header length, version), passport
(v4: 80-byte description at 16, 4 information-flag bytes at 96, EPSG
at 100, 8 projected + 8 geographic corner doubles, ellipsoid/
projection bytes at 232, resolution + frame at 312, 6 projection
param doubles at 352), 'DAT\\0' descriptor, then records: 32-byte
headers (0x7FFF7FFF magic, full/geometry lengths, classify code,
group ids, 3 reference bytes, point counts) followed by the geometry
certificate and optional semantics.

Geometry decode per OGRSXFLayer::TranslateXYH (:419): values are
(Y, X[, H]) pairs as short/float/int/double chosen by ref-byte bits;
conditional coordinates scale by scale/resolution around the frame
origin, but all-zero frame coords force real coordinates
(ogrsxfdatasource.cpp:842-852). Record geometry types (record ref
byte low bits): 0 line, 1 polygon, 2 point, 3 text, 4 vector-angle,
5 text-template; sub-objects add rings/parts.

RSC: Layers section (name cp1251/koi8 by nFontEnc, short name, layer
no) creates the layer set; Objects section maps classify codes to
layers and names. Records not matching any classifier fall into
Not_Classified; empty layers are pruned (FillLayers :1092-1105).
Semantics decode the SC_<code> fields with pow(10, scale) numeric
scaling (ogrsxflayer.cpp:920-1101).
"""
from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                             POINT, POLYGON, Geom, geom_to_wkb)

IDSXFOBJ = 0x7FFF7FFF
TO_DEG = 180.0 / np.pi


def _bit(v: int, b: int) -> bool:
    return bool(v & (1 << b))


def _cstr(raw: bytes, enc: str) -> str:
    return raw.split(b"\x00")[0].decode(enc, "replace")


def read_sxf_passport(data: bytes) -> dict:
    if data[:3] != b"SXF":
        raise ValueError("not an SXF file")
    (hlen,) = struct.unpack_from("<I", data, 4)
    # nFormatVersion[2] when header > 256 bytes, else [1]
    # (ogrsxfdatasource.cpp:141-150)
    version = data[8 + 2] if hlen > 256 else data[8 + 1]
    p: dict = {"version": int(version)}
    if version != 4:
        raise NotImplementedError(f"SXF version {version} (only v4)")
    p["sheet"] = _cstr(data[16 + 12:16 + 44], "cp1251")
    (p["scale"],) = struct.unpack_from("<I", data, 16 + 44)
    p["sheet_name"] = _cstr(data[16 + 48:16 + 80], "cp1251")
    flags = data[96:100]
    if (flags[0] & 3) != 3:
        raise ValueError("SXF: not exchange-state data")
    p["real_coords"] = _bit(flags[0], 4)
    p["text_enc"] = flags[1]
    (p["epsg"],) = struct.unpack_from("<i", data, 100)
    p["proj_corners"] = struct.unpack_from("<8d", data, 104)
    p["geo_corners"] = [v * TO_DEG for v in struct.unpack_from("<8d", data, 168)]
    ell = data[232:240]
    p["ellipsoid"], p["vcs"], p["projsys"], p["datum"] = ell[:4]
    buff = struct.unpack_from("<10I", data, 312)
    p["resolution"] = buff[0]
    p["frame"] = buff[1:9]
    params = struct.unpack_from("<6d", data, 352)
    p["proj_params"] = params
    p["xor"] = params[2] * TO_DEG
    p["yor"] = params[3] * TO_DEG
    if p["resolution"] == 0:
        raise ValueError("SXF: zero resolution")
    coeff = p["scale"] / p["resolution"]
    p["coeff"] = coeff
    if not p["real_coords"]:
        if all(v == 0 for v in p["frame"]):
            p["real_coords"] = True
        else:
            p["xor"] = p["proj_corners"][1] - p["frame"][1] * coeff
            p["yor"] = p["proj_corners"][0] - p["frame"][0] * coeff
    # record count for FillLayers (v4: u4 at 440, records start at 452)
    (p["record_count"],) = struct.unpack_from("<I", data, 440)
    p["records_at"] = 452
    return p


def _read_rsc_layers(rsc: bytes) -> tuple[list[tuple[int, str, str]],
                                          dict[int, tuple[int, str]], int]:
    """-> ([(layer_no, short, full)], {classify_code: (layer_no, name)},
    font_enc)."""
    if rsc[:3] != b"RSC":
        raise ValueError("not an RSC file")
    off = 4 + 28 + 8 + 32 + 32 + 8 + 4 + 4
    sections = {}
    for name in ("Objects", "Semantic", "ClassifySemantic", "Defaults",
                 "Semantics", "Layers", "Limits", "Parameters", "Print",
                 "Palettes", "Fonts", "Libs", "ImageParams", "Tables"):
        sections[name] = struct.unpack_from("<3I", rsc, off)
        off += 12
    off += 1 + 1 + 30
    (font_enc, _ncol) = struct.unpack_from("<2I", rsc, off)
    enc = {125: "koi8-r", 126: "cp1251"}.get(font_enc, "utf-8")

    layers = []
    o, _l, c = sections["Layers"]
    pos = o
    for _ in range(c):
        (ln,) = struct.unpack_from("<I", rsc, pos)
        full = _cstr(rsc[pos + 4:pos + 36], enc) or "Unnamed"
        short = _cstr(rsc[pos + 36:pos + 52], enc) or "Unnamed"
        no = rsc[pos + 52]
        layers.append((no, short, full))
        pos += ln

    codes: dict[int, tuple[int, str]] = {}
    o, _l, c = sections["Objects"]
    pos = o
    for _ in range(c):
        ln, ccode, _num, _ocode = struct.unpack_from("<4I", rsc, pos)
        name = _cstr(rsc[pos + 16 + 32:pos + 16 + 64], enc) or "Unnamed"
        layer_no = rsc[pos + 16 + 64 + 1]
        codes[ccode] = (layer_no, name)
        pos += ln
    return layers, codes, font_enc


def _xyh(buf: bytes, off: int, vt: str, has_z: bool, p: dict):
    """One coordinate tuple; returns (x, y, z, nbytes). Stored (Y, X)."""
    if vt == "short":
        y, x = struct.unpack_from("<2h", buf, off)
        n = 4
        zsz = 4
        zfmt = "<f"
    elif vt == "float":
        y, x = struct.unpack_from("<2f", buf, off)
        n = 8
        zsz = 4
        zfmt = "<f"
    elif vt == "int":
        y, x = struct.unpack_from("<2i", buf, off)
        n = 8
        zsz = 4
        zfmt = "<f"
    else:  # double
        y, x = struct.unpack_from("<2d", buf, off)
        n = 16
        zsz = 8
        zfmt = "<d"
    if not p["real_coords"]:
        x = p["xor"] + x * p["coeff"]
        y = p["yor"] + y * p["coeff"]
    z = 0.0
    if has_z:
        (z,) = struct.unpack_from(zfmt, buf, off + n)
        n += zsz
    return float(x), float(y), float(z), n


_SEM_ENC = {0: "cp866", 126: "cp1251"}


def _parse_semantics(buf: bytes) -> dict[str, object]:
    out: dict[str, object] = {}
    off = 0
    while off + 4 <= len(buf):
        code, typ, scale = struct.unpack_from("<Hbb", buf, off)
        off += 4
        name = f"SC_{code}"
        if typ == 0:  # ASCIIZ DOS
            ln = (scale & 0xFF) + 1
            out[name] = _cstr(buf[off:off + ln], "cp866")
            off += ln
        elif typ == 1:
            out[name] = float(buf[off]) * 10.0 ** scale
            off += 1
        elif typ == 2:
            (v,) = struct.unpack_from("<h", buf, off)
            out[name] = float(v) * 10.0 ** scale
            off += 2
        elif typ == 4:
            (v,) = struct.unpack_from("<i", buf, off)
            out[name] = float(v) * 10.0 ** scale
            off += 4
        elif typ == 8:
            (v,) = struct.unpack_from("<d", buf, off)
            out[name] = float(v)
            off += 8
        elif typ == 126:  # ANSI WIN
            ln = (scale & 0xFF) + 1
            out[name] = _cstr(buf[off:off + ln], "cp1251")
            off += ln
        elif typ == 127:  # UNICODE
            ln = ((scale & 0xFF) + 1) * 2
            out[name] = buf[off:off + ln].decode("utf-16-le",
                                                 "replace").rstrip("\x00")
            off += ln
        elif typ == -128 or typ == 128:  # BIGTEXT
            (ln,) = struct.unpack_from("<I", buf, off)
            off += 4
            out[name] = buf[off:off + ln].decode("utf-16-le", "replace")
            off += ln
        else:
            break
    return out


def _coords_list(buf: bytes, off: int, count: int, vt: str, has_z: bool,
                 p: dict):
    xs, ys, zs = [], [], []
    for _ in range(count):
        if off >= len(buf):
            break
        x, y, z, n = _xyh(buf, off, vt, has_z, p)
        xs.append(x)
        ys.append(y)
        zs.append(z)
        off += n
    return np.column_stack([xs, ys]) if xs else np.zeros((0, 2)), zs, off


def read_sxf(path: str, rsc_path: str | None = None,
             layer_fullname: bool = False) -> dict[str, pa.Table]:
    """All non-empty layers of an SXF sheet as Arrow tables with
    (ogc_fid, geometry WKB, CLCODE, CLNAME, OBJECTNUMB, ANGLE, TEXT,
    SC_* semantics) columns."""
    data = open(path, "rb").read()
    p = read_sxf_passport(data)

    # layer set: RSC classifier or the default SYSTEM/Not_Classified
    code_to_layer: dict[int, tuple[int, str]] = {}
    layer_defs: list[tuple[int, str]] = []
    rsc = None
    if rsc_path is not None:
        try:
            raw = open(rsc_path, "rb").read()
            if raw[:3] == b"RSC":
                rsc = raw
        except OSError:
            rsc = None
    if rsc is not None:
        layers, codes, _enc = _read_rsc_layers(rsc)
        layer_defs = [(no, full if layer_fullname else short)
                      for no, short, full in layers]
        code_to_layer = codes
    else:
        layer_defs = [(0, "SYSTEM")]
        for c in list(range(1000000001, 1000000015)) + [91000000]:
            code_to_layer[c] = (0, "")
    layer_defs.append((255, "Not_Classified"))
    by_no = {no: name for no, name in layer_defs}

    feats: dict[int, list[dict]] = {no: [] for no, _ in layer_defs}
    pos = p["records_at"]
    for fid in range(p["record_count"]):
        if pos + 32 > len(data):
            break
        (nid, full_len, geom_len, clcode, g0, g1) = struct.unpack_from(
            "<IIIIHH", data, pos)
        ref = data[pos + 20:pos + 23]
        (npoints,) = struct.unpack_from("<I", data, pos + 24)
        (nsub, npt_small) = struct.unpack_from("<2H", data, pos + 28)
        if nid != IDSXFOBJ:
            break
        code = ref[0] & 15
        if code == 0x04:
            code = 0x21
            nsub = 0
        if _bit(ref[2], 5):
            nsub = 0
        has_attrs = _bit(ref[1], 1)
        has_z = _bit(ref[2], 1)
        bfloat = _bit(ref[2], 2)
        bbig = _bit(ref[1], 2)
        has_text = _bit(ref[2], 3)
        vt = ("double" if bbig else "float") if bfloat else \
             ("int" if bbig else "short")
        count = npoints if npt_small == 65535 else npt_small

        gbuf = data[pos + 32:pos + 32 + geom_len]
        off = 0
        geom = None
        angle = None
        text = None
        if code == 0x02:  # point -> MultiPoint
            pts, zs, off = _coords_list(gbuf, off, 1, vt, has_z, p)
            allpts = [pts]
            allzs = list(zs)
            for _ in range(nsub):
                if off + 4 > len(gbuf):
                    break
                _sub, nc = struct.unpack_from("<2H", gbuf, off)
                off += 4
                spts, szs, off = _coords_list(gbuf, off, nc, vt, has_z, p)
                allpts.append(spts)
                allzs.extend(szs)
            arr = np.vstack(allpts)
            geom = Geom(MULTIPOINT, [arr])
            if has_z:
                geom.zs = [np.array(allzs)]
        elif code in (0x00, 0x22, 0x03):  # line / scaled vector / text
            pts, zs, off = _coords_list(gbuf, off, count, vt, has_z, p)
            parts = [pts]
            pzs = [np.array(zs)]
            if code == 0x03 and has_text and off < len(gbuf):
                tl = gbuf[off]
                text = _cstr(gbuf[off + 1:off + 1 + tl], "cp1251")
                off += tl + 2
            for _ in range(nsub):
                if off + 4 > len(gbuf):
                    break
                _sub, nc = struct.unpack_from("<2H", gbuf, off)
                off += 4
                spts, szs, off = _coords_list(gbuf, off, nc, vt, has_z, p)
                parts.append(spts)
                pzs.append(np.array(szs))
                if code == 0x03 and has_text and off < len(gbuf):
                    tl = gbuf[off]
                    if off + 1 + tl <= len(gbuf):
                        off += tl + 2
            geom = Geom(MULTILINESTRING, parts)
            if has_z:
                geom.zs = pzs
        elif code == 0x01:  # polygon
            pts, zs, off = _coords_list(gbuf, off, count, vt, has_z, p)
            rings = [pts]
            rzs = [np.array(zs)]
            for _ in range(nsub):
                if off + 4 > len(gbuf):
                    break
                _sub, nc = struct.unpack_from("<2H", gbuf, off)
                off += 4
                spts, szs, off = _coords_list(gbuf, off, nc, vt, has_z, p)
                rings.append(spts)
                rzs.append(np.array(szs))
            geom = Geom(POLYGON, rings)
            if has_z:
                geom.zs = rzs
        elif code == 0x21:  # vector with angle
            pts, zs, off = _coords_list(gbuf, off, 2, vt, has_z, p)
            if len(pts) == 2:
                xd = pts[0, 0] - pts[1, 0]
                yd = pts[0, 1] - pts[1, 1]
                angle = float(np.arctan2(xd, yd) * TO_DEG - 90)
                if angle < 0:
                    angle += 360
                geom = Geom(POINT, [pts[:1]])
                if has_z:
                    geom.zs = [np.array(zs[:1])]
        # else: text template / unknown -> skipped (record still consumed)

        attrs: dict[str, object] = {}
        if has_attrs and full_len >= 32 + geom_len:
            sem = data[pos + 32 + geom_len:pos + full_len]
            attrs = _parse_semantics(sem)

        if geom is not None:
            lay_no, clname = code_to_layer.get(clcode, (255, ""))
            if lay_no not in feats:
                lay_no = 255
            feats[lay_no].append({
                "ogc_fid": fid, "geometry": geom_to_wkb(geom),
                "CLCODE": clcode, "CLNAME": clname or str(clcode),
                "OBJECTNUMB": nsub, "ANGLE": angle, "TEXT": text,
                **attrs})
        pos += full_len

    out: dict[str, pa.Table] = {}
    for no, name in layer_defs:
        rows = feats.get(no, [])
        if not rows:
            continue
        keys = ["ogc_fid", "geometry", "CLCODE", "CLNAME", "OBJECTNUMB",
                "ANGLE", "TEXT"]
        sem_keys = sorted({k for r in rows for k in r if k not in keys})
        cols: dict[str, pa.Array] = {
            "ogc_fid": pa.array([r["ogc_fid"] for r in rows], pa.int64()),
            "geometry": pa.array([r["geometry"] for r in rows], pa.binary()),
            "CLCODE": pa.array([r["CLCODE"] for r in rows], pa.int64()),
            "CLNAME": pa.array([r["CLNAME"] for r in rows], pa.string()),
            "OBJECTNUMB": pa.array([r["OBJECTNUMB"] for r in rows],
                                   pa.int64()),
            "ANGLE": pa.array([r["ANGLE"] for r in rows], pa.float64()),
            "TEXT": pa.array([r["TEXT"] for r in rows], pa.string()),
        }
        for k in sem_keys:
            vals = [r.get(k) for r in rows]
            if any(isinstance(v, str) for v in vals):
                cols[k] = pa.array([None if v is None else str(v)
                                    for v in vals], pa.string())
            else:
                cols[k] = pa.array(vals, pa.float64())
        out[name] = pa.table(cols)
    return out
