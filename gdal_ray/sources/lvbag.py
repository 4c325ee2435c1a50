"""Dutch Kadaster LVBAG (BAG 2.0 extract) vector driver (reference
ogr/ogrsf_frmts/lvbag, conformance ogr_lvbag.py).

A BAG extract XML carries one object type per file (LIG/NUM/OPR/PND/
STA/VBO/WPL) under ``sl:standBestand/sl:stand/sl-bag-extract:
bagObject``.  Each layer has a FIXED schema: the type-specific lead
fields, then identificatie, the document block (status,
geconstateerd, documentDatum, documentNummer) and the Historie
occurrence block (ogrlvbaglayer.cpp CreateFeatureDefn).  Values:
``identificatie``/``Objecten-ref:*Ref`` get the ``domein`` attribute
prefixed (15-digit ids are zero-padded to 16); ``geconstateerd``
J/N maps to 1/0; dates render ``YYYY/MM/DD`` and datetimes
``YYYY/MM/DD HH:MM:SS[.mmm]`` (trailing ``.000`` dropped) like OGR
field formatting.  Only the v20200601 schema is accepted — older
namespaces yield no layers.  Geometry (gml under
``Objecten:geometrie``) becomes WKT; Woonplaats polygons are
promoted to MULTIPOLYGON per the layer's declared type."""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

_COMMON = [
    "identificatie", "status", "geconstateerd", "documentDatum",
    "documentNummer", "voorkomenIdentificatie", "beginGeldigheid",
    "eindGeldigheid", "tijdstipRegistratie", "eindRegistratie",
    "tijdstipInactief", "tijdstipRegistratieLV",
    "tijdstipEindRegistratieLV", "tijdstipInactiefLV",
    "tijdstipNietBagLV",
]

SCHEMAS = {
    "Pand": ["oorspronkelijkBouwjaar"] + _COMMON,
    "Nummeraanduiding": ["huisnummer", "huisletter",
                         "huisnummerToevoeging", "postcode",
                         "typeAdresseerbaarObject", "openbareruimteRef",
                         "woonplaatsRef"] + _COMMON,
    "Ligplaats": ["hoofdadresNummeraanduidingRef",
                  "nevenadresNummeraanduidingRef"] + _COMMON,
    "Standplaats": ["hoofdadresNummeraanduidingRef",
                    "nevenadresNummeraanduidingRef"] + _COMMON,
    "Openbareruimte": ["naam", "type", "woonplaatsRef",
                       "verkorteNaam"] + _COMMON,
    "Verblijfsobject": ["gebruiksdoel", "oppervlakte",
                        "hoofdadresNummeraanduidingRef",
                        "nevenadresNummeraanduidingRef",
                        "pandRef"] + _COMMON,
    "Woonplaats": ["naam"] + _COMMON,
}

_INT_FIELDS = {"oorspronkelijkBouwjaar", "huisnummer", "geconstateerd",
               "voorkomenIdentificatie", "oppervlakte"}
_LIST_FIELDS = {"nevenadresNummeraanduidingRef", "pandRef",
                "gebruiksdoel"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _fix_id(v: str, domein: str) -> str | None:
    # 16-char BAG ids sometimes lose a leading zero
    # (ogrlvbaglayer.cpp nDefaultIdentifierSize handling)
    if len(v) == 15:
        v = "0" + v
    elif len(v) > 16:
        return None
    return (domein + "." + v) if domein else v


def _date(v: str) -> str:
    return v.replace("-", "/")


def _datetime(v: str) -> str:
    d, _, t = v.partition("T")
    if t.endswith(".000"):
        t = t[:-4]
    return d.replace("-", "/") + " " + t


def _gml_wkt(geom_el, promote_multi: bool = False) -> str | None:
    """gml Point/Polygon/MultiSurface under Objecten:geometrie."""

    def coords(el):
        txt = (el.text or "").split()
        dim = int(el.get("srsDimension", 0)) or None
        return txt, dim

    def ring_coords(ring, dim):
        pos = None
        for el in ring.iter():
            if _local(el.tag) == "posList":
                pos = el
                break
        if pos is None:
            return ""
        txt = (pos.text or "").split()
        d = dim or (3 if pos.get("count") and len(txt) %
                    (3 * int(pos.get("count"))) == 0 else 2)
        if pos.get("count"):
            n = int(pos.get("count"))
            d = len(txt) // n
        pts = ["%s %s" % (txt[i], txt[i + 1])
               for i in range(0, len(txt), d)]
        return ", ".join(pts)

    for el in geom_el.iter():
        t = _local(el.tag)
        if t == "Point":
            dim = int(el.get("srsDimension", "2"))
            for p in el.iter():
                if _local(p.tag) == "pos":
                    c = (p.text or "").split()
                    return "POINT (%s %s)" % (c[0], c[1])
            return None
        if t in ("Polygon", "PolygonPatch"):
            dim = int(el.get("srsDimension", "2")) if el.get(
                "srsDimension") else None
            rings = []
            for sub in el.iter():
                if _local(sub.tag) in ("exterior", "interior"):
                    rings.append("(" + ring_coords(sub, dim) + ")")
            wkt = "POLYGON (" + ", ".join(rings) + ")"
            if promote_multi:
                wkt = "MULTIPOLYGON ((" + wkt[len("POLYGON ("):]
                wkt = wkt[:-1] + "))"
            return wkt
        if t == "MultiSurface":
            dim = int(el.get("srsDimension", "2")) if el.get(
                "srsDimension") else None
            polys = []
            for poly in el.iter():
                if _local(poly.tag) == "Polygon":
                    rings = []
                    for sub in poly.iter():
                        if _local(sub.tag) in ("exterior", "interior"):
                            rings.append("(" + ring_coords(sub, dim) + ")")
                    polys.append("(" + ", ".join(rings) + ")")
            return "MULTIPOLYGON (" + ", ".join(polys) + ")"
    return None


_BY_LOWER = {k.lower(): k for k in SCHEMAS}


def _parse_object(obj) -> tuple[str, dict]:
    """One Objecten:<Type> element -> (layer name, field dict).  The
    XML element is e.g. OpenbareRuimte; the layer uses the
    reference's casing (Openbareruimte)."""
    lname = _BY_LOWER.get(_local(obj.tag).lower(), _local(obj.tag))
    rec: dict = {}

    def set_ref(field, ref_el):
        v = _fix_id((ref_el.text or "").strip(),
                    ref_el.get("domein", ""))
        if field in _LIST_FIELDS:
            rec.setdefault(field, []).append(v)
        else:
            rec[field] = v

    for ch in obj:
        t = _local(ch.tag)
        tl = t.lower()
        if tl == "identificatie":
            rec["identificatie"] = _fix_id((ch.text or "").strip(),
                                           ch.get("domein", ""))
        elif tl == "geconstateerd":
            rec["geconstateerd"] = 1 if (ch.text or "").strip().upper() \
                == "J" else 0
        elif tl == "documentdatum":
            rec["documentDatum"] = _date((ch.text or "").strip())
        elif tl == "documentnummer":
            rec["documentNummer"] = (ch.text or "").strip()
        elif tl == "heeftalshoofdadres":
            for r in ch.iter():
                if _local(r.tag).lower().endswith("ref"):
                    set_ref("hoofdadresNummeraanduidingRef", r)
        elif tl == "heeftalsnevenadres":
            for r in ch.iter():
                if _local(r.tag).lower().endswith("ref"):
                    set_ref("nevenadresNummeraanduidingRef", r)
        elif tl == "maaktdeeluitvan":
            for r in ch.iter():
                if _local(r.tag).lower().endswith("ref"):
                    set_ref("pandRef", r)
        elif tl == "ligtaan":
            for r in ch.iter():
                if _local(r.tag).lower().endswith("ref"):
                    set_ref("openbareruimteRef", r)
        elif tl == "ligtin":
            for r in ch.iter():
                if _local(r.tag).lower().endswith("ref"):
                    set_ref("woonplaatsRef", r)
        elif tl == "verkortenaam":
            txt = None
            for sub in ch.iter():
                if _local(sub.tag).lower() == "verkortenaam" and \
                        sub is not ch and (sub.text or "").strip():
                    txt = sub.text.strip()
            rec["verkorteNaam"] = txt
        elif tl == "gebruiksdoel":
            rec.setdefault("gebruiksdoel", []).append(
                (ch.text or "").strip())
        elif tl == "voorkomen":
            for sub in ch.iter():
                st = _local(sub.tag)
                stl = st.lower()
                v = (sub.text or "").strip()
                if not v:
                    continue
                if stl == "voorkomenidentificatie":
                    rec["voorkomenIdentificatie"] = int(v)
                elif stl in ("begingeldigheid", "eindgeldigheid"):
                    rec["beginGeldigheid" if stl.startswith("begin")
                        else "eindGeldigheid"] = _date(v)
                elif stl == "tijdstipregistratie":
                    rec["tijdstipRegistratie"] = _datetime(v)
                elif stl == "eindregistratie":
                    rec["eindRegistratie"] = _datetime(v)
                elif stl == "tijdstipinactief":
                    rec["tijdstipInactief"] = _datetime(v)
                elif stl == "tijdstipregistratielv":
                    rec["tijdstipRegistratieLV"] = _datetime(v)
                elif stl == "tijdstipeindregistratielv":
                    rec["tijdstipEindRegistratieLV"] = _datetime(v)
                elif stl == "tijdstipinactieflv":
                    rec["tijdstipInactiefLV"] = _datetime(v)
                elif stl == "tijdstipnietbaglv":
                    rec["tijdstipNietBagLV"] = _datetime(v)
        elif tl == "geometrie":
            rec["wkt"] = _gml_wkt(ch, promote_multi=(lname == "Woonplaats"))
        else:
            # plain scalar fields (huisnummer, postcode, naam, type,
            # status, oorspronkelijkBouwjaar, oppervlakte, ...)
            for f in SCHEMAS.get(lname, []):
                if f.lower() == tl:
                    v = (ch.text or "").strip()
                    rec[f] = int(v) if f in _INT_FIELDS else v
                    break
    return lname, rec


def _records_to_table(lname: str, recs: list[dict]) -> pa.Table:
    fields = SCHEMAS[lname]
    arrays = []
    names = []
    for f in fields:
        vals = [r.get(f) for r in recs]
        names.append(f)
        if f in _LIST_FIELDS:
            arrays.append(pa.array(vals, pa.list_(pa.string())))
        elif f in _INT_FIELDS:
            arrays.append(pa.array(vals, pa.int64()))
        else:
            arrays.append(pa.array(vals, pa.string()))
    if any("wkt" in r for r in recs):
        names.append("wkt")
        arrays.append(pa.array([r.get("wkt") for r in recs],
                               pa.string()))
    return pa.table(arrays, names=names)


def _parse_xml(data: bytes) -> tuple[str, list[dict]] | None:
    root = ET.fromstring(data)
    # only the v20200601 schema is supported (old_schema test)
    if "v20200601" not in data[:4096].decode("utf-8", "replace"):
        return None
    lname = None
    recs = []
    for obj_holder in root.iter():
        if _local(obj_holder.tag) != "bagObject":
            continue
        for obj in obj_holder:
            ln, rec = _parse_object(obj)
            if ln in SCHEMAS:
                lname = ln
                recs.append(rec)
    if lname is None:
        return None
    return lname, recs


def read_lvbag(path: str) -> dict[str, pa.Table]:
    """Layers keyed by object-type name, in first-seen order.  A .zip
    merges all member XMLs (same type concatenates, mixed types give
    multiple layers, like the reference's zip handling)."""
    per_layer: dict[str, list[dict]] = {}
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            for n in z.namelist():
                if not n.lower().endswith(".xml"):
                    continue
                parsed = _parse_xml(z.read(n))
                if parsed:
                    per_layer.setdefault(parsed[0], []).extend(parsed[1])
    else:
        with open(path, "rb") as f:
            parsed = _parse_xml(f.read())
        if parsed:
            per_layer[parsed[0]] = parsed[1]
    return {k: _records_to_table(k, v) for k, v in per_layer.items()}
