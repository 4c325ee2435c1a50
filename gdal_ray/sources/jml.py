"""OpenJUMP JML vector driver (reference ogr/ogrsf_frmts/jml).

A .jml file is a JCSDataFile: a JCSGMLInputTemplate declares the
collection/feature/geometry element names and the column set — each
column has a name, a type (STRING/INTEGER/DOUBLE/DATE/OBJECT) and a
value source: an element name (optionally filtered by an
attribute=value match) with the value in the element body or in a
named attribute.  Features carry GML geometry in the declared
geometry element (parsed with the engine's GML grammar).  The
R_G_B column styles features (BRUSH(fc:#RGB) for areas, PEN(c:#RGB)
otherwise, matching the reference's style mapping); DATE columns are
rendered in OGR datetime text ("YYYY/MM/DD HH:MM:SS[+TZ]")."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pyarrow as pa

from .gml import _local, _parse_gml_geom
from ..functions.wkb import POLYGON, MULTIPOLYGON, geom_to_wkt


def _ogr_datetime(txt: str) -> str:
    txt = txt.strip()
    m = re.match(r"(\d{4})[-/](\d{2})[-/](\d{2})"
                 r"(?:[T ](\d{2}):(\d{2}):(\d{2})(?:\.\d+)?)?"
                 r"(Z|[+-]\d{2}(?::?\d{2})?)?$", txt)
    if not m:
        return txt
    y, mo, d = m.group(1), m.group(2), m.group(3)
    h, mi, s = m.group(4) or "00", m.group(5) or "00", m.group(6) or "00"
    tz = m.group(7) or ""
    if tz == "Z":
        tz = "+00"
    elif tz:
        tz = tz.replace(":", "")
        if tz.endswith("00") and len(tz) == 5:
            tz = tz[:3]
    return "%s/%s/%s %s:%s:%s%s" % (y, mo, d, h, mi, s, tz)


def read_jml(path: str) -> pa.Table:
    root = ET.parse(path).getroot()
    tmpl = None
    for c in root:
        if _local(c.tag) == "JCSGMLInputTemplate":
            tmpl = c
    feat_el_name = "feature"
    geom_el_name = "geometry"
    coll_el_name = "featureCollection"
    columns = []  # (name, type, elem, attr_match, attr_val, loc, loc_attr)
    if tmpl is not None:
        for c in tmpl:
            t = _local(c.tag)
            if t == "CollectionElement" and c.text:
                coll_el_name = c.text.strip()
            elif t == "FeatureElement" and c.text:
                feat_el_name = c.text.strip()
            elif t == "GeometryElement" and c.text:
                geom_el_name = c.text.strip()
        # columns anywhere under the template (the autotest fixture
        # has a valid column after </ColumnDefinitions> and an
        # ignored one outside the template)
        for col in tmpl.iter():
            if _local(col.tag) == "column":
                    name = ctype = None
                    elem = attr_match = attr_val = None
                    loc, loc_attr = "body", None
                    for sub in col:
                        st = _local(sub.tag)
                        if st == "name":
                            name = (sub.text or "").strip()
                        elif st == "type":
                            ctype = (sub.text or "").strip().upper()
                        elif st == "valueElement":
                            elem = sub.get("elementName")
                            attr_match = sub.get("attributeName")
                            attr_val = sub.get("attributeValue")
                        elif st == "valueLocation":
                            loc = sub.get("position", "body")
                            loc_attr = sub.get("attributeName")
                    if name and elem:
                        columns.append((name, ctype or "STRING", elem,
                                        attr_match, attr_val, loc, loc_attr))

    # the collection element can be nested anywhere outside the
    # template; feature elements outside it are "not expected"
    coll = None
    for el in root.iter():
        if _local(el.tag) == coll_el_name and el is not tmpl:
            coll = el
            break

    rows = []
    wkts = []
    styles = []
    for feat in (coll.iter() if coll is not None else []):
        if _local(feat.tag) != feat_el_name:
            continue
        row = {}
        wkt = None
        is_area = False
        for child in feat.iter():
            if _local(child.tag) == geom_el_name:
                for g in child:
                    try:
                        geom = _parse_gml_geom(g)
                    except Exception:
                        geom = None
                    if geom is not None and len(geom.rings):
                        wkt = geom_to_wkt(geom, precision=12)
                        is_area = geom.kind in (POLYGON, MULTIPOLYGON)
                    break
        for name, ctype, elem, attr_match, attr_val, loc, loc_attr in columns:
            val = None
            for child in feat.iter():
                if _local(child.tag) != elem:
                    continue
                if attr_match and child.get(attr_match) != attr_val \
                        and attr_val is not None:
                    continue
                if loc == "attribute" and loc_attr:
                    val = child.get(loc_attr)
                else:
                    val = child.text
                break
            if val is not None:
                val = val.strip() if isinstance(val, str) else val
                if ctype == "INTEGER":
                    try:
                        val = int(val)
                    except ValueError:
                        val = None
                elif ctype == "DOUBLE":
                    try:
                        val = float(val)
                    except ValueError:
                        val = None
                elif ctype == "DATE":
                    val = _ogr_datetime(val)
            row[name] = val
        rgb = row.get("R_G_B")
        styles.append(("BRUSH(fc:#%s)" % rgb if is_area
                       else "PEN(c:#%s)" % rgb) if rgb else None)
        rows.append(row)
        wkts.append(wkt)

    names = [c[0] for c in columns]
    arrays = []
    for i, name in enumerate(names):
        vals = [r.get(name) for r in rows]
        ctype = columns[i][1]
        if ctype == "INTEGER":
            arrays.append(pa.array(vals, pa.int32()))
        elif ctype == "DOUBLE":
            arrays.append(pa.array(vals, pa.float64()))
        else:
            arrays.append(pa.array(
                [None if v is None else str(v) for v in vals], pa.string()))
    names = names + ["style", "wkt"]
    arrays += [pa.array(styles, pa.string()), pa.array(wkts, pa.string())]
    return pa.table(arrays, names=names)
