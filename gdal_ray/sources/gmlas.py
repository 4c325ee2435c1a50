"""GMLAS — schema-driven GML/XML feature flattening (scoped subset).

Re-derives the core of ogr/ogrsf_frmts/gmlas (XSD-driven layer
building + element flattening; VERDICT r4 directive #8 scoped to
"element flattening + typed fields" over the reference's own
autotest/ogr/data/gmlas fixture families):

- global elements with complex types become LAYERS;
- nested single-occurrence elements and attributes FLATTEN into
  underscore-joined field paths (``a`` > ``b`` > ``@int_attr`` ->
  ``a_b_int_attr``), with XSD simple types mapped to Arrow types;
- repeated leaf elements (attribute-only / simple content) flatten
  to LIST fields (the reference's choice_*_inlined cases);
- repeated references to complex elements become a JUNCTION layer
  (``<parent>_<property>`` with ``parent_ogr_pkid`` +
  ``<Target>_pkid``) plus the target element's own layer, linked by
  generated pkids (the geosciml composition/compositionPart shape).

Out of scope (documented, like SURVEY §12 entries): xlink resolution,
swe/iso19139 profiles, schema caching, OGR geometry columns beyond
GML passthrough, and the full substitution-group matrix.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np  # noqa: F401  (kept for parity with sibling sources)
import pyarrow as pa

_XS = "{http://www.w3.org/2001/XMLSchema}"

_TYPE_MAP = {
    "string": pa.string(), "ID": pa.string(), "anyURI": pa.string(),
    "int": pa.int32(), "integer": pa.int64(), "long": pa.int64(),
    "short": pa.int32(), "byte": pa.int32(),
    "double": pa.float64(), "float": pa.float64(),
    "decimal": pa.float64(), "boolean": pa.bool_(),
    "date": pa.string(), "dateTime": pa.string(),
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xs_type(name: str | None):
    if not name:
        return None
    return _TYPE_MAP.get(name.rsplit(":", 1)[-1])


class _Schema:
    def __init__(self, root: ET.Element):
        self.elements: dict[str, ET.Element] = {}
        self.types: dict[str, ET.Element] = {}
        for child in root:
            if child.tag == f"{_XS}element":
                self.elements[child.get("name")] = child
            elif child.tag == f"{_XS}complexType":
                self.types[child.get("name")] = child

    def resolve_type(self, elt: ET.Element) -> ET.Element | None:
        """The complexType node governing an element declaration."""
        t = elt.get("type")
        if t:
            return self.types.get(t.rsplit(":", 1)[-1])
        return elt.find(f"{_XS}complexType")

    def element(self, ref: str) -> ET.Element | None:
        return self.elements.get(ref.rsplit(":", 1)[-1])


def _particles(ctype: ET.Element, schema: "_Schema | None" = None):
    """Flattened (element-decl, maxOccurs) particles of a complex
    type: sequence / choice / nested combinations; with ``schema``,
    a complexContent/extension's BASE type contributes its particles
    first (xs derivation-by-extension order)."""
    out = []
    if schema is not None:
        ext = ctype.find(f"{_XS}complexContent/{_XS}extension")
        if ext is not None and ext.get("base"):
            base = schema.types.get(ext.get("base").rsplit(":", 1)[-1])
            if base is not None:
                out.extend(_particles(base, schema))

    def walk(node, inherited_max=1):
        for ch in node:
            tag = _local(ch.tag)
            if tag in ("sequence", "choice", "complexContent",
                       "extension"):
                mx = ch.get("maxOccurs", "1")
                m = (10 ** 9 if mx == "unbounded" else int(mx))
                walk(ch, max(inherited_max, m))
            elif tag == "element":
                mx = ch.get("maxOccurs", "1")
                m = (10 ** 9 if mx == "unbounded" else int(mx))
                out.append((ch, max(inherited_max, m)))

    walk(ctype)
    return out


def _attributes(ctype: ET.Element, schema: "_Schema | None" = None):
    out = []
    if schema is not None:
        ext = ctype.find(f"{_XS}complexContent/{_XS}extension")
        if ext is not None and ext.get("base"):
            base = schema.types.get(ext.get("base").rsplit(":", 1)[-1])
            if base is not None:
                out.extend(_attributes(base, schema))
    out += [(a.get("name"), _xs_type(a.get("type")) or pa.string())
            for a in ctype.findall(f"{_XS}attribute")]
    # extension attributes live under the extension node itself
    ext = ctype.find(f"{_XS}complexContent/{_XS}extension")
    if ext is not None:
        out += [(a.get("name"), _xs_type(a.get("type")) or pa.string())
                for a in ext.findall(f"{_XS}attribute")]
    return out


def _is_leaf_type(schema: _Schema, ctype: ET.Element | None) -> bool:
    """Attribute-only / simple-content type: flattens inline (list
    fields when repeated) instead of spawning a layer."""
    if ctype is None:
        return True
    return not _particles(ctype, schema)


class _LayerBuilder:
    def __init__(self, schema: _Schema):
        self.schema = schema
        self.rows: dict[str, list[dict]] = {}
        self.fields: dict[str, dict[str, pa.DataType]] = {}
        self.counter: dict[str, int] = {}

    def _add(self, layer: str, row: dict, types: dict):
        self.rows.setdefault(layer, []).append(row)
        f = self.fields.setdefault(layer, {})
        for k, t in types.items():
            f.setdefault(k, t)

    def _pkid(self, layer: str) -> str:
        n = self.counter.get(layer, 0)
        self.counter[layer] = n + 1
        return f"{layer}_{n}"

    def read_element(self, decl: ET.Element, node: ET.Element,
                     layer: str) -> str:
        """Materialize one feature of `layer`; returns its pkid."""
        row: dict = {}
        types: dict = {"ogr_pkid": pa.string()}
        row["ogr_pkid"] = self._pkid(layer)
        self._flatten(decl, node, "", row, types, layer,
                      row["ogr_pkid"])
        self._add(layer, row, types)
        return row["ogr_pkid"]

    def _flatten(self, decl, node, prefix, row, types, layer,
                 parent_pkid):
        ctype = self.schema.resolve_type(decl)
        if ctype is None:
            return
        for aname, atype in _attributes(ctype, self.schema):
            key = f"{prefix}{aname}"
            types[key] = atype
            v = node.get(aname)
            if v is not None:
                row[key] = _coerce(v, atype)
        for child_decl, mx in _particles(ctype, self.schema):
            ref = child_decl.get("ref")
            cdecl = (self.schema.element(ref) if ref else child_decl)
            if cdecl is None:
                continue
            cname = cdecl.get("name")
            matches = [ch for ch in node if _local(ch.tag) == cname]
            st = _xs_type(cdecl.get("type"))
            cctype = self.schema.resolve_type(cdecl)
            # cctype None with no simple type = xs:anyType -> treat
            # as string text content (single or list)
            if st is not None or cctype is None or (
                    not _particles(cctype, self.schema)
                    and not _attributes(cctype, self.schema)):
                # simple-typed element -> scalar or list field
                t = st or pa.string()
                key = f"{prefix}{cname}"
                if mx > 1:
                    types[key] = pa.list_(t)
                    row[key] = [_coerce(ch.text, t) for ch in matches]
                else:
                    types[key] = t
                    if matches:
                        row[key] = _coerce(matches[0].text, t)
                continue
            if mx > 1 and _is_leaf_type(self.schema, cctype):
                # repeated attribute-only element -> list fields
                for aname, atype in _attributes(cctype, self.schema):
                    key = f"{prefix}{cname}_{aname}"
                    types[key] = pa.list_(atype)
                    row[key] = [_coerce(ch.get(aname), atype)
                                for ch in matches]
                continue
            if mx > 1:
                # repeated complex property -> junction layer; its
                # single complex child element gets its own layer
                jname = f"{layer}_{prefix}{cname}"
                for ch in matches:
                    for tdecl, _m in _particles(cctype, self.schema):
                        tref = tdecl.get("ref")
                        tdecl2 = (self.schema.element(tref) if tref
                                  else tdecl)
                        tname = tdecl2.get("name")
                        for g in [g for g in ch
                                  if _local(g.tag) == tname]:
                            # one junction row PER (parent, child)
                            # pair — a property holding several
                            # targets links each of them
                            pk = self.read_element(tdecl2, g, tname)
                            self._add(jname,
                                      {"parent_ogr_pkid": parent_pkid,
                                       f"{tname}_pkid": pk},
                                      {"parent_ogr_pkid": pa.string(),
                                       f"{tname}_pkid": pa.string()})
                continue
            if _is_leaf_type(self.schema, cctype):
                # single attribute-only referenced element -> inline
                for ch in matches[:1]:
                    self._flatten(cdecl, ch, f"{prefix}{cname}_",
                                  row, types, layer, parent_pkid)
                if not matches and cctype is not None:
                    for aname, atype in _attributes(cctype,
                                                    self.schema):
                        types[f"{prefix}{cname}_{aname}"] = atype
                continue
            # single inlined complex element -> flatten with prefix
            for ch in matches[:1]:
                self._flatten(cdecl, ch, f"{prefix}{cname}_", row,
                              types, layer, parent_pkid)


def _coerce(v, t):
    if v is None:
        return None
    v = v.strip() if isinstance(v, str) else v
    base = t.value_type if pa.types.is_list(t) else t
    if pa.types.is_integer(base):
        return int(v)
    if pa.types.is_floating(base):
        return float(v)
    if pa.types.is_boolean(base):
        return v in ("1", "true")
    return v


def read_gmlas(xml_path: str, xsd_path: str | None = None
               ) -> dict[str, pa.Table]:
    """Open an XML/GML document through its XSD -> {layer: table}.

    The XSD is found from xsi:(noNamespace)SchemaLocation when not
    given explicitly (GMLAS:<file> open semantics)."""
    import os

    doc = ET.parse(xml_path).getroot()
    if xsd_path is None:
        xsi = "{http://www.w3.org/2001/XMLSchema-instance}"
        loc = doc.get(f"{xsi}noNamespaceSchemaLocation")
        if loc is None:
            sl = doc.get(f"{xsi}schemaLocation")
            if sl:
                loc = sl.split()[-1]
        if loc is None:
            raise ValueError("no schemaLocation and no xsd given")
        xsd_path = os.path.join(os.path.dirname(xml_path), loc)
    schema = _Schema(ET.parse(xsd_path).getroot())

    b = _LayerBuilder(schema)
    root_name = _local(doc.tag)
    decl = schema.elements.get(root_name)
    if decl is None:
        raise ValueError(f"root element {root_name!r} not in schema")
    b.read_element(decl, doc, root_name)

    out = {}
    for layer, rows in b.rows.items():
        ftypes = b.fields[layer]
        cols = {}
        for name, t in ftypes.items():
            cols[name] = pa.array([r.get(name) for r in rows], t)
        out[layer] = pa.table(cols)
    return out
