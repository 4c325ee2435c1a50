"""GMT ASCII vector driver (reference ogr/ogrsf_frmts/gmt).

A .gmt file: ``# @VGMT1.0 @G<GEOMTYPE>`` header, ``@N`` field names
and ``@T`` types (string/integer/double/datetime), then features:
``>`` segment separators, ``# @D`` attribute rows (|-separated,
double-quoted strings), and ``x y`` coordinate lines.  A new ``@D``
starts a new feature; additional ``>`` segments without one are
further parts of the same (multi) geometry; ``@P``/``@H`` mark
polygon shells and holes.  The writer emits the same layout (region
header + per-feature @D rows), round-trippable with the reader."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _parse_attr_row(line: str) -> list[str]:
    body = line.split("@D", 1)[1].strip()
    out = []
    cur = ""
    in_q = False
    for ch in body:
        if ch == '"':
            in_q = not in_q
        elif ch == "|" and not in_q:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    out.append(cur)
    return out


def read_gmt(path: str) -> pa.Table:
    with open(path, encoding="utf-8", errors="replace") as f:
        lines = f.read().splitlines()

    gtype = "LINESTRING"
    names: list[str] = []
    types: list[str] = []
    feats: list[dict] = []
    cur: dict | None = None
    cur_part: list | None = None

    def close_part():
        nonlocal cur_part
        if cur is not None and cur_part:
            cur["parts"].append(np.array(cur_part))
        cur_part = []

    def new_feature(attrs=None):
        nonlocal cur, cur_part
        close_part()
        cur = {"attrs": attrs, "parts": [], "holes": []}
        feats.append(cur)
        cur_part = []

    for line in lines:
        s = line.strip()
        if s.startswith("#"):
            m = re.search(r"@G(\w+)", s)
            if m and "@VGMT" in s:
                gtype = m.group(1)
            elif "@N" in s and not names:
                names = s.split("@N", 1)[1].strip().split("|")
            elif "@T" in s and not types:
                types = s.split("@T", 1)[1].strip().split("|")
            elif "@D" in s:
                if cur is None or cur["attrs"] is not None:
                    new_feature(_parse_attr_row(s))
                else:
                    cur["attrs"] = _parse_attr_row(s)
            continue
        if s.startswith(">"):
            if cur is None:
                new_feature(None)
            else:
                close_part()
            continue
        if not s:
            continue
        toks = s.split()
        try:
            x, y = float(toks[0]), float(toks[1])
        except (ValueError, IndexError):
            continue
        if cur is None:
            new_feature(None)
        cur_part.append((x, y))
    close_part()

    def fmt(v):
        return "%.12g" % v

    wkts = []
    rows = []
    for feat in feats:
        parts = feat["parts"]
        if not parts:
            continue
        if gtype.endswith("POINT") and "MULTI" not in gtype:
            wkt = "POINT (%s %s)" % (fmt(parts[0][0][0]),
                                     fmt(parts[0][0][1]))
        elif gtype == "MULTIPOINT":
            pts = np.vstack(parts)
            wkt = "MULTIPOINT (%s)" % ",".join(
                "%s %s" % (fmt(p[0]), fmt(p[1])) for p in pts)
        elif gtype == "LINESTRING":
            wkt = "LINESTRING (%s)" % ",".join(
                "%s %s" % (fmt(p[0]), fmt(p[1])) for p in parts[0])
        elif gtype == "MULTILINESTRING":
            wkt = "MULTILINESTRING (%s)" % ",".join(
                "(%s)" % ",".join("%s %s" % (fmt(p[0]), fmt(p[1]))
                                  for p in part) for part in parts)
        elif gtype == "POLYGON":
            wkt = "POLYGON (%s)" % ",".join(
                "(%s)" % ",".join("%s %s" % (fmt(p[0]), fmt(p[1]))
                                  for p in ring) for ring in parts)
        else:  # MULTIPOLYGON: each part one shell (holes via @H ignored)
            wkt = "MULTIPOLYGON (%s)" % ",".join(
                "((%s))" % ",".join("%s %s" % (fmt(p[0]), fmt(p[1]))
                                    for p in ring) for ring in parts)
        row = {}
        attrs = feat["attrs"] or []
        for i, name in enumerate(names):
            v = attrs[i] if i < len(attrs) else None
            t = types[i] if i < len(types) else "string"
            if v is None or v == "":
                row[name] = None
            elif t == "integer":
                row[name] = int(v)
            elif t == "double":
                row[name] = float(v)
            else:
                row[name] = v
        row["wkt"] = wkt
        rows.append(row)

    cols = names + ["wkt"]
    arrays = []
    for i, c in enumerate(cols):
        vals = [r.get(c) for r in rows]
        t = types[i] if i < len(types) else "string"
        if c != "wkt" and t == "integer":
            arrays.append(pa.array(vals, pa.int64()))
        elif c != "wkt" and t == "double":
            arrays.append(pa.array(
                [float(v) if v is not None else None for v in vals],
                pa.float64()))
        else:
            arrays.append(pa.array(
                [None if v is None else str(v) for v in vals], pa.string()))
    return pa.table(arrays, names=cols)


def write_gmt(path: str, table: pa.Table, geom_type="POLYGON"):
    """Write a table with a ``wkt`` column to .gmt."""
    names = [c for c in table.column_names if c != "wkt"]

    def typename(field):
        import pyarrow.types as pt

        if pt.is_integer(field.type):
            return "integer"
        if pt.is_floating(field.type):
            return "double"
        return "string"

    types = [typename(table.schema.field(c)) for c in names]
    with open(path, "w", encoding="utf-8") as f:
        f.write("# @VGMT1.0 @G%s\n" % geom_type)
        f.write("# @N%s\n" % "|".join(names))
        f.write("# @T%s\n" % "|".join(types))
        f.write("# FEATURE_DATA\n")
        for r in table.to_pylist():
            f.write(">\n")
            vals = []
            for c, t in zip(names, types):
                v = r.get(c)
                if v is None:
                    vals.append("")
                elif t == "string":
                    vals.append('"%s"' % v)
                else:
                    vals.append(str(v))
            f.write("# @D%s\n" % "|".join(vals))
            wkt = r["wkt"] or ""
            rings = re.findall(r"\(([^()]+)\)", wkt)
            first = True
            for ring in rings:
                if not first:
                    f.write(">\n# @H\n" if geom_type.endswith("POLYGON")
                            else ">\n")
                first = False
                for pair in ring.split(","):
                    xy = pair.split()
                    f.write("%s %s\n" % (xy[0], xy[1]))
