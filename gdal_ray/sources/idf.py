"""VDV IDF (INTREST Data Format) vector driver (reference
ogr/ogrsf_frmts/vdv/ogrvdvdatasource.cpp IDF reader).

Semicolon-delimited sections: ``tbl;Name`` opens a table, ``atr``
lists columns, ``frm`` their types (decimal(n[,m]) -> int/float,
string(n)), ``rec`` rows (quoted strings), ``end`` closes.  The
Node / Link / LinkCoordinate trio builds geometry like the
reference: nodes are POINTs, links become LINESTRINGs from
FROM_NODE -> ordered LinkCoordinate points -> TO_NODE, and
LinkCoordinate rows surface as POINTs."""

from __future__ import annotations

import pyarrow as pa


def read_idf(path: str) -> dict[str, pa.Table]:
    with open(path, encoding="latin-1") as f:
        lines = f.read().splitlines()

    tables: dict[str, dict] = {}
    cur = None
    for line in lines:
        parts = line.split(";")
        key = parts[0]
        if key == "tbl":
            cur = {"name": parts[1].strip(), "atr": [], "frm": [],
                   "rows": []}
            tables[cur["name"]] = cur
        elif key == "atr" and cur is not None:
            cur["atr"] = [p.strip() for p in parts[1:] if p.strip()]
        elif key == "frm" and cur is not None:
            cur["frm"] = [p.strip() for p in parts[1:] if p.strip()]
        elif key == "rec" and cur is not None:
            vals = parts[1:]
            row = []
            for i, v in enumerate(vals):
                v = v.strip()
                frm = cur["frm"][i] if i < len(cur["frm"]) else "string"
                if v.startswith('"') and v.endswith('"'):
                    row.append(v[1:-1])
                elif frm.startswith("decimal") and "," in frm:
                    row.append(float(v) if v else None)
                elif frm.startswith("decimal"):
                    row.append(int(v) if v else None)
                else:
                    row.append(v or None)
            cur["rows"].append(row)
        elif key == "end":
            cur = None

    def table_dicts(name):
        t = tables.get(name)
        if not t:
            return []
        return [dict(zip(t["atr"], r)) for t2 in [t] for r in t["rows"]]

    nodes = {r["NODE_ID"]: (r.get("X"), r.get("Y"))
             for r in table_dicts("Node") if "NODE_ID" in r}
    link_coords: dict[int, list] = {}
    for r in table_dicts("LinkCoordinate"):
        link_coords.setdefault(r.get("LINK_ID"), []).append(
            (r.get("COUNT"), r.get("X"), r.get("Y")))

    out: dict[str, pa.Table] = {}
    for name, t in tables.items():
        rows = table_dicts(name)
        wkts = None
        if name == "Node":
            wkts = ["POINT (%.10g %.10g)" % (r["X"], r["Y"]) for r in rows]
        elif name == "LinkCoordinate":
            wkts = ["POINT (%.10g %.10g)" % (r["X"], r["Y"]) for r in rows]
        elif name == "Link":
            wkts = []
            for r in rows:
                pts = []
                f = nodes.get(r.get("FROM_NODE"))
                if f and f[0] is not None:
                    pts.append(f)
                for _c, x, y in sorted(link_coords.get(r.get("LINK_ID"),
                                                       [])):
                    pts.append((x, y))
                to = nodes.get(r.get("TO_NODE"))
                if to and to[0] is not None:
                    pts.append(to)
                wkts.append("LINESTRING (%s)" % ",".join(
                    "%.10g %.10g" % p for p in pts)
                    if len(pts) >= 2 else None)
        cols = t["atr"]
        arrays = []
        for i, c in enumerate(cols):
            vals = [r.get(c) for r in rows]
            arrays.append(pa.array(vals))
        names = list(cols)
        if wkts is not None:
            names.append("wkt")
            arrays.append(pa.array(wkts, pa.string()))
        out[name] = pa.table(arrays, names=names)
    return out
