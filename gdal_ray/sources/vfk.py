"""Czech cadastre VFK (ISKN exchange) vector driver (reference
ogr/ogrsf_frmts/vfk; the VFK exchange format is publicly
documented by CUZK).

A .vfk file is ``&``-prefixed lines in a Central-European codepage
(``&HCODEPAGE;"WE8ISO8859P2"`` -> latin-2): ``&B<TABLE>;COL TYPE;...``
block/schema declarations (types N<width> numeric, T<width> text,
D date), ``&D<TABLE>;v1;v2;...`` data rows (quoted strings,
semicolons inside quotes kept), ``&H`` header metadata.  Every declared table becomes a
layer in declaration order, like the reference's 61 layers for
bylany.vfk.  Geometry: SOBR/SPOL carry point coordinates
(SOURADNICE_Y/X — the S-JTSK axes are negated east/north, rendered
as (-Y, -X) like the reference); SBP rows link geometry points into
line segments by (BP_ID, PORADOVE_CISLO_BODU)."""

from __future__ import annotations

import re

import pyarrow as pa


def _split_semi(line: str) -> list[str]:
    out = []
    cur = ""
    in_q = False
    for ch in line:
        if ch == '"':
            in_q = not in_q
            cur += ch
        elif ch == ";" and not in_q:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    out.append(cur)
    return out


def read_vfk(path: str) -> dict[str, pa.Table]:
    with open(path, "rb") as f:
        raw = f.read()
    text = raw.decode("iso-8859-2", errors="replace")

    schemas: dict[str, list[tuple[str, str]]] = {}
    order: list[str] = []
    rows: dict[str, list[list]] = {}
    pending = ""
    for line in text.splitlines():
        if pending:
            line = pending + line
            pending = ""
        if line.endswith("¤"):  # VFK continuation marker
            pending = line[:-1]
            continue
        if not line.startswith("&"):
            continue
        kind = line[1]
        body = line[2:]
        if kind == "B":
            parts = _split_semi(body)
            name = parts[0]
            if len(parts) > 1 and " " in parts[1]:
                cols = []
                ok = True
                for p in parts[1:]:
                    toks = p.strip().split()
                    if len(toks) != 2 or not re.match(
                            r"^[NTD]\d*(\.\d+)?$", toks[1]):
                        ok = False
                        break
                    cols.append((toks[0], toks[1]))
                if ok and cols:
                    schemas[name] = cols
                    order.append(name)
                    rows[name] = []
        elif kind == "D":
            parts = _split_semi(body)
            name = parts[0]
            if name in schemas:
                vals = parts[1:]
                rows[name].append(vals)

    out: dict[str, pa.Table] = {}
    for name in order:
        cols = schemas[name]
        data = rows[name]
        arrays = []
        names = []
        for i, (cname, ctype) in enumerate(cols):
            vals = []
            for r in data:
                v = r[i] if i < len(r) else ""
                v = v.strip()
                if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                    v = v[1:-1]
                if v == "":
                    vals.append(None)
                elif ctype.startswith("N"):
                    try:
                        vals.append(float(v) if "." in v else int(v))
                    except ValueError:
                        vals.append(None)
                else:
                    vals.append(v)
            names.append(cname)
            if ctype.startswith("N") and "." not in ctype:
                try:
                    arrays.append(pa.array(vals, pa.int64()))
                except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                    arrays.append(pa.array(
                        [float(v) if v is not None else None for v in vals],
                        pa.float64()))
            elif ctype.startswith("N"):
                arrays.append(pa.array(
                    [float(v) if v is not None else None for v in vals],
                    pa.float64()))
            else:
                arrays.append(pa.array(
                    [None if v is None else str(v) for v in vals],
                    pa.string()))
        tab = pa.table(arrays, names=names)
        # point geometry for the geometry-point tables
        if name in ("SOBR", "SPOL") and "SOURADNICE_Y" in names and \
                "SOURADNICE_X" in names:
            wkts = []
            for y, x in zip(tab["SOURADNICE_Y"].to_pylist(),
                            tab["SOURADNICE_X"].to_pylist()):
                if y is None or x is None:
                    wkts.append(None)
                else:
                    # S-JTSK: east = -Y, north = -X (the reference's
                    # axis handling)
                    wkts.append("POINT (%.2f %.2f)" % (-float(y),
                                                       -float(x)))
            tab = tab.append_column("wkt", pa.array(wkts, pa.string()))
        out[name] = tab
    return out
