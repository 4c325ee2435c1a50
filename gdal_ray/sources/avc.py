"""Arc/Info E00 (AVCE00) vector driver (reference
ogr/ogrsf_frmts/avc; the E00 interchange format is publicly
documented at avce00.maptools.org).

An E00 file is ASCII sections after an ``EXP 0`` header:

- ``ARC``: per-arc header (arc#, user-id, fnode, tnode, lpoly,
  rpoly, n-vertices) then %14.7E coordinate pairs, two per line;
- ``LAB``: label points (id, polyid, x, y + a bbox line);
- ``CNT``: polygon centroids;
- ``PAL``: per-polygon arc lists — (n-arcs, bbox) then (arc-id,
  fnode, adjacent-poly) triplets; the first record is the universe
  polygon (skipped, like the reference); ring geometry chains the
  listed arcs by endpoint connectivity starting from the first arc's
  stored direction;
- ``IFO``: INFO tables — item definitions (name, storage size,
  position, output width, type: 50 int / 60 float / 20 char / 40
  date) followed by fixed-width records hard-wrapped at 80 columns
  (ints print in 11 columns, floats in 14, chars in their output
  width — verified against the reference's own fixtures).

Layers produced: ``ARC`` (UserID + FNODE/TNODE/LPOLY/RPOLY +
linestring), ``LAB`` points (ValueId + joined .PAT attributes),
``PAL`` polygons (ArcIds + joined .PAT attributes), ``CNT``
centroids.  Compressed E00 ("EXP 1") raises like the reference
refuses it."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def _fmt(v: float) -> str:
    s = "%.15g" % v
    if "." not in s and "e" not in s and "E" not in s:
        s += ".0"
    return s


def _parse_ifo_tables(lines: list[str], i: int):
    tables = {}
    n = len(lines)
    while i < n:
        line = lines[i]
        if line.startswith("EOI"):
            i += 1
            break
        # table header: NAME [XX] nitems nitems2 reclen nrecords
        m = re.match(r"\s*(\S+)\s+(?:XX\s+)?(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*$",
                     line)
        if not m:
            i += 1
            continue
        tname = m.group(1)
        nitems = int(m.group(2))
        nrecords = int(m.group(5))
        i += 1
        items = []  # (name, print_width, kind)
        for _ in range(nitems):
            parts = lines[i].split()
            name = parts[0]
            # type code is in the token list: 50=int, 60=float, 20=char,
            # 40=date; output width precedes it
            text = lines[i]
            if re.search(r"\b50-1\b|\s50\s", text):
                kind, width = "int", 11
            elif re.search(r"\b60-1\b|\s60\s", text):
                kind, width = "float", 14
            elif re.search(r"\b40-1\b", text):
                kind, width = "date", 8
            else:
                kind = "char"
                m2 = re.match(r"\s*\S+\s+(\d+)-", lines[i])
                width = int(m2.group(1)) if m2 else 20
            items.append((name, width, kind))
            i += 1
        recwidth = sum(w for _n, w, _k in items)
        lines_per_rec = max(1, -(-recwidth // 80))
        rows = []
        for _ in range(nrecords):
            chunk = ""
            for j in range(lines_per_rec):
                raw = lines[i] if i < n else ""
                i += 1
                chunk += raw.ljust(80)
            pos = 0
            row = {}
            for name, width, kind in items:
                txt = chunk[pos:pos + width].strip()
                pos += width
                if kind == "int":
                    try:
                        row[name] = int(txt)
                    except ValueError:
                        row[name] = None
                elif kind == "float":
                    try:
                        row[name] = float(txt)
                    except ValueError:
                        row[name] = None
                else:
                    row[name] = txt
            rows.append(row)
        tables[tname] = rows
    return tables, i


def read_e00(path: str) -> dict[str, pa.Table]:
    with open(path, errors="replace") as f:
        lines = f.read().splitlines()
    if not lines or not lines[0].startswith("EXP"):
        raise ValueError("not an E00 file")
    if lines[0].split()[1] != "0":
        raise ValueError("compressed E00 not supported (like the reference)")

    arcs = {}  # arc# -> dict
    labs = []
    cnts = []
    pals = []
    tables = {}
    i = 1
    n = len(lines)
    while i < n:
        line = lines[i]
        tok = line.split()
        sec = tok[0] if tok else ""
        if sec == "ARC":
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if int(hdr[0]) == -1:
                    break
                arcnum, userid, fnode, tnode, lpoly, rpoly, npts = \
                    map(int, hdr[:7])
                coords = []
                while len(coords) < npts * 2:
                    coords.extend(float(x) for x in lines[i].split())
                    i += 1
                pts = np.array(coords).reshape(-1, 2)[:npts]
                arcs[arcnum] = {"UserID": userid, "FNODE": fnode,
                                "TNODE": tnode, "LPOLY": lpoly,
                                "RPOLY": rpoly, "pts": pts}
        elif sec == "LAB":
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if int(hdr[0]) == -1:
                    break
                labs.append({"ValueId": int(hdr[0]),
                             "PolyId": int(hdr[1]),
                             "x": float(hdr[2]), "y": float(hdr[3])})
                i += 1  # bbox line
        elif sec == "CNT":
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if int(hdr[0]) == -1:
                    break
                nlabels = int(hdr[0])
                cnts.append({"x": float(hdr[1]), "y": float(hdr[2])})
                for _ in range(nlabels):
                    i += 1
        elif sec == "PAL":
            i += 1
            while i < n:
                hdr = lines[i].split()
                i += 1
                if int(hdr[0]) == -1:
                    break
                narcs = int(hdr[0])
                trip = []
                while len(trip) < narcs * 3:
                    trip.extend(int(x) for x in lines[i].split())
                    i += 1
                arcids = [trip[j * 3] for j in range(narcs)]
                pals.append({"ArcIds": arcids})
        elif sec == "IFO":
            tables, i = _parse_ifo_tables(lines, i + 1)
        elif sec in ("TOL", "SIN", "LOG", "PRJ", "TX6", "TX7", "RXP",
                     "RPL"):
            i += 1
            # skip until terminator
            if sec == "PRJ":
                while i < n and not lines[i].startswith("EOP"):
                    i += 1
                i += 1
            elif sec == "SIN":
                while i < n and not lines[i].startswith("EOX"):
                    i += 1
                i += 1
            elif sec == "LOG":
                while i < n and not lines[i].startswith("EOL"):
                    i += 1
                i += 1
            else:
                while i < n and not lines[i].split()[:1] == ["-1"]:
                    i += 1
                i += 1
        else:
            i += 1

    def pat_table():
        for name, rows in tables.items():
            if name.upper().endswith(".PAT"):
                return rows
        return []

    out = {}
    if arcs:
        rows = sorted(arcs.values(), key=lambda a: a["UserID"])
        out["ARC"] = pa.table({
            "UserID": pa.array([str(a["UserID"]) for a in rows],
                               pa.string()),
            "FNODE": pa.array([a["FNODE"] for a in rows], pa.int32()),
            "TNODE": pa.array([a["TNODE"] for a in rows], pa.int32()),
            "LPOLY": pa.array([a["LPOLY"] for a in rows], pa.int32()),
            "RPOLY": pa.array([a["RPOLY"] for a in rows], pa.int32()),
            "wkt": pa.array(["LINESTRING (%s)" % ",".join(
                "%s %s" % (_fmt(x), _fmt(y)) for x, y in a["pts"])
                for a in rows], pa.string())})
    if labs:
        pat = pat_table()
        cols: dict[str, list] = {"ValueId": []}
        wkts = []
        for k, lab in enumerate(labs):
            cols["ValueId"].append(lab["ValueId"])
            wkts.append("POINT (%s %s)" % (_fmt(lab["x"]), _fmt(lab["y"])))
            # PAT row k+1 is universe-less for point coverages
            prow = pat[k] if k < len(pat) else {}
            for pk, pv in prow.items():
                cols.setdefault(pk, [None] * k).append(pv)
            for ck in cols:
                if ck != "ValueId" and len(cols[ck]) < k + 1:
                    cols[ck].append(None)
        arrays, names = [], []
        for ck, vals in cols.items():
            names.append(ck)
            arrays.append(pa.array(vals))
        names.append("wkt")
        arrays.append(pa.array(wkts, pa.string()))
        out["LAB"] = pa.table(arrays, names=names)
    if pals:
        pat = pat_table()
        rows = []
        for k, p in enumerate(pals):
            if k == 0:
                continue  # universe polygon
            ring = _assemble_pal_ring(p["ArcIds"], arcs)
            wkt = ("POLYGON ((%s))" % ",".join(
                "%s %s" % (_fmt(x), _fmt(y)) for x, y in ring)
                if ring is not None else None)
            row = {"ArcIds": p["ArcIds"], "wkt": wkt}
            if k < len(pat):
                row.update(pat[k])
            rows.append(row)
        cols = {}
        for r in rows:
            for ck in r:
                cols.setdefault(ck, [])
        for r in rows:
            for ck in cols:
                cols[ck].append(r.get(ck))
        arrays, names = [], []
        for ck, vals in cols.items():
            names.append(ck)
            if ck == "ArcIds":
                arrays.append(pa.array(vals, pa.list_(pa.int32())))
            else:
                arrays.append(pa.array(vals))
        out["PAL"] = pa.table(arrays, names=names)
    if cnts:
        out["CNT"] = pa.table({
            "wkt": pa.array(["POINT (%s %s)" % (_fmt(c["x"]), _fmt(c["y"]))
                             for c in cnts], pa.string())})
    return out


def _assemble_pal_ring(arcids, arcs):
    """Chain the listed arcs by endpoint connectivity, starting from
    the first arc in its stored direction (matches the reference's
    ring output for the autotest coverages)."""
    segs = []
    for aid in arcids:
        a = arcs.get(abs(aid))
        if a is None or aid == 0:
            continue
        segs.append([tuple(p) for p in a["pts"]])
    if not segs:
        return None
    ring = list(segs[0])
    rest = segs[1:]
    while rest and ring[0] != ring[-1]:
        for j, s in enumerate(rest):
            if s[0] == ring[-1]:
                ring.extend(s[1:])
                rest.pop(j)
                break
            if s[-1] == ring[-1]:
                ring.extend(reversed(s[:-1]))
                rest.pop(j)
                break
        else:
            break
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    return ring
