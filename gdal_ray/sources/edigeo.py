"""EDIGEO (French cadastre exchange, AFNOR NF Z 52000) vector driver.

Re-derivation of ogr/ogrsf_frmts/edigeo/ogredigeodatasource.cpp:

- identification: "RTYSA03:GTS" within the first 100 lines of the
  .THF (Open, :1355-1380); records are ``KEYTTNN:value`` lines (field
  significant when byte 7 is ':');
- THF: LON (lot name) + GNN/GON/QAN/DIN/SCN names and GDN VEC list
  (ReadTHF); sibling files open as <LON><name>.<EXT> case-insensitive;
- GEO: RELSA projection id -> Lambert zone / Lambert-93 EPSG;
- DIC: DID object RID->LAB, DIA attribute RID->(LAB, TYP with
  R/E real, I/N integer, else string);
- SCD: RTYSA OBJ blocks (DIPCP 4th token = DID name, KNDSA ARE/LIN/
  PCT -> polygon/line/point) and ATT blocks (AAPCP attribute list,
  CANSN width);
- QAL: QUP blocks ODASD/UDASD creation/update dates keyed by RID;
- VEC: PAR arc coordinate lists (CORCC x;y), PNO node coordinates,
  FEA attribute bags (ATPCP id + ATVS value with NEXT continuation
  and "TEXT 06:8859-1" latin-1 recode, or ATVCP composite), SCPCP OBJ
  layer assignment, QAPCP QUP link, LNK topology (PAR->PFE face
  membership, FEA->PFE faces, FEA->PAR lines, FEA->PNO points,
  FEA->FEA IS_S_REL_IWW label links);
- geometry assembly: points from PNO; lines as (multi)linestrings
  from the FEA->PAR arc list; polygons by chaining the face's arcs
  end-to-end with reversal (BuildPolygon:1128-1240), shell/hole
  assignment by signed-area + containment in place of
  organizePolygons;
- layer per SCD OBJ RID with OBJECT_RID + DIC-labelled fields
  (+CREAT_DATE/UPDATE_DATE when a QAL exists), the label layer
  ID_S_OBJ_Z_1_2_2 gaining OGR_OBJ_LNK/OGR_OBJ_LNK_LAYER/OGR_ATR_VAL/
  OGR_ANGLE/OGR_FONT_SIZE from the IS_S_REL_IWW link exactly like
  SetStyle; empty layers purged and the rest sorted points-lines-
  polygons with the QGIS cadastre polygon order
  (OGREDIGEOSortForQGIS).
"""
from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa

from gdal_ray.functions.wkb import (Geom, LINESTRING, MULTILINESTRING,
                                    POINT, POLYGON, geom_to_wkb)

_REL_EPSG = {"LAMB1": 27561, "LAMB2": 27562, "LAMB3": 27563,
             "LAMB4": 27564, "LAMB93": 2154, "LAMBE": 27572,
             "RGF93G": 4171}

_POLY_ORDER = ["COMMUNE_id", "LIEUDIT_id", "SECTION_id", "SUBDSECT_id",
               "SUBDFISC_id", "PARCELLE_id", "BATIMENT_id"]


def _lines(path: str):
    with open(path, "rb") as f:
        text = f.read().decode("latin-1", "replace")
    return text.splitlines()


def _fields(path: str):
    """(key5, value) for lines whose 8th char is ':'."""
    for line in _lines(path):
        if len(line) >= 8 and line[7] == ":":
            yield line[:5], line[8:], line


def _sibling(base_dir: str, lon: str, name: str, ext: str) -> str | None:
    for cand in (f"{lon}{name}.{ext}", f"{lon}{name}.{ext.lower()}"):
        p = os.path.join(base_dir, cand)
        if os.path.exists(p):
            return p
    # case-insensitive directory scan
    want = f"{lon}{name}.{ext}".lower()
    for f in os.listdir(base_dir):
        if f.lower() == want:
            return os.path.join(base_dir, f)
    return None


def is_edigeo(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    try:
        for i, line in enumerate(_lines(path)):
            if i >= 100:
                break
            if line == "RTYSA03:GTS":
                return True
    except OSError:
        return False
    return False


def _ring_area(xy: np.ndarray) -> float:
    x, y = xy[:, 0], xy[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    x, y = pt
    j = len(ring) - 1
    inside = False
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > y) != (yj > y) and \
                x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def read_edigeo(thf_path: str) -> dict[str, pa.Table]:
    if not is_edigeo(thf_path):
        raise ValueError(f"{thf_path}: not an EDIGEO THF (RTYSA03:GTS)")
    base_dir = os.path.dirname(thf_path) or "."

    lon = gnn = gon = qan = din = scn = ""
    gdn: list[str] = []
    for key, val, _ in _fields(thf_path):
        if key == "LONSA" and not lon:
            lon = val
        elif key == "GNNSA":
            gnn = val
        elif key == "GONSA":
            gon = val
        elif key == "QANSA":
            qan = val
        elif key == "DINSA":
            din = val
        elif key == "SCNSA":
            scn = val
        elif key == "GDNSA":
            gdn.append(val)
    for miss, v in (("LON", lon), ("GON", gon), ("DIN", din), ("SCN", scn)):
        if not v:
            raise ValueError(f"EDIGEO: {miss} field missing in THF")

    # ---------------------------------------------------------- GEO
    epsg = None
    geo_path = _sibling(base_dir, lon, gon, "GEO")
    if geo_path:
        for key, val, _ in _fields(geo_path):
            if key == "RELSA":
                epsg = _REL_EPSG.get(val)
                break

    # ---------------------------------------------------------- DIC
    dic_objects: dict[str, str] = {}
    dic_attrs: dict[str, tuple[str, str]] = {}      # RID -> (LAB, TYP)
    dic_path = _sibling(base_dir, lon, din, "DIC")
    if dic_path is None:
        raise ValueError("EDIGEO: DIC file missing")

    def run_blocks(path, on_block):
        rty = ""
        cur: list[tuple[str, str]] = []
        for key, val, _ in _fields(path):
            if key == "RTYSA":
                if rty:
                    on_block(rty, cur)
                rty = val
                cur = []
            else:
                cur.append((key, val))
        if rty:
            on_block(rty, cur)

    def dic_block(rty, kv):
        d = dict(kv)
        rid = d.get("RIDSA", "")
        if rty == "DID":
            dic_objects[rid] = d.get("LABSA", "")
        elif rty == "DIA":
            dic_attrs[rid] = (d.get("LABSA", ""), d.get("TYPSA", ""))

    run_blocks(dic_path, dic_block)

    # ---------------------------------------------------------- SCD
    obj_descs = []            # (rid, name_rid, knd, [attr rids])
    scd_attrs: dict[str, str] = {}    # SCD ATT rid -> DIC name rid
    scd_path = _sibling(base_dir, lon, scn, "SCD")
    if scd_path is None:
        raise ValueError("EDIGEO: SCD file missing")

    def scd_block(rty, kv):
        rid = name_rid = knd = ""
        attrs = []
        for k, v in kv:
            if k == "RIDSA":
                rid = v
            elif k == "DIPCP":
                toks = v.split(";")
                if len(toks) == 4:
                    name_rid = toks[3]
            elif k == "KNDSA":
                knd = v
            elif k == "AAPCP":
                toks = v.split(";")
                if len(toks) == 4:
                    attrs.append(toks[3])
        if rty == "OBJ" and name_rid in dic_objects:
            obj_descs.append((rid, name_rid, knd, attrs))
        elif rty == "ATT" and name_rid in dic_attrs:
            scd_attrs[rid] = name_rid

    run_blocks(scd_path, scd_block)

    # ---------------------------------------------------------- QAL
    qal: dict[str, tuple[int, int]] = {}
    if qan:
        qal_path = _sibling(base_dir, lon, qan, "QAL")
        if qal_path:
            def qal_block(rty, kv):
                d = dict(kv)
                if rty == "QUP":
                    qal[d.get("RIDSA", "")] = (
                        int(d.get("ODASD", "0") or 0),
                        int(d.get("UDASD", "0") or 0))

            run_blocks(qal_path, qal_block)

    # ------------------------------------------------------- layers
    layers: dict[str, dict] = {}
    for rid, name_rid, knd, attrs in obj_descs:
        kind = {"ARE": POLYGON, "LIN": LINESTRING, "PCT": POINT}.get(knd)
        if kind is None:
            continue
        fields = []    # (field name, type, attr scd rid)
        for a in attrs:
            if a in scd_attrs:
                lab, typ = dic_attrs[scd_attrs[a]]
                ft = ("real" if typ in ("R", "E") else
                      "int" if typ in ("I", "N") else "str")
                fields.append((lab, ft, a))
        extra = []
        if rid == "ID_S_OBJ_Z_1_2_2":
            extra = [("OGR_OBJ_LNK", "str"), ("OGR_OBJ_LNK_LAYER", "str"),
                     ("OGR_ATR_VAL", "str"), ("OGR_ANGLE", "real"),
                     ("OGR_FONT_SIZE", "real")]
        elif qal:
            extra = [("CREAT_DATE", "int"), ("UPDATE_DATE", "int")]
        layers[rid] = {"kind": kind, "fields": fields, "extra": extra,
                       "rows": []}

    # ------------------------------------------------------- VEC(s)
    for vec_name in gdn:
        vec_path = _sibling(base_dir, lon, vec_name, "VEC")
        if vec_path is None:
            continue
        par: dict[str, list] = {}
        pno: dict[str, tuple] = {}
        fea: dict[str, dict] = {}
        pfe_par: dict[str, list] = {}
        fea_pfe, fea_par, fea_pno = [], [], []
        fea_fea: dict[str, str] = {}

        rty = rid = ""
        xy: list[tuple[float, float]] = []
        lnk: list[tuple[str, str]] = []
        att_id = ""
        att_vals: list[tuple[str, str]] = []
        scp = qup = ""
        iso = False
        pending_att_val: str | None = None

        def flush():
            nonlocal rty
            if rty == "PAR":
                if len(xy) >= 2:
                    par[rid] = list(xy)
            elif rty == "PNO":
                if len(xy) == 1:
                    pno[rid] = xy[0]
            elif rty == "FEA":
                fea[rid] = {"attrs": list(att_vals), "scp": scp,
                            "qup": qup}
            elif rty == "LNK" and len(lnk) >= 2:
                (t0, n0), ends = lnk[0], lnk[1:]
                if t0 == "PAR" and ends[0][0] == "PFE":
                    lst = pfe_par.setdefault(ends[0][1], [])
                    if n0 not in lst:
                        lst.append(n0)
                elif t0 == "FEA" and ends[0][0] == "PFE":
                    fea_pfe.append((n0, [e[1] for e in ends]))
                elif t0 == "FEA" and ends[0][0] == "PAR":
                    fea_par.append((n0, [e[1] for e in ends]))
                elif t0 == "FEA" and ends[0][0] == "PNO":
                    fea_pno.append((n0, ends[0][1]))
                elif t0 == "FEA" and ends[0][0] == "FEA":
                    if scp == "IS_S_REL_IWW":
                        fea_fea[n0] = ends[0][1]

        lines_iter = iter(_lines(vec_path))
        pushed = None
        while True:
            line = pushed if pushed is not None else next(lines_iter, None)
            pushed = None
            if line is not None and (len(line) < 8 or line[7] != ":"):
                continue
            if line is None or line.startswith("RTYSA"):
                flush()
                if line is None:
                    break
                rty = line[8:]
                rid = ""
                xy, lnk, att_vals = [], [], []
                att_id = scp = qup = ""
                iso = False
                continue
            key, val = line[:5], line[8:]
            if key == "RIDSA":
                rid = val
            elif key == "CORCC":
                if ";" in val:
                    sx, sy = val.split(";", 1)
                    xy.append((float(sx), float(sy)))
            elif key == "FTPCP":
                toks = val.split(";")
                if len(toks) == 4:
                    lnk.append((toks[2], toks[3]))
            elif key == "SCPCP":
                toks = val.split(";")
                if len(toks) == 4:
                    if rty == "LNK":
                        if toks[2] == "ASS":
                            scp = toks[3]
                    elif toks[2] == "OBJ":
                        scp = toks[3]
            elif key == "ATPCP":
                toks = val.split(";")
                if len(toks) == 4 and toks[2] == "ATT":
                    att_id = toks[3]
            elif line == "TEXT 06:8859-1":
                iso = True
            elif key.startswith("ATVS"):
                att_val = val
                while True:
                    nxt = next(lines_iter, None)
                    if nxt is not None and len(nxt) >= 8 and \
                            nxt[7] == ":" and nxt.startswith("NEXT "):
                        att_val += nxt[8:]
                    else:
                        pushed = nxt
                        break
                if att_id:
                    att_vals.append((att_id, att_val))
                att_id = ""
                iso = False
            elif key == "ATVCP":
                toks = val.split(";")
                if len(toks) == 4 and toks[2] == "ATT" and att_id:
                    att_vals.append((att_id, toks[3]))
                    att_id = ""
            elif key == "QAPCP":
                toks = val.split(";")
                if len(toks) == 4 and toks[2] == "QUP":
                    qup = toks[3]

        def add_row(fea_id, geom: Geom | None):
            f = fea.get(fea_id)
            if f is None or f["scp"] not in layers:
                return
            lay = layers[f["scp"]]
            row = {"OBJECT_RID": fea_id, "__geom__": geom}
            attmap = dict(f["attrs"])
            for lab, _t, a in lay["fields"]:
                row[lab] = attmap.get(a)
            if lay["extra"] and lay["extra"][0][0] == "CREAT_DATE":
                oda, uda = qal.get(f["qup"], (0, 0))
                row["CREAT_DATE"] = oda or None
                row["UPDATE_DATE"] = uda or None
            elif lay["extra"]:
                # label layer: resolve the IS_S_REL_IWW link (SetStyle)
                row.update({"OGR_OBJ_LNK": None, "OGR_OBJ_LNK_LAYER": None,
                            "OGR_ATR_VAL": None, "OGR_ANGLE": None,
                            "OGR_FONT_SIZE": None})
                atr = attmap_label_value(attmap, lay)
                lnk_fea = fea_fea.get(fea_id)
                if atr and lnk_fea and lnk_fea in fea:
                    target = fea[lnk_fea]
                    for aid, aval in target["attrs"]:
                        if aid == atr:
                            angle = 0.0
                            di3 = _label_num(attmap, lay, "DI3")
                            di4 = _label_num(attmap, lay, "DI4")
                            if di3 is not None and di4 is not None:
                                angle = math.degrees(
                                    math.atan2(di4, di3))
                                if angle < 0:
                                    angle += 360
                            size = _label_num(attmap, lay, "HEI") or 1.0
                            if size <= 0 or size >= 100:
                                size = 1.0
                            row["OGR_OBJ_LNK"] = lnk_fea
                            row["OGR_OBJ_LNK_LAYER"] = target["scp"]
                            row["OGR_ATR_VAL"] = aval
                            row["OGR_ANGLE"] = angle
                            row["OGR_FONT_SIZE"] = size
                            break
            lay["rows"].append(row)

        def attmap_label_value(attmap, lay):
            for lab, _t, a in lay["fields"]:
                if lab == "ATR":
                    return attmap.get(a)
            return None

        def _label_num(attmap, lay, name):
            for lab, _t, a in lay["fields"]:
                if lab == name and attmap.get(a) is not None:
                    try:
                        return float(attmap[a])
                    except ValueError:
                        return None
            return None

        # points
        for fea_id, pno_id in fea_pno:
            p = pno.get(pno_id)
            if p is None:
                continue
            add_row(fea_id, Geom(POINT, [np.array([p])]))
        # linestrings
        for fea_id, par_ids in fea_par:
            parts = [np.array(par[p]) for p in par_ids if p in par]
            if not parts:
                add_row(fea_id, None)
            elif len(parts) == 1:
                add_row(fea_id, Geom(LINESTRING, parts))
            else:
                add_row(fea_id, Geom(MULTILINESTRING, parts))
        # polygons
        for fea_id, pfe_ids in fea_pfe:
            rings = []
            ok = True
            for pfe_id in pfe_ids:
                arcs = [par[a] for a in pfe_par.get(pfe_id, [])
                        if a in par]
                if not arcs:
                    ok = False
                    break
                used = [False] * len(arcs)
                for j in range(len(arcs)):
                    if used[j]:
                        continue
                    ring = list(arcs[j])
                    used[j] = True
                    it = 1
                    while ring[-1] != ring[0] and it < len(arcs):
                        found = False
                        for i in range(len(arcs)):
                            if used[i]:
                                continue
                            seg = arcs[i]
                            if ring[-1] == seg[0]:
                                ring.extend(seg[1:])
                                used[i] = found = True
                                break
                            if ring[-1] == seg[-1]:
                                ring.extend(seg[-2::-1])
                                used[i] = found = True
                                break
                        if not found:
                            break
                        it += 1
                    if ring[-1] != ring[0]:
                        ring.append(ring[0])
                    rings.append(np.array(ring))
            if not ok or not rings:
                add_row(fea_id, None)
                continue
            # shell/hole assignment (organizePolygons stand-in)
            order = sorted(range(len(rings)),
                           key=lambda i: -abs(_ring_area(rings[i])))
            shell = rings[order[0]]
            holes = [rings[i] for i in order[1:]
                     if _point_in_ring(rings[i][0], shell)]
            add_row(fea_id, Geom(POLYGON, [shell] + holes))

    # ------------------------------------------------- assemble tables
    out: dict[str, pa.Table] = {}
    alive = [(rid, lay) for rid, lay in layers.items() if lay["rows"]]

    def sort_key(item):
        rid, lay = item
        t = {POINT: 1, LINESTRING: 2, POLYGON: 3}.get(lay["kind"], 4)
        try:
            o = _POLY_ORDER.index(rid)
        except ValueError:
            o = len(_POLY_ORDER)
        return (-t, o, rid)

    alive.sort(key=sort_key)
    for rid, lay in alive:
        cols: dict[str, list] = {"OBJECT_RID": []}
        names = [n for n, _t, _a in lay["fields"]] + \
                [n for n, _t in lay["extra"]]
        types = {n: t for n, t, _a in lay["fields"]}
        types.update({n: t for n, t in lay["extra"]})
        for n in names:
            cols[n] = []
        wkbs = []
        for row in lay["rows"]:
            cols["OBJECT_RID"].append(row["OBJECT_RID"])
            for n in names:
                cols[n].append(row.get(n))
            g = row["__geom__"]
            wkbs.append(geom_to_wkb(g) if g is not None else b"")
        arrs = {"fid": pa.array(range(len(wkbs)), pa.int64()),
                "OBJECT_RID": pa.array(cols["OBJECT_RID"], pa.string())}
        for n in names:
            t = types[n]
            if t == "real":
                arrs[n] = pa.array(
                    [float(v) if v not in (None, "") else None
                     for v in cols[n]], pa.float64())
            elif t == "int":
                arrs[n] = pa.array(
                    [int(v) if v not in (None, "") else None
                     for v in cols[n]], pa.int32())
            else:
                arrs[n] = pa.array(cols[n], pa.string())
        arrs["geometry"] = pa.array(wkbs, pa.binary())
        out[rid] = pa.table(arrs)
    out["__epsg__"] = epsg
    return out


# ------------------------------------------------------------------ fixture
def synth_edigeo_lot(tmp_path):
    """Synthesize a mini cadastre lot (tests + driver-query fixture)."""
    import pathlib

    tmp_path = pathlib.Path(tmp_path)
    lon = "EDAB01"
    (tmp_path / "E000AB01.THF").write_text("\n".join([
        "BOMT 12:TER00101.DDN",
        "RTYSA03:GTS",
        f"LONSA06:{lon}",
        "GNNSA02:SE",
        "GONSA02:SE",
        "QANSA02:SE",
        "DINSA02:SE",
        "SCNSA02:SE",
        "GDNSA02:T1",
    ]) + "\n")
    (tmp_path / f"{lon}SE.GEO").write_text("\n".join([
        "RTYSA03:GEO",
        "RELSA06:LAMB93",
    ]) + "\n")
    (tmp_path / f"{lon}SE.GEN").write_text("\n".join([
        "RTYSA03:GEN",
        "CM1CC21:900000.00;6500000.00",
        "CM2CC21:910000.00;6510000.00",
    ]) + "\n")
    (tmp_path / f"{lon}SE.DIC").write_text("\n".join([
        "RTYSA03:DID",
        "RIDSA08:PARCELLE",
        "LABSA08:PARCELLE",
        "RTYSA03:DID",
        "RIDSA05:BORNE",
        "LABSA05:BORNE",
        "RTYSA03:DID",
        "RIDSA10:ZONCOMMUNI",
        "LABSA10:ZONCOMMUNI",
        "RTYSA03:DIA",
        "RIDSA07:ATT_IDU",
        "LABSA03:IDU",
        "TYPSA01:A",
        "RTYSA03:DIA",
        "RIDSA12:ATT_SUPF_DIA",
        "LABSA04:SUPF",
        "TYPSA01:R",
    ]) + "\n")
    (tmp_path / f"{lon}SE.SCD").write_text("\n".join([
        "RTYSA03:ATT",
        "RIDSA07:IDU_id ",
        "DIPCP22:SE;SE;DIA;ATT_IDU",
        "CANSN02:12",
        "RTYSA03:ATT",
        "RIDSA07:SUPF_id",
        "DIPCP27:SE;SE;DIA;ATT_SUPF_DIA",
        "RTYSA03:OBJ",
        "RIDSA11:PARCELLE_id",
        "DIPCP19:SE;SE;DID;PARCELLE",
        "KNDSA03:ARE",
        "AAPCP18:SE;SE;ATT;IDU_id ",
        "AAPCP18:SE;SE;ATT;SUPF_id",
        "RTYSA03:OBJ",
        "RIDSA08:BORNE_id",
        "DIPCP16:SE;SE;DID;BORNE",
        "KNDSA03:PCT",
        "RTYSA03:OBJ",
        "RIDSA13:ZONCOMMUNI_id",
        "DIPCP21:SE;SE;DID;ZONCOMMUNI",
        "KNDSA03:LIN",
    ]) + "\n")
    (tmp_path / f"{lon}SE.QAL").write_text("\n".join([
        "RTYSA03:QUP",
        "RIDSA06:QUP001",
        "ODASD08:20200115",
        "UDASD08:20230601",
    ]) + "\n")
    # VEC: a square parcel from two arcs, a point, a two-arc line
    (tmp_path / f"{lon}T1.VEC").write_text("\n".join([
        # arcs for the parcel ring (square split into 2 polylines)
        "RTYSA03:PAR",
        "RIDSA06:Arc_01",
        "CORCC09:0.0;0.0",
        "CORCC09:10.0;0.0",
        "CORCC10:10.0;10.0",
        "RTYSA03:PAR",
        "RIDSA06:Arc_02",
        "CORCC10:10.0;10.0",    # note: will be chained reversed
        "CORCC09:0.0;10.0",
        "CORCC09:0.0;0.0",
        # a line arc
        "RTYSA03:PAR",
        "RIDSA06:Arc_10",
        "CORCC09:5.0;5.0",
        "CORCC09:6.0;7.0",
        # point node
        "RTYSA03:PNO",
        "RIDSA06:Nod_01",
        "CORCC09:2.5;3.5",
        # features
        "RTYSA03:FEA",
        "RIDSA06:Fea_01",
        "SCPCP23:SE;SE;OBJ;PARCELLE_id",
        "ATPCP18:SE;SE;ATT;IDU_id ",
        "ATVS 12:AB0123456789",
        "ATPCP18:SE;SE;ATT;SUPF_id",
        "ATVCP15:SE;SE;ATT;123.5",
        "QAPCP17:SE;SE;QUP;QUP001",
        "RTYSA03:FEA",
        "RIDSA06:Fea_02",
        "SCPCP20:SE;SE;OBJ;BORNE_id",
        "QAPCP17:SE;SE;QUP;QUP001",
        "RTYSA03:FEA",
        "RIDSA06:Fea_03",
        "SCPCP25:SE;SE;OBJ;ZONCOMMUNI_id",
        # topology: face membership for the parcel
        "RTYSA03:LNK",
        "RIDSA06:Lnk_01",
        "FTPCP16:SE;SE;PAR;Arc_01",
        "FTPCP16:SE;SE;PFE;Fac_01",
        "RTYSA03:LNK",
        "RIDSA06:Lnk_02",
        "FTPCP16:SE;SE;PAR;Arc_02",
        "FTPCP16:SE;SE;PFE;Fac_01",
        "RTYSA03:LNK",
        "RIDSA06:Lnk_03",
        "FTPCP16:SE;SE;FEA;Fea_01",
        "FTPCP16:SE;SE;PFE;Fac_01",
        "RTYSA03:LNK",
        "RIDSA06:Lnk_04",
        "FTPCP16:SE;SE;FEA;Fea_02",
        "FTPCP16:SE;SE;PNO;Nod_01",
        "RTYSA03:LNK",
        "RIDSA06:Lnk_05",
        "FTPCP16:SE;SE;FEA;Fea_03",
        "FTPCP16:SE;SE;PAR;Arc_10",
    ]) + "\n")
    return str(tmp_path / "E000AB01.THF")
