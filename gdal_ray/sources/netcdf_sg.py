"""CF-1.8 Simple Geometries vector layers over classic netCDF
(reference frmts/netcdf/netcdfsg.cpp, netcdflayersg.cpp; conformance
autotest/gdrivers/netcdf.py test_point_read .. test_states_full_layer).

A geometry *container* is a (usually scalar dummy) variable carrying
``geometry_type`` + ``node_coordinates`` attributes, and optionally
``node_count`` / ``part_node_count`` / ``interior_ring`` /
``grid_mapping`` variable references. Data variables that declare
``geometry: <container>`` become the layer's attribute fields, one
feature per entry of the instance dimension.

Geometry-type promotion per netcdfsg.cpp getGeometryType (:898-957):
point without node_count -> Point, with -> MultiPoint; line without
part_node_count -> LineString, with -> MultiLineString; polygon with
neither part_node_count nor interior_ring -> Polygon, else
MultiPolygon (interior_ring==0 starts a new member polygon, ==1 is a
hole of the current one).

Well-formedness checks mirror the SGeometry_Reader constructor
(netcdfsg.cpp:100-270): negative counts, non-0/1 interior rings,
part_node_count without node_count, sum mismatches, interior_ring
cardinality, missing node_count for line/polygon, and per-feature
part sums overshooting the feature node count all raise ValueError —
the reference aborts the open on the same inputs
(autotest test_bad_cf1_8).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.wkb import (LINESTRING, MULTILINESTRING, MULTIPOINT,
                             MULTIPOLYGON, POINT, POLYGON, Geom,
                             geom_to_wkb)
from .netcdf import parse_nc_header, nc_variable

_GEOM_TYPES = {"point", "line", "polygon"}


def _read_char_var(data: bytes, hdr: dict, v: dict) -> list[str]:
    """2-D (instance, width) char variable -> list of stripped strings."""
    dims = hdr["dims"]
    shape = [hdr["numrecs"] if dims[i][1] == 0 else dims[i][1]
             for i in v["dimids"]]
    if len(shape) == 1:  # scalar-ish string
        raw = data[v["begin"]:v["begin"] + shape[0]]
        return [raw.split(b"\x00")[0].decode("latin-1").strip()]
    n, w = shape
    raw = np.frombuffer(data[v["begin"]:v["begin"] + n * w],
                        np.uint8).reshape(n, w)
    out = []
    for row in raw:
        b = row.tobytes().split(b"\x00")[0]
        out.append(b.decode("latin-1").rstrip())
    return out


def _read_num(data: bytes, name: str) -> np.ndarray:
    return np.atleast_1d(nc_variable(data, name).read())


def _axis_of(v: dict) -> str | None:
    ax = v["attrs"].get("axis")
    if isinstance(ax, str) and ax.upper() in ("X", "Y", "Z"):
        return ax.upper()
    sn = v["attrs"].get("standard_name", "")
    if sn == "longitude":
        return "X"
    if sn == "latitude":
        return "Y"
    return None


def _container_geoms(data: bytes, hdr: dict, cont: dict,
                     byname: dict) -> tuple[list[Geom], str]:
    attrs = cont["attrs"]
    gt = attrs.get("geometry_type")
    if gt is None:
        raise ValueError(f"{cont['name']}: missing geometry_type")
    if gt not in _GEOM_TYPES:
        raise ValueError(f"{cont['name']}: unsupported geometry_type {gt!r}")

    # node coordinate variables, resolved to X/Y/Z by axis attribute
    # (netcdfsg.cpp:275-340 touple-order logic; flipped/arbitrary axis
    # order fixtures list them in any order)
    coord_names = str(attrs.get("node_coordinates", "")).split()
    if not coord_names:
        raise ValueError(f"{cont['name']}: missing node_coordinates")
    by_axis: dict[str, np.ndarray] = {}
    lens = set()
    for cn in coord_names:
        cv = byname.get(cn)
        if cv is None:
            raise ValueError(f"{cont['name']}: node coordinate {cn} absent")
        ax = _axis_of(cv)
        if ax is None:
            raise ValueError(f"{cont['name']}: {cn} has no axis")
        arr = _read_num(data, cn).astype(np.float64)
        by_axis[ax] = arr
        lens.add(len(arr))
    if "X" not in by_axis or "Y" not in by_axis:
        raise ValueError(f"{cont['name']}: need X and Y node coordinates")
    if len(lens) != 1:
        # unequal_xy fixture: coordinate variables over different dims
        raise ValueError(f"{cont['name']}: node coordinate dims disagree")
    xs, ys = by_axis["X"], by_axis["Y"]
    zs = by_axis.get("Z")

    def counts(attr_name: str) -> np.ndarray | None:
        ref = attrs.get(attr_name)
        if ref is None:
            return None
        arr = _read_num(data, str(ref)).astype(np.int64)
        return arr

    nc = counts("node_count")
    pnc = counts("part_node_count")
    ir = counts("interior_ring")
    for label, arr in (("node_count", nc), ("part_node_count", pnc)):
        if arr is not None and (arr < 0).any():
            raise ValueError(f"{cont['name']}: negative {label}")
    if ir is not None and not np.isin(ir, (0, 1)).all():
        raise ValueError(f"{cont['name']}: interior_ring must be 0 or 1")
    if pnc is not None and nc is None:
        raise ValueError(f"{cont['name']}: part_node_count needs node_count")
    if pnc is not None and nc is not None and pnc.sum() != nc.sum():
        raise ValueError(f"{cont['name']}: part/node count sum mismatch")
    if ir is not None and pnc is None:
        raise ValueError(f"{cont['name']}: interior_ring needs "
                         "part_node_count")
    if ir is not None and pnc is not None and len(ir) != len(pnc):
        raise ValueError(f"{cont['name']}: interior_ring cardinality")
    if gt in ("line", "polygon") and nc is None:
        raise ValueError(f"{cont['name']}: {gt} requires node_count")
    if nc is not None and nc.sum() != len(xs):
        raise ValueError(f"{cont['name']}: node coordinates length "
                         f"{len(xs)} != node_count sum {nc.sum()}")

    def seg(start: int, cnt: int) -> np.ndarray:
        return np.column_stack([xs[start:start + cnt], ys[start:start + cnt]])

    def zseg(start: int, cnt: int):
        return None if zs is None else zs[start:start + cnt]

    geoms: list[Geom] = []
    if gt == "point" and nc is None:
        for i in range(len(xs)):
            g = Geom(POINT, [seg(i, 1)])
            if zs is not None:
                g.zs = [zseg(i, 1)]
            geoms.append(g)
        return geoms, "Point"

    if gt == "point":  # node_count present -> MultiPoint
        pos = 0
        for c in nc:
            g = Geom(MULTIPOINT, [seg(pos, int(c))])
            if zs is not None:
                g.zs = [zseg(pos, int(c))]
            geoms.append(g)
            pos += int(c)
        return geoms, "MultiPoint"

    # split part_node_count runs per feature by matching cumulative
    # sums against node_count (netcdfsg.cpp:239-270)
    feat_parts: list[list[tuple[int, int]]] = []  # [(start, cnt)] per feat
    feat_ir: list[list[bool]] = []
    if pnc is None:
        pos = 0
        for c in nc:
            feat_parts.append([(pos, int(c))])
            feat_ir.append([False])
            pos += int(c)
    else:
        pos = 0
        ind = 0
        cur: list[tuple[int, int]] = []
        cur_ir: list[bool] = []
        prog = 0
        for pi, c in enumerate(pnc):
            cur.append((pos, int(c)))
            cur_ir.append(bool(ir[pi]) if ir is not None else False)
            pos += int(c)
            prog += int(c)
            if ind >= len(nc):
                raise ValueError(f"{cont['name']}: more parts than features")
            if prog == nc[ind]:
                feat_parts.append(cur)
                feat_ir.append(cur_ir)
                cur, cur_ir = [], []
                prog = 0
                ind += 1
            elif prog > nc[ind]:
                raise ValueError(f"{cont['name']}: part sums overshoot "
                                 "node_count")

    if gt == "line":
        multi = pnc is not None
        for parts in feat_parts:
            if not multi:
                (s, c), = parts
                g = Geom(LINESTRING, [seg(s, c)])
                if zs is not None:
                    g.zs = [zseg(s, c)]
            else:
                g = Geom(MULTILINESTRING, [seg(s, c) for s, c in parts])
                if zs is not None:
                    g.zs = [zseg(s, c) for s, c in parts]
            geoms.append(g)
        return geoms, "MultiLineString" if multi else "LineString"

    # polygon family
    multi = pnc is not None or ir is not None
    for parts, irs in zip(feat_parts, feat_ir):
        rings = [seg(s, c) for s, c in parts]
        ring_zs = ([zseg(s, c) for s, c in parts]
                   if zs is not None else None)
        if not multi:
            g = Geom(POLYGON, rings)
            if ring_zs is not None:
                g.zs = ring_zs
        else:
            # group rings into member polygons: an exterior (ir=0)
            # starts a new polygon, interiors attach to the current one
            counts_per_poly: list[int] = []
            for flag in irs:
                if not flag or not counts_per_poly:
                    counts_per_poly.append(1)
                else:
                    counts_per_poly[-1] += 1
            g = Geom(MULTIPOLYGON, rings, counts_per_poly)
            if ring_zs is not None:
                g.zs = ring_zs
        geoms.append(g)
    return geoms, "MultiPolygon" if multi else "Polygon"


def read_nc_sg(src) -> dict[str, dict]:
    """All CF-1.8 simple-geometry layers of a classic netCDF file.

    Returns {container_name: {"table": pa.Table(fid, geometry(WKB),
    fields...), "geom_type": str, "grid_mapping": attrs-dict|None}}.
    """
    data = src if isinstance(src, (bytes, bytearray)) else open(src, "rb").read()
    hdr = parse_nc_header(data)
    byname = {v["name"]: v for v in hdr["vars"]}

    # field variables grouped by their container reference
    fields_by_cont: dict[str, list[dict]] = {}
    for v in hdr["vars"]:
        cont = v["attrs"].get("geometry")
        if isinstance(cont, str):
            fields_by_cont.setdefault(cont, []).append(v)

    containers = [v for v in hdr["vars"]
                  if "geometry_type" in v["attrs"] or
                  v["name"] in fields_by_cont]
    if not containers:
        raise ValueError("no CF-1.8 geometry containers found")

    out: dict[str, dict] = {}
    for cont in containers:
        geoms, gname = _container_geoms(data, hdr, cont, byname)
        cols: dict[str, pa.Array] = {
            "fid": pa.array(range(len(geoms)), pa.int64()),
            "geometry": pa.array([geom_to_wkb(g) for g in geoms],
                                 pa.binary()),
        }
        for fv in fields_by_cont.get(cont["name"], []):
            name = fv["attrs"].get("ogr_field_name", fv["name"])
            if fv["type"] == 2:
                vals = _read_char_var(data, hdr, fv)
                cols[name] = pa.array(vals[:len(geoms)], pa.string())
            else:
                arr = _read_num(data, fv["name"])[:len(geoms)]
                if arr.dtype.kind == "f":
                    cols[name] = pa.array(arr, pa.float64())
                else:
                    cols[name] = pa.array(arr.astype(np.int64), pa.int64())
        gm = None
        gm_ref = cont["attrs"].get("grid_mapping")
        if isinstance(gm_ref, str) and gm_ref in byname:
            gm = dict(byname[gm_ref]["attrs"])
        out[cont["name"]] = {"table": pa.table(cols), "geom_type": gname,
                             "grid_mapping": gm}
    return out
