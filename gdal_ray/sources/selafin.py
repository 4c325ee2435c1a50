"""Selafin (TELEMAC SERAFIN) hydraulic-mesh vector driver (reference
ogr/ogrsf_frmts/selafin/io_selafin.cpp read_header/write_header,
ogrselafinlayer.cpp; conformance autotest/ogr/ogr_selafin.py).

Big-endian Fortran-record file: each record is a 4-byte byte-length,
the payload, and the length again (io_selafin.cpp read_integer /
read_string / read_intarray / read_floatarray, all CPL_MSBPTR32).
Layout: 80-char title; [nVar, unused]; nVar x 32-char variable names;
10 ints (epsg at [1], x/y origin at [2]/[3], date flag at [9]);
optional 6-int start date; [nElements, nPoints, nPointsPerElement, 1];
connectivity (1-based); border array; X; Y (stored minus origin,
read adds it back — io_selafin.cpp:755); then per time step one
1-float time record + nVar records of nPoints floats.

Per time step the OGR datasource exposes two layers, <stem>_p<step>
(one POINT per node, one Real field per variable) and <stem>_e<step>
(one POLYGON per element from the closed connectivity ring, each
field the MEAN of its nodes' values — ogrselafinlayer.cpp:216-241).
"""
from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from ..functions.wkb import (POINT, POLYGON, Geom, geom_to_wkb,
                             points_to_wkb)


def _rec(payload: bytes) -> bytes:
    n = struct.pack(">i", len(payload))
    return n + payload + n


def write_selafin(path: str, x, y, ikle, variables: dict[str, np.ndarray],
                  title: str = "", epsg: int = 4326,
                  times: list[float] | None = None,
                  border=None, date=None) -> None:
    """Write a single- or multi-step Selafin file. ``ikle`` is
    (nElements, nPointsPerElement) 1-based connectivity; each entry of
    ``variables`` is (nPoints,) for one step or (nSteps, nPoints)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    ikle = np.asarray(ikle, np.int64)
    npoin = len(x)
    nelem, ndp = ikle.shape if ikle.size else (0, 3)
    vals = {}
    nsteps = 1
    for name, v in variables.items():
        v = np.asarray(v, np.float64)
        if v.ndim == 1:
            v = v[None]
        nsteps = v.shape[0]
        vals[name] = v
    if times is None:
        times = [float(i) for i in range(nsteps)]

    with open(path, "wb") as f:
        f.write(_rec(title.ljust(80)[:80].encode("latin-1")))
        f.write(_rec(struct.pack(">2i", len(vals), 0)))
        for name in vals:
            f.write(_rec(name.ljust(32)[:32].encode("latin-1")))
        iparam = [0] * 10
        iparam[1] = epsg
        if date is not None:
            iparam[9] = 1
        f.write(_rec(struct.pack(">10i", *iparam)))
        if date is not None:
            f.write(_rec(struct.pack(">6i", *date)))
        f.write(_rec(struct.pack(">4i", nelem, npoin, ndp, 1)))
        f.write(_rec(ikle.astype(">i4").tobytes()))
        b = (np.zeros(npoin, ">i4") if border is None
             else np.asarray(border).astype(">i4"))
        f.write(_rec(b.tobytes()))
        f.write(_rec(x.astype(">f4").tobytes()))
        f.write(_rec(y.astype(">f4").tobytes()))
        for s in range(nsteps):
            f.write(_rec(struct.pack(">f", times[s])))
            for name in vals:
                f.write(_rec(vals[name][s].astype(">f4").tobytes()))


class _R:
    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def rec(self) -> bytes:
        (n,) = struct.unpack_from(">i", self.d, self.p)
        payload = self.d[self.p + 4:self.p + 4 + n]
        (n2,) = struct.unpack_from(">i", self.d, self.p + 4 + n)
        if n2 != n:
            raise ValueError("selafin: record framing mismatch")
        self.p += 8 + n
        return payload

    @property
    def eof(self) -> bool:
        return self.p >= len(self.d)


def read_selafin(path_or_bytes) -> dict:
    data = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
            else open(path_or_bytes, "rb").read())
    r = _R(data)
    title = r.rec().decode("latin-1").rstrip()
    nvar, _unused = struct.unpack(">2i", r.rec())
    names = [r.rec().decode("latin-1").rstrip().replace("'", " ")
             for _ in range(nvar)]
    iparam = struct.unpack(">10i", r.rec())
    epsg = iparam[1]
    origin = (float(iparam[2]), float(iparam[3]))
    date = struct.unpack(">6i", r.rec()) if iparam[9] == 1 else None
    nelem, npoin, ndp, one = struct.unpack(">4i", r.rec())
    if one != 1 or nelem < 0 or npoin < 0 or ndp < 0:
        raise ValueError("selafin: bad element/point record")
    ikle = np.frombuffer(r.rec(), ">i4").reshape(nelem, ndp).astype(np.int64)
    if ikle.size and (ikle.min() <= 0 or ikle.max() > npoin):
        raise ValueError("selafin: connectivity out of range")
    border = np.frombuffer(r.rec(), ">i4").astype(np.int64)
    x = np.frombuffer(r.rec(), ">f4").astype(np.float64) + origin[0]
    y = np.frombuffer(r.rec(), ">f4").astype(np.float64) + origin[1]
    times = []
    steps = []  # [ {var: values} ]
    while not r.eof:
        try:
            times.append(struct.unpack(">f", r.rec())[0])
        except struct.error:
            break
        step = {}
        for name in names:
            step[name] = np.frombuffer(r.rec(), ">f4").astype(np.float64)
        steps.append(step)
    return {"title": title, "vars": names, "epsg": epsg, "date": date,
            "x": x, "y": y, "ikle": ikle, "border": border,
            "times": times, "steps": steps}


def selafin_layers(path: str) -> dict[str, pa.Table]:
    """All layers: per step a point layer <stem>_p<step> and an
    element layer <stem>_e<step> (field = mean over element nodes)."""
    h = read_selafin(path)
    stem = os.path.splitext(os.path.basename(path))[0]
    x, y, ikle = h["x"], h["y"], h["ikle"]
    n = len(x)
    out: dict[str, pa.Table] = {}
    elem_wkb = None
    for s, step in enumerate(h["steps"]):
        cols = {"fid": pa.array(range(n), pa.int64()),
                "geometry": pa.array(points_to_wkb(x, y), pa.binary())}
        for name in h["vars"]:
            cols[name] = pa.array(step[name], pa.float64())
        out[f"{stem}_p{s}"] = pa.table(cols)

        if elem_wkb is None:
            elem_wkb = []
            for e in range(len(ikle)):
                idx = ikle[e] - 1
                ring = np.column_stack([x[idx], y[idx]])
                ring = np.vstack([ring, ring[:1]])  # closeRings
                elem_wkb.append(geom_to_wkb(Geom(POLYGON, [ring])))
        ecols = {"fid": pa.array(range(len(ikle)), pa.int64()),
                 "geometry": pa.array(elem_wkb, pa.binary())}
        for name in h["vars"]:
            ecols[name] = pa.array(step[name][ikle - 1].mean(axis=1),
                                   pa.float64())
        out[f"{stem}_e{s}"] = pa.table(ecols)
    return out
