"""OpenDRIVE (XODR) vector driver — six layers over parametric road
geometry.

Re-derivation of ogr/ogrsf_frmts/xodr (OGRXODRLayer* +
OGRXODRDataSource, which wrap the external libOpenDRIVE) as a
pure-numpy geometry engine.  The reference's layer set, field schemas
and iteration order come from the layer sources
(ogrxodrlayerreferenceline.cpp, ogrxodrlayerlaneborder.cpp,
ogrxodrlayerlane.cpp:57-66 centre-lane skip,
ogrxodrlayerroadmark.cpp, ogrxodrlayerroadobject.cpp,
ogrxodrlayerroadsignal.cpp dissolved point = road.get_xyz(s,t,zOffset),
ogrxodrdatasource.cpp:createRoadElements roads→sections→lanes walk
over std::map<std::string, Road>, i.e. roads sorted by string id).

The sampling/evaluation semantics of the wrapped geometry library were
re-derived against the reference's own goldens
(autotest/ogr/ogr_xodr.py test_ogr_xodr_geometry_eps /
test_ogr_xodr_geometry_dissolve, all matched to the 1e-9 print
precision of the expected WKT):

* ``paramPoly3`` evaluation: power coefficients → cubic Bézier; an
  arc-length table is built from CHORD lengths between the Bézier
  parameters returned by ``approximate_linear(0.01)`` and
  ``get_xy(s)`` inverts it by linear interpolation (s-domain target,
  not rescaled);
* ``approximate_linear(eps)``: the cubic is split at t=0.5 into the
  two classic quadratics q1=(P0+3·P1)/4 / (P3+3·P2)/4 sharing
  M=(P0+3P1+3P2+P3)/8; each quadratic is sampled from its start with
  the uniform parameter step ``sqrt(2·eps/|q0-2q1+q2|)``;
* surface frame: e_s = normalize(d(x,y)/dp, dz/ds) — the *parameter*
  derivative for xy mixed with the s-derivative of elevation — then
  e_t0 = unit horizontal left normal and e_t = Rodrigues rotation of
  e_t0 about e_s by the superelevation angle (this mixed-pitch axis
  reproduces the goldens' lane/roadmark vertices exactly; a pure
  2-D-heading roll axis is ~1.5e-5 rad off);
* lane mesh stations: refline.approximate_linear(eps) ∪ the piece
  boundaries of the lane's INNER border spline; roadmark mesh
  stations: refline ∪ OUTER border piece boundaries ∪ their midpoints;
* roadmark repetition: per <line> entry marks start at
  group_s+sOffset and repeat every (length+space) while < group end —
  including space=0 (which tiles at ``length``; fp rounding can emit
  a degenerate trailing mark exactly like the wrapped library — the
  fixture's RoadMark count 424 requires it);
* roadmarks of weight/width fallback: width attr > 0 wins, else 0.25
  for weight="bold", else 0.12;
* TIN triangulation per quad (stations i,i+1 with [inner,outer]
  vertex pairs): (in_i, out_{i+1}, in_{i+1}), (in_i, out_i, out_{i+1}).

Only ``paramPoly3`` appears in the reference fixture (59/59
geometries); line/arc/poly3/spiral evaluation follows the OpenDRIVE
1.5 spec directly with the same adaptive-linear contract (documented
inferred — no golden exercises them).
"""
from __future__ import annotations

import math
import struct
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# libOpenDRIVE's internal sampling eps for the s→parameter table.
_TABLE_EPS = 0.01
# roadmark render widths when the file gives none (standard/bold).
_MARK_WIDTH_STANDARD = 0.12
_MARK_WIDTH_BOLD = 0.25


# ------------------------------------------------------------------ WKB (ISO, Z)
def _wkb_tin_z(tris: list[np.ndarray]) -> bytes:
    """ISO WKB TIN Z (1016) of Triangle Z (1017) children."""
    out = [struct.pack("<BII", 1, 1016, len(tris))]
    for t in tris:
        out.append(struct.pack("<BIII", 1, 1017, 1, 4))
        for i in (0, 1, 2, 0):
            out.append(struct.pack("<ddd", *t[i]))
    return b"".join(out)


def _wkb_polygon_z(ring: np.ndarray) -> bytes:
    out = [struct.pack("<BIII", 1, 1003, 1, len(ring))]
    for p in ring:
        out.append(struct.pack("<ddd", *p))
    return b"".join(out)


def _wkb_linestring_z(pts: np.ndarray) -> bytes:
    out = [struct.pack("<BII", 1, 1002, len(pts))]
    for p in pts:
        out.append(struct.pack("<ddd", *p))
    return b"".join(out)


def _wkb_point_z(p) -> bytes:
    return struct.pack("<BIddd", 1, 1001, p[0], p[1], p[2])


# ------------------------------------------------------------------ cubic rows
def _rows_eval(rows: list[tuple], s):
    """Piecewise cubic a+b·ds+c·ds²+d·ds³ (ds relative to row s0)."""
    s = np.asarray(s, float)
    out = np.zeros_like(s)
    if not rows:
        return out
    starts = np.array([r[0] for r in rows])
    idx = np.clip(np.searchsorted(starts, s + 1e-12) - 1, 0, len(rows) - 1)
    for i, (s0, A, B, C, D) in enumerate(rows):
        m = idx == i
        if m.any():
            ds = s[m] - s0
            out[m] = A + B * ds + C * ds * ds + D * ds ** 3
    return out


def _rows_deriv(rows: list[tuple], s):
    s = np.asarray(s, float)
    out = np.zeros_like(s)
    if not rows:
        return out
    starts = np.array([r[0] for r in rows])
    idx = np.clip(np.searchsorted(starts, s + 1e-12) - 1, 0, len(rows) - 1)
    for i, (s0, A, B, C, D) in enumerate(rows):
        m = idx == i
        if m.any():
            ds = s[m] - s0
            out[m] = B + 2 * C * ds + 3 * D * ds * ds
    return out


def _rows_boundaries(rows: list[tuple], lo: float, hi: float) -> list[float]:
    return [r[0] for r in rows if lo + 1e-9 < r[0] < hi - 1e-9]


def _rows_add(a: list[tuple], b: list[tuple], sign: float) -> list[tuple]:
    """a + sign·b with breakpoint union (rebase each poly at new s0)."""
    starts = sorted({r[0] for r in a} | {r[0] for r in b})

    def rebase(rows, s0):
        r = max([r for r in rows if r[0] <= s0 + 1e-12],
                key=lambda r: r[0], default=None)
        if r is None:
            return (0.0, 0.0, 0.0, 0.0)
        ds = s0 - r[0]
        _, A, B, C, D = r
        return (A + B * ds + C * ds * ds + D * ds ** 3,
                B + 2 * C * ds + 3 * D * ds * ds,
                C + 3 * D * ds, D)

    out = []
    for s0 in starts:
        pa_ = rebase(a, s0)
        pb = rebase(b, s0)
        out.append((s0, pa_[0] + sign * pb[0], pa_[1] + sign * pb[1],
                    pa_[2] + sign * pb[2], pa_[3] + sign * pb[3]))
    return out


# ------------------------------------------------------------------ geometries
class _ParamPoly3:
    """pRange-normalized/arcLength parametric cubic (OpenDRIVE 5.3.4.1.5)."""

    def __init__(self, s0, x, y, hdg, length, att):
        self.s0, self.x, self.y, self.hdg, self.length = s0, x, y, hdg, length
        aU = float(att.get("aU", 0)); bU = float(att.get("bU", 0))
        cU = float(att.get("cU", 0)); dU = float(att.get("dU", 0))
        aV = float(att.get("aV", 0)); bV = float(att.get("bV", 0))
        cV = float(att.get("cV", 0)); dV = float(att.get("dV", 0))
        if att.get("pRange", "normalized") == "arcLength":
            bU *= length; cU *= length ** 2; dU *= length ** 3
            bV *= length; cV *= length ** 2; dV *= length ** 3
        self._a = np.array([aU, aV]); self._b = np.array([bU, bV])
        self._c = np.array([cU, cV]); self._d = np.array([dU, dV])
        # Bézier control points of the power-basis cubic
        P0 = self._a
        P1 = self._a + self._b / 3
        P2 = self._a + 2 * self._b / 3 + self._c / 3
        P3 = self._a + self._b + self._c + self._d
        self._P = (P0, P1, P2, P3)
        self._M = (P0 + 3 * P1 + 3 * P2 + P3) / 8
        self._qL = (P0 + 3 * P1) / 4
        self._qR = (P3 + 3 * P2) / 4
        # chord arclen table over approximate_linear(0.01) params
        tt = self._t_vals(_TABLE_EPS)
        pts = self._local(tt)
        self._tab_t = tt
        self._tab_len = np.concatenate(
            [[0.0], np.cumsum(np.hypot(np.diff(pts[:, 0]),
                                       np.diff(pts[:, 1])))])

    def _local(self, p):
        p = np.asarray(p, float)
        xs = self._a[0] + self._b[0] * p + self._c[0] * p * p + self._d[0] * p ** 3
        ys = self._a[1] + self._b[1] * p + self._c[1] * p * p + self._d[1] * p ** 3
        return np.stack([xs, ys], -1)

    def _local_grad(self, p):
        p = np.asarray(p, float)
        gx = self._b[0] + 2 * self._c[0] * p + 3 * self._d[0] * p * p
        gy = self._b[1] + 2 * self._c[1] * p + 3 * self._d[1] * p * p
        return np.stack([gx, gy], -1)

    def _t_vals(self, eps: float) -> np.ndarray:
        ts = {0.0, 0.5, 1.0}
        P0, _, _, P3 = self._P
        for q0, q1, q2, off in ((P0, self._qL, self._M, 0.0),
                                (self._M, self._qR, P3, 0.5)):
            c = float(np.linalg.norm(q0 - 2 * q1 + q2))
            if c > 1e-15:
                step = math.sqrt(2 * eps / c)
                k = 1
                while k * step < 1:
                    ts.add(off + 0.5 * k * step)
                    k += 1
        return np.array(sorted(ts))

    def approximate_linear(self, eps: float) -> list[float]:
        return [self.s0 + t * self.length for t in self._t_vals(eps)]

    def _p_of_s(self, s):
        return np.interp(np.asarray(s, float) - self.s0,
                         self._tab_len, self._tab_t)

    def xy(self, s):
        p = self._p_of_s(s)
        loc = self._local(p)
        ch, sh = math.cos(self.hdg), math.sin(self.hdg)
        return np.stack([self.x + ch * loc[..., 0] - sh * loc[..., 1],
                         self.y + sh * loc[..., 0] + ch * loc[..., 1]], -1)

    def grad(self, s):
        """d(x,y)/dparameter (NOT normalized by ds/dp) — the frame
        axis convention the goldens pin (module docstring)."""
        p = self._p_of_s(s)
        g = self._local_grad(p)
        ch, sh = math.cos(self.hdg), math.sin(self.hdg)
        return np.stack([ch * g[..., 0] - sh * g[..., 1],
                         sh * g[..., 0] + ch * g[..., 1]], -1)


class _Line:
    def __init__(self, s0, x, y, hdg, length):
        self.s0, self.x, self.y, self.hdg, self.length = s0, x, y, hdg, length

    def approximate_linear(self, eps):
        return [self.s0, self.s0 + self.length]

    def xy(self, s):
        ds = np.asarray(s, float) - self.s0
        return np.stack([self.x + math.cos(self.hdg) * ds,
                         self.y + math.sin(self.hdg) * ds], -1)

    def grad(self, s):
        s = np.asarray(s, float)
        return np.broadcast_to(
            np.array([math.cos(self.hdg), math.sin(self.hdg)]),
            s.shape + (2,)).copy()


class _Arc:
    def __init__(self, s0, x, y, hdg, length, k):
        self.s0, self.x, self.y, self.hdg, self.length = s0, x, y, hdg, length
        self.k = k

    def approximate_linear(self, eps):
        # chord deviation of a circular arc: eps = r(1-cos(k·ds/2))
        r = 1.0 / abs(self.k)
        if eps >= r:
            step = self.length
        else:
            step = 2 * math.acos(1 - eps / r) * r
        out = [self.s0]
        s = self.s0 + step
        while s < self.s0 + self.length - 1e-12:
            out.append(s)
            s += step
        out.append(self.s0 + self.length)
        return out

    def xy(self, s):
        ds = np.asarray(s, float) - self.s0
        a = self.hdg + self.k * ds
        return np.stack(
            [self.x + (np.sin(a) - math.sin(self.hdg)) / self.k,
             self.y - (np.cos(a) - math.cos(self.hdg)) / self.k], -1)

    def grad(self, s):
        ds = np.asarray(s, float) - self.s0
        a = self.hdg + self.k * ds
        return np.stack([np.cos(a), np.sin(a)], -1)


class _Spiral:
    """Euler clothoid via dense RK4 integration (alg parity contract:
    curvature linear in s; no reference golden exercises it)."""

    def __init__(self, s0, x, y, hdg, length, k0, k1):
        self.s0, self.x, self.y, self.hdg, self.length = s0, x, y, hdg, length
        self.k0, self.k1 = k0, k1
        n = max(64, int(length * 8))
        ds = length / n
        ss = np.arange(n + 1) * ds
        kk = k0 + (k1 - k0) * ss / length
        theta = hdg + np.concatenate(
            [[0.0], np.cumsum((kk[1:] + kk[:-1]) / 2 * ds)])
        cx = x + np.concatenate(
            [[0.0], np.cumsum((np.cos(theta[1:]) + np.cos(theta[:-1])) / 2 * ds)])
        cy = y + np.concatenate(
            [[0.0], np.cumsum((np.sin(theta[1:]) + np.sin(theta[:-1])) / 2 * ds)])
        self._ss, self._cx, self._cy, self._th = ss, cx, cy, theta

    def approximate_linear(self, eps):
        kmax = max(abs(self.k0), abs(self.k1), 1e-9)
        step = min(self.length, 2 * math.sqrt(2 * eps / kmax))
        out = [self.s0]
        s = self.s0 + step
        while s < self.s0 + self.length - 1e-12:
            out.append(s)
            s += step
        out.append(self.s0 + self.length)
        return out

    def xy(self, s):
        ds = np.asarray(s, float) - self.s0
        return np.stack([np.interp(ds, self._ss, self._cx),
                         np.interp(ds, self._ss, self._cy)], -1)

    def grad(self, s):
        ds = np.asarray(s, float) - self.s0
        th = np.interp(ds, self._ss, self._th)
        return np.stack([np.cos(th), np.sin(th)], -1)


class _Poly3:
    """v = a+b·u+c·u²+d·u³ along the heading (legacy OpenDRIVE poly3);
    s mapped to u through the same chord-table contract."""

    def __init__(self, s0, x, y, hdg, length, a, b, c, d):
        self.s0, self.x, self.y, self.hdg, self.length = s0, x, y, hdg, length
        self.co = (a, b, c, d)
        uu = np.linspace(0, max(length * 2, 1.0), 513)
        vv = a + b * uu + c * uu ** 2 + d * uu ** 3
        seg = np.hypot(np.diff(uu), np.diff(vv))
        self._tab_u = uu
        self._tab_len = np.concatenate([[0.0], np.cumsum(seg)])

    def approximate_linear(self, eps):
        a, b, c, d = self.co
        out = [self.s0]
        s = self.s0
        while s < self.s0 + self.length - 1e-12:
            u = np.interp(s - self.s0, self._tab_len, self._tab_u)
            k = abs(2 * c + 6 * d * u)
            step = self.length if k < 1e-12 else 2 * math.sqrt(2 * eps / k)
            s = s + max(step, 1e-6)
            if s < self.s0 + self.length - 1e-12:
                out.append(s)
        out.append(self.s0 + self.length)
        return out

    def _uv(self, s):
        u = np.interp(np.asarray(s, float) - self.s0,
                      self._tab_len, self._tab_u)
        a, b, c, d = self.co
        return u, a + b * u + c * u ** 2 + d * u ** 3

    def xy(self, s):
        u, v = self._uv(s)
        ch, sh = math.cos(self.hdg), math.sin(self.hdg)
        return np.stack([self.x + ch * u - sh * v,
                         self.y + sh * u + ch * v], -1)

    def grad(self, s):
        u, _ = self._uv(s)
        a, b, c, d = self.co
        dv = b + 2 * c * u + 3 * d * u ** 2
        ch, sh = math.cos(self.hdg), math.sin(self.hdg)
        return np.stack([ch - sh * dv, sh + ch * dv], -1)


# ------------------------------------------------------------------ road model
@dataclass
class _Lane:
    id: int
    type: str
    predecessor: int
    successor: int
    width_rows: list          # absolute-s cubic rows
    roadmark_groups: list     # (s_abs, type, weight, width, color, lines)
    inner_rows: list = field(default_factory=list)
    outer_rows: list = field(default_factory=list)


@dataclass
class _LaneSection:
    s0: float
    s_end: float
    lanes: list               # sorted by id ascending


@dataclass
class _Signal:
    id: str; s: float; t: float; z_offset: float; h_offset: float
    pitch: float; roll: float; orientation: str; name: str
    dynamic: int; type: str; subtype: str; width: float; height: float


@dataclass
class _Object:
    id: str; type: str; name: str; s: float; t: float
    z_offset: float; hdg: float; length: float; width: float
    height: float; radius: float


class _Road:
    def __init__(self, el: ET.Element):
        self.id = el.get("id", "")
        self.length = float(el.get("length", 0))
        self.junction = el.get("junction", "-1")
        self.geoms = []
        for g in el.find("planView").findall("geometry"):
            s0 = float(g.get("s")); x = float(g.get("x"))
            y = float(g.get("y")); hdg = float(g.get("hdg"))
            ln = float(g.get("length"))
            child = g[0]
            if child.tag == "paramPoly3":
                self.geoms.append(_ParamPoly3(s0, x, y, hdg, ln, child.attrib))
            elif child.tag == "line":
                self.geoms.append(_Line(s0, x, y, hdg, ln))
            elif child.tag == "arc":
                self.geoms.append(_Arc(s0, x, y, hdg, ln,
                                       float(child.get("curvature"))))
            elif child.tag == "spiral":
                self.geoms.append(_Spiral(
                    s0, x, y, hdg, ln, float(child.get("curvStart")),
                    float(child.get("curvEnd"))))
            elif child.tag == "poly3":
                self.geoms.append(_Poly3(
                    s0, x, y, hdg, ln, float(child.get("a")),
                    float(child.get("b")), float(child.get("c")),
                    float(child.get("d"))))
            else:
                raise NotImplementedError(
                    f"OpenDRIVE geometry <{child.tag}> not supported")
        self._geom_starts = np.array([g.s0 for g in self.geoms])

        def rows_of(parent, tag, names=("a", "b", "c", "d"), skey="s"):
            if parent is None:
                return []
            return [(float(e.get(skey, 0)),) +
                    tuple(float(e.get(n, 0)) for n in names)
                    for e in parent.findall(tag)]

        self.elev_rows = rows_of(el.find("elevationProfile"), "elevation")
        lat = el.find("lateralProfile")
        self.sup_rows = rows_of(lat, "superelevation")
        lanes_el = el.find("lanes")
        self.offset_rows = rows_of(lanes_el, "laneOffset")
        if not self.elev_rows:
            self.elev_rows = [(0.0, 0.0, 0.0, 0.0, 0.0)]
        if not self.offset_rows:
            self.offset_rows = [(0.0, 0.0, 0.0, 0.0, 0.0)]

        sec_els = lanes_el.findall("laneSection")
        sec_s = [float(e.get("s")) for e in sec_els]
        sec_end = sec_s[1:] + [self.length]
        self.sections = []
        for se, s0, s1 in zip(sec_els, sec_s, sec_end):
            lanes = []
            for side in se:
                if side.tag not in ("left", "center", "right"):
                    continue
                for ln in side.findall("lane"):
                    wid = [(s0 + float(w.get("sOffset", 0)),
                            float(w.get("a", 0)), float(w.get("b", 0)),
                            float(w.get("c", 0)), float(w.get("d", 0)))
                           for w in ln.findall("width")]
                    marks = []
                    for rm in ln.findall("roadMark"):
                        typ = rm.find("type")
                        lines = []
                        if typ is not None:
                            for li in typ.findall("line"):
                                lines.append((float(li.get("sOffset", 0)),
                                              float(li.get("length", 0)),
                                              float(li.get("space", 0)),
                                              float(li.get("width", 0)),
                                              float(li.get("tOffset", 0))))
                        marks.append((s0 + float(rm.get("sOffset", 0)),
                                      rm.get("type", "none"),
                                      rm.get("weight", "standard"),
                                      float(rm.get("width", 0) or 0),
                                      rm.get("color", "standard"), lines))
                    lanes.append(_Lane(
                        int(ln.get("id")), ln.get("type", "none"),
                        int(ln.find("link/predecessor").get("id"))
                        if ln.find("link/predecessor") is not None else 0,
                        int(ln.find("link/successor").get("id"))
                        if ln.find("link/successor") is not None else 0,
                        wid, marks))
            lanes.sort(key=lambda l: l.id)
            sec = _LaneSection(s0, s1, lanes)
            self._derive_borders(sec)
            self.sections.append(sec)

        self.signals = []
        sig_el = el.find("signals")
        if sig_el is not None:
            for sg in sig_el.findall("signal"):
                self.signals.append(_Signal(
                    sg.get("id", ""), float(sg.get("s", 0)),
                    float(sg.get("t", 0)), float(sg.get("zOffset", 0)),
                    float(sg.get("hOffset", 0) or 0),
                    float(sg.get("pitch", 0) or 0),
                    float(sg.get("roll", 0) or 0),
                    sg.get("orientation", "none"), sg.get("name", ""),
                    1 if sg.get("dynamic", "no") == "yes" else 0,
                    sg.get("type", ""), sg.get("subtype", ""),
                    float(sg.get("width", 0) or 0),
                    float(sg.get("height", 0) or 0)))
        self.objects = []
        obj_el = el.find("objects")
        if obj_el is not None:
            for ob in obj_el.findall("object"):
                self.objects.append(_Object(
                    ob.get("id", ""), ob.get("type", ""),
                    ob.get("name", ""), float(ob.get("s", 0)),
                    float(ob.get("t", 0)), float(ob.get("zOffset", 0) or 0),
                    float(ob.get("hdg", 0) or 0),
                    float(ob.get("length", 0) or 0),
                    float(ob.get("width", 0) or 0),
                    float(ob.get("height", 0) or 0),
                    float(ob.get("radius", 0) or 0)))

    # -------------------------------------------------- borders
    def _derive_borders(self, sec: _LaneSection):
        """inner/outer border rows per lane = laneOffset ± cumulative
        widths walking outward from the centre lane."""
        left = sorted([l for l in sec.lanes if l.id > 0], key=lambda l: l.id)
        right = sorted([l for l in sec.lanes if l.id < 0],
                       key=lambda l: -l.id)
        for group, sign in ((left, 1.0), (right, -1.0)):
            cur = list(self.offset_rows)
            for lane in group:
                lane.inner_rows = cur
                cur = _rows_add(cur, lane.width_rows, sign)
                lane.outer_rows = cur
        for lane in sec.lanes:
            if lane.id == 0:
                lane.inner_rows = list(self.offset_rows)
                lane.outer_rows = list(self.offset_rows)

    # -------------------------------------------------- geometry eval
    def _geom_at(self, s):
        i = int(np.clip(np.searchsorted(self._geom_starts, s + 1e-9) - 1,
                        0, len(self.geoms) - 1))
        return self.geoms[i]

    def ref_s_vals(self, eps: float, lo: float, hi: float) -> list[float]:
        vals = set()
        for g in self.geoms:
            for s in g.approximate_linear(eps):
                if lo - 1e-9 <= s <= hi + 1e-9:
                    vals.add(min(max(s, lo), hi))
        for b in _rows_boundaries(self.elev_rows, lo, hi):
            vals.add(b)
        vals.add(lo); vals.add(hi)
        return sorted(vals)

    def ref_xyz(self, s_list) -> np.ndarray:
        s_arr = np.asarray(s_list, float)
        out = np.empty((len(s_arr), 3))
        for i, s in enumerate(s_arr):
            g = self._geom_at(s)
            out[i, :2] = g.xy(s)
        out[:, 2] = _rows_eval(self.elev_rows, s_arr)
        return out

    def frame(self, s: float):
        """(pos3, e_s, e_t, e_h) with the golden-pinned mixed axis."""
        g = self._geom_at(s)
        xy = np.atleast_2d(g.xy(s))[0]
        z = float(_rows_eval(self.elev_rows, [s])[0])
        gr = np.atleast_2d(g.grad(s))[0]
        dz = float(_rows_deriv(self.elev_rows, [s])[0])
        e_s = np.array([gr[0], gr[1], dz])
        e_s /= np.linalg.norm(e_s)
        e_t0 = np.array([-e_s[1], e_s[0], 0.0])
        n = np.linalg.norm(e_t0)
        e_t0 = e_t0 / n if n > 0 else np.array([0.0, 1.0, 0.0])
        roll = float(_rows_eval(self.sup_rows, [s])[0]) if self.sup_rows else 0.0
        cr, sr = math.cos(roll), math.sin(roll)
        e_t = e_t0 * cr + np.cross(e_s, e_t0) * sr \
            + e_s * np.dot(e_s, e_t0) * (1 - cr)
        e_h = np.cross(e_s, e_t)
        e_h /= np.linalg.norm(e_h)
        return np.array([xy[0], xy[1], z]), e_s, e_t, e_h

    def get_xyz(self, s: float, t: float, h: float = 0.0) -> np.ndarray:
        pos, _, e_t, e_h = self.frame(s)
        return pos + t * e_t + h * e_h

    def border_line(self, rows: list[tuple], s_vals: list[float]) -> np.ndarray:
        ts = _rows_eval(rows, np.asarray(s_vals))
        return np.array([self.get_xyz(s, t) for s, t in zip(s_vals, ts)])

    # -------------------------------------------------- meshes
    def _strip(self, s_vals, t_inner_rows, t_outer_rows,
               half_width: float | None = None):
        """Interleaved [inner, outer] vertices per station."""
        verts = []
        for s in s_vals:
            pos, _, e_t, _ = self.frame(s)
            if half_width is None:
                ti = float(_rows_eval(t_inner_rows, [s])[0])
                to = float(_rows_eval(t_outer_rows, [s])[0])
            else:
                tc = float(_rows_eval(t_outer_rows, [s])[0])
                ti, to = tc + half_width, tc - half_width
            verts.append(pos + ti * e_t)
            verts.append(pos + to * e_t)
        return np.array(verts)

    @staticmethod
    def _strip_triangles(verts: np.ndarray) -> list[np.ndarray]:
        tris = []
        n = len(verts) // 2
        for i in range(n - 1):
            a, b = verts[2 * i], verts[2 * i + 1]
            c, d = verts[2 * i + 2], verts[2 * i + 3]
            tris.append(np.array([a, d, c]))
            tris.append(np.array([a, b, d]))
        return tris

    @staticmethod
    def _strip_ring(verts: np.ndarray) -> np.ndarray:
        """Dissolved outline: outer run reversed + inner run + close
        (matches the reference's UnaryUnion ring for the Lane golden)."""
        inner = verts[0::2]
        outer = verts[1::2]
        return np.concatenate([outer[::-1], inner, outer[-1:]])

    def lane_mesh_stations(self, lane: _Lane, sec: _LaneSection,
                           eps: float) -> list[float]:
        vals = set(self.ref_s_vals(eps, sec.s0, sec.s_end))
        vals.update(_rows_boundaries(lane.inner_rows, sec.s0, sec.s_end))
        return sorted(vals)

    def lane_mesh(self, lane: _Lane, sec: _LaneSection, eps: float):
        s_vals = self.lane_mesh_stations(lane, sec, eps)
        return self._strip(s_vals, lane.inner_rows, lane.outer_rows)

    def roadmarks(self, lane: _Lane, sec: _LaneSection):
        """(s_start, s_end, type, render_width) expanded per the
        reference-count-424 repetition rule."""
        out = []
        groups = lane.roadmark_groups
        g_end = [g[0] for g in groups[1:]] + [sec.s_end]
        for (gs, typ, weight, width, _color, lines), ge in zip(groups, g_end):
            fallback = (_MARK_WIDTH_BOLD if weight == "bold"
                        else _MARK_WIDTH_STANDARD)
            if not lines:
                out.append((gs, ge, typ, width if width > 0 else fallback))
                continue
            for (soff, ln, space, lwidth, _toff) in lines:
                w = lwidth if lwidth > 0 else (width if width > 0 else fallback)
                if ln + space <= 0:
                    out.append((gs + soff, ge, typ, w))
                    continue
                s = gs + soff
                while s < ge:
                    out.append((s, min(s + ln, ge), typ, w))
                    s += ln + space
        return out

    def roadmark_mesh(self, lane: _Lane, sec: _LaneSection,
                      s_lo: float, s_hi: float, width: float, eps: float):
        rows = lane.outer_rows
        vals = set(self.ref_s_vals(eps, s_lo, s_hi))
        bnds = sorted({s_lo, s_hi} |
                      set(_rows_boundaries(rows, s_lo, s_hi)))
        vals.update(bnds)
        for a, b in zip(bnds, bnds[1:]):
            vals.add((a + b) / 2)
        s_vals = sorted(vals)
        return self._strip(s_vals, None, rows, half_width=width / 2)

    def signal_mesh(self, sig: _Signal):
        """Panel box: width along the rotated lateral axis, fixed 0.2 m
        depth along the rotated s axis, height along e_h (pinned by the
        RoadSignal TIN golden)."""
        pos, e_s, e_t, e_h = self.frame(sig.s)
        base = pos + sig.t * e_t + sig.z_offset * e_h
        ang = sig.h_offset
        ca, sa = math.cos(ang), math.sin(ang)
        du = e_s * ca + e_t * sa
        dv = -e_s * sa + e_t * ca
        w = sig.width if sig.width > 0 else 0.5
        h = sig.height if sig.height > 0 else 1.0
        depth = 0.2
        c = []
        for iz in (0.0, h):
            for iu in (-depth / 2, depth / 2):
                for iv in (-w / 2, w / 2):
                    c.append(base + iu * du + iv * dv + iz * e_h)
        c = np.array(c)  # [z][u][v] order: 0..7
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 2, 6, 4),
                 (1, 5, 7, 3), (0, 4, 5, 1), (2, 3, 7, 6)]
        tris = []
        for a, b, cc, d in quads:
            tris.append(np.array([c[a], c[b], c[cc]]))
            tris.append(np.array([c[a], c[cc], c[d]]))
        return tris

    def object_mesh(self, ob: _Object):
        """Oriented bounding box (radius → square of side 2r)."""
        pos, e_s, e_t, e_h = self.frame(ob.s)
        base = pos + ob.t * e_t + ob.z_offset * e_h
        ca, sa = math.cos(ob.hdg), math.sin(ob.hdg)
        du = e_s * ca + e_t * sa
        dv = -e_s * sa + e_t * ca
        length = ob.length if ob.length > 0 else 2 * ob.radius
        width = ob.width if ob.width > 0 else 2 * ob.radius
        length = length or 0.5
        width = width or 0.5
        h = ob.height if ob.height > 0 else 0.5
        c = []
        for iz in (0.0, h):
            for iu in (-length / 2, length / 2):
                for iv in (-width / 2, width / 2):
                    c.append(base + iu * du + iv * dv + iz * e_h)
        c = np.array(c)
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 2, 6, 4),
                 (1, 5, 7, 3), (0, 4, 5, 1), (2, 3, 7, 6)]
        tris = []
        for a, b, cc, d in quads:
            tris.append(np.array([c[a], c[b], c[cc]]))
            tris.append(np.array([c[a], c[cc], c[d]]))
        return tris


# ------------------------------------------------------------------ reader
_LAYER_NAMES = ["ReferenceLine", "LaneBorder", "RoadMark", "RoadObject",
                "Lane", "RoadSignal"]


def _proj4(root: ET.Element) -> str:
    geo = root.find("header/geoReference")
    return (geo.text or "").strip() if geo is not None else ""


def read_xodr(path: str, epsilon: float = 1.0,
              dissolve_tin: bool = False) -> dict[str, pa.Table]:
    """All six OGR XODR layers as Arrow tables (fid + attrs +
    geometry WKB).  Layer order matches OGRXODRDataSource::Open."""
    root = ET.parse(path).getroot()
    if root.tag != "OpenDRIVE":
        raise ValueError(f"{path}: not an OpenDRIVE document")
    # skeleton <road> elements without a planView (empty.xodr) are
    # skipped like the wrapped library's road validation
    roads = sorted((_Road(r) for r in root.findall("road")
                    if r.find("planView") is not None
                    and r.find("lanes") is not None),
                   key=lambda r: r.id)
    proj4 = _proj4(root)

    ref_rows = {"ID": [], "Length": [], "Junction": [], "geometry": []}
    lb_rows = {"ID": [], "RoadID": [], "Type": [], "Predecessor": [],
               "Successor": [], "geometry": []}
    lane_rows = {"LaneID": [], "RoadID": [], "Type": [], "Predecessor": [],
                 "Successor": [], "geometry": []}
    rm_rows = {"RoadID": [], "LaneID": [], "Type": [], "geometry": []}
    ro_rows = {"ObjectID": [], "RoadID": [], "Type": [], "Name": [],
               "geometry": []}
    rs_rows = {"SignalID": [], "RoadID": [], "Type": [], "SubType": [],
               "HOffset": [], "Pitch": [], "Roll": [], "Orientation": [],
               "Name": [], "Dynamic": [], "geometry": []}

    for road in roads:
        s_vals = road.ref_s_vals(epsilon, 0.0, road.length)
        pts = road.ref_xyz(s_vals)
        ref_rows["ID"].append(road.id)
        ref_rows["Length"].append(road.length)
        ref_rows["Junction"].append(road.junction)
        ref_rows["geometry"].append(_wkb_linestring_z(pts))

        for sec in road.sections:
            for lane in sec.lanes:
                # LaneBorder: outer border line (all lanes)
                sb = sorted(set(road.ref_s_vals(epsilon, sec.s0, sec.s_end))
                            | set(_rows_boundaries(lane.outer_rows,
                                                   sec.s0, sec.s_end)))
                line = road.border_line(lane.outer_rows, sb)
                lb_rows["ID"].append(lane.id)
                lb_rows["RoadID"].append(road.id)
                lb_rows["Type"].append(lane.type)
                lb_rows["Predecessor"].append(lane.predecessor)
                lb_rows["Successor"].append(lane.successor)
                lb_rows["geometry"].append(_wkb_linestring_z(line))

                if lane.id != 0:  # Lane layer skips centre lanes
                    verts = road.lane_mesh(lane, sec, epsilon)
                    if dissolve_tin:
                        wkb = _wkb_polygon_z(_Road._strip_ring(verts))
                    else:
                        wkb = _wkb_tin_z(_Road._strip_triangles(verts))
                    lane_rows["LaneID"].append(lane.id)
                    lane_rows["RoadID"].append(road.id)
                    lane_rows["Type"].append(lane.type)
                    lane_rows["Predecessor"].append(lane.predecessor)
                    lane_rows["Successor"].append(lane.successor)
                    lane_rows["geometry"].append(wkb)

                for (ms, me, mtyp, mw) in road.roadmarks(lane, sec):
                    verts = road.roadmark_mesh(lane, sec, ms, me, mw,
                                               epsilon)
                    if dissolve_tin:
                        wkb = _wkb_polygon_z(_Road._strip_ring(verts))
                    else:
                        wkb = _wkb_tin_z(_Road._strip_triangles(verts))
                    rm_rows["RoadID"].append(road.id)
                    rm_rows["LaneID"].append(lane.id)
                    rm_rows["Type"].append(mtyp)
                    rm_rows["geometry"].append(wkb)

        for ob in road.objects:
            ro_rows["ObjectID"].append(ob.id)
            ro_rows["RoadID"].append(road.id)
            ro_rows["Type"].append(ob.type)
            ro_rows["Name"].append(ob.name)
            ro_rows["geometry"].append(
                _wkb_tin_z(road.object_mesh(ob)))

        for sg in road.signals:
            rs_rows["SignalID"].append(sg.id)
            rs_rows["RoadID"].append(road.id)
            rs_rows["Type"].append(sg.type)
            rs_rows["SubType"].append(sg.subtype)
            rs_rows["HOffset"].append(sg.h_offset)
            rs_rows["Pitch"].append(sg.pitch)
            rs_rows["Roll"].append(sg.roll)
            rs_rows["Orientation"].append(sg.orientation)
            rs_rows["Name"].append(sg.name)
            rs_rows["Dynamic"].append(sg.dynamic)
            if dissolve_tin:
                p = road.get_xyz(sg.s, sg.t, sg.z_offset)
                rs_rows["geometry"].append(_wkb_point_z(p))
            else:
                rs_rows["geometry"].append(
                    _wkb_tin_z(road.signal_mesh(sg)))

    def tab(rows, ints=(), reals=()):
        arrs = {}
        n = len(rows["geometry"])
        arrs["fid"] = pa.array(range(n), pa.int64())
        for k, v in rows.items():
            if k == "geometry":
                continue
            if k in ints:
                arrs[k] = pa.array(v, pa.int32())
            elif k in reals:
                arrs[k] = pa.array(v, pa.float64())
            else:
                arrs[k] = pa.array(v, pa.string())
        arrs["geometry"] = pa.array(rows["geometry"], pa.binary())
        return pa.table(arrs)

    out = {
        "ReferenceLine": tab(ref_rows, reals=("Length",)),
        "LaneBorder": tab(lb_rows, ints=("ID", "Predecessor", "Successor")),
        "RoadMark": tab(rm_rows, ints=("LaneID",)),
        "RoadObject": tab(ro_rows),
        "Lane": tab(lane_rows,
                    ints=("LaneID", "Predecessor", "Successor")),
        "RoadSignal": tab(rs_rows, ints=("Dynamic",),
                          reals=("HOffset", "Pitch", "Roll")),
    }
    out["__proj4__"] = proj4
    return out


def xodr_layer_names(path: str) -> list[str]:
    """Always the fixed six layers (OGRXODRDataSource::Open order) —
    an OpenDRIVE doc without roads still opens with 6 (empty) layers
    in the reference test_ogr_xodr_empty."""
    root = ET.parse(path).getroot()
    if root.tag != "OpenDRIVE":
        raise ValueError(f"{path}: not an OpenDRIVE document")
    return list(_LAYER_NAMES)
