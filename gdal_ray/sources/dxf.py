"""AutoCAD DXF vector driver — a from-scratch re-derivation of the
reference's ogr/ogrsf_frmts/dxf reader semantics over the group-code /
value pair stream:

- one OGR layer ``entities`` with the reference's six fields (Layer,
  SubClasses, LineType, EntityHandle, Text, PaperSpace);
- entity translations matching ogrdxflayer.cpp: POINT, LINE,
  LWPOLYLINE (bulge arcs via ogrdxf_polyline_smooth.cpp's exact
  center/angle construction), POLYLINE/VERTEX/SEQEND, CIRCLE, ARC,
  ELLIPSE (ogrgeometryfactory.cpp approximateArcAngles with the 4°
  default step and angle negation), SPLINE (uniform B-spline sampled
  like intronurbs), SOLID/TRACE (1-2-4-3 ring order with duplicate
  skip), 3DFACE, TEXT/MTEXT (TextUnescape + LABEL style strings),
  INSERT (recursive block inlining with non-label geometry merging
  per InsertBlockInline), DIMENSION (fallback rendering: dimension
  line + synthesized arrowhead polygons + formatted label exactly as
  ogrdxf_dimension.cpp lays them out);
- OCS (arbitrary axis algorithm, ogrdxf_ocstransformer.cpp) applied
  per entity, inverse OCS for ELLIPSE centers;
- AutoCAD color index table reproduced generatively (index 7 is black
  like the reference's table comment says) + 420 true colors.

Conformance: the reference's own autotest/ogr/ogr_dxf.py expectations
for assorted.dxf (all 22 features), entities_only.dxf and
LWPOLYLINE-OCS.dxf are pinned in tests/test_dxf.py.
"""

from __future__ import annotations

import math
import re

DEFAULT_ARC_STEP = 4.0  # degrees — OGR_ARC_STEPSIZE default

_NUM_RE = re.compile(r"^\s*[+-]?\d*\.?\d*(?:[eE][+-]?\d+)?")
_INT_RE = re.compile(r"^\s*[+-]?\d*")


def _atof(s: str) -> float:
    m = _NUM_RE.match(s)
    t = m.group(0).strip() if m else ""
    try:
        return float(t)
    except ValueError:
        return 0.0


def _atoi(s: str) -> int:
    m = _INT_RE.match(s)
    t = m.group(0).strip() if m else ""
    try:
        return int(t)
    except ValueError:
        return 0


# ---------------------------------------------------------------------------
# colors
# ---------------------------------------------------------------------------

def aci_to_rgb(idx: int) -> tuple[int, int, int]:
    """AutoCAD color index -> RGB, generating the reference's table
    (ogr_autocad_services.cpp — index 7 deliberately black)."""
    base = [(0, 0, 0), (255, 0, 0), (255, 255, 0), (0, 255, 0),
            (0, 255, 255), (0, 0, 255), (255, 0, 255), (0, 0, 0),
            (127, 127, 127), (191, 191, 191)]
    if 0 <= idx < 10:
        return base[idx]
    if 10 <= idx < 250:
        hue = (idx - 10) // 10 * 15  # degrees
        j = (idx - 10) % 10
        intensity = [255, 165, 127, 76, 38][j // 2]
        low = intensity // 2 if j % 2 else 0
        sector = hue // 60
        frac = (hue % 60) / 60.0
        up = low + int((intensity - low) * frac)
        down = low + int((intensity - low) * (1.0 - frac))
        table = [(intensity, up, low), (down, intensity, low),
                 (low, intensity, up), (low, down, intensity),
                 (up, low, intensity), (intensity, low, down)]
        return table[sector % 6]
    if 250 <= idx <= 255:
        v = [84, 118, 152, 186, 220, 255][idx - 250]
        return (v, v, v)
    return (0, 0, 0)


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

class Geom:
    """Tiny geometry record: kind + coordinate arrays (always xyz
    tuples) + whether z is real (25D)."""

    def __init__(self, kind, coords, has_z=False):
        self.kind = kind          # POINT/LINESTRING/POLYGON/MULTI.../COLL
        self.coords = coords      # per kind: point, list, list-of-rings,
        self.has_z = has_z        # list of Geom for MULTI/COLLECTION

    def clone(self):
        import copy

        return Geom(self.kind, copy.deepcopy(self.coords), self.has_z)

    def transform(self, fn):
        def walk(c):
            if isinstance(c, tuple):
                return fn(c)
            return [walk(x) for x in c]

        if self.kind in ("MULTILINESTRING", "MULTIPOLYGON",
                         "GEOMETRYCOLLECTION"):
            for g in self.coords:
                g.transform(fn)
        else:
            self.coords = walk(self.coords)

    def all_points(self):
        out = []

        def walk(c):
            if isinstance(c, tuple):
                out.append(c)
            else:
                for x in c:
                    walk(x)

        if self.kind in ("MULTILINESTRING", "MULTIPOLYGON",
                         "GEOMETRYCOLLECTION"):
            for g in self.coords:
                out.extend(g.all_points())
        else:
            walk(self.coords)
        return out

    def wkt(self) -> str:
        z = self.has_z

        def fmt(p):
            s = f"{p[0]:.15g} {p[1]:.15g}"
            return s + (f" {p[2]:.15g}" if z else "")

        def seq(pts):
            return "(" + ",".join(fmt(p) for p in pts) + ")"

        k = self.kind
        zs = " Z " if z else " "
        if k == "POINT":
            return f"POINT{zs}({fmt(self.coords)})"
        if k == "LINESTRING":
            return f"LINESTRING{zs}{seq(self.coords)}"
        if k == "POLYGON":
            return f"POLYGON{zs}(" + ",".join(
                seq(r) for r in self.coords) + ")"
        if k == "MULTILINESTRING":
            return f"MULTILINESTRING{zs}(" + ",".join(
                seq(g.coords) for g in self.coords) + ")"
        if k == "MULTIPOLYGON":
            return f"MULTIPOLYGON{zs}(" + ",".join(
                "(" + ",".join(seq(r) for r in g.coords) + ")"
                for g in self.coords) + ")"
        return f"GEOMETRYCOLLECTION{zs}(" + ",".join(
            g.wkt() for g in self.coords) + ")"


def approximate_arc(cx, cy, z, r_prim, r_sec, rotation_deg, start_deg,
                    end_deg, step=DEFAULT_ARC_STEP):
    """Exact port of OGRGeometryFactory::approximateArcAngles (angle
    negation, vertex count, -rotation application)."""
    rot = math.radians(rotation_deg)
    full_circle = abs(end_deg - start_deg) == 360.0
    start, end = -start_deg, -end_deg
    nvert = max(2, int(math.ceil(abs(end - start) / step) + 1))
    dslice = (end - start) / (nvert - 1)
    if full_circle:
        nvert -= 1
    pts = []
    for i in range(nvert):
        a = math.radians(start + i * dslice)
        ex = math.cos(a) * r_prim
        ey = math.sin(a) * r_sec
        pts.append((cx + ex * math.cos(rot) + ey * math.sin(rot),
                    cy - ex * math.sin(rot) + ey * math.cos(rot), z))
    if full_circle:
        pts.append(pts[0])
    return pts


def ocs_matrix(n):
    """Arbitrary axis algorithm -> (ax, ay, n) unit basis vectors."""
    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def unit(v):
        ln = math.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
        return (v[0] / ln, v[1] / ln, v[2] / ln) if ln else v

    n = unit(n)
    small = 1.0 / 64.0
    if abs(n[0]) < small and abs(n[1]) < small:
        ax = cross((0.0, 1.0, 0.0), n)
    else:
        ax = cross((0.0, 0.0, 1.0), n)
    ax = unit(ax)
    ay = unit(cross(n, ax))
    return ax, ay, n


def ocs_to_wcs(n):
    ax, ay, nz = ocs_matrix(n)

    def fn(p):
        x, y, z = p
        return (x * ax[0] + y * ay[0] + z * nz[0],
                x * ax[1] + y * ay[1] + z * nz[1],
                x * ax[2] + y * ay[2] + z * nz[2])

    return fn


def wcs_to_ocs(n):
    ax, ay, nz = ocs_matrix(n)

    def fn(p):
        x, y, z = p
        return (x * ax[0] + y * ax[1] + z * ax[2],
                x * ay[0] + y * ay[1] + z * ay[2],
                x * nz[0] + y * nz[1] + z * nz[2])

    return fn


# ---------------------------------------------------------------------------
# text unescape (ogr_autocad_services.cpp ACTextUnescape)
# ---------------------------------------------------------------------------

def text_unescape(text: str, is_mtext: bool = True) -> str:
    out = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if text[i:i + 4] in ("\\U+", "\\u+") or \
                (c == "\\" and text[i + 1:i + 3] in ("U+", "u+")):
            code = text[i + 3:i + 7]
            try:
                out.append(chr(int(code, 16)))
                i += 7
                continue
            except ValueError:
                pass
        if c == "%" and text[i:i + 2] == "%%":
            ch = text[i + 2:i + 3].lower()
            rep = {"d": "°", "p": "±", "c": "⌀"}.get(ch)
            if rep:
                out.append(rep)
                i += 3
                continue
            i += 2
            continue
        if not is_mtext:
            out.append(c)
            i += 1
            continue
        if c == "\\":
            nxt = text[i + 1:i + 2]
            if nxt == "P":
                out.append("\n")
                i += 2
                continue
            if nxt == "~":
                out.append(" ")
                i += 2
                continue
            if nxt in ("\\", "{", "}"):
                out.append(nxt)
                i += 2
                continue
            if nxt in "WTAcC":  # numeric property: skip to ';'
                j = text.find(";", i)
                i = (j + 1) if j >= 0 else n
                continue
            if nxt in "fF":  # font override: skip to ';'
                j = text.find(";", i)
                i = (j + 1) if j >= 0 else n
                continue
            if nxt == "S":  # stacked fraction: keep content
                j = text.find(";", i)
                frag = text[i + 2:j if j >= 0 else n]
                out.append(frag.replace("^", "/").replace("#", "/"))
                i = (j + 1) if j >= 0 else n
                continue
            out.append(nxt)
            i += 2
            continue
        if c in "{}":
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class _Pairs:
    def __init__(self, text: str):
        self.lines = text.splitlines()
        self.i = 0
        self.pushed = None

    def read(self):
        if self.pushed is not None:
            v = self.pushed
            self.pushed = None
            return v
        while self.i + 1 < len(self.lines):
            try:
                code = int(self.lines[self.i].strip())
            except ValueError:
                self.i += 1
                continue
            val = self.lines[self.i + 1]
            self.i += 2
            return code, val.strip("\r")
        return None

    def unread(self, pair):
        self.pushed = pair


_FIELDS = ("Layer", "SubClasses", "Linetype", "EntityHandle", "Text",
           "PaperSpace")


class DXFFeature:
    def __init__(self):
        self.fields = {"Layer": "0", "SubClasses": None, "Linetype": None,
                       "EntityHandle": None, "Text": None,
                       "PaperSpace": None}
        self.geom: Geom | None = None
        self.style: str | None = None
        self.color = None          # ACI or None (ByLayer)
        self.true_color = None
        self.ocs = (0.0, 0.0, 1.0)
        self.block_name = None     # set for INSERT sub-references
        self.block_xyz = (0.0, 0.0, 0.0)
        self.block_scale = (1.0, 1.0, 1.0)
        self.block_angle = 0.0
        self.attribute_tag = None
        self.is_label = False

    def clone(self):
        import copy

        f = DXFFeature()
        f.fields = dict(self.fields)
        f.geom = self.geom.clone() if self.geom else None
        f.style = self.style
        f.color = self.color
        f.true_color = self.true_color
        f.ocs = self.ocs
        f.block_name = self.block_name
        f.block_xyz = self.block_xyz
        f.block_scale = self.block_scale
        f.block_angle = self.block_angle
        f.attribute_tag = self.attribute_tag
        f.is_label = self.is_label
        return f


class DXFReader:
    """Parse a whole DXF into a feature list (reference layer name
    'entities')."""

    def __init__(self, text: str):
        self.layers: dict[str, dict] = {}
        self.blocks: dict[str, list[DXFFeature]] = {}
        self.features: list[DXFFeature] = []
        self.dimstyles: dict[str, dict] = {}
        self._parse(_Pairs(text))

    # -- defaults per ogr_autocad_services.cpp
    _DIM_DEFAULTS = {"DIMSCALE": 1.0, "DIMASZ": 0.18, "DIMEXO": 0.0625,
                     "DIMEXE": 0.18, "DIMSE1": 0, "DIMSE2": 0,
                     "DIMTAD": 0, "DIMTXT": 0.18, "DIMGAP": 0.09,
                     "DIMCLRD": 0, "DIMCLRT": 0, "DIMDEC": 4}

    def _parse(self, rd: _Pairs):
        entities_seen = False
        while True:
            pair = rd.read()
            if pair is None:
                break
            code, val = pair
            if code == 0 and val == "SECTION":
                nxt = rd.read()
                if nxt is None:
                    break
                name = nxt[1]
                if name == "TABLES":
                    self._parse_tables(rd)
                elif name == "BLOCKS":
                    self._parse_blocks(rd)
                elif name == "ENTITIES":
                    entities_seen = True
                    self._parse_entities(rd, self.features)
            elif code == 0 and not entities_seen and val in _ENTITY_SET:
                # entities-only files (#3412): no SECTION wrapper
                rd.unread(pair)
                self._parse_entities(rd, self.features, bare=True)
                entities_seen = True

    def _parse_tables(self, rd):
        current = None
        layer = None
        dimstyle = None
        while True:
            pair = rd.read()
            if pair is None:
                return
            code, val = pair
            if code == 0 and val == "ENDSEC":
                return
            if code == 0:
                if layer is not None:
                    self.layers[layer["name"]] = layer
                    layer = None
                if dimstyle is not None:
                    self.dimstyles[dimstyle.get("name", "")] = dimstyle
                    dimstyle = None
            if code == 0 and val == "TABLE":
                current = None
            elif code == 2 and current is None:
                current = val
            elif code == 0 and val == "LAYER":
                layer = {"name": "0", "color": 7, "linetype": "",
                         "hidden": False}
            elif code == 0 and val == "DIMSTYLE":
                dimstyle = {}
            elif layer is not None:
                if code == 2:
                    layer["name"] = val
                elif code == 62:
                    c = _atoi(val)
                    if c < 0:
                        layer["hidden"] = True
                        c = -c
                    layer["color"] = c
                elif code == 70 and _atoi(val) & 1:
                    layer["hidden"] = True
                elif code == 6:
                    layer["linetype"] = val
            elif dimstyle is not None:
                if code == 2:
                    dimstyle["name"] = val
                elif code in (40, 41, 42, 44, 140, 147):
                    key = {40: "DIMSCALE", 41: "DIMASZ", 42: "DIMEXO",
                           44: "DIMEXE", 140: "DIMTXT",
                           147: "DIMGAP"}[code]
                    dimstyle[key] = _atof(val)
                elif code in (75, 76, 77, 271):
                    key = {75: "DIMSE1", 76: "DIMSE2", 77: "DIMTAD",
                           271: "DIMDEC"}[code]
                    dimstyle[key] = _atoi(val)
                elif code == 178:
                    dimstyle["DIMCLRT"] = _atoi(val)

    def _parse_blocks(self, rd):
        name = None
        while True:
            pair = rd.read()
            if pair is None:
                return
            code, val = pair
            if code == 0 and val == "ENDSEC":
                return
            if code == 0 and val == "BLOCK":
                name = None
                # read block header until first entity / ENDBLK
                while True:
                    p2 = rd.read()
                    if p2 is None:
                        return
                    if p2[0] == 2 and name is None:
                        name = p2[1]
                    if p2[0] == 0:
                        rd.unread(p2)
                        break
                feats: list[DXFFeature] = []
                self._in_block = True
                try:
                    self._parse_entities(rd, feats, end_at="ENDBLK")
                finally:
                    self._in_block = False
                self.blocks[name or ""] = feats

    def _parse_entities(self, rd, sink: list[DXFFeature],
                        end_at: str = "ENDSEC", bare: bool = False):
        pending: list[DXFFeature] = []
        while True:
            if pending:
                sink.append(pending.pop(0))
                continue
            pair = rd.read()
            if pair is None:
                return
            code, val = pair
            if code != 0:
                continue
            if val == end_at or (bare and val == "EOF"):
                return
            if val == "ENDBLK":
                if end_at == "ENDBLK":
                    return
                continue
            feat = self._translate(val, rd, pending)
            if feat is not None:
                sink.append(feat)

    # -- entity translation --------------------------------------------------

    def _generic(self, feat: DXFFeature, code: int, val: str):
        if code == 8:
            feat.fields["Layer"] = val
        elif code == 100:
            sc = feat.fields["SubClasses"]
            feat.fields["SubClasses"] = val if sc is None else \
                sc + ":" + val
        elif code == 5:
            feat.fields["EntityHandle"] = val
        elif code == 6:
            feat.fields["Linetype"] = val
        elif code == 67:
            feat.fields["PaperSpace"] = 1 if val.strip() == "1" else None
        elif code == 62:
            feat.color = _atoi(val)
        elif code == 420:
            feat.true_color = _atoi(val)
        elif code == 210:
            feat.ocs = (_atof(val), feat.ocs[1], feat.ocs[2])
        elif code == 220:
            feat.ocs = (feat.ocs[0], _atof(val), feat.ocs[2])
        elif code == 230:
            feat.ocs = (feat.ocs[0], feat.ocs[1], _atof(val))

    def _read_entity(self, rd, feat, handlers):
        """Common group-code loop; handlers: {code: fn(value)}."""
        while True:
            pair = rd.read()
            if pair is None:
                return
            code, val = pair
            if code == 0:
                rd.unread(pair)
                return
            if code in handlers:
                handlers[code](val)
            else:
                self._generic(feat, code, val)

    def pen_color(self, feat: DXFFeature,
                  block_feat: DXFFeature | None = None) -> str:
        if feat.true_color is not None:
            return "#%02x%02x%02x" % ((feat.true_color >> 16) & 0xFF,
                                      (feat.true_color >> 8) & 0xFF,
                                      feat.true_color & 0xFF)
        color = feat.color if feat.color not in (None, 256, 0) else None
        if color is None:
            lay = self.layers.get(feat.fields["Layer"])
            color = lay["color"] if lay else 7
        r, g, b = aci_to_rgb(color)
        return "#%02x%02x%02x" % (r, g, b)

    def _pen_style(self, feat):
        feat.style = f"PEN(c:{self.pen_color(feat)})"

    def _brush_style(self, feat):
        feat.style = f"BRUSH(fc:{self.pen_color(feat)})"

    def _apply_ocs(self, feat, geom):
        if feat.ocs != (0.0, 0.0, 1.0):
            geom.transform(ocs_to_wcs(feat.ocs))

    def _translate(self, etype, rd, pending):
        fn = getattr(self, "_t_" + etype.lower(), None)
        if fn is None:
            # skip unknown entity: consume its codes
            f = DXFFeature()
            self._read_entity(rd, f, {})
            return None
        return fn(rd, pending)

    def _t_point(self, rd, pending):
        f = DXFFeature()
        p = [0.0, 0.0, 0.0]
        have_z = [False]

        def setz(v):
            p[2] = _atof(v)
            have_z[0] = True

        self._read_entity(rd, f, {
            10: lambda v: p.__setitem__(0, _atof(v)),
            20: lambda v: p.__setitem__(1, _atof(v)),
            30: setz})
        f.geom = Geom("POINT", tuple(p), have_z[0])
        self._apply_ocs(f, f.geom)
        self._pen_style(f)
        return f

    def _t_line(self, rd, pending):
        f = DXFFeature()
        a = [0.0, 0.0, 0.0]
        b = [0.0, 0.0, 0.0]
        have_z = [False]

        def mk(arr, i):
            def set_(v):
                arr[i] = _atof(v)
                if i == 2:
                    have_z[0] = True
            return set_

        self._read_entity(rd, f, {
            10: mk(a, 0), 20: mk(a, 1), 30: mk(a, 2),
            11: mk(b, 0), 21: mk(b, 1), 31: mk(b, 2)})
        f.geom = Geom("LINESTRING", [tuple(a), tuple(b)], have_z[0])
        self._pen_style(f)
        return f

    # -- smooth polyline helpers (ogrdxf_polyline_smooth.cpp) ---------------

    @staticmethod
    def _emit_bulge_arc(start, end, bulge, z, out):
        length = math.hypot(end[0] - start[0], end[1] - start[1])
        h = (bulge * length) / 2.0
        radius = h / 2.0 + (length * length / (8.0 * h))
        clockwise = bulge < 0
        b = -bulge if clockwise else bulge
        saggita = abs(b * (length / 2.0))
        r = abs(radius)
        apo = -(r - saggita) if clockwise else -(saggita - r)
        vx, vy = start[0] - end[0], start[1] - end[1]
        mx, my = end[0] + 0.5 * vx, end[1] + 0.5 * vy
        pl = math.hypot(vy, -vx)
        px_, py_ = (vy / pl, -vx / pl) if pl else (0.0, 0.0)
        cx, cy = mx + px_ * apo, my + py_ * apo
        linedir = 1.0 if end[1] > start[1] else -1.0

        def get_angle(c, p):
            return math.degrees(math.atan2(c[1] - p[1], c[0] - p[0]))

        def ogr_angle(a):
            return -(a - 180.0) if a > 0.0 else -(a + 180.0)

        a = get_angle((cx, cy), start)
        if clockwise and linedir == 1.0:
            a += linedir * 180.0
        start_ang = ogr_angle(a)
        a = get_angle((cx, cy), end)
        if clockwise and linedir == 1.0:
            a += linedir * 180.0
        end_ang = ogr_angle(a)
        if not clockwise and start_ang < end_ang:
            end_ang = -180.0 + linedir * a
        if clockwise and start_ang > end_ang:
            end_ang += 360.0
        rotation = linedir * 180.0 if (clockwise and linedir == 1.0) \
            else 0.0
        if abs(end_ang - start_ang) <= 361.0:
            pts = approximate_arc(cx, cy, z, r, r, rotation, start_ang,
                                  end_ang)
            if len(pts) >= 2:
                pts[0] = (start[0], start[1], z)
                pts[-1] = (end[0], end[1], z)
            # addSubLineString semantics: junction duplicates are KEPT
            out.extend(pts)

    def _tessellate_polyline(self, verts, bulges, closed, dim):
        """verts: [(x, y, z)], returns point list (z kept)."""
        if closed and verts and verts[0] != verts[-1]:
            verts = verts + [verts[0]]
            bulges = bulges + [0.0]
        out: list[tuple] = []
        started = False
        for i in range(len(verts) - 1):
            a, b = verts[i], verts[i + 1]
            length = math.hypot(b[0] - a[0], b[1] - a[1])
            if length == 0 or bulges[i] == 0 or a[2] != b[2]:
                # EmitLine: start point only once per run of segments
                if not started:
                    out.append(a)
                    started = True
                out.append(b)
            else:
                self._emit_bulge_arc(a, b, bulges[i], a[2], out)
                started = True
        return out

    def _t_lwpolyline(self, rd, pending):
        f = DXFFeature()
        verts: list[list[float]] = []
        bulges: list[float] = []
        flags = [0]
        cz = [0.0]

        def add_x(v):
            verts.append([_atof(v), 0.0, 0.0])
            bulges.append(0.0)

        def add_y(v):
            verts[-1][1] = _atof(v)

        def add_b(v):
            bulges[-1] = _atof(v)

        self._read_entity(rd, f, {
            10: add_x, 20: add_y, 42: add_b,
            70: lambda v: flags.__setitem__(0, _atoi(v)),
            38: lambda v: cz.__setitem__(0, _atof(v))})
        if not verts:
            return None
        for v in verts:
            v[2] = cz[0]
        closed = bool(flags[0] & 1)
        pts = self._tessellate_polyline([tuple(v) for v in verts], bulges,
                                        closed, 2)
        has_z = feat_z = cz[0] != 0.0 or f.ocs != (0.0, 0.0, 1.0)
        f.geom = Geom("LINESTRING", pts, feat_z)
        self._apply_ocs(f, f.geom)
        f.geom.has_z = has_z
        self._pen_style(f)
        return f

    def _t_polyline(self, rd, pending):
        f = DXFFeature()
        flags = [0]
        self._read_entity(rd, f, {
            70: lambda v: flags.__setitem__(0, _atoi(v))})
        verts: list[tuple] = []
        bulges: list[float] = []
        have_z = [False]
        # VERTEX records follow until SEQEND
        while True:
            pair = rd.read()
            if pair is None:
                break
            code, val = pair
            if code == 0 and val == "VERTEX":
                p = [0.0, 0.0, 0.0]
                b = [0.0]
                vf = DXFFeature()

                def setz(v, p=p):
                    p[2] = _atof(v)
                    have_z[0] = True

                self._read_entity(rd, vf, {
                    10: lambda v, p=p: p.__setitem__(0, _atof(v)),
                    20: lambda v, p=p: p.__setitem__(1, _atof(v)),
                    30: setz,
                    42: lambda v, b=b: b.__setitem__(0, _atof(v))})
                verts.append(tuple(p))
                bulges.append(b[0])
            elif code == 0 and val == "SEQEND":
                vf = DXFFeature()
                self._read_entity(rd, vf, {})
                break
            elif code == 0:
                rd.unread(pair)
                break
        if not verts:
            return None
        closed = bool(flags[0] & 1)
        pts = self._tessellate_polyline(verts, bulges, closed, 3)
        f.geom = Geom("LINESTRING", pts, have_z[0])
        self._apply_ocs(f, f.geom)
        self._pen_style(f)
        return f

    def _t_circle(self, rd, pending):
        f = DXFFeature()
        c = [0.0, 0.0, 0.0, 0.0]
        have_z = [False]

        def setz(v):
            c[2] = _atof(v)
            have_z[0] = True

        self._read_entity(rd, f, {
            10: lambda v: c.__setitem__(0, _atof(v)),
            20: lambda v: c.__setitem__(1, _atof(v)),
            30: setz,
            40: lambda v: c.__setitem__(3, _atof(v))})
        pts = approximate_arc(c[0], c[1], c[2], c[3], c[3], 0.0, 0.0,
                              360.0)
        f.geom = Geom("LINESTRING", pts, have_z[0])
        self._apply_ocs(f, f.geom)
        self._pen_style(f)
        return f

    def _t_arc(self, rd, pending):
        f = DXFFeature()
        c = [0.0, 0.0, 0.0, 0.0]
        ang = [0.0, 360.0]  # [start, end] AFTER the reference's negation
        have_z = [False]

        def setz(v):
            c[2] = _atof(v)
            have_z[0] = True

        self._read_entity(rd, f, {
            10: lambda v: c.__setitem__(0, _atof(v)),
            20: lambda v: c.__setitem__(1, _atof(v)),
            30: setz,
            40: lambda v: c.__setitem__(3, _atof(v)),
            50: lambda v: ang.__setitem__(1, -_atof(v)),   # -> end
            51: lambda v: ang.__setitem__(0, -_atof(v))})  # -> start
        start, end = ang
        if start > end:
            end += 360.0
        pts = approximate_arc(c[0], c[1], c[2], c[3], c[3], 0.0, start,
                              end)
        f.geom = Geom("LINESTRING", pts, have_z[0])
        self._apply_ocs(f, f.geom)
        self._pen_style(f)
        return f

    def _t_ellipse(self, rd, pending):
        f = DXFFeature()
        c = [0.0, 0.0, 0.0]
        axis = [0.0, 0.0, 0.0]
        ratio = [0.0]
        ang = [0.0, 360.0]
        have_z = [False]

        def setz(v):
            c[2] = _atof(v)
            have_z[0] = True

        self._read_entity(rd, f, {
            10: lambda v: c.__setitem__(0, _atof(v)),
            20: lambda v: c.__setitem__(1, _atof(v)),
            30: setz,
            11: lambda v: axis.__setitem__(0, _atof(v)),
            21: lambda v: axis.__setitem__(1, _atof(v)),
            31: lambda v: axis.__setitem__(2, _atof(v)),
            40: lambda v: ratio.__setitem__(0, _atof(v)),
            41: lambda v: ang.__setitem__(1, -math.degrees(_atof(v))),
            42: lambda v: ang.__setitem__(0, -math.degrees(_atof(v)))})
        cx, cy, cz = c
        ax, ay, az = axis
        apply_ocs = f.ocs != (0.0, 0.0, 1.0)
        if apply_ocs:
            inv = wcs_to_ocs(f.ocs)
            cx, cy, cz = inv((cx, cy, cz))
            ax, ay, az = inv((ax, ay, az))
        r_prim = math.sqrt(ax * ax + ay * ay + az * az)
        r_sec = ratio[0] * r_prim
        rotation = -math.degrees(math.atan2(ay, ax))
        start, end = ang
        if start > end:
            end += 360.0
        if abs(end - start) <= 361.0:
            pts = approximate_arc(cx, cy, cz, r_prim, r_sec, rotation,
                                  start, end)
            g = Geom("LINESTRING", pts, have_z[0])
            if apply_ocs:
                g.transform(ocs_to_wcs(f.ocs))
            f.geom = g
        self._pen_style(f)
        return f

    def _t_spline(self, rd, pending):
        f = DXFFeature()
        ctl: list[list[float]] = []
        degree = [3]

        def add_x(v):
            ctl.append([_atof(v), 0.0, 0.0])

        self._read_entity(rd, f, {
            10: add_x,
            20: lambda v: ctl[-1].__setitem__(1, _atof(v)),
            30: lambda v: ctl[-1].__setitem__(2, _atof(v)),
            71: lambda v: degree.__setitem__(0, _atoi(v))})
        if len(ctl) < 2:
            return None
        pts = _sample_bspline([tuple(p) for p in ctl], degree[0])
        f.geom = Geom("LINESTRING", pts, False)
        self._apply_ocs(f, f.geom)
        self._pen_style(f)
        return f

    def _corner_entity(self, rd, solid: bool):
        f = DXFFeature()
        p = [[0.0] * 3 for _ in range(4)]
        got4 = [False]

        def mk(i, j):
            def set_(v):
                p[i][j] = _atof(v)
                if i == 3:
                    got4[0] = True
            return set_

        handlers = {}
        for i, base in enumerate((10, 11, 12, 13)):
            handlers[base] = mk(i, 0)
            handlers[base + 10] = mk(i, 1)
            handlers[base + 20] = mk(i, 2)
        self._read_entity(rd, f, handlers)
        want_z = any(pt[2] != 0.0 for pt in p)
        uniq = []
        for pt in p:
            t = tuple(pt)
            if t not in uniq:
                uniq.append(t)
        if len(uniq) == 1:
            f.geom = Geom("POINT", uniq[0], want_z)
            self._pen_style(f)
        elif len(uniq) == 2:
            f.geom = Geom("LINESTRING", uniq, want_z)
            self._pen_style(f)
        elif solid:
            # SOLID vertex order 1, 2, 4, 3 with duplicate skip
            ring = [tuple(p[0])]
            if p[1] != p[0]:
                ring.append(tuple(p[1]))
            if p[3] != p[1]:
                ring.append(tuple(p[3]))
            if p[2] != p[3] and p[2] != p[0]:
                ring.append(tuple(p[2]))
            ring.append(ring[0])
            f.geom = Geom("POLYGON", [ring], True)
            self._brush_style(f)
        else:
            # 3DFACE: natural 1, 2, 3, 4 order (4th optional)
            ring = [tuple(p[0]), tuple(p[1]), tuple(p[2])]
            if got4[0] and p[3] != p[2]:
                ring.append(tuple(p[3]))
            ring.append(ring[0])
            f.geom = Geom("POLYGON", [ring], True)
            self._brush_style(f)
        self._apply_ocs(f, f.geom)
        return f

    def _t_solid(self, rd, pending):
        return self._corner_entity(rd, True)

    def _t_trace(self, rd, pending):
        return self._corner_entity(rd, True)

    def _t_3dface(self, rd, pending):
        return self._corner_entity(rd, False)

    def _label_style(self, f, text, angle, height, attach):
        esc = text.replace("\\", "\\\\").replace('"', '\\"')
        parts = [f'LABEL(f:"Arial",t:"{esc}"']
        if angle != 0.0:
            parts.append(",a:%s" % _fmt3g(angle))
        if height != 0.0:
            parts.append(",s:%sg" % _fmt3g(height))
        if attach is not None:
            parts.append(",p:%d" % attach)
        parts.append(",c:%s" % self.pen_color(f))
        parts.append(")")
        f.style = "".join(parts)
        f.is_label = True

    _MTEXT_ANCHOR = {1: 7, 2: 8, 3: 9, 4: 4, 5: 5, 6: 6, 7: 1, 8: 2,
                     9: 3}

    def _t_mtext(self, rd, pending):
        f = DXFFeature()
        p = [0.0, 0.0, 0.0]
        have_z = [False]
        height = [0.0]
        angle = [0.0]
        direction = [0.0, 0.0]
        attach = [None]
        text = [""]

        def setz(v):
            p[2] = _atof(v)
            have_z[0] = True

        def set_dir_y(v):
            direction[1] = _atof(v)
            angle[0] = math.degrees(math.atan2(direction[1],
                                               direction[0]))

        self._read_entity(rd, f, {
            10: lambda v: p.__setitem__(0, _atof(v)),
            20: lambda v: p.__setitem__(1, _atof(v)),
            30: setz,
            40: lambda v: height.__setitem__(0, _atof(v)),
            71: lambda v: attach.__setitem__(0, _atoi(v)),
            11: lambda v: direction.__setitem__(0, _atof(v)),
            21: set_dir_y,
            50: lambda v: angle.__setitem__(0, _atof(v)),
            1: lambda v: text.__setitem__(0, text[0] +
                                          text_unescape(v, True)),
            3: lambda v: text.__setitem__(0, text[0] +
                                          text_unescape(v, True)),
            7: lambda v: None})
        txt = text[0]
        if txt.endswith("\n"):
            txt = txt[:-1]
        f.fields["Text"] = txt
        f.geom = Geom("POINT", tuple(p), have_z[0])
        self._apply_ocs(f, f.geom)
        anchor = self._MTEXT_ANCHOR.get(attach[0]) if attach[0] else None
        self._label_style(f, txt, angle[0], height[0], anchor)
        return f

    def _t_text(self, rd, pending):
        f = DXFFeature()
        p = [0.0, 0.0, 0.0]
        have_z = [False]
        height = [0.0]
        angle = [0.0]
        halign = [0]
        valign = [0]
        text = [""]

        def setz(v):
            p[2] = _atof(v)
            have_z[0] = True

        self._read_entity(rd, f, {
            10: lambda v: p.__setitem__(0, _atof(v)),
            20: lambda v: p.__setitem__(1, _atof(v)),
            30: setz,
            40: lambda v: height.__setitem__(0, _atof(v)),
            50: lambda v: angle.__setitem__(0, _atof(v)),
            72: lambda v: halign.__setitem__(0, _atoi(v)),
            73: lambda v: valign.__setitem__(0, _atoi(v)),
            1: lambda v: text.__setitem__(0, text_unescape(v, False)),
            11: lambda v: None, 21: lambda v: None, 31: lambda v: None,
            7: lambda v: None})
        f.fields["Text"] = text[0]
        f.geom = Geom("POINT", tuple(p), have_z[0])
        self._apply_ocs(f, f.geom)
        anchor = 1 + min(max(halign[0], 0), 2) + \
            {0: 0, 1: 0, 2: 3, 3: 6}.get(valign[0], 0)
        self._label_style(f, text[0], angle[0], height[0], anchor)
        return f

    def _t_attrib(self, rd, pending):
        f = self._t_text(rd, pending)
        return f

    def _t_attdef(self, rd, pending):
        self._t_text(rd, pending)
        return None

    def _t_insert(self, rd, pending):
        f = DXFFeature()
        name = [""]
        xyz = [0.0, 0.0, 0.0]
        scale = [1.0, 1.0, 1.0]
        angle = [0.0]
        has_attribs = [False]

        self._read_entity(rd, f, {
            2: lambda v: name.__setitem__(0, v),
            10: lambda v: xyz.__setitem__(0, _atof(v)),
            20: lambda v: xyz.__setitem__(1, _atof(v)),
            30: lambda v: xyz.__setitem__(2, _atof(v)),
            41: lambda v: scale.__setitem__(0, _atof(v)),
            42: lambda v: scale.__setitem__(1, _atof(v)),
            43: lambda v: scale.__setitem__(2, _atof(v)),
            50: lambda v: angle.__setitem__(0, _atof(v)),
            66: lambda v: has_attribs.__setitem__(0, v.strip() == "1")})
        if getattr(self, "_in_block", False):
            # defer: block bodies may reference not-yet-defined blocks
            f.block_name = name[0]
            f.block_xyz = tuple(xyz)
            f.block_scale = tuple(scale)
            f.block_angle = angle[0]
            return f
        attribs = []
        if has_attribs[0]:
            while True:
                pair = rd.read()
                if pair is None:
                    break
                code, val = pair
                if code == 0 and val == "ATTRIB":
                    af = self._t_text(rd, pending)
                    attribs.append(af)
                elif code == 0 and val == "SEQEND":
                    sf = DXFFeature()
                    self._read_entity(rd, sf, {})
                    break
                elif code == 0:
                    rd.unread(pair)
                    break
        try:
            merged, extras = self._insert_block(
                f, name[0], tuple(xyz), tuple(scale), angle[0])
        except KeyError:
            return None
        pending.extend(extras)
        pending.extend(attribs)
        return merged

    def _insert_block(self, feat, name, xyz, scale, angle_deg):
        """InsertBlockInline with geometry merging. Mutually/self-
        recursive block references stop expanding at re-entry (the
        reference survives insert-recursive-pair.dxf the same way —
        ogr_dxf.py test_ogr_dxf_43 expects one feature, not a hang)."""
        stack = getattr(self, "_insert_stack", None)
        if stack is None:
            stack = self._insert_stack = []
        if name in stack:
            return None, []
        stack.append(name)
        try:
            return self._insert_block_inner(feat, name, xyz, scale,
                                            angle_deg)
        finally:
            stack.pop()

    def _insert_block_inner(self, feat, name, xyz, scale, angle_deg):
        block = self.blocks[name]
        rot = math.radians(angle_deg)
        insertion = xyz
        if feat.ocs != (0.0, 0.0, 1.0):
            insertion = ocs_to_wcs(feat.ocs)(xyz)

        def rot_scale(p):
            x = p[0] * scale[0]
            y = p[1] * scale[1]
            z = p[2] * scale[2]
            return (x * math.cos(rot) - y * math.sin(rot),
                    x * math.sin(rot) + y * math.cos(rot), z)

        def offset(p):
            return (p[0] + insertion[0], p[1] + insertion[1],
                    p[2] + insertion[2])

        merged: list[Geom] = []
        extras: list[DXFFeature] = []
        for sub in block:
            sf = sub.clone()
            if sf.block_name is not None:
                inner_merged, inner_extras = self._insert_block(
                    sf, sf.block_name, sf.block_xyz, sf.block_scale,
                    sf.block_angle)
                cand = ([inner_merged] if inner_merged else []) + \
                    inner_extras
            else:
                cand = [sf]
            for c in cand:
                if c.geom is not None:
                    c.geom.transform(rot_scale)
                    if feat.ocs != (0.0, 0.0, 1.0):
                        c.geom.transform(ocs_to_wcs(feat.ocs))
                    c.geom.transform(offset)
                if not c.is_label and c.geom is not None and \
                        not isinstance(c.geom, DXFFeature):
                    if c.geom.kind == "GEOMETRYCOLLECTION":
                        merged.extend(c.geom.coords)
                    else:
                        merged.append(c.geom)
                else:
                    if c.fields["Layer"] == "0" and \
                            feat.fields["Layer"]:
                        c.fields["Layer"] = feat.fields["Layer"]
                    if feat.fields["EntityHandle"]:
                        c.fields["EntityHandle"] = \
                            feat.fields["EntityHandle"]
                    extras.append(c)
        if not merged:
            return None, extras
        kinds = {g.kind for g in merged}
        has_z = any(g.has_z for g in merged)
        for g in merged:
            g.has_z = has_z
        if kinds == {"LINESTRING"}:
            feat.geom = Geom("MULTILINESTRING", merged, has_z)
        elif kinds == {"POLYGON"}:
            feat.geom = Geom("MULTIPOLYGON", merged, has_z)
        elif kinds == {"POINT"} and len(merged) == 1:
            feat.geom = merged[0]
        else:
            feat.geom = Geom("GEOMETRYCOLLECTION", merged, has_z)
        self._pen_style(feat)
        return feat, extras

    def _t_dimension(self, rd, pending):
        f = DXFFeature()
        arrow1 = [0.0, 0.0]
        textp = [0.0, 0.0]
        target1 = [0.0, 0.0]
        target2 = [0.0, 0.0]
        block = [None]
        text = [""]
        props = dict(self._DIM_DEFAULTS)

        def use_style(v):
            props.update(self.dimstyles.get(v, {}))

        self._read_entity(rd, f, {
            2: lambda v: block.__setitem__(0, v),
            3: use_style,
            10: lambda v: arrow1.__setitem__(0, _atof(v)),
            20: lambda v: arrow1.__setitem__(1, _atof(v)),
            30: lambda v: None,
            11: lambda v: textp.__setitem__(0, _atof(v)),
            21: lambda v: textp.__setitem__(1, _atof(v)),
            31: lambda v: None,
            13: lambda v: target2.__setitem__(0, _atof(v)),
            23: lambda v: target2.__setitem__(1, _atof(v)),
            33: lambda v: None,
            14: lambda v: target1.__setitem__(0, _atof(v)),
            24: lambda v: target1.__setitem__(1, _atof(v)),
            34: lambda v: None,
            70: lambda v: None,
            1: lambda v: text.__setitem__(0, v)})
        if block[0] and block[0] in self.blocks:
            merged, extras = self._insert_block(
                f, block[0], (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 0.0)
            pending.extend(extras)
            return merged

        scale = float(props["DIMSCALE"])
        asz = float(props["DIMASZ"])
        exe = float(props["DIMEXE"])
        exo = float(props["DIMEXO"])
        txt_h = float(props["DIMTXT"])
        prec = int(props["DIMDEC"])
        centered = int(props["DIMTAD"]) == 0

        ax1, ay1 = arrow1
        tx1, ty1 = target1
        tx2, ty2 = target2
        v1x, v1y = ax1 - tx1, ay1 - ty1
        v1l = math.hypot(v1x, v1y)
        if v1l > 0:
            v1x, v1y = v1x / v1l, v1y / v1l
        v2x, v2y = v1y, -v1x
        if v1x == 0.0 and v1y == 0.0:
            ax2, ay2 = tx2, ty2
        elif v1x == 0.0:
            ax2, ay2 = tx2, ay1
        elif v1y == 0.0:
            ax2, ay2 = ax1, ty2
        else:
            l1m = v1y / v1x
            l1b = ty2 - l1m * tx2
            l2m = v2y / v2x
            l2b = ay1 - l2m * ax1
            ax2 = (l2b - l1b) / (l1m - l2m)
            ay2 = l2m * ax2 + l2b

        lines = [[(ax1, ay1, 0.0), (ax2, ay2, 0.0)]]
        # arrowheads (pending polygon features)
        main = [(ax1, ay1), (ax2, ay2)]
        for rev in (False, True):
            p1 = main[1] if rev else main[0]
            p2 = main[0] if rev else main[1]
            seg = math.hypot(p2[0] - p1[0], p2[1] - p1[1])
            size = asz * scale
            if size == 0.0 or seg == 0.0 or size > 0.5 * seg:
                continue
            k = size / seg
            parx = k * (p2[0] - p1[0])
            pary = k * (p2[1] - p1[1])
            perx, pery = pary, -parx
            af = f.clone()
            ring = [(p1[0] + parx + perx / 6, p1[1] + pary + pery / 6,
                     0.0),
                    (p1[0], p1[1], 0.0),
                    (p1[0] + parx - perx / 6, p1[1] + pary - pery / 6,
                     0.0)]
            ring.append(ring[0])
            af.geom = Geom("POLYGON", [ring], True)
            self._brush_style(af)
            pending.append(af)
        e1 = [(tx1 + v1x * exo, ty1 + v1y * exo, 0.0),
              (ax1 + v1x * exe, ay1 + v1y * exe, 0.0)]
        if int(props["DIMSE1"]) == 0 and e1[0][:2] != e1[1][:2]:
            lines.append(e1)
        e2 = [(tx2 + v1x * exo, ty2 + v1y * exo, 0.0),
              (ax2 + v1x * exe, ay2 + v1y * exe, 0.0)]
        if int(props["DIMSE2"]) == 0 and e2[0][:2] != e2[1][:2]:
            lines.append(e2)
        f.geom = Geom("MULTILINESTRING",
                      [Geom("LINESTRING", ln, False) for ln in lines],
                      False)
        self._pen_style(f)

        if text[0] == " ":
            return f
        lf = f.clone()
        lf.geom = Geom("POINT", (textp[0], textp[1], 0.0), False)
        osr = text[0] or "<>"
        if "<>" in osr:
            dim = math.hypot(ax2 - ax1, ay2 - ay1)
            osr = osr.replace("<>", "%.*f" % (max(0, min(20, prec)),
                                              dim))
        osr = text_unescape(osr, True)
        lf.fields["Text"] = osr
        esc = osr.replace("\\", "\\\\").replace('"', '\\"')
        style = f'LABEL(f:"Arial",t:"{esc}"'
        style += ",p:11" if centered else ",p:5"
        if ax1 == ax2:
            tang = -90.0
        else:
            tang = math.degrees(math.atan((ay1 - ay2) / (ax1 - ax2)))
        if tang != 0.0:
            style += ",a:%s" % _fmt3g(tang)
        if txt_h != 0.0:
            style += ",s:%sg" % _fmt3g(txt_h * scale)
        clrt = int(props["DIMCLRT"]) or None
        if clrt:
            lf.color = clrt
        style += ",c:%s" % self.pen_color(lf)
        style += ")"
        lf.style = style
        lf.is_label = True
        pending.append(lf)
        return f

    def _t_hatch(self, rd, pending):
        # boundary path polygons: straight polyline paths only
        f = DXFFeature()
        rings: list[list[tuple]] = []
        cur: list[tuple] = []
        state = {"in_path": False}

        while True:
            pair = rd.read()
            if pair is None:
                break
            code, val = pair
            if code == 0:
                rd.unread(pair)
                break
            if code == 92:
                if cur:
                    rings.append(cur)
                cur = []
                state["in_path"] = True
            elif code == 10 and state["in_path"]:
                cur.append((float(val), 0.0, 0.0))
            elif code == 20 and state["in_path"] and cur:
                cur[-1] = (cur[-1][0], float(val), 0.0)
            elif code == 75:
                state["in_path"] = False
            else:
                self._generic(f, code, val)
        if cur:
            rings.append(cur)
        rings = [r + [r[0]] for r in rings if len(r) >= 3]
        if not rings:
            return None
        f.geom = Geom("POLYGON", rings, False)
        self._apply_ocs(f, f.geom)
        self._brush_style(f)
        return f


# block-reference placeholders stored inside BLOCKS: an INSERT inside a
# block body records its parameters for recursive expansion
_ENTITY_SET = {
    "POINT", "LINE", "LWPOLYLINE", "POLYLINE", "CIRCLE", "ARC", "ELLIPSE",
    "SPLINE", "3DFACE", "SOLID", "TRACE", "TEXT", "MTEXT", "INSERT",
    "DIMENSION", "HATCH", "ATTRIB", "ATTDEF",
}


def _fmt3g(v: float) -> str:
    return "%.3g" % v


def _sample_bspline(ctl, degree, per_span: int = 8):
    """Clamped uniform B-spline sampling (intronurbs-style density)."""
    n = len(ctl)
    p = min(degree, n - 1)
    knots = [0.0] * (p + 1) + \
        [i / (n - p) for i in range(1, n - p)] + [1.0] * (p + 1)

    def de_boor(u):
        # find span
        k = p
        while k < n - 1 and not (knots[k] <= u < knots[k + 1]):
            k += 1
        d = [list(ctl[j]) for j in range(k - p, k + 1)]
        for r in range(1, p + 1):
            for j in range(p, r - 1, -1):
                i = k - p + j
                den = knots[i + p - r + 1] - knots[i]
                alpha = 0.0 if den == 0 else (u - knots[i]) / den
                for c in range(3):
                    d[j][c] = (1 - alpha) * d[j - 1][c] + alpha * d[j][c]
        return tuple(d[p])

    total = max(2, (n - p) * per_span + 1)
    pts = [de_boor(min(i / (total - 1), 1.0 - 1e-12))
           for i in range(total)]
    pts[0] = tuple(ctl[0])
    pts[-1] = tuple(ctl[-1])
    return pts


def _block_aware_reader(text: str) -> DXFReader:
    return DXFReader(text)


def read_dxf(path: str):
    """-> list of feature dicts: {fields..., 'wkt', 'style'} in file
    order (the reference's 'entities' layer)."""
    with open(path, "rb") as fh:
        text = fh.read().decode("latin-1")
    rdr = DXFReader(text)
    out = []
    for fid, f in enumerate(rdr.features):
        rec = dict(f.fields)
        rec["fid"] = fid
        rec["wkt"] = f.geom.wkt() if f.geom else None
        rec["style"] = f.style
        out.append(rec)
    return out
