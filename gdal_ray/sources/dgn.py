"""MicroStation DGN v7 vector driver (reference
ogr/ogrsf_frmts/dgn: dgnread.cpp / dgnstroke.cpp / ogrdgnlayer.cpp).

A DGN file is a stream of word-counted elements: header word 0 holds
level (6 bits) + complex flag, word 1 the type (7 bits) + deleted
flag, word 2 the words-to-follow (element length = words*2+4).
32-bit coordinates are PDP-style word-swapped little-endian UORs
(DGN_INT32, dgnlibp.h:70); 8-byte reals are VAX D doubles
(CPLVaxToIEEEDouble).  The TCB element (type 9) sets the transform:
``master = uor * scale - origin`` with
``scale = 1/(uor_per_subunit * subunits_per_master)``
(DGNParseTCB, dgnread.cpp:1488-1550).

Elements translated (matching OGR's layer semantics):

- LINE(3)/LINE_STRING(4)/SHAPE(6)/CURVE(11): vertex lists (2-D:
  8-byte xy int pairs at offset 38 after a count at 36; LINE carries
  two vertices at 36);
- ELLIPSE(15)/ARC(16): VAX-double axes (scaled), rotation in
  1/360000 deg, VAX-double origin; stroked like DGNStrokeArc with
  ``n = min(90, |sweep|/5 + 1)`` parametric points;
- TEXT(17): font/justification, length/height multipliers
  (int * scale * 6/1000), rotation, origin, ASCII text; rendered as
  POINT with the reference's LABEL style string (font list
  ogrdgnlayer.cpp:658, color table element GROUP_DATA level 1 with
  entry 255 stored first).

Features carry Type/Level/GraphicGroup/ColorIndex/Weight/Style/Text
columns plus wkt + style."""

from __future__ import annotations

import math
import struct

import numpy as np
import pyarrow as pa

from .vicar import vax_to_float64

FONTS = ["STANDARD", "WORKING", "FANCY", "ENGINEERING", "NEWZERO",
         "STENCEL", "USTN_FANCY", "COMPRESSED", "STENCEQ", None, "hand",
         "ARCH", "ARCHB", None, None, "IGES1001", "IGES1002", "IGES1003",
         "CENTB", "MICROS", None, None, "ISOFRACTIONS", "ITALICS",
         "ISO30", None, "GREEK", "ISOREC", "Isoeq", None, "ISO_FONTLEFT",
         "ISO_FONTRIGHT", "INTL_ENGINEERING", "INTL_WORKING",
         "ISOITEQ", None, "USTN FONT 26", None, None, None, "ANSI_SYMBOLS",
         "FEATURE_CONTROL_SYSMBOLS", "SYMB_FAST", None, None,
         "INTL_ISO", "INTL_ISO_EQUAL", "INTL_ISO_ITALIC",
         "INTL_ISO_ITALIC_EQUAL"]


# head of the reference's default palette (dgnhelp.cpp abyDefaultPCT;
# files with their own color-table element override this)
_DEFAULT_PCT = {0: (255, 255, 255), 1: (0, 0, 255), 2: (0, 255, 0),
                3: (255, 0, 0), 4: (255, 255, 0), 5: (255, 0, 255),
                6: (255, 127, 0), 7: (0, 255, 255), 8: (64, 64, 64),
                9: (192, 192, 192), 10: (254, 0, 96), 11: (160, 224, 0),
                12: (0, 254, 160), 13: (128, 0, 160), 14: (176, 176, 176),
                15: (0, 240, 240)}


def _i32(buf: bytes, off: int) -> int:
    v = (buf[off + 2] | (buf[off + 3] << 8)
         | (buf[off + 1] << 24) | (buf[off] << 16))
    return v - 0x100000000 if v >= 0x80000000 else v


def _vax_d(buf: bytes, off: int) -> float:
    words = np.frombuffer(buf[off:off + 8], "<u2")
    return float(vax_to_float64(words)[0])


def read_dgn(path: str) -> pa.Table:
    with open(path, "rb") as f:
        data = f.read()

    scale = 1.0
    ox = oy = 0.0
    dimension = 2
    color_table: list[tuple[int, int, int]] | None = None
    rows = []

    def tp(x, y):
        return (x * scale - ox, y * scale - oy)

    pos = 0
    while pos + 4 <= len(data):
        w0 = data[pos] | (data[pos + 1] << 8)
        if w0 == 0xFFFF:
            break
        level = data[pos] & 0x3F
        complex_f = bool(data[pos] & 0x80)
        etype = data[pos + 1] & 0x7F
        deleted = bool(data[pos + 1] & 0x80)
        nwords = data[pos + 2] | (data[pos + 3] << 8)
        el = data[pos:pos + nwords * 2 + 4]
        pos += nwords * 2 + 4
        if deleted or len(el) < 36:
            if etype == 9 and len(el) >= 1264:
                pass
            else:
                continue

        core = {}
        if len(el) >= 36:
            core = {"GraphicGroup": el[28] + el[29] * 256,
                    "Style": el[34] & 0x7,
                    "Weight": (el[34] & 0xF8) >> 3,
                    "ColorIndex": el[35]}

        if etype == 9:  # TCB
            if len(el) >= 1264:
                dimension = 3 if el[1214] & 0x40 else 2
                sub_per_master = _i32(el, 1112)
                uor_per_sub = _i32(el, 1116)
                gx = _vax_d(el, 1240)
                gy = _vax_d(el, 1248)
                if uor_per_sub and sub_per_master:
                    denom = uor_per_sub * sub_per_master
                    scale = 1.0 / denom
                    ox, oy = gx / denom, gy / denom
            continue
        if etype == 5 and level == 1:  # color table
            ct = [(255, 255, 255)] * 256
            if len(el) >= 38 + 3 + 255 * 3:
                ct[255] = tuple(el[38:41])
                for i in range(255):
                    o = 41 + i * 3
                    ct[i] = tuple(el[o:o + 3])
            color_table = ct
            continue

        row = {"Type": etype, "Level": level, **core}
        wkt = None
        style = None
        pdim = dimension

        if etype == 3 and len(el) >= 36 + 8 * pdim // 2:
            if pdim == 2:
                pts = [tp(_i32(el, 36), _i32(el, 40)),
                       tp(_i32(el, 44), _i32(el, 48))]
            else:
                pts = [tp(_i32(el, 36), _i32(el, 40)),
                       tp(_i32(el, 48), _i32(el, 52))]
            wkt = "LINESTRING (%s)" % ",".join("%.8g %.8g" % p for p in pts)
        elif etype in (4, 6, 11):
            count = el[36] + el[37] * 256
            psize = 4 * pdim
            count = min(count, (len(el) - 38) // psize)
            pts = []
            for i in range(count):
                o = 38 + i * psize
                pts.append(tp(_i32(el, o), _i32(el, o + 4)))
            if etype == 6 and len(pts) >= 3:
                wkt = "POLYGON ((%s))" % ",".join(
                    "%.8g %.8g" % p for p in pts)
            elif len(pts) >= 2:
                wkt = "LINESTRING (%s)" % ",".join(
                    "%.8g %.8g" % p for p in pts)
        elif etype in (15, 16):
            if etype == 15:
                primary = _vax_d(el, 36) * scale
                secondary = _vax_d(el, 44) * scale
                if pdim == 2:
                    rotation = _i32(el, 52) / 360000.0
                    cx = _vax_d(el, 56)
                    cy = _vax_d(el, 64)
                else:
                    rotation = 0.0
                    cx = _vax_d(el, 68)
                    cy = _vax_d(el, 76)
                startang, sweepang = 0.0, 360.0
            else:
                startang = _i32(el, 36) / 360000.0
                raw41 = el[41]
                elb = bytearray(el)
                neg = bool(raw41 & 0x80)
                elb[41] = raw41 & 0x7F
                sweep = _i32(bytes(elb), 40)
                if neg:
                    sweep = -sweep
                sweepang = 360.0 if sweep == 0 else sweep / 360000.0
                primary = _vax_d(el, 44) * scale
                secondary = _vax_d(el, 52) * scale
                if pdim == 2:
                    rotation = _i32(el, 60) / 360000.0
                    cx = _vax_d(el, 64)
                    cy = _vax_d(el, 72)
                else:
                    rotation = 0.0
                    cx = _vax_d(el, 76)
                    cy = _vax_d(el, 84)
            cx, cy = tp(cx, cy)
            n = int(max(1.0, abs(sweepang) / 5.0) + 1.0)
            n = min(n, 90)
            rot = math.radians(rotation)
            pts = []
            step = sweepang / (n - 1) if n > 1 else 0.0
            for i in range(n):
                ang = math.radians(startang + step * i)
                ex = primary * math.cos(ang)
                ey = secondary * math.sin(ang)
                pts.append((cx + ex * math.cos(rot) - ey * math.sin(rot),
                            cy + ex * math.sin(rot) + ey * math.cos(rot)))
            wkt = "LINESTRING (%s)" % ",".join("%.8g %.8g" % p for p in pts)
        elif etype == 17:
            num_chars = el[58] if pdim == 2 else el[74]
            font_id = el[36]
            height_mult = _i32(el, 42) * scale * 6.0 / 1000.0
            if pdim == 2:
                x, y = tp(_i32(el, 50), _i32(el, 54))
                text_off = 60
            else:
                x, y = tp(_i32(el, 62), _i32(el, 66))
                text_off = 76
            text = el[text_off:text_off + num_chars].decode(
                "latin-1").rstrip("\x00")
            row["Text"] = text
            wkt = "POINT (%.8g %.8g)" % (x, y)
            color = core.get("ColorIndex", 0)
            if color_table is not None and color < len(color_table):
                r, g, b = color_table[color]
            else:
                r, g, b = _DEFAULT_PCT.get(color, (255, 255, 255))
            cstr = ",c:#%02x%02x%02x" % (r, g, b)
            if abs(height_mult) >= 6.0:
                sstr = ",s:%dg" % int(height_mult)
            elif abs(height_mult) > 0.1:
                sstr = ",s:%.3fg" % height_mult
            else:
                sstr = ",s:%.12fg" % height_mult
            fname = (FONTS[font_id] if font_id < len(FONTS)
                     and FONTS[font_id] else "MstnFont%d" % font_id)
            style = 'LABEL(t:"%s"%s%s,f:%s)' % (text, cstr, sstr, fname)
        else:
            continue

        row["wkt"] = wkt
        row["style"] = style
        rows.append(row)

    cols = ["Type", "Level", "GraphicGroup", "ColorIndex", "Weight",
            "Style", "Text", "wkt", "style"]
    arrays = []
    for c in cols:
        vals = [r.get(c) for r in rows]
        if c in ("Text", "wkt", "style"):
            arrays.append(pa.array(
                [None if v is None else str(v) for v in vals], pa.string()))
        else:
            arrays.append(pa.array(vals, pa.int32()))
    return pa.table(arrays, names=cols)
