"""GRIB edition-2 reader (the reference's frmts/grib driver surface).

Semantics transcribed from the public degrib/g2clib sources that the
reference vendors:

- section walk + template value extraction driven by the g2clib octet
  maps (gridtemplates.c / drstemplates.c: entry widths, negative =
  sign-magnitude);
- data representation templates 5.0 (simple packing), 5.2 (complex),
  5.3 (complex + spatial differencing, comunpack.c: group refs/widths/
  lengths each byte-padded, order-1/2 reconstruction, missing-value
  management 1/2), 5.4 (IEEE float), 5.41 (PNG payload through the
  engine's own PNG codec), and the nbits==0 constant-field case of
  5.40 (JPEG2000 otherwise unsupported -- no codec in this
  environment);
- bitmap section 6 (indicator 0 apply / 254 reuse previous) with
  degrib's UNDEFINED value 9999 for masked cells;
- grid definition templates 3.0/3.1 (lat/lon incl. basic-angle units),
  3.10 Mercator, 3.12 Transverse Mercator (projected corner coords in
  the template), 3.20 Polar Stereographic, 3.30/3.31 LCC/Albers,
  3.140 LAEA (metaparse.cpp octet semantics, mm->m / 1e-6 deg units,
  earth shapes 0-7);
- the geotransform algorithm of gribdataset.cpp:2629-2860 (project
  first grid point, scan-mode-0100 southern-most rule + the buggy-grid
  heuristic, lat/lon Dx refinement from lon2-lon1, 0-360 longitude
  shift, half-pixel shift at the end);
- GRIB_NORMALIZE_UNITS=YES value normalization: parameters whose
  degrib table entry carries UC_K2F convert K -> C (metaname.cpp
  ComputeUnit, f_unit=2), matching the reference's band checksums.

Projection math reuses the engine's crs kernels (functions/crs.py,
crs_registry.py) parameterized with the GRIB earth shape.
"""
from __future__ import annotations

import math
import os
import struct

import numpy as np

from ..functions.crs import (
    AlbersEqualArea, LambertConformalConic2SP, PolarStereographic,
    _ellipsoid, _iso_t,
)

MISSING_S4 = -2147483647 - 1  # g2clib GRIB2MISSING_s4 sentinel pattern
UNDEFINED = 9999.0  # degrib UNDEFINED for bitmap/missing cells


# ------------------------------------------------------------ bit utils
def _bits_to_uints(bitarr: np.ndarray, start: int, width: int,
                   count: int) -> np.ndarray:
    """Vectorized read of `count` unsigned ints of `width` bits from a
    0/1 uint8 array starting at bit offset `start`."""
    if width == 0 or count == 0:
        return np.zeros(count, np.int64)
    sel = bitarr[start:start + width * count]
    sel = sel.reshape(count, width).astype(np.int64)
    weights = (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
    return sel @ weights


def _read_sm(data: bytes, pos: int, n: int) -> int:
    """Sign-magnitude int of n bytes (leftmost bit = sign)."""
    v = int.from_bytes(data[pos:pos + n], "big")
    sign_bit = 1 << (8 * n - 1)
    if v & sign_bit:
        return -(v & (sign_bit - 1))
    return v


# g2clib template maps: octet widths; negative = sign-magnitude
_GRID_MAPS = {
    0: [1, 1, 4, 1, 4, 1, 4, 4, 4, 4, 4, -4, -4, 1, -4, -4, 4, 4, 1],
    1: [1, 1, 4, 1, 4, 1, 4, 4, 4, 4, 4, -4, -4, 1, -4, -4, 4, 4, 1,
        -4, 4, 4],
    10: [1, 1, 4, 1, 4, 1, 4, 4, 4, -4, -4, 1, -4, -4, -4, 1, 4, 4, 4],
    12: [1, 1, 4, 1, 4, 1, 4, 4, 4, -4, 4, 1, -4, -4, -4, 1, 4, 4, -4,
         -4, -4, -4],
    20: [1, 1, 4, 1, 4, 1, 4, 4, 4, -4, -4, 1, -4, -4, -4, 4, 1, 1],
    30: [1, 1, 4, 1, 4, 1, 4, 4, 4, -4, 4, 1, -4, 4, 4, 4, 1, 1, -4,
         -4, -4, 4],
    31: [1, 1, 4, 1, 4, 1, 4, 4, 4, -4, 4, 1, -4, 4, 4, 4, 1, 1, -4,
         -4, -4, 4],
    40: [1, 1, 4, 1, 4, 1, 4, 4, 4, 4, 4, -4, 4, 1, -4, 4, 4, 4, 1],
    140: [1, 1, 4, 1, 4, 1, 4, 4, 4, -4, -4, -4, -4, 1, 4, 4, 1],
}

_DRS_MAPS = {
    0: [4, -2, -2, 1, 1],
    2: [4, -2, -2, 1, 1, 1, 1, 4, 4, 4, 1, 1, 4, 1, 4, 1],
    3: [4, -2, -2, 1, 1, 1, 1, 4, 4, 4, 1, 1, 4, 1, 4, 1, 1, 1],
    4: [1],
    40: [4, -2, -2, 1, 1, 1, 1],
    41: [4, -2, -2, 1, 1],
    42: [4, -2, -2, 1, 1, 1, 1],
}


def _unpack_template(data: bytes, pos: int, omap: list[int]) -> list[int]:
    vals = []
    for w in omap:
        n = abs(w)
        if w < 0:
            vals.append(_read_sm(data, pos, n))
        else:
            vals.append(int.from_bytes(data[pos:pos + n], "big"))
        pos += n
    return vals


# -------------------------------------------------------- earth shapes
def _earth(tv: list[int]) -> tuple[float, float]:
    """Template values 0..6 -> (a, f) in meters (metaparse.cpp earth
    shape switch; km-vs-m plausibility fixups included)."""
    shape = tv[0]
    if shape == 0:
        return 6367470.0, 0.0
    if shape == 1:
        r = tv[2] / (10.0 ** tv[1]) if tv[2] else 6371229.0
        if r < 6400:  # value was km
            r *= 1000.0
        return r, 0.0
    if shape == 2:
        a, b = 6378160.0, 6356775.0
        return a, (a - b) / a
    if shape == 3 or shape == 7:
        scale = 1000.0 if shape == 3 else 1.0
        a = tv[4] / (10.0 ** tv[3]) * scale
        b = tv[6] / (10.0 ** tv[5]) * scale
        if shape == 3:
            if a > 6400000:
                a /= 1000.0
            if b > 6400000:
                b /= 1000.0
        return a, (a - b) / a
    if shape == 4:
        return 6378137.0, 1.0 / 298.257222101
    if shape == 5:
        return 6378137.0, 1.0 / 298.257223563
    if shape == 6:
        return 6371229.0, 0.0
    return 6367470.0, 0.0


def _lon360to180(lon: float) -> float:
    return lon - 360.0 if lon > 180.0 else lon


# ------------------------------------------------------------ sections
class _Msg:
    __slots__ = ("discipline", "sec1", "gds_tmpl", "gds_vals", "ndpts",
                 "pdtn", "pds_vals", "drtn", "drs_vals", "bitmap",
                 "data7", "nx_total")


def _walk_messages(data: bytes):
    """Yield _Msg per GRIB2 field (a message may hold several fields
    via repeated sections 4-7; bitmap 254 reuses the previous)."""
    pos = 0
    while True:
        i = data.find(b"GRIB", pos)
        if i < 0 or i + 16 > len(data):
            return
        edition = data[i + 7]
        if edition != 2:
            if edition == 1:
                tlen = int.from_bytes(data[i + 4:i + 7], "big")
                pos = i + max(tlen, 8)
            else:
                pos = i + 4
            continue
        discipline = data[i + 6]
        tlen = int.from_bytes(data[i + 8:i + 16], "big")
        end = min(i + tlen, len(data))
        p = i + 16
        sec1 = gds_tmpl = gds_vals = None
        pdtn = pds_vals = drtn = drs_vals = None
        ndpts = 0
        bitmap = None
        prev_bitmap = None
        yielded_for_gds = False
        truncated = False
        while p + 5 <= end:
            if data[p:p + 4] == b"7777":
                break
            slen = int.from_bytes(data[p:p + 4], "big")
            if slen < 5 or p + slen > end + 4:
                truncated = True
                break
            snum = data[p + 4]
            body = p + 5
            if snum == 1:
                sec1 = data[p:p + slen]
            elif snum == 3:
                gds_tmpl = int.from_bytes(data[p + 12:p + 14], "big")
                omap = _GRID_MAPS.get(gds_tmpl)
                gds_vals = (_unpack_template(data, p + 14, omap)
                            if omap else None)
            elif snum == 4:
                pdtn = int.from_bytes(data[p + 7:p + 9], "big")
                pds_vals = data[p + 9:p + slen]
            elif snum == 5:
                ndpts = int.from_bytes(data[p + 5:p + 9], "big")
                drtn = int.from_bytes(data[p + 9:p + 11], "big")
                omap = _DRS_MAPS.get(drtn)
                drs_vals = (_unpack_template(data, p + 11, omap)
                            if omap else None)
            elif snum == 6:
                ind = data[p + 5]
                if ind == 0:
                    bits = np.unpackbits(
                        np.frombuffer(data[p + 6:p + slen], np.uint8))
                    bitmap = bits
                    prev_bitmap = bits
                elif ind == 254:
                    bitmap = prev_bitmap
                else:
                    bitmap = None
            elif snum == 7:
                m = _Msg()
                m.discipline = discipline
                m.sec1 = sec1
                m.gds_tmpl = gds_tmpl
                m.gds_vals = gds_vals
                m.ndpts = ndpts
                m.pdtn = pdtn
                m.pds_vals = pds_vals
                m.drtn = drtn
                m.drs_vals = drs_vals
                m.bitmap = bitmap
                m.data7 = data[p + 5:p + slen]
                yield m
                yielded_for_gds = True
            p += slen
        if truncated and gds_vals is not None and not yielded_for_gds:
            # .begin/.head style truncation: georef is still readable
            m = _Msg()
            m.discipline = discipline
            m.sec1 = sec1
            m.gds_tmpl = gds_tmpl
            m.gds_vals = gds_vals
            m.ndpts = ndpts
            m.pdtn = pdtn
            m.pds_vals = pds_vals
            m.drtn = drtn
            m.drs_vals = drs_vals
            m.bitmap = None
            m.data7 = None
            yield m
        pos = end if tlen > 16 else i + 4


# ----------------------------------------------------------- unpackers
def _ieee_ref(raw: int) -> float:
    return struct.unpack(">f", struct.pack(">I", raw & 0xFFFFFFFF))[0]


def _unpack_simple(m: _Msg) -> np.ndarray:
    R = _ieee_ref(m.drs_vals[0])
    E, D, nbits = m.drs_vals[1], m.drs_vals[2], m.drs_vals[3]
    bscale, dscale = 2.0 ** E, 10.0 ** (-D)
    if nbits == 0:
        return np.full(m.ndpts, R * dscale, np.float64)
    bits = np.unpackbits(np.frombuffer(m.data7, np.uint8))
    x = _bits_to_uints(bits, 0, nbits, m.ndpts)
    return (x * bscale + R) * dscale


def _unpack_ieee(m: _Msg) -> np.ndarray:
    prec = m.drs_vals[0]
    dt = {1: ">f4", 2: ">f8"}.get(prec)
    if dt is None:
        raise ValueError(f"IEEE precision {prec} unsupported")
    return np.frombuffer(m.data7, dt, count=m.ndpts).astype(np.float64)


def _unpack_png(m: _Msg) -> np.ndarray:
    from ..functions.png import decode_png

    R = _ieee_ref(m.drs_vals[0])
    E, D, nbits = m.drs_vals[1], m.drs_vals[2], m.drs_vals[3]
    bscale, dscale = 2.0 ** E, 10.0 ** (-D)
    if nbits == 0:
        return np.full(m.ndpts, R * dscale, np.float64)
    img = decode_png(bytes(m.data7))
    arr = np.asarray(img)
    if arr.ndim == 3:  # multi-channel encodings pack high..low bytes
        weights = (256 ** np.arange(arr.shape[2] - 1, -1, -1)
                   .astype(np.int64))
        arr = (arr.astype(np.int64) * weights).sum(axis=2)
    x = arr.astype(np.float64).ravel()[:m.ndpts]
    return (x * bscale + R) * dscale


def _unpack_complex(m: _Msg) -> np.ndarray:
    """comunpack.c transcription (templates 5.2/5.3)."""
    tv = m.drs_vals
    R = _ieee_ref(tv[0])
    E, D = tv[1], tv[2]
    nbitsgref, itype = tv[3], tv[4]
    miss_mgmt = tv[6]
    ngroups = tv[9]
    gwidth_ref, nbitsgwidth = tv[10], tv[11]
    glen_ref, len_incr, last_len, nbitsglen = tv[12], tv[13], tv[14], \
        tv[15]
    bscale, dscale = 2.0 ** E, 10.0 ** (-D)
    ndpts = m.ndpts

    rmiss1 = rmiss2 = None
    if miss_mgmt >= 1:
        rmiss1 = _ieee_ref(tv[7]) if itype == 0 else float(tv[7])
    if miss_mgmt == 2:
        rmiss2 = _ieee_ref(tv[8]) if itype == 0 else float(tv[8])

    bits = np.unpackbits(np.frombuffer(m.data7, np.uint8))
    iofst = 0
    ival1 = ival2 = minsd = 0
    sd_order = 0
    if m.drtn == 3:
        sd_order = tv[16]
        nbitsd = tv[17] * 8
        if nbitsd:
            ival1 = int(_bits_to_uints(bits, iofst, nbitsd, 1)[0])
            iofst += nbitsd
            if sd_order == 2:
                ival2 = int(_bits_to_uints(bits, iofst, nbitsd, 1)[0])
                iofst += nbitsd
            isign = bits[iofst]
            iofst += 1
            minsd = int(_bits_to_uints(bits, iofst, nbitsd - 1, 1)[0])
            iofst += nbitsd - 1
            if isign:
                minsd = -minsd

    gref = np.zeros(ngroups, np.int64)
    if nbitsgref:
        gref = _bits_to_uints(bits, iofst, nbitsgref, ngroups)
        t = nbitsgref * ngroups
        iofst += t + ((8 - t % 8) % 8)
    gwidth = np.zeros(ngroups, np.int64)
    if nbitsgwidth:
        gwidth = _bits_to_uints(bits, iofst, nbitsgwidth, ngroups)
        t = nbitsgwidth * ngroups
        iofst += t + ((8 - t % 8) % 8)
    gwidth = gwidth + gwidth_ref
    glen = np.zeros(ngroups, np.int64)
    if nbitsglen:
        glen = _bits_to_uints(bits, iofst, nbitsglen, ngroups)
        t = nbitsglen * ngroups
        iofst += t + ((8 - t % 8) % 8)
    glen = glen * len_incr + glen_ref
    glen[-1] = last_len

    ifld = np.empty(ndpts, np.int64)
    miss_flag = np.zeros(ndpts, np.int8) if miss_mgmt else None
    n = 0
    non = 0
    for j in range(ngroups):
        lj = int(glen[j])
        wj = int(gwidth[j])
        if miss_mgmt == 0:
            if wj:
                vals = _bits_to_uints(bits, iofst, wj, lj) + gref[j]
                iofst += wj * lj
            else:
                vals = np.full(lj, gref[j], np.int64)
            ifld[n:n + lj] = vals
            n += lj
        else:
            if wj:
                msng1 = (1 << wj) - 1
                msng2 = msng1 - 1
                vals = _bits_to_uints(bits, iofst, wj, lj)
                iofst += wj * lj
                is1 = vals == msng1
                is2 = (vals == msng2) if miss_mgmt == 2 else \
                    np.zeros(lj, bool)
                ok = ~(is1 | is2)
                miss_flag[n:n + lj][is1] = 1
                miss_flag[n:n + lj][is2] = 2
                kk = int(ok.sum())
                ifld[non:non + kk] = vals[ok] + gref[j]
                non += kk
            else:
                msng1 = (1 << nbitsgref) - 1
                msng2 = msng1 - 1
                if gref[j] == msng1:
                    miss_flag[n:n + lj] = 1
                elif miss_mgmt == 2 and gref[j] == msng2:
                    miss_flag[n:n + lj] = 2
                else:
                    ifld[non:non + lj] = gref[j]
                    non += lj
            n += lj

    nvals = ndpts if miss_mgmt == 0 else non
    if m.drtn == 3 and sd_order:
        if sd_order == 1:
            ifld[0] = ival1
            ifld[1:nvals] += minsd
            np.cumsum(ifld[:nvals], out=ifld[:nvals])
        else:
            # comunpack.c: ifld[n] = raw[n] + minsd + 2*ifld[n-1]
            # - ifld[n-2]; i.e. raw+minsd are second differences.
            # First differences f[1] = ival2-ival1,
            # f[n] = f[n-1] + (raw[n]+minsd); then integrate again.
            if nvals > 1:
                diffs = ifld[1:nvals].copy()
                diffs[0] = ival2 - ival1
                diffs[1:] += minsd
                np.cumsum(diffs, out=diffs)  # first differences
                ifld[0] = ival1
                ifld[1:nvals] = ival1 + np.cumsum(diffs)
            else:
                ifld[0] = ival1

    if miss_mgmt == 0:
        return (ifld.astype(np.float64) * bscale + R) * dscale
    out = np.empty(ndpts, np.float64)
    vals = (ifld[:nvals].astype(np.float64) * bscale + R) * dscale
    ok = miss_flag == 0
    out[ok] = vals
    out[miss_flag == 1] = rmiss1 if rmiss1 is not None else UNDEFINED
    if miss_mgmt == 2:
        out[miss_flag == 2] = rmiss2 if rmiss2 is not None else UNDEFINED
    return out


def _unpack_field(m: _Msg) -> np.ndarray:
    if m.drtn == 0:
        vals = _unpack_simple(m)
    elif m.drtn in (2, 3):
        vals = _unpack_complex(m)
    elif m.drtn == 4:
        vals = _unpack_ieee(m)
    elif m.drtn == 41:
        vals = _unpack_png(m)
    elif m.drtn in (40, 42):
        nbits = m.drs_vals[3]
        if nbits == 0 or len(m.data7) == 0:
            R = _ieee_ref(m.drs_vals[0])
            D = m.drs_vals[2]
            vals = np.full(m.ndpts, R * 10.0 ** (-D), np.float64)
        else:
            codec = "JPEG2000" if m.drtn == 40 else "CCSDS AEC"
            raise ValueError(
                f"GRIB2 DRS template 5.{m.drtn} ({codec}) needs a "
                f"codec unavailable in this environment")
    else:
        raise ValueError(f"GRIB2 DRS template 5.{m.drtn} unsupported")
    if m.bitmap is not None:
        full = np.full(len(m.bitmap), UNDEFINED, np.float64)
        idx = np.flatnonzero(m.bitmap[:len(full)])
        full[idx[:len(vals)]] = vals[:len(idx)]
        return full
    return vals


# ------------------------------------------------------------- georef
class _Gds:
    pass


def _parse_gds(m: _Msg) -> _Gds | None:
    tv = m.gds_vals
    if tv is None:
        return None
    g = _Gds()
    g.template = m.gds_tmpl
    g.a, g.f = _earth(tv)
    t = m.gds_tmpl
    unit = 1e-6
    if t in (0, 1, 40):
        angle, subdiv = tv[9], tv[10]
        if angle:
            unit = angle / float(subdiv)
        g.nx, g.ny = tv[7], tv[8]
        g.lat1, g.lon1 = tv[11] * unit, tv[12] * unit
        g.res = tv[13]
        g.lat2, g.lon2 = tv[14] * unit, tv[15] * unit
        g.dx = tv[16] * unit
        if t == 40:
            g.dy = 90.0 / tv[17] if tv[17] else g.dx
        else:
            g.dy = tv[17] * unit
        g.scan = tv[18]
        if t == 1:
            g.south_lat, g.south_lon = tv[19] * unit, tv[20] * unit
            g.rot_angle = tv[21] * unit
    elif t == 10:
        g.nx, g.ny = tv[7], tv[8]
        g.lat1, g.lon1 = tv[9] * unit, tv[10] * unit
        g.res = tv[11]
        g.mesh_lat = tv[12] * unit          # LaD
        g.lat2, g.lon2 = tv[13] * unit, tv[14] * unit
        g.scan = tv[15]
        g.orient_lon = tv[16] * unit
        g.dx, g.dy = tv[17] / 1000.0, tv[18] / 1000.0
    elif t == 12:
        g.nx, g.ny = tv[7], tv[8]
        g.lat0, g.lon0 = tv[9] * unit, tv[10] * unit
        g.res = tv[11]
        raw = tv[12]
        ntemp = (-raw) | 0x80000000 if raw < 0 else raw
        g.k0 = struct.unpack(">f", struct.pack(">I",
                                               ntemp & 0xFFFFFFFF))[0]
        g.x0, g.y0 = tv[13] / 100.0, tv[14] / 100.0
        g.scan = tv[15]
        g.dx, g.dy = tv[16] / 100.0, tv[17] / 100.0
        g.x1, g.y1 = tv[18] / 100.0, tv[19] / 100.0
        g.x2, g.y2 = tv[20] / 100.0, tv[21] / 100.0
    elif t == 20:
        g.nx, g.ny = tv[7], tv[8]
        g.lat1, g.lon1 = tv[9] * unit, tv[10] * unit
        g.res = tv[11]
        g.mesh_lat = tv[12] * unit          # LaD
        g.orient_lon = tv[13] * unit        # LoV
        g.dx, g.dy = tv[14] / 1000.0, tv[15] / 1000.0
        g.center = tv[16]
        g.scan = tv[17]
    elif t in (30, 31):
        g.nx, g.ny = tv[7], tv[8]
        g.lat1, g.lon1 = tv[9] * unit, tv[10] * unit
        g.res = tv[11]
        g.mesh_lat = tv[12] * unit          # LaD (lat of origin)
        g.orient_lon = tv[13] * unit        # LoV
        g.dx, g.dy = tv[14] / 1000.0, tv[15] / 1000.0
        g.center = tv[16]
        g.scan = tv[17]
        g.scale_lat1, g.scale_lat2 = tv[18] * unit, tv[19] * unit
    elif t == 140:
        g.nx, g.ny = tv[7], tv[8]
        g.lat1, g.lon1 = tv[9] * unit, tv[10] * unit
        g.mesh_lat = tv[11] * unit          # standard parallel
        g.orient_lon = tv[12] * unit        # central longitude
        g.res = tv[13]
        g.dx, g.dy = tv[14] / 1000.0, tv[15] / 1000.0
        g.scan = tv[16]
    else:
        return None
    # resolution flags: bit3 set/bit4 clear -> Dy=Dx and vice versa
    if t in (0, 1, 10, 40):
        res = getattr(g, "res", 0)
        if (res & 0x20) and not (res & 0x10):
            g.dy = g.dx
        elif not (res & 0x20) and (res & 0x10):
            g.dx = g.dy
    return g


def _mercator_proj(g: _Gds):
    a, f = g.a, g.f
    _, e2, e = _ellipsoid(a, f)
    lat_ts = getattr(g, "mesh_lat", 0.0)
    if lat_ts == 0.0:
        k0 = 1.0
    else:
        p = math.radians(lat_ts)
        k0 = math.cos(p) / math.sqrt(1 - e2 * math.sin(p) ** 2)

    def fwd(lon, lat):
        lam = np.radians(np.asarray(lon, np.float64))
        phi = np.radians(np.asarray(lat, np.float64))
        t = _iso_t(phi, e)
        return a * k0 * lam, -a * k0 * np.log(t)

    return fwd


def _laea_proj(g: _Gds):
    from ..functions.crs_registry import LambertAzimuthalEqualArea

    prj = LambertAzimuthalEqualArea.__new__(LambertAzimuthalEqualArea)
    prj.a, prj.e2, prj.e = _ellipsoid(g.a, g.f)
    prj.lon0 = _lon360to180(g.orient_lon)
    prj.fe = prj.fn = 0.0
    p0 = np.radians(g.mesh_lat)
    prj.qp = float(prj._q(np.array([np.pi / 2]))[0])
    q0 = float(prj._q(np.array([p0]))[0])
    prj.beta0 = np.arcsin(np.clip(q0 / prj.qp, -1, 1))
    prj.Rq = prj.a * np.sqrt(prj.qp / 2.0)
    from ..functions.crs import _m_fn
    m0 = _m_fn(p0, prj.e2)
    prj.D = prj.a * m0 / (prj.Rq * np.cos(prj.beta0)) \
        if np.cos(prj.beta0) != 0 else 1.0
    return prj.forward


def _grid_georef(g: _Gds):
    """-> (gt, proj dict) transcribing gribdataset.cpp:2629-2860."""
    proj: dict = {"a": g.a, "b": g.a * (1 - g.f)}
    if g.template in (0, 1, 40):
        rminx = g.lon1
        rmaxy = max(g.lat1, g.lat2)
        rminy = min(g.lat1, g.lat2)
        rmaxx = g.lon2
        if g.nx == 1:
            psx = g.dx
        elif g.lon1 > g.lon2:
            psx = (360.0 - (g.lon1 - g.lon2)) / (g.nx - 1)
        else:
            psx = (g.lon2 - g.lon1) / (g.nx - 1)
        psy = g.dy if g.ny == 1 else (rmaxy - rminy) / (g.ny - 1)
        if psx < 0 or abs(psx - g.dx) > 0.002:
            psx = g.dx
        if psy < 0 or abs(psy - g.dy) > 0.002:
            psy = g.dy
        if rminx + psx >= 180 or rmaxx - psx >= 180:
            if psx * g.nx > 360 + psx / 4:
                pass
            elif rminx == 180:
                rminx = -180.0
            elif (abs(360 - psx * g.nx) < psx / 4 and rminx <= 180
                  and g.template == 0):
                # gribdataset.cpp split-and-swap: rewrap around the
                # antimeridian; caller rolls the columns
                split = int(math.ceil((180 - rminx) / psx))
                if split < g.nx:
                    proj["split_and_swap_column"] = split
                    rminx = -180.0
            elif _lon360to180(rminx) > _lon360to180(rmaxx):
                rminx = _lon360to180(rminx)
            else:
                rminx = _lon360to180(rminx)
        proj["kind"] = "latlon" if g.template != 1 else "rotated_latlon"
        if g.template == 1:
            proj.update(south_lat=g.south_lat, south_lon=g.south_lon,
                        rotation=g.rot_angle)
    elif g.template == 12:
        rminx, rmaxy = g.x1, g.y2
        psx, psy = g.dx, g.dy
        proj.update(kind="transverse_mercator",
                    lat0=g.lat0, lon0=_lon360to180(g.lon0),
                    k0=0.9996 if abs(g.k0 - 0.9996) < 1e-8 else g.k0,
                    x0=g.x0, y0=g.y0)
    else:
        if g.template == 10:
            fwd = _mercator_proj(g)
            proj.update(kind="mercator", lat_ts=g.mesh_lat, lon0=0.0)
        elif g.template == 20:
            lat_ts = g.mesh_lat if not (g.center & 0x80) else \
                -abs(g.mesh_lat)
            prj = PolarStereographic(
                g.mesh_lat if g.mesh_lat else
                (90.0 if not (g.center & 0x80) else -90.0),
                _lon360to180(g.orient_lon), 0.0, 0.0, a=g.a, f=g.f)
            fwd = prj.forward
            proj.update(kind="polar_stereographic", lat_ts=g.mesh_lat,
                        lon0=_lon360to180(g.orient_lon))
        elif g.template == 30:
            prj = LambertConformalConic2SP(
                g.scale_lat1, g.scale_lat2, g.mesh_lat,
                _lon360to180(g.orient_lon), 0.0, 0.0, a=g.a, f=g.f)
            fwd = prj.forward
            proj.update(kind="lcc", lat1=g.scale_lat1,
                        lat2=g.scale_lat2, lat0=g.mesh_lat,
                        lon0=_lon360to180(g.orient_lon))
        elif g.template == 31:
            prj = AlbersEqualArea(
                g.scale_lat1, g.scale_lat2, g.mesh_lat,
                _lon360to180(g.orient_lon), 0.0, 0.0, a=g.a, f=g.f)
            fwd = prj.forward
            proj.update(kind="albers", lat1=g.scale_lat1,
                        lat2=g.scale_lat2, lat0=g.mesh_lat,
                        lon0=_lon360to180(g.orient_lon))
        elif g.template == 140:
            fwd = _laea_proj(g)
            proj.update(kind="laea", lat0=g.mesh_lat,
                        lon0=_lon360to180(g.orient_lon))
        else:
            return None, proj
        # normalize the first-point longitude into lon0 +/- 180 so the
        # conic/azimuthal forward lands on the right side of the cone
        lon0 = proj.get("lon0", 0.0)
        lon1 = lon0 + ((g.lon1 - lon0 + 180.0) % 360.0 - 180.0)
        x1, y1 = fwd(lon1, g.lat1)
        rminx, oriy = float(np.asarray(x1)), float(np.asarray(y1))
        psx, psy = g.dx, g.dy
        if g.scan & 0x40:  # lat1 is the southern-most row
            southern = True
            # gribdataset.cpp MANAL buggy-grid heuristic (LCC 60/30,
            # origin 30/140): first point may actually be the
            # northern-most row
            if (g.template == 30
                    and abs(g.scale_lat1 - 60) <= 1e-8
                    and abs(g.scale_lat2 - 30) <= 1e-8
                    and abs(g.mesh_lat - 30) <= 1e-8
                    and abs(_lon360to180(g.orient_lon) - 140) <= 1e-8):
                xc, yc = fwd(_lon360to180(g.orient_lon), g.mesh_lat)
                xc, yc = float(np.asarray(xc)), float(np.asarray(yc))
                x_nom = rminx + g.nx * g.dx / 2
                y_nom = oriy + g.ny * g.dy / 2
                y_bug = oriy - g.ny * g.dy / 2
                if ((x_nom - xc) ** 2 + (y_bug - yc) ** 2) < \
                        100 * ((x_nom - xc) ** 2 + (y_nom - yc) ** 2):
                    southern = False
            rmaxy = oriy + (g.ny - 1) * g.dy if southern else oriy
        else:
            rmaxy = oriy
    rminx -= psx / 2
    rmaxy += psy / 2
    return (rminx, psx, 0.0, rmaxy, 0.0, -psy), proj


# --------------------------------------------------------- unit tables
_K2C_CACHE: dict[tuple[int, int], set[int]] = {}


def _k2c_param_numbers(discipline: int, category: int) -> set[int]:
    """Parameter numbers whose degrib table entry is UC_K2F (rendered
    in Celsius under the reference's default GRIB_NORMALIZE_UNITS)."""
    key = (discipline, category)
    if key in _K2C_CACHE:
        return _K2C_CACHE[key]
    out: set[int] = set()
    path = ("/root/reference/frmts/grib/data/"
            f"grib2_table_4_2_{discipline}_{category}.csv")
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                if "UC_K2F" in line:
                    try:
                        out.add(int(line.split(",", 1)[0]))
                    except ValueError:
                        pass
    elif discipline == 0 and category == 0:
        out = set(range(0, 22))  # temperature family
    _K2C_CACHE[key] = out
    return out


def _ref_time(sec1: bytes) -> int:
    import calendar
    year = int.from_bytes(sec1[12:14], "big")
    mo, day, hr, mi, se = sec1[14], sec1[15], sec1[16], sec1[17], \
        sec1[18]
    return calendar.timegm((year, mo, day, hr, mi, se, 0, 0, 0))


_TIME_UNIT_SECONDS = {0: 60, 1: 3600, 2: 86400, 10: 10800, 11: 21600,
                      12: 43200, 13: 1}


def _safe_messages(data: bytes):
    """Tolerate truncated trailing messages (.begin/.head fixtures):
    fields decoded before the truncation point still come through."""
    gen = _walk_messages(data)
    while True:
        try:
            m = next(gen)
        except StopIteration:
            return
        except (IndexError, ValueError, struct.error):
            return
        yield m


def read_grib2(data: bytes):
    """-> list of band dicts {values (north-up 2D), gt, proj, meta}."""
    out = []
    for m in _safe_messages(data):
        g = _parse_gds(m)
        meta: dict = {"discipline": m.discipline, "pdtn": m.pdtn,
                      "drtn": m.drtn}
        if m.sec1 is not None and len(m.sec1) >= 19:
            meta["ref_time"] = _ref_time(m.sec1)
        if m.pds_vals is not None and len(m.pds_vals) >= 2:
            meta["param_category"] = m.pds_vals[0]
            meta["param_number"] = m.pds_vals[1]
            meta["pds_template_numbers"] = list(m.pds_vals)
        if m.pdtn in (0, 1, 2, 8, 32) and m.pds_vals is not None \
                and len(m.pds_vals) >= 13:
            unit_code = m.pds_vals[8]
            fv = int.from_bytes(m.pds_vals[9:13], "big")
            secs = _TIME_UNIT_SECONDS.get(unit_code)
            if secs is not None:
                meta["forecast_seconds"] = fv * secs
                if "ref_time" in meta:
                    meta["valid_time"] = meta["ref_time"] + fv * secs
        if m.data7 is None:  # truncated message: georef only
            gt, proj = (None, None)
            if g is not None:
                gt, proj = _grid_georef(g)
                meta["nx"], meta["ny"] = g.nx, g.ny
            meta["error"] = "truncated GRIB2 message (data absent)"
            out.append({"values": None, "gt": gt, "proj": proj,
                        "meta": meta})
            continue
        try:
            vals = _unpack_field(m)
        except ValueError as exc:
            meta["error"] = str(exc)
            out.append({"values": None, "gt": None, "proj": None,
                        "meta": meta})
            continue
        band = None
        gt = proj = None
        if g is not None:
            if m.bitmap is not None and len(vals) >= g.nx * g.ny:
                vals = vals[:g.nx * g.ny]
            if g.scan & 0x20:  # consecutive points in j direction
                band = vals.reshape(g.nx, g.ny)
                if g.scan & 0x10:  # alternate columns reverse
                    band = band.copy()
                    band[1::2] = band[1::2, ::-1]
                band = band.T
            else:
                band = vals.reshape(g.ny, g.nx)
                if g.scan & 0x10:  # boustrophedon: odd rows reversed
                    band = band.copy()
                    band[1::2] = band[1::2, ::-1]
            if g.scan & 0x40:  # j scans south->north: flip to north-up
                band = band[::-1]
            if g.scan & 0x80:  # i scans negative
                band = band[:, ::-1]
            gt, proj = _grid_georef(g)
            if proj and "split_and_swap_column" in proj:
                band = np.roll(band, -proj["split_and_swap_column"],
                               axis=1)
        else:
            band = vals
        # GRIB_NORMALIZE_UNITS: K -> C for UC_K2F parameters
        if ("param_category" in meta and band is not None
                and meta["param_number"] in _k2c_param_numbers(
                    m.discipline, meta["param_category"])):
            mask = band != UNDEFINED
            band = np.where(mask, band - 273.15, band)
            meta["unit"] = "[C]"
        if m.bitmap is not None:
            meta["nodata"] = UNDEFINED
        out.append({"values": band, "gt": gt, "proj": proj,
                    "meta": meta})
    return out
