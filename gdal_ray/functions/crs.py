"""Vectorized CRS math (the engine's PROJ stand-in).

The reference delegates reprojection to PROJ through ``OGRProjCT``
(reference ogr/ogrct.cpp:655) and composes it into the GenImgProj
transformer chain (reference alg/gdaltransformer.cpp). No PROJ/pyproj
binding exists in this container, so the projections the engine
supports are implemented directly from the public formulas:

- EPSG:4326          — WGS84 geographic lon/lat degrees (hub CRS).
- EPSG:3857          — spherical Web Mercator (R = 6378137), with the
                       +/-85.0511287798066 deg clamp used by tiling
                       (reference apps/gdalalg_raster_tile.cpp:2323).
- EPSG:326xx / 327xx — WGS84 UTM north/south zones via the 6th-order
                       Krueger series (Karney 2011, "Transverse
                       Mercator with an accuracy of a few nanometers"),
                       k0=0.9996, FE=500000, FN=0/10000000.
- EPSG:2154          — RGF93 / Lambert-93: Lambert Conformal Conic 2SP
                       on GRS80 (Snyder 1987 eqs. 15-1..15-11).
- EPSG:5070          — NAD83 / Conus Albers: Albers Equal Area on
                       GRS80 (Snyder eqs. 14-1..14-21).
- EPSG:3413 / 3031   — WGS84 polar stereographic north (NSIDC) /
                       south (Antarctic), variant B with standard
                       parallel 70N / 71S (Snyder eqs. 21-30..21-40).
Datum note: GRS80 and WGS84 geographic coordinates are treated as
identical (sub-centimeter apart), the standard operational assumption.

All transforms are numpy-vectorized over coordinate arrays. Accuracy:
UTM series is sub-micrometer in-zone; the inverse conformal-latitude
step solves the exact relation by fixed-point iteration (converges at
rate e^2 ~ 1/150, 8 iterations => ~1e-17 rad).
"""

from __future__ import annotations

import numpy as np

# WGS84
A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2_WGS84 = F_WGS84 * (2.0 - F_WGS84)
E_WGS84 = np.sqrt(E2_WGS84)

R_MERC = 6378137.0
MAX_MERC_LAT = 85.0511287798066  # reference apps/gdalalg_raster_tile.cpp MAX_LAT
WEB_MERCATOR_EXTENT = np.pi * R_MERC  # half-width of the 3857 square

_N = F_WGS84 / (2.0 - F_WGS84)  # third flattening
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6
# rectifying radius
_A_CAP = A_WGS84 / (1 + _N) * (1 + _N2 / 4 + _N4 / 64 + _N6 / 256)
# Krueger alpha (forward) / beta (inverse) coefficients, order n^6
_ALPHA = np.array(
    [
        _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288 + 7891 * _N6 / 37800,
        13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630 - 1983433 * _N6 / 1935360,
        61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880 + 167603 * _N6 / 181440,
        49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
        34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
        212378941 * _N6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512 + 96199 * _N6 / 604800,
        _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105 - 1118711 * _N6 / 3870720,
        17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
        4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
        4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
        20648693 * _N6 / 638668800,
    ]
)
_J = np.arange(1, 7, dtype=np.float64)

UTM_K0 = 0.9996
UTM_FE = 500000.0
UTM_FN_SOUTH = 10000000.0


# ---------------------------------------------------------------- Web Mercator
def lonlat_to_webmercator(lon, lat, clamp: bool = True):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if clamp:
        lat = np.clip(lat, -MAX_MERC_LAT, MAX_MERC_LAT)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(2 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2)
    return lon, lat


# ------------------------------------------------------ Transverse Mercator
def _conformal_lat(phi):
    s = np.sin(phi)
    return np.arctan(np.sinh(np.arctanh(s) - E_WGS84 * np.arctanh(E_WGS84 * s)))


def _inv_conformal_lat(chi):
    """phi such that conformal(phi) == chi; fixed-point, vectorized."""
    phi = chi.copy()
    for _ in range(8):
        phi = phi + (chi - _conformal_lat(phi))
    return phi


def lonlat_to_tm(lon, lat, lon0_deg: float):
    """Geographic -> transverse Mercator (unscaled, no false offsets).

    Returns (easting_raw, northing_raw) = k0-free (x, y); callers apply
    k0 / false easting. Krueger series, Karney 2011 eqs. 7-11.
    """
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    chi = _conformal_lat(phi)
    t = np.tan(chi)
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    j2xi = 2 * _J[:, None] * xi_p.reshape(1, -1)
    j2eta = 2 * _J[:, None] * eta_p.reshape(1, -1)
    xi = xi_p + (_ALPHA[:, None] * np.sin(j2xi) * np.cosh(j2eta)).sum(axis=0).reshape(xi_p.shape)
    eta = eta_p + (_ALPHA[:, None] * np.cos(j2xi) * np.sinh(j2eta)).sum(axis=0).reshape(eta_p.shape)
    return _A_CAP * eta, _A_CAP * xi


def tm_to_lonlat(x, y, lon0_deg: float):
    """Inverse transverse Mercator (unscaled x, y)."""
    eta = np.asarray(x, dtype=np.float64) / _A_CAP
    xi = np.asarray(y, dtype=np.float64) / _A_CAP
    j2xi = 2 * _J[:, None] * xi.reshape(1, -1)
    j2eta = 2 * _J[:, None] * eta.reshape(1, -1)
    xi_p = xi - (_BETA[:, None] * np.sin(j2xi) * np.cosh(j2eta)).sum(axis=0).reshape(xi.shape)
    eta_p = eta - (_BETA[:, None] * np.cos(j2xi) * np.sinh(j2eta)).sum(axis=0).reshape(eta.shape)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = _inv_conformal_lat(chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def utm_zone_lon0(zone: int) -> float:
    return -183.0 + 6.0 * zone


def lonlat_to_utm(lon, lat, zone: int, south: bool = False):
    x, y = lonlat_to_tm(lon, lat, utm_zone_lon0(zone))
    e = UTM_K0 * x + UTM_FE
    n = UTM_K0 * y + (UTM_FN_SOUTH if south else 0.0)
    return e, n


def utm_to_lonlat(e, n, zone: int, south: bool = False):
    x = (np.asarray(e, dtype=np.float64) - UTM_FE) / UTM_K0
    y = (np.asarray(n, dtype=np.float64) - (UTM_FN_SOUTH if south else 0.0)) / UTM_K0
    return tm_to_lonlat(x, y, utm_zone_lon0(zone))


# ------------------------------------------------- conic / polar projections

A_GRS80 = 6378137.0
F_GRS80 = 1.0 / 298.257222101


def _ellipsoid(a: float, f: float):
    e2 = f * (2.0 - f)
    return a, e2, np.sqrt(e2)


def _iso_t(phi, e):
    """Snyder eq. 15-9: isometric-latitude t."""
    s = np.sin(phi)
    return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)


def _inv_iso_t(t, e):
    """phi from t (Snyder 7-9), fixed point — e^2-rate convergence."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * s) / (1 + e * s)) ** (e / 2))
    return phi


def _m_fn(phi, e2):
    """Snyder eq. 14-15: m = cos(phi)/sqrt(1 - e2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - e2 * s * s)


class LambertConformalConic2SP:
    """Snyder 1987 pp. 104-110 (the PROJ lcc core)."""

    def __init__(self, lat1, lat2, lat0, lon0, fe, fn,
                 a=A_GRS80, f=F_GRS80):
        self.a, self.e2, self.e = _ellipsoid(a, f)
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        self.lon0 = lon0
        self.fe, self.fn = fe, fn
        m1 = _m_fn(p1, self.e2)
        m2 = _m_fn(p2, self.e2)
        t1 = _iso_t(p1, self.e)
        t2 = _iso_t(p2, self.e)
        t0 = _iso_t(p0, self.e)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = self.a * self.F * t0 ** self.n

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        t = _iso_t(phi, self.e)
        rho = self.a * self.F * t ** self.n
        th = self.n * lam
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(dx, dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        phi = _inv_iso_t(t, self.e)
        return np.degrees(th / self.n) + self.lon0, np.degrees(phi)


class AlbersEqualArea:
    """Snyder 1987 pp. 98-103 (the PROJ aea core)."""

    def __init__(self, lat1, lat2, lat0, lon0, fe, fn,
                 a=A_GRS80, f=F_GRS80):
        self.a, self.e2, self.e = _ellipsoid(a, f)
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        self.lon0 = lon0
        self.fe, self.fn = fe, fn
        m1 = _m_fn(p1, self.e2)
        m2 = _m_fn(p2, self.e2)
        q1 = self._q(p1)
        q2 = self._q(p2)
        q0 = self._q(p0)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = self.a * np.sqrt(self.C - self.n * q0) / self.n

    def _q(self, phi):
        s = np.sin(phi)
        e, e2 = self.e, self.e2
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        q = self._q(phi)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * lam
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        if self.n < 0:
            # southern standard parallels: reverse the signs of x and
            # rho0 - y before taking theta (Snyder p. 101, after
            # eq. 14-11) — rho's sign cancels in the squared q term
            dx, dy = -dx, -dy
        rho = np.hypot(dx, dy)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        th = np.arctan2(dx, dy)
        # Snyder eq. 3-16 iteration for phi from q
        e, e2 = self.e, self.e2
        phi = np.arcsin(np.clip(q / 2, -1, 1))
        for _ in range(8):
            s = np.sin(phi)
            phi = phi + ((1 - e2 * s * s) ** 2 / (2 * np.cos(phi))) * (
                q / (1 - e2) - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))
        return np.degrees(th / self.n) + self.lon0, np.degrees(phi)


class PolarStereographic:
    """Variant B (standard parallel), Snyder pp. 160-162; north or
    south aspect by the sign of ``lat_ts``."""

    def __init__(self, lat_ts, lon0, fe, fn, a=A_WGS84, f=F_WGS84):
        self.a, self.e2, self.e = _ellipsoid(a, f)
        self.south = lat_ts < 0
        pf = np.radians(abs(lat_ts))
        self.lon0 = lon0
        self.fe, self.fn = fe, fn
        self.mf = _m_fn(pf, self.e2)
        self.tf = _iso_t(pf, self.e)

    def forward(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        if self.south:
            lon, lat = -lon, -lat
            lon0 = -self.lon0
        else:
            lon0 = self.lon0
        phi = np.radians(lat)
        lam = np.radians(lon - lon0)
        t = _iso_t(phi, self.e)
        rho = self.a * self.mf * t / self.tf
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if self.south:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def inverse(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        if self.south:
            dx, dy = -dx, -dy
        rho = np.hypot(dx, dy)
        t = rho * self.tf / (self.a * self.mf)
        phi = _inv_iso_t(t, self.e)
        lam = np.arctan2(dx, -dy)
        lon = np.degrees(lam) + (-self.lon0 if self.south else self.lon0)
        lat = np.degrees(phi)
        if self.south:
            lon, lat = -lon, -lat
    # normalize into [-180, 180]
        lon = (np.asarray(lon) + 180.0) % 360.0 - 180.0
        return lon, lat


# EPSG parameter registry for the projected CRSs above
_PROJECTIONS = {
    2154: lambda: LambertConformalConic2SP(49.0, 44.0, 46.5, 3.0,
                                           700000.0, 6600000.0),
    5070: lambda: AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    3413: lambda: PolarStereographic(70.0, -45.0, 0.0, 0.0),
    3031: lambda: PolarStereographic(-71.0, 0.0, 0.0, 0.0),
}
_PROJ_CACHE: dict[int, object] = {}


def _projection(epsg: int):
    if epsg not in _PROJ_CACHE:
        _PROJ_CACHE[epsg] = _PROJECTIONS[epsg]()
    return _PROJ_CACHE[epsg]


# ------------------------------------------------------------------ dispatch
def _parse_epsg(crs: int | str) -> int:
    if isinstance(crs, str):
        crs = crs.upper().replace("EPSG:", "")
        return int(crs)
    return int(crs)


def _to_lonlat_fn(epsg: int):
    if epsg == 4326:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if epsg == 3857:
        return webmercator_to_lonlat
    if 32601 <= epsg <= 32660:
        z = epsg - 32600
        return lambda x, y: utm_to_lonlat(x, y, z, south=False)
    if 32701 <= epsg <= 32760:
        z = epsg - 32700
        return lambda x, y: utm_to_lonlat(x, y, z, south=True)
    if epsg in _PROJECTIONS:
        return _projection(epsg).inverse
    from .crs_registry import lookup

    ent = lookup(epsg)
    if ent is not None:
        return ent[0].inverse
    raise NotImplementedError(f"EPSG:{epsg}")


def _from_lonlat_fn(epsg: int):
    if epsg == 4326:
        return lambda lon, lat: (np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    if epsg == 3857:
        return lonlat_to_webmercator
    if 32601 <= epsg <= 32660:
        z = epsg - 32600
        return lambda lon, lat: lonlat_to_utm(lon, lat, z, south=False)
    if 32701 <= epsg <= 32760:
        z = epsg - 32700
        return lambda lon, lat: lonlat_to_utm(lon, lat, z, south=True)
    if epsg in _PROJECTIONS:
        return _projection(epsg).forward
    from .crs_registry import lookup

    ent = lookup(epsg)
    if ent is not None:
        return ent[0].forward
    raise NotImplementedError(f"EPSG:{epsg}")


def _datum_fn(epsg: int):
    """Helmert shift to/from WGS84 for registry CRSs on genuinely
    offset datums; None = WGS84-equivalent."""
    from .crs_registry import lookup

    ent = lookup(epsg)
    return None if ent is None else ent[1]


class Transformer:
    """pyproj.Transformer analog: build once (per actor), apply per batch.

    Mirrors the OGRProjCT reuse pattern (reference ogr/ogrct.cpp:1654
    Clone()/GetInverse()) — construction is the expensive part in PROJ;
    here it is cheap but the actor-pool pattern is kept identical so a
    real PROJ binding can slot in.
    """

    def __init__(self, src: int | str, dst: int | str):
        self.src = _parse_epsg(src)
        self.dst = _parse_epsg(dst)
        self._to_ll = _to_lonlat_fn(self.src)
        self._from_ll = _from_lonlat_fn(self.dst)
        # datum hop through WGS84 (null for the WGS84-equivalent
        # family: NAD83/ETRS89/RGF93/NZGD2000)
        sd, dd = _datum_fn(self.src), _datum_fn(self.dst)
        # cancel the WGS84 hop when both sides sit on the SAME datum —
        # by equality key, not object identity (distinct instances of
        # one datum appear across registry-cache generations, and the
        # Helmert geodetic iteration would otherwise inject ~0.5 mm
        # into what must be an exact no-op)
        same = (sd is dd or (sd is not None and dd is not None
                             and getattr(sd, "datum_key", 0)
                             == getattr(dd, "datum_key", 1)))
        self._src_datum = None if same else sd
        self._dst_datum = None if same else dd

    def transform(self, x, y):
        if self.src == self.dst:
            return np.asarray(x, np.float64), np.asarray(y, np.float64)
        lon, lat = self._to_ll(x, y)
        if self._src_datum is not None:
            lon, lat = self._src_datum.to_wgs84(lon, lat)
        if self._dst_datum is not None:
            lon, lat = self._dst_datum.from_wgs84(lon, lat)
        return self._from_ll(lon, lat)

    def inverse(self) -> "Transformer":
        return Transformer(self.dst, self.src)
