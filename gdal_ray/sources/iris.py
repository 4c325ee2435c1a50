"""Vaisala IRIS weather-radar product reader (reference
frmts/iris/irisdataset.cpp).

A product file is a 640-byte little-endian header (magic 27/26 at
bytes 0/2 + product code) followed by band-sequential rows stored
SOUTH-first (rows are flipped on read).  Header fields (all offsets
include the reference's +12 struct base): raster size at 112/116,
band count 120, product code 24, data-type code 142, projection byte
158; georef block at +320+12: equatorial radius (cm) 552, inverse
flattening (1e-6) 556, center lat/lon as binary angles (x*360/2^32)
440/444, projection ref lat/lon 572/576; radar offset 124/128
(1/1000 px) and pixel scale 100/104 (cm).

Pixel transforms per data-type code (IReadBlock, ``:275-360``):
dBZ/dBT ``(v-64)/2`` (95.5 -> nodata), dBZ2/dBT2
``(u16-32768)/100``, FLIQUID2 4-bit-exponent mantissa, HEIGHT2
``(u16-1)/1000``, HEIGHT ``(u8-1)/10``, raw bytes otherwise; nodata
-9999.

Geotransform: Azimuthal-equidistant and the default path use the
radar offset and scale directly; Mercator products walk one pixel
east/north on the ellipsoid with Vincenty's direct formula (the
reference ports Chris Veness' CC-BY implementation; this uses the
same published equations) and difference the ellipsoidal Mercator
forward projection of the two points."""

from __future__ import annotations

import math
import struct

import numpy as np

PRODUCTS = ["", "PPI", "RHI", "CAPPI", "CROSS", "TOPS", "TRACK", "RAIN1",
            "RAINN", "VVP", "VIL", "SHEAR", "WARN", "CATCH", "RTI", "RAW",
            "MAX", "USER", "USERV", "OTHER", "STATUS", "SLINE", "WIND",
            "BEAM", "TEXT", "FCAST", "NDOP", "IMAGE", "COMP", "TDWR",
            "GAGE", "DWELL", "SRI", "BASE", "HMAX"]
PROJECTIONS = ["Azimutal equidistant", "Mercator", "Polar Stereographic",
               "UTM", "Perspective from geosync", "Equidistant cylindrical",
               "Gnomonic", "Gauss conformal", "Lambert conformal conic"]


def _vincenty_direct(lat1, lon1, alpha1, s, a, b, f):
    """Vincenty's direct geodesic solution (public formula)."""
    alpha1 = math.radians(alpha1)
    sin_a1, cos_a1 = math.sin(alpha1), math.cos(alpha1)
    tanU1 = (1 - f) * math.tan(math.radians(lat1))
    cosU1 = 1 / math.sqrt(1 + tanU1 * tanU1)
    sinU1 = tanU1 * cosU1
    sigma1 = math.atan2(tanU1, cos_a1)
    sin_alpha = cosU1 * sin_a1
    cos_sq_alpha = 1 - sin_alpha * sin_alpha
    u_sq = cos_sq_alpha * (a * a - b * b) / (b * b)
    A = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    B = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    sigma = s / (b * A)
    for _ in range(100):
        cos2sigma_m = math.cos(2 * sigma1 + sigma)
        sin_sigma = math.sin(sigma)
        cos_sigma = math.cos(sigma)
        delta_sigma = B * sin_sigma * (
            cos2sigma_m + B / 4 * (
                cos_sigma * (-1 + 2 * cos2sigma_m ** 2)
                - B / 6 * cos2sigma_m * (-3 + 4 * sin_sigma ** 2)
                * (-3 + 4 * cos2sigma_m ** 2)))
        sigma_new = s / (b * A) + delta_sigma
        if abs(sigma_new - sigma) < 1e-12:
            sigma = sigma_new
            break
        sigma = sigma_new
    sin_sigma = math.sin(sigma)
    cos_sigma = math.cos(sigma)
    cos2sigma_m = math.cos(2 * sigma1 + sigma)
    lat2 = math.atan2(
        sinU1 * cos_sigma + cosU1 * sin_sigma * cos_a1,
        (1 - f) * math.sqrt(sin_alpha ** 2 + (
            sinU1 * sin_sigma - cosU1 * cos_sigma * cos_a1) ** 2))
    lam = math.atan2(sin_sigma * sin_a1,
                     cosU1 * cos_sigma - sinU1 * sin_sigma * cos_a1)
    C = f / 16 * cos_sq_alpha * (4 + f * (4 - 3 * cos_sq_alpha))
    L = lam - (1 - C) * f * sin_alpha * (
        sigma + C * sin_sigma * (
            cos2sigma_m + C * cos_sigma * (-1 + 2 * cos2sigma_m ** 2)))
    lon2 = lon1 + math.degrees(L)
    return math.degrees(lat2), lon2


def _mercator_forward(lat, lon, lon0, a, e):
    x = a * math.radians(lon - lon0)
    phi = math.radians(lat)
    if e == 0:
        y = a * math.log(math.tan(math.pi / 4 + phi / 2))
    else:
        esin = e * math.sin(phi)
        y = a * math.log(math.tan(math.pi / 4 + phi / 2)
                         * ((1 - esin) / (1 + esin)) ** (e / 2))
    return x, y


def read_iris(path: str):
    """-> (pixels float32 [h,w] or [h,w,bands], gt, meta)."""
    with open(path, "rb") as f:
        data = f.read()
    hdr = data[:640]

    def u16(off):
        return struct.unpack_from("<H", hdr, off)[0]

    def i32(off):
        return struct.unpack_from("<i", hdr, off)[0]

    def u32(off):
        return struct.unpack_from("<I", hdr, off)[0]

    nx = i32(100 + 12)
    ny = i32(104 + 12)
    nbands = max(1, i32(108 + 12))
    product_code = u16(12 + 12)
    dtype_code = u16(130 + 12)
    proj_code = hdr[146 + 12]

    dlen = 2 if dtype_code in (8, 9, 37, 33) else 1
    per_band = nx * ny * dlen
    bands = []
    for b in range(nbands):
        raw = np.frombuffer(data, np.uint8, per_band, 640 + b * per_band)
        if dlen == 2:
            vals = raw.view("<u2").astype(np.float64)
        else:
            vals = raw.astype(np.float64)
        if dtype_code in (1, 2):
            out = (vals - 64.0) / 2.0
            out[out == 95.5] = -9999.0
        elif dtype_code in (8, 9):
            out = (vals - 32768.0) / 100.0
            out[np.isclose(out, 327.67)] = -9999.0
        elif dtype_code == 37:
            v = vals.astype(np.uint64)
            exp = v >> 12
            mant = v - (exp << 12)
            out = np.where(exp == 0, mant / 1000.0,
                           ((mant + 4096) << np.maximum(
                               exp, 1) - 1) / 1000.0).astype(np.float64)
            out[v == 65535] = -9999.0
        elif dtype_code == 33:
            out = (vals - 1.0) / 1000.0
            out[vals == 0] = -1.0
            out[vals == 65535] = -9999.0
        elif dtype_code == 32:
            out = (vals - 1.0) / 10.0
            out[vals == 0] = -1.0
            out[vals == 255] = -9999.0
        else:
            out = vals
        band = out.reshape(ny, nx)[::-1]  # south-first storage
        bands.append(band.astype(np.float32))
    px = bands[0] if nbands == 1 else np.stack(bands, axis=2)

    # georeferencing (LoadProjection, irisdataset.cpp:452-595)
    geo = 320 + 12
    a = u32(geo + 220) / 100.0
    inv_f = u32(geo + 224) / 1e6
    if a == 0.0:
        a, b, flat = 6371000.0, 6371000.0, 0.0
    elif inv_f == 0.0:
        b, flat = a, 0.0
    else:
        flat = 1.0 / inv_f
        b = a * (1.0 - flat)
    U32MAX = 0xFFFFFFFF
    center_lon = u32(geo + 112) * 360.0 / U32MAX
    center_lat = u32(geo + 108) * 360.0 / U32MAX
    ref_lon = u32(geo + 244) * 360.0 / U32MAX
    ref_lat = u32(geo + 240) * 360.0 / U32MAX
    radar_x = i32(112 + 12) / 1000.0
    radar_y = i32(116 + 12) / 1000.0
    scale_x = i32(88 + 12) / 100.0
    scale_y = i32(92 + 12) / 100.0

    gt = None
    proj_name = PROJECTIONS[proj_code] if proj_code < len(PROJECTIONS) else ""
    if 0 < scale_x < b and 0 < scale_y < b:
        if proj_name == "Mercator":
            lat_x2, lon_x2 = _vincenty_direct(center_lat, center_lon, 90.0,
                                              scale_x, a, b, flat)
            lat_y2, lon_y2 = _vincenty_direct(center_lat, center_lon, 0.0,
                                              scale_y, a, b, flat)
            e = math.sqrt(max(0.0, 1 - (b / a) ** 2))
            x0, y0 = _mercator_forward(center_lat, center_lon, ref_lon, a, e)
            x2, _ = _mercator_forward(center_lat, lon_x2, ref_lon, a, e)
            _, y2 = _mercator_forward(lat_y2, center_lon, ref_lon, a, e)
            gt = (x0 - radar_x * (x2 - x0), x2 - x0, 0.0,
                  y0 + radar_y * (y2 - y0), 0.0, -(y2 - y0))
        else:
            gt = (-radar_x * scale_x, scale_x, 0.0,
                  radar_y * scale_y, 0.0, -scale_y)

    meta = {"product": PRODUCTS[product_code]
            if product_code < len(PRODUCTS) else str(product_code),
            "projection": proj_name, "data_type_code": dtype_code,
            "nodata": -9999.0}
    return px, gt, meta
