"""DEM moving-window ops: hillshade, slope, aspect, TRI, TPI, roughness.

Vectorized numpy re-implementations of the reference's 3x3-window
algorithms (reference apps/gdaldem_lib.cpp): Horn gradient
(:780-794), hillshade (:950-1030, constants :1170-1196), slope Horn
(:1345-1369) and Zevenbergen-Thorne (:1373-1390), aspect (:1420-1460),
TRI Riley/Wilson (:2351-2377), TPI (:2383-2393), roughness
(:2400-2422).

Window layout (afWin indices):
    0 1 2      row y-1
    3 4 5      row y      (4 = center)
    6 7 8      row y+1

Border pixels are nodata (NaN) — the reference's default without
`-compute_edges`. Each function takes a 2-D float array and the
geotransform pixel sizes; returns float64 with NaN borders. Designed
to run inside `map_batches` per tile with a 1-pixel halo
(SURVEY.md §2.2 DEM ops).
"""

from __future__ import annotations

import numpy as np

_DEG = 180.0 / np.pi


def _win(z: np.ndarray):
    """The nine shifted views of the interior: w[i] matches afWin[i]."""
    return [
        z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:],
        z[1:-1, :-2], z[1:-1, 1:-1], z[1:-1, 2:],
        z[2:, :-2], z[2:, 1:-1], z[2:, 2:],
    ]


def _horn(w, inv_ew: float, inv_ns: float):
    x = ((w[0] + w[3] + w[3] + w[6]) - (w[2] + w[5] + w[5] + w[8])) * inv_ew
    y = ((w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])) * inv_ns
    return x, y


def _zt(w, inv_ew: float, inv_ns: float):
    x = (w[3] - w[5]) * inv_ew
    y = (w[7] - w[1]) * inv_ns
    return x, y


def _frame(core: np.ndarray, fill=np.nan) -> np.ndarray:
    out = np.full((core.shape[0] + 2, core.shape[1] + 2), fill, np.float64)
    out[1:-1, 1:-1] = core
    return out


def pad_edges(z: np.ndarray) -> np.ndarray:
    """-compute_edges padding: linear extrapolation 2a - b beyond each
    edge (reference apps/gdaldem_lib.cpp INTERPOL :286-311; rows first,
    then columns over the already-extended rows — the order
    GDALGeneric3x3Processing fills edge windows)."""
    z = np.asarray(z, np.float64)
    h, w = z.shape
    p = np.empty((h + 2, w + 2), np.float64)
    p[1:-1, 1:-1] = z
    # degenerate 1-row/1-col strips: the INTERPOL(2a - b) neighbor
    # does not exist, so duplicate the edge (2a - a)
    p[0, 1:-1] = 2 * z[0] - (z[1] if h > 1 else z[0])
    p[-1, 1:-1] = 2 * z[-1] - (z[-2] if h > 1 else z[-1])
    p[:, 0] = 2 * p[:, 1] - (p[:, 2] if w > 1 else p[:, 1])
    p[:, -1] = 2 * p[:, -2] - (p[:, -3] if w > 1 else p[:, -2])
    return p


def auto_scale_geographic(gt, n_rows: int, semimajor: float = 6378137.0):
    """gdaldem's default scale for geographic CRS inputs
    (apps/gdaldem_lib.cpp:3679-3700): yscale = angular_units * a,
    xscale = yscale * cos(center latitude)."""
    ang = np.pi / 180.0
    yscale = ang * semimajor
    mean_lat = (gt[3] + n_rows * gt[5] / 2) * ang
    return yscale * np.cos(mean_lat), yscale


def _with_computed_edges(kern, z: np.ndarray) -> np.ndarray:
    """-compute_edges evaluation: run ``kern`` on the extrapolation-
    padded grid, then redo the four CORNERS with GDAL's clamped corner
    windows (the first/last-row loop clamps jmin/jmax instead of
    extrapolating horizontally — gdaldem_lib.cpp:458-482,766+)."""
    p = pad_edges(z)
    out = kern(p)[1:-1, 1:-1]
    h, w = z.shape
    for cy, prow in ((0, [0, 1, 2]), (h - 1, [h - 1, h, h + 1])):
        for cx in (0, w - 1):
            cols = [cx + 1, cx + 1, cx + 2] if cx == 0 else [cx, cx + 1, cx + 1]
            win = p[np.ix_(prow, cols)]
            out[cy, cx] = kern(win)[1, 1]
    return out


def hillshade(z: np.ndarray, ewres: float, nsres: float, *, zfactor: float = 1.0,
              azimuth: float = 315.0, altitude: float = 45.0,
              alg: str = "horn", combined: bool = False,
              compute_edges: bool = False) -> np.ndarray:
    """Hillshade in [1, 255] (GDALHillshadeAlg; combined variant
    :1140-1168 multiplies the Lambertian angle by the slope term)."""
    z = np.asarray(z, np.float64)
    if compute_edges:
        def kern(zz):
            return hillshade(zz, ewres, nsres, zfactor=zfactor,
                             azimuth=azimuth, altitude=altitude, alg=alg,
                             combined=combined)

        return _with_computed_edges(kern, z)
    zf = zfactor / (2.0 if alg == "zevenbergen-thorne" else 8.0)
    inv_ew = 1.0 / ewres
    inv_ns = 1.0 / nsres
    alt = np.radians(altitude)
    az = np.radians(azimuth)
    w = _win(z)
    x, y = (_zt if alg == "zevenbergen-thorne" else _horn)(w, inv_ew, inv_ns)
    if combined:
        slope_t = zf * zf * (x * x + y * y)
        lamb = (np.sin(alt) - (y * np.cos(az) * np.cos(alt) * zf
                               - x * np.sin(az) * np.cos(alt) * zf)) \
            / np.sqrt(1.0 + slope_t)
        c = np.arccos(np.clip(lamb, -1.0, 1.0))
        c = 1.0 - c * np.arctan(np.sqrt(slope_t)) / ((np.pi / 2) ** 2)
        cang = np.where(c <= 0.0, 1.0, 1.0 + 254.0 * c)
        return _frame(cang)
    sin_alt_254 = 254.0 * np.sin(alt)
    cos_az_cos_alt_z_254 = 254.0 * np.cos(az) * np.cos(alt) * zf
    sin_az_cos_alt_z_254 = 254.0 * np.sin(az) * np.cos(alt) * zf
    cang_254 = (sin_alt_254 - (y * cos_az_cos_alt_z_254 - x * sin_az_cos_alt_z_254)) \
        / np.sqrt(1.0 + zf * zf * (x * x + y * y))
    cang = np.where(cang_254 <= 0.0, 1.0, 1.0 + cang_254)
    return _frame(cang)


def hillshade_multidirectional(z: np.ndarray, ewres: float, nsres: float, *,
                               zfactor: float = 1.0, altitude: float = 45.0,
                               alg: str = "horn",
                               compute_edges: bool = False) -> np.ndarray:
    """USGS OF 92-422 multidirectional hillshade
    (GDALHillshadeMultiDirectionalAlg, apps/gdaldem_lib.cpp:1226+):
    four azimuths (225/270/315/360) weighted by sin^2(aspect - az)."""
    z = np.asarray(z, np.float64)
    if compute_edges:
        def kern(zz):
            return hillshade_multidirectional(zz, ewres, nsres,
                                              zfactor=zfactor,
                                              altitude=altitude, alg=alg)

        return _with_computed_edges(kern, z)
    zf = zfactor / (2.0 if alg == "zevenbergen-thorne" else 8.0)
    w = _win(z)
    x, y = (_zt if alg == "zevenbergen-thorne" else _horn)(
        w, 1.0 / ewres, 1.0 / nsres)
    alt = np.radians(altitude)
    sin_alt_127 = 127.0 * np.sin(alt)
    cos225_m = np.cos(np.radians(225.0)) * np.cos(alt) * zf * 127.0
    cos_alt_z_127 = np.cos(alt) * zf * 127.0
    xx = x * x
    yy = y * y
    xy = xx + yy
    v225 = np.maximum(sin_alt_127 + (x - y) * cos225_m, 0.0)
    v270 = np.maximum(sin_alt_127 - x * cos_alt_z_127, 0.0)
    v315 = np.maximum(sin_alt_127 + (x + y) * cos225_m, 0.0)
    v360 = np.maximum(sin_alt_127 - y * cos_alt_z_127, 0.0)
    w225 = 0.5 * xy - x * y
    w270 = xx
    w315 = xy - w225
    w360 = yy
    with np.errstate(invalid="ignore", divide="ignore"):
        num = (w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360) / xy
        cang = 1.0 + num / np.sqrt(1.0 + zf * zf * xy)
    cang = np.where(xy == 0.0, 1.0 + 2.0 * sin_alt_127, cang)
    return _frame(cang)


def hillshade_igor(z: np.ndarray, ewres: float, nsres: float, *,
                   zfactor: float = 1.0, azimuth: float = 315.0,
                   alg: str = "horn",
                   compute_edges: bool = False) -> np.ndarray:
    """Igor Evsukoff shading (GDALHillshadeIgorAlg,
    apps/gdaldem_lib.cpp:950-1030): 255 * (1 - slope/90 *
    aspect-alignment strength); altitude is not used."""
    z = np.asarray(z, np.float64)
    if compute_edges:
        def kern(zz):
            return hillshade_igor(zz, ewres, nsres, zfactor=zfactor,
                                  azimuth=azimuth, alg=alg)

        return _with_computed_edges(kern, z)
    w = _win(z)
    zt = alg == "zevenbergen-thorne"
    zf = zfactor / (2.0 if zt else 8.0)
    gx, gy = (_zt if zt else _horn)(w, 1.0 / ewres, 1.0 / nsres)
    slope_deg = np.arctan(np.hypot(gx, gy) * zf) * _DEG
    if zt:
        dx = w[5] - w[3]
        dy = w[7] - w[1]
    else:
        dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
        dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    aspect = np.arctan2(dy, -dx)
    az = np.radians(azimuth)
    diff = np.mod(aspect - (np.pi * 3 / 2 - az), 2 * np.pi)
    diff = np.minimum(diff, 2 * np.pi - diff)
    strength = 1.0 - diff / np.pi
    shadow = 1.0 - (slope_deg / 90.0) * strength
    return _frame(255.0 * shadow)


def slope(z: np.ndarray, ewres: float, nsres: float, *, zfactor: float = 1.0,
          percent: bool = False, alg: str = "horn") -> np.ndarray:
    """Slope in degrees (or percent) — GDALSlopeHornAlg /
    GDALSlopeZevenbergenThorneAlg."""
    z = np.asarray(z, np.float64)
    w = _win(z)
    div = 2.0 if alg == "zevenbergen-thorne" else 8.0
    x, y = (_zt if alg == "zevenbergen-thorne" else _horn)(
        w, 1.0 / ewres, 1.0 / nsres)
    key = np.sqrt(x * x + y * y) * (zfactor / div)
    core = 100.0 * key if percent else np.arctan(key) * _DEG
    return _frame(core)


def aspect(z: np.ndarray, *, azimuth: bool = True,
           alg: str = "horn") -> np.ndarray:
    """Aspect (GDALAspectAlg / GDALAspectZevenbergenThorneAlg):
    azimuth degrees by default; flat areas are NaN."""
    z = np.asarray(z, np.float64)
    w = _win(z)
    if alg == "zevenbergen-thorne":
        dx = w[5] - w[3]
        dy = w[7] - w[1]
    else:
        dx = (w[2] + w[5] + w[5] + w[8]) - (w[0] + w[3] + w[3] + w[6])
        dy = (w[6] + w[7] + w[7] + w[8]) - (w[0] + w[1] + w[1] + w[2])
    a = np.arctan2(dy, -dx) * _DEG
    a = a.astype(np.float32).astype(np.float64)  # reference computes in float
    if azimuth:
        a = np.where(a > 90.0, 450.0 - a, 90.0 - a)
    else:
        a = np.where(a < 0, a + 360.0, a)
    a = np.where(a == 360.0, 0.0, a)
    a = np.where((dx == 0) & (dy == 0), np.nan, a)
    return _frame(a)


def tri(z: np.ndarray, *, alg: str = "riley") -> np.ndarray:
    """Terrain Ruggedness Index: Riley (default, sqrt of squared
    diffs) or Wilson (mean abs diff)."""
    z = np.asarray(z, np.float64)
    w = _win(z)
    c = w[4]
    ds = [w[i] - c for i in (0, 1, 2, 3, 5, 6, 7, 8)]
    if alg == "wilson":
        core = sum(np.abs(d) for d in ds) * 0.125
    else:
        core = np.sqrt(sum(d * d for d in ds))
    return _frame(core)


def tpi(z: np.ndarray) -> np.ndarray:
    """Topographic Position Index: center minus mean of neighbors."""
    z = np.asarray(z, np.float64)
    w = _win(z)
    return _frame(w[4] - (w[0] + w[1] + w[2] + w[3] + w[5] + w[6] + w[7] + w[8]) * 0.125)


def roughness(z: np.ndarray) -> np.ndarray:
    """Largest difference between any two cells of the window."""
    z = np.asarray(z, np.float64)
    w = _win(z)
    stack = np.stack(w)
    return _frame(stack.max(axis=0) - stack.min(axis=0))


def color_relief_gdal(z: np.ndarray, levels, colors,
                      mode: str = "linear_interpolation",
                      src_nodata: float | None = None) -> np.ndarray:
    """Faithful gdaldem color-relief (GDALColorReliefGetRGBA,
    apps/gdaldem_lib.cpp:1300-1500): stable-sorted entries, binary-
    search bucket, exact / nearest / linear selection, nextafter guard
    entries around a nodata value present in the table, interpolation
    rounded int(0.5 + a + t*(b-a)) clamped to [0, 255].

    mode: 'linear_interpolation' | 'nearest_color_entry' |
    'exact_color_entry'. Returns (h, w, 3) uint8."""
    z = np.asarray(z, np.float64)
    order = np.argsort(np.asarray(levels, np.float64), kind="stable")
    vals = np.asarray(levels, np.float64)[order]
    cols = np.asarray(colors, np.float64)[order]
    if src_nodata is not None and mode != "exact_color_entry":
        # guard entries on both sides of a table entry equal to nodata
        add_v, add_c = [], []
        for i in range(1, len(vals)):
            if vals[i] == src_nodata:
                nv = np.nextafter(vals[i], -np.inf)
                if nv > vals[i - 1]:
                    add_v.append(nv)
                    add_c.append(cols[i - 1])
            elif vals[i - 1] == src_nodata:
                nv = np.nextafter(vals[i - 1], np.inf)
                if nv < vals[i]:
                    add_v.append(nv)
                    add_c.append(cols[i])
        if add_v:
            vals = np.concatenate([vals, add_v])
            cols = np.vstack([cols, add_c])
            o2 = np.argsort(vals, kind="stable")
            vals = vals[o2]
            cols = cols[o2]
    flat = z.ravel()
    n = len(vals)
    i = np.searchsorted(vals, flat, side="left")
    out = np.zeros((flat.size, 3), np.float64)
    lowc = np.clip(i - 1, 0, n - 1)
    hic = np.clip(i, 0, n - 1)
    exact_lo = vals[lowc] == flat
    exact_hi = vals[hic] == flat
    below = i == 0
    above = i == n
    mid = ~below & ~above
    if mode == "exact_color_entry":
        hit = (mid & (exact_lo | exact_hi)) \
            | (below & (vals[0] == flat)) | (above & (vals[n - 1] == flat))
        out[below & hit] = cols[0]
        out[above & hit] = cols[n - 1]
        m = mid & hit
        out[m] = np.where(exact_lo[m, None], cols[lowc[m]], cols[hic[m]])
        return np.clip(out, 0, 255).astype(np.uint8).reshape(z.shape + (3,))
    out[below] = cols[0]
    out[above] = cols[n - 1]
    m_exlo = mid & exact_lo
    out[m_exlo] = cols[lowc[m_exlo]]
    m_exhi = mid & ~exact_lo & exact_hi
    out[m_exhi] = cols[hic[m_exhi]]
    rest = mid & ~exact_lo & ~exact_hi
    if mode == "nearest_color_entry":
        use_lo = (flat[rest] - vals[lowc[rest]]) < (vals[hic[rest]] - flat[rest])
        out[rest] = np.where(use_lo[:, None], cols[lowc[rest]], cols[hic[rest]])
    else:
        t = ((flat[rest] - vals[lowc[rest]])
             / (vals[hic[rest]] - vals[lowc[rest]]))[:, None]
        out[rest] = np.floor(0.5 + cols[lowc[rest]]
                             + t * (cols[hic[rest]] - cols[lowc[rest]]))
    return np.clip(out, 0, 255).astype(np.uint8).reshape(z.shape + (3,))


def color_relief(z: np.ndarray, levels, colors) -> np.ndarray:
    """gdaldem color-relief with linear interpolation between level
    entries (reference apps/gdaldem_lib.cpp color-relief mode).

    ``levels``: ascending 1-D values; ``colors``: (n, 3) uint8 rows.
    Returns (h, w, 3) uint8."""
    z = np.asarray(z, np.float64)
    levels = np.asarray(levels, np.float64)
    colors = np.asarray(colors, np.float64)
    idx = np.clip(np.searchsorted(levels, z, side="right") - 1, 0, len(levels) - 2)
    lo = levels[idx]
    hi = levels[idx + 1]
    t = np.where(hi > lo, (z - lo) / np.where(hi > lo, hi - lo, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)[..., None]
    out = colors[idx] * (1 - t) + colors[idx + 1] * t
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------
# `gdal raster color-map` step (apps/gdalalg_raster_color_map.cpp):
# expand a single band to RGB(A) through a gdaldem color file or the
# band's own color table (autotest/utilities/
# test_gdalalg_raster_color_map.py published checksums).

_NAMED_COLORS = {
    "white": (255, 255, 255), "black": (0, 0, 0), "red": (255, 0, 0),
    "green": (0, 255, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "magenta": (255, 0, 255), "cyan": (0, 255, 255),
    "aqua": (0, 255, 255), "grey": (128, 128, 128),
    "gray": (128, 128, 128), "orange": (255, 165, 0),
    "brown": (165, 42, 42), "purple": (128, 0, 128),
    "violet": (238, 130, 238), "indigo": (75, 0, 130),
}


def parse_color_file(text: str, band_min: float | None = None,
                     band_max: float | None = None):
    """gdaldem color file -> (levels, colors, alphas).  Supports
    numeric 'elev R G B [A]' rows, single-value grey rows, named
    colors, comma separators, and percentage elevations relative to
    the band range (GDALColorReliefParseColorFile,
    apps/gdaldem_lib.cpp).  'nv' rows return level None; percentage
    rows require band_min/band_max."""
    levels, colors, alphas = [], [], []
    for line in text.splitlines():
        line = line.split("#")[0].strip().replace(",", " ")
        if not line:
            continue
        parts = line.split()
        tok = parts[0].lower()
        if tok == "nv":
            lv = None
        elif tok.endswith("%"):
            if band_min is None or band_max is None:
                raise ValueError(
                    "percentage elevation in color file needs the "
                    "band range (pass band_min/band_max)")
            lv = band_min + (band_max - band_min) * float(tok[:-1]) / 100.0
        else:
            lv = float(tok)
        rest = parts[1:]
        if len(rest) == 1 and rest[0].lower() in _NAMED_COLORS:
            rgb = list(_NAMED_COLORS[rest[0].lower()])
            a = 255
        else:
            nums = [int(float(p)) for p in rest]
            if len(nums) == 1:
                rgb = [nums[0]] * 3
                a = 255
            else:
                rgb = nums[:3]
                a = nums[3] if len(nums) > 3 else 255
        levels.append(lv)
        colors.append(tuple(rgb))
        alphas.append(a)
    return levels, colors, alphas


def color_map(band: np.ndarray, levels, colors, alphas=None,
              color_selection: str = "interpolate",
              add_alpha: bool = False,
              src_nodata: float | None = None) -> np.ndarray:
    """'gdal raster color-map' with a color file: returns (h, w, 3|4)
    uint8.  color_selection: interpolate | exact | nearest (mapped to
    the gdaldem color-relief modes; the alpha channel interpolates
    with the same rule)."""
    mode = {"interpolate": "linear_interpolation",
            "exact": "exact_color_entry",
            "nearest": "nearest_color_entry"}[color_selection]
    keep = [i for i, lv in enumerate(levels) if lv is not None]
    nv = next((i for i, lv in enumerate(levels) if lv is None), None)
    lv = [levels[i] for i in keep]
    co = [colors[i] for i in keep]
    al = [alphas[i] if alphas else 255 for i in keep]
    rgb = color_relief_gdal(band, lv, co, mode, src_nodata=src_nodata)
    a = None
    if add_alpha:
        a = color_relief_gdal(band, lv, [(x, x, x) for x in al], mode,
                              src_nodata=src_nodata)[:, :, 0]
    if nv is not None and src_nodata is not None:
        # the file's 'nv' entry colors nodata pixels (GDALColorRelief
        # nv semantics)
        mask = (np.asarray(band, np.float64) == src_nodata)
        if mask.any():
            rgb = rgb.copy()
            rgb[mask] = np.asarray(colors[nv], np.uint8)
            if a is not None:
                a = a.copy()
                a[mask] = np.uint8(alphas[nv] if alphas else 255)
    if not add_alpha:
        return rgb
    return np.dstack([rgb, a])


def color_map_from_table(idx: np.ndarray, palette: np.ndarray,
                         add_alpha: bool = False) -> np.ndarray:
    """'gdal raster color-map' without a color file: expand the
    band's color table (gdal_translate -expand rgb/rgba semantics).
    palette: (n, 3|4) uint8; indices beyond the table map to 0."""
    pal = np.asarray(palette, np.uint8)
    if pal.shape[1] == 3:
        pal = np.c_[pal, np.full(len(pal), 255, np.uint8)]
    safe = np.clip(idx, 0, len(pal) - 1)
    out = pal[safe]
    out[(idx >= len(pal)) | (idx < 0)] = 0
    return out[:, :, :4] if add_alpha else out[:, :, :3]
