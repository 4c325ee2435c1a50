"""Viewshed generation (gdal raster viewshed / GDALViewshedGenerate).

Re-derivation of the reference's line-of-sight algorithm
(/root/reference/alg/viewshed/viewshed_executor.cpp — Wang, Robinson &
White style wavefront): the DEM is scanned outward from the observer;
each cell's minimum observable height dfZ is interpolated from the
already-computed observable heights of its neighbors toward the
observer, then the cell's own (curvature- and observer-adjusted)
height is folded in with max() before the wavefront moves on.

Height interpolation per alg/viewshed/viewshed_executor.cpp:50-108:
  on-axis / exact diagonal:  CalcHeightLine  Z(d) = Z(d-1) * d/(d-1)
  edge mode (default):       CalcHeightEdge  plane through origin and
                             the two previous-line cells
  diagonal mode:             CalcHeightDiagonal
  min/max:                   min/max of the two
Output per setOutput (viewshed_executor.cpp:180-193):
  normal:  visible iff adjusted_height + target_height >= dfZ
  dem:     max(0, raw + dfZ - adjusted)   (= observable absolute height)
  ground:  max(0, dfZ - adjusted)         (= required height above ground)
Curvature adjustment (viewshed_executor.cpp:150-173,239-330):
  adjusted = raw - curve_coeff/(2*semimajor) * R2 - z_observer,
with R2 the georeferenced squared distance via the geotransform.
Max-distance output cropping transcribes Viewshed::calcExtents
(alg/viewshed/viewshed.cpp:291-345) including its asymmetric-epsilon
row behavior. Cumulative mode (alg/viewshed/cumulative.cpp): observers
on a `spacing` grid, visible=1 rasters summed, scaled to 0..255 by
floor(255/max * v).

Angle masking (start/end compass angles, normalizeAngle + the
maskAngleLeft/Right/maskInitial fills and the shrinkWindowForAngles
output crop, alg/viewshed/util.cpp:25-183, viewshed.cpp:228-280) and
pitch masking (low pitch raises the observable plane inside the
wavefront, high pitch marks cells above the plane out-of-range,
viewshed_executor.cpp:989-1024) are implemented; the one remaining
fence is an observer outside the raster (raises).

Everything is vectorized: axis scans are running maxima of A(d)/d,
the quadrant interiors advance one anti-diagonal per step (numpy
gathers), so work is O(cells) with O(width+height) numpy calls.
"""

from __future__ import annotations

import numpy as np

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _calc_extents(W: int, H: int, ox: int, oy: int, gt, max_distance: float):
    """Transcription of Viewshed::calcExtents (viewshed.cpp:291-345):
    output window from the max-distance box (scaling-only transform
    assumption, same as the reference), incl. the reference's
    asymmetric +-1 row adjustment for the inverse-gt sign."""
    if max_distance <= 0:
        return 0, W, 0, H
    eps = 1e-8
    inv1 = 1.0 / gt[1]
    inv5 = 1.0 / gt[5]
    x_start = int(np.floor(ox - abs(inv1) * max_distance + eps))
    x_stop = int(np.ceil(ox + abs(inv1) * max_distance - eps) + 1)
    y_start = int(np.floor(oy - abs(inv5) * max_distance + eps)) - (
        1 if inv5 > 0 else 0)
    y_stop = int(np.ceil(oy + abs(inv5) * max_distance - eps)) + (
        1 if inv5 < 0 else 0)
    x_start = max(0, x_start)
    y_start = max(0, y_start)
    x_stop = min(W, x_stop)
    y_stop = min(H, y_stop)
    if x_start >= x_stop or y_start >= y_stop:
        raise ValueError("max_distance window does not intersect the raster")
    return x_start, x_stop, y_start, y_stop


def _axis_scan(a_line: np.ndarray, low_c: float = -np.inf,
               raise_first: bool = True) -> np.ndarray:
    """Observable-height scan along a ray from the observer.

    a_line[k] is the adjusted height at distance k+1 from the observer.
    CalcHeightLine's recurrence Z(d) = max(A(d), Z(d-1)*d/(d-1)) with
    Z(1) = A(1) is, in W(d) = Z(d)/d form, a running maximum of A(d)/d.
    ``low_c`` is the low-pitch plane slope per unit step
    (step_dist * tan(low_pitch)); maskLowPitch raises dfZ to
    d*low_c before the max fold, which in W form is a floor at low_c.
    Returns dfZ (the raised, pre-max minimum observable height).
    """
    n = a_line.size
    if n == 0:
        return a_line
    d = np.arange(1, n + 1, dtype=np.float64)
    f = np.maximum(a_line / d, low_c)
    if not raise_first:
        # normal mode skips maskLowPitch on the observer-adjacent scan
        # cell (viewshed_executor.cpp:434-445 Normal branch)
        f[0] = a_line[0]
    w = np.maximum.accumulate(f)
    dfz = np.empty(n, np.float64)
    dfz[0] = a_line[0] if not raise_first else max(a_line[0], low_c)
    dfz[1:] = np.maximum(w[:-1], low_c) * d[1:]
    return dfz


_CELL_MODES = ("edge", "diagonal", "min", "max")

_PI = np.pi


def _eq(a: float, b: float) -> bool:
    return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))


def normalize_angle(deg: float) -> float:
    """Compass degrees (clockwise, 0 = north) -> math radians
    (counterclockwise, 0 = east); util.cpp:25-31."""
    a = 90.0 - deg
    if a < 0:
        a += 360.0
    return a * (_PI / 180.0)


def _ray_between(start: float, end: float, test: float) -> bool:
    """Is `test` in the clockwise slice [start, end]? util.cpp:174-183."""
    start, end = end, start
    if start < end:
        return start <= test <= end
    if start > end:
        return test >= start or test <= end
    return False


def _h_float(angle, nX, nY, y):
    """horizontalIntersect (util.cpp:40-61): X where the ray crosses
    line Y=y, or None."""
    if nY == y:
        return float(nX)
    if nY > y:
        if _eq(angle, _PI / 2):
            return float(nX)
        if 0 < angle < _PI:
            return nX + (nY - y) / np.tan(angle)
        return None
    if _eq(angle, 3 * _PI / 2):
        return float(nX)
    if angle > _PI:
        return nX - (y - nY) / np.tan(angle)
    return None


def _v_float(angle, nX, nY, x):
    """verticalIntersect (util.cpp:108-130)."""
    if nX == x:
        return float(nY)
    if nX < x:
        if _eq(angle, 0):
            return float(nY)
        if angle < _PI / 2 or angle > 3 * _PI / 2:
            return nY + (nX - x) * np.tan(angle)
        return None
    if _eq(angle, _PI):
        return float(nY)
    if _PI / 2 < angle < 3 * _PI / 2:
        return nY - (x - nX) * np.tan(angle)
    return None


def _h_isect(angle, nX, nY, y):
    x = _h_float(angle, nX, nY, y)
    return None if x is None else int(np.round(x))


def _v_isect(angle, nX, nY, x):
    y = _v_float(angle, nX, nY, x)
    return None if y is None else int(np.round(y))


def _h_isect_win(angle, nX, nY, x0, x1, y0, y1):
    """hIntersect window variant (util.cpp:88-98)."""
    if _eq(angle, _PI):
        return x0
    if _eq(angle, 0):
        return x1
    x = _h_float(angle, nX, nY, y0)
    if x is None:
        x = _h_float(angle, nX, nY, y1)
    return int(np.clip(int(np.round(x)), x0, x1))


def _v_isect_win(angle, nX, nY, x0, x1, y0, y1):
    """vIntersect window variant (util.cpp:156-166)."""
    if _eq(angle, _PI / 2):
        return y0
    if _eq(angle, 3 * _PI / 2):
        return y1
    y = _v_float(angle, nX, nY, x0)
    if y is None:
        y = _v_float(angle, nX, nY, x1)
    return int(np.clip(int(np.round(y)), y0, y1))


def _shrink_window_for_angles(x0, x1, y0, y1, nX, nY, start, end):
    """shrinkWindowForAngles (viewshed.cpp:228-280)."""
    sX = _h_isect_win(start, nX, nY, x0, x1, y0, y1)
    eX = _h_isect_win(end, nX, nY, x0, x1, y0, y1)
    if not _ray_between(start, end, 0):
        x1 = min(x1, max(nX, sX, eX) + 1)
    if not _ray_between(start, end, _PI):
        x0 = max(x0, min(nX, sX, eX))
    sY = _v_isect_win(start, nX, nY, x0, x1, y0, y1)
    eY = _v_isect_win(end, nX, nY, x0, x1, y0, y1)
    if not _ray_between(start, end, _PI / 2):
        y0 = max(y0, min(nY, sY, eY))
    if not _ray_between(start, end, 3 * _PI / 2):
        y1 = min(y1, max(nY, sY, eY) + 1)
    if x0 >= x1 or y0 >= y1:
        raise ValueError("angle window does not intersect the raster")
    return x0, x1, y0, y1


def _test_angles(w, h, ox, oy):
    """calcTestAngles (viewshed_executor.cpp:897-931): one ray inside
    each quadrant for the all-outside-the-slice test."""
    t = {}
    t[1] = np.arctan2(oy + 1, (w - ox) / 2.0)
    t[2] = np.arctan2(oy + 1, -(ox + 1) / 2.0)
    t[3] = np.arctan2(-(h - oy), -(ox + 1) / 2.0)
    t[4] = np.arctan2(-(h - oy), (w - ox) / 2.0)
    return {k: (v + 2 * _PI if v < 0 else v) for k, v in t.items()}


def _apply_angle_masks(out, ox, oy, start, end, oor) -> None:
    """maskAngleLeft/Right + maskInitial per line
    (viewshed_executor.cpp:468-575,815-840)."""
    h, w = out.shape
    ta = _test_angles(w, h, ox, oy)
    for line in range(h):
        row = out[line]
        # ---- left of the observer
        def clamp_l(x):
            return None if (x is None or x < 0 or x >= ox) else x
        if line != oy:
            sX = clamp_l(_h_isect(start, ox, oy, line))
            eX = clamp_l(_h_isect(end, ox, oy, line))
            if sX is None and eX is None:
                test = ta[2] if line < oy else ta[3]
                if not _ray_between(start, end, test):
                    row[:ox] = oor
            else:
                if line > oy:
                    sX, eX = eX, sX
                sX = 0 if sX is None else sX
                eX = ox - 1 if eX is None else eX
                if sX <= eX:
                    row[:sX] = oor
                    row[eX + 1:ox] = oor
                else:
                    row[eX + 1:sX] = oor
        elif not _ray_between(start, end, _PI):
            row[:ox] = oor
        # ---- right of the observer
        def clamp_r(x):
            return None if (x is None or x <= ox or x >= w) else x
        if line != oy:
            sX = clamp_r(_h_isect(start, ox, oy, line))
            eX = clamp_r(_h_isect(end, ox, oy, line))
            if sX is None and eX is None:
                test = ta[1] if line < oy else ta[4]
                if not _ray_between(start, end, test):
                    row[ox + 1:] = oor
            else:
                if line > oy:
                    sX, eX = eX, sX
                eX = w - 1 if eX is None else eX
                sX = ox + 1 if sX is None else sX
                if sX <= eX:
                    row[ox + 1:sX] = oor
                    row[eX + 1:] = oor
                else:
                    row[eX + 1:sX] = oor
        elif not _ray_between(start, end, 0):
            row[ox + 1:] = oor
        # ---- the observer column (maskInitial)
        if line < oy and not _ray_between(start, end, _PI / 2):
            row[ox] = oor
        elif line > oy and not _ray_between(start, end, 3 * _PI / 2):
            row[ox] = oor


def _quadrant(A: np.ndarray, D: np.ndarray, z_axis_x: np.ndarray,
              z_axis_y: np.ndarray, oy: int, ox: int, sy: int, sx: int,
              cell_mode: str, Zmask: np.ndarray | None = None) -> None:
    """Fill D (min observable height) for one open quadrant.

    Wavefront over anti-diagonals i+j = d: every cell (i, j) (offsets
    from the observer, i = x-dominant axis) depends only on
    (i-1, j), (i, j-1), (i-1, j-1) — all on earlier diagonals — so each
    step is one vectorized gather (viewshed_executor.cpp processes the
    same dependencies line-by-line with a sequential inner loop).
    z_axis_x / z_axis_y are the already-max-folded observable heights
    along the two bounding half-axes (index = distance, [0] = observer).
    """
    H, W = A.shape
    ni = (W - 1 - ox) if sx > 0 else ox
    nj = (H - 1 - oy) if sy > 0 else oy
    if ni < 1 or nj < 1:
        return
    xs = ox + sx * np.arange(ni + 1)
    ys = oy + sy * np.arange(nj + 1)
    Aq = A[np.ix_(ys, xs)]  # [j, i]
    Mq = Zmask[np.ix_(ys, xs)] if Zmask is not None else None
    Zq = np.empty_like(Aq)
    Zq[0, :] = z_axis_x[: ni + 1]
    Zq[:, 0] = z_axis_y[: nj + 1]
    Dq = np.empty_like(Aq)
    for d in range(2, ni + nj + 1):
        i0 = max(1, d - nj)
        i1 = min(ni, d - 1)
        if i0 > i1:
            continue
        i = np.arange(i0, i1 + 1)
        j = d - i
        za = Zq[j - 1, i - 1]  # observable at (i-1, j-1)
        zt = Zq[j, i - 1]      # observable at (i-1, j)   (dfThisPrev)
        zl = Zq[j - 1, i]      # observable at (i,   j-1) (dfLast)
        dfz = np.empty(i.size, np.float64)
        diag = i == j
        if diag.any():
            if d == 2:  # i == j == 1: adjacent diagonal, dfZ = own height
                dfz[diag] = Aq[1, 1]
            else:
                dfz[diag] = za[diag] * (d / 2) / (d / 2 - 1)
        nd = ~diag
        if nd.any():
            iN = i[nd].astype(np.float64)
            jN = j[nd].astype(np.float64)
            if cell_mode != "diagonal":
                xdom = iN > jN
                edge = np.where(
                    xdom,
                    (za[nd] * jN + zt[nd] * (iN - jN)) / np.where(xdom, iN - 1, 1),
                    (za[nd] * iN + zl[nd] * (jN - iN)) / np.where(xdom, 1, jN - 1),
                )
            if cell_mode != "edge":
                diag_v = (zt[nd] * iN + zl[nd] * jN) / (iN + jN - 1)
            if cell_mode == "edge":
                dfz[nd] = edge
            elif cell_mode == "diagonal":
                dfz[nd] = diag_v
            elif cell_mode == "min":
                dfz[nd] = np.minimum(edge, diag_v)
            else:
                dfz[nd] = np.maximum(edge, diag_v)
        if Mq is not None:  # maskLowPitch before setOutput
            dfz = np.maximum(dfz, Mq[j, i])
        Dq[j, i] = dfz
        Zq[j, i] = np.maximum(Aq[j, i], dfz)
    D[np.ix_(ys[1:], xs[1:])] = Dq[1:, 1:]


def viewshed(dem: np.ndarray, observer_x: int, observer_y: int, *,
             observer_z: float = 0.0, target_height: float = 0.0,
             visible_val: float = 255.0, invisible_val: float = 0.0,
             out_of_range_val: float = 0.0, min_distance: float = 0.0,
             max_distance: float = 0.0, curve_coeff: float = 0.85714,
             semimajor: float = 0.0, gt=IDENTITY_GT, mode: str = "normal",
             cell_mode: str = "edge",
             start_angle: float | None = None, end_angle: float | None = None,
             low_pitch: float | None = None, high_pitch: float | None = None,
             ) -> tuple[np.ndarray, int, int]:
    """Single-observer viewshed. Returns (out, x_off, y_off) where out
    is float64 over the (possibly max-distance-cropped) window and
    x_off/y_off locate it in the input raster.

    semimajor=0 disables the curvature adjustment (matching the
    reference when the destination has no SRS, viewshed_executor.cpp
    calcHeightAdjFactor); pass 6378137.0 for WGS84 ground units.
    """
    if (start_angle is None) != (end_angle is None):
        raise ValueError("start_angle and end_angle go together")
    angles = None
    if start_angle is not None and start_angle != end_angle:
        angles = (normalize_angle(start_angle), normalize_angle(end_angle))
    if mode not in ("normal", "dem", "ground"):
        raise ValueError(f"unknown viewshed mode {mode!r}")
    if cell_mode not in _CELL_MODES:
        raise ValueError(f"unknown cell mode {cell_mode!r}")
    dem = np.asarray(dem, np.float64)
    H, W = dem.shape
    if not (0 <= observer_x < W and 0 <= observer_y < H):
        raise NotImplementedError(
            "observer outside the raster is not supported")

    x0, x1, y0, y1 = _calc_extents(W, H, observer_x, observer_y, gt,
                                   max_distance)
    if angles is not None:
        x0, x1, y0, y1 = _shrink_window_for_angles(
            x0, x1, y0, y1, observer_x, observer_y, *angles)
    raw = dem[y0:y1, x0:x1]
    ox = observer_x - x0
    oy = observer_y - y0
    h, w = raw.shape

    # georeferenced squared distance per cell (offsets through the gt)
    dx = np.arange(w) - ox
    dy = np.arange(h)[:, None] - oy
    gx = gt[1] * dx + gt[2] * dy
    gy = gt[4] * dx + gt[5] * dy
    r2 = gx * gx + gy * gy

    z_obs = observer_z + dem[observer_y, observer_x]
    adj = curve_coeff / (2.0 * semimajor) if semimajor else 0.0
    A = raw - adj * r2 - z_obs

    # pitch planes (viewshed_executor.cpp:140-143,989-1024)
    tan_low = np.tan(np.radians(low_pitch)) if (
        low_pitch is not None and low_pitch != -90.0) else None
    tan_high = np.tan(np.radians(high_pitch)) if (
        high_pitch is not None and high_pitch != 90.0) else None
    dist = np.sqrt(r2) if (tan_low is not None or tan_high is not None) \
        else None
    Zmask = dist * tan_low if tan_low is not None else None
    x_step = float(np.hypot(gt[1], gt[4]))
    y_step = float(np.hypot(gt[2], gt[5]))
    low_cx = x_step * tan_low if tan_low is not None else -np.inf
    low_cy = y_step * tan_low if tan_low is not None else -np.inf
    # normal mode skips the low raise on the two observer-adjacent
    # horizontal cells (they're force-marked visible)
    raise_first = mode != "normal"

    # minimum observable height per cell (adjusted frame)
    D = np.empty((h, w), np.float64)
    D[oy, ox] = A[oy, ox]  # placeholder; the observer cell is set below
    # half-axes: dfZ via running max, then Z = max(A, dfZ) for reuse
    z_right = np.concatenate(([A[oy, ox]], np.maximum(
        A[oy, ox + 1:], d_r := _axis_scan(A[oy, ox + 1:], low_cx,
                                          raise_first))))
    z_left = np.concatenate(([A[oy, ox]], np.maximum(
        A[oy, :ox][::-1], d_l := _axis_scan(A[oy, :ox][::-1], low_cx,
                                            raise_first))))
    z_down = np.concatenate(([A[oy, ox]], np.maximum(
        A[oy + 1:, ox], d_d := _axis_scan(A[oy + 1:, ox], low_cy))))
    z_up = np.concatenate(([A[oy, ox]], np.maximum(
        A[:oy, ox][::-1], d_u := _axis_scan(A[:oy, ox][::-1], low_cy))))
    D[oy, ox + 1:] = d_r
    D[oy, :ox] = d_l[::-1]
    D[oy + 1:, ox] = d_d
    D[:oy, ox] = d_u[::-1]
    for sy, zy in ((1, z_down), (-1, z_up)):
        for sx, zx in ((1, z_right), (-1, z_left)):
            _quadrant(A, D, zx, zy, oy, ox, sy, sx, cell_mode, Zmask)

    if mode == "normal":
        out = np.where(A + target_height < D, invisible_val, visible_val)
        out[oy, ox] = visible_val
        # the two horizontal observer neighbors are marked visible
        # unconditionally (processFirstLineLeft/Right)
        if ox + 1 < w:
            out[oy, ox + 1] = visible_val
        if ox >= 1:
            out[oy, ox - 1] = visible_val
    elif mode == "dem":
        out = np.maximum(0.0, raw + (D - A))
        out[oy, ox] = raw[oy, ox]
    else:  # ground
        out = np.maximum(0.0, D - A)
        out[oy, ox] = 0.0

    if tan_high is not None:
        # maskHighPitch: cells whose observable height exceeds the
        # high-pitch plane go out of range (the observer cell exempt)
        hp = dist * tan_high < D
        hp[oy, ox] = False
        out[hp] = out_of_range_val

    if min_distance > 0 or max_distance > 0:
        oor = np.zeros((h, w), bool)
        if min_distance > 0:
            oor |= r2 < min_distance * min_distance
        if max_distance > 0:
            oor |= r2 > max_distance * max_distance
        out[oor] = out_of_range_val

    if angles is not None:
        _apply_angle_masks(out, ox, oy, angles[0], angles[1],
                           out_of_range_val)
    return out, x0, y0


def cumulative_observers(W: int, H: int, spacing: int) -> list[tuple[int, int]]:
    """Observer grid of cumulative mode (cumulative.cpp:66-67)."""
    return [(x, y) for x in range(0, W, spacing) for y in range(0, H, spacing)]


def cumulative_scale(acc: np.ndarray) -> np.ndarray:
    """Spread the observability counts over 8 bits
    (Cumulative::scaleOutput, cumulative.cpp:200-213)."""
    m = int(acc.max())
    if m == 0:
        return acc.astype(np.uint8)
    return np.floor((255.0 / m) * acc).astype(np.uint8)


def cumulative_viewshed(dem: np.ndarray, spacing: int, *,
                        observer_z: float = 0.0, gt=IDENTITY_GT,
                        curve_coeff: float = 0.85714, semimajor: float = 0.0,
                        ) -> np.ndarray:
    """Single-process cumulative viewshed (the distributed version fans
    the observer grid out through map_batches — see
    pipelines/raster.py:q_viewshed_cumulative)."""
    H, W = dem.shape
    acc = np.zeros((H, W), np.uint32)
    for x, y in cumulative_observers(W, H, spacing):
        out, _, _ = viewshed(dem, x, y, observer_z=observer_z, gt=gt,
                             visible_val=1.0, invisible_val=0.0,
                             curve_coeff=curve_coeff, semimajor=semimajor)
        acc += out.astype(np.uint32)
    return cumulative_scale(acc)


def line_of_sight(dem, xa, ya, za, xb, yb, zb):
    """GDALIsLineOfSightVisible (alg/los.cpp): Bresenham walk from
    (xa,ya) to (xb,yb) over the DEM, z linearly interpolated along
    the dominant axis; returns (visible, x_intersection,
    y_intersection) with -1/-1 when clear.  Out-of-bounds endpoints
    raise (the reference surfaces the RasterIO window error)."""
    import numpy as np

    dem = np.asarray(dem)
    h, w = dem.shape

    def above(x, y, z):
        if not (0 <= x < w and 0 <= y < h):
            raise IndexError("Access window out of range")
        return z > dem[y, x]

    if not above(xa, ya, za):
        return False, xa, ya
    if not above(xb, yb, zb):
        return False, xb, yb
    if xa == xb and ya == yb:
        return True, -1, -1

    def z_from_x(x):
        r = (x - xa) / (xb - xa)
        return za + (zb - za) * r

    def z_from_y(y):
        r = (y - ya) / (yb - ya)
        return za + (zb - za) * r

    if xa == xb:
        step = 1 if yb >= ya else -1
        for y in range(ya, yb + step, step):
            if not above(xa, y, z_from_y(y)):
                return False, xa, y
        return True, -1, -1
    if ya == yb:
        step = 1 if xb >= xa else -1
        for x in range(xa, xb + step, step):
            if not above(x, ya, z_from_x(x)):
                return False, x, ya
        return True, -1, -1

    # general Bresenham (los.cpp Bresenham2D)
    dx = abs(xb - xa)
    incx = 1 if xb >= xa else -1
    dy = abs(yb - ya)
    incy = 1 if yb >= ya else -1
    x, y = xa, ya
    if dx >= dy:
        err = dx / 2
        for _ in range(dx + 1):
            if not above(x, y, z_from_x(x)):
                return False, x, y
            err -= dy
            if err < 0:
                y += incy
                err += dx
            x += incx
    else:
        err = dy / 2
        for _ in range(dy + 1):
            if not above(x, y, z_from_y(y)):
                return False, x, y
            err -= dx
            if err < 0:
                x += incx
                err += dy
            y += incy
    return True, -1, -1
