"""ogrlineref linear referencing (apps/ogrlineref.cpp).

Re-derivation of the reference utility's four operations over plain
(n, 2) float64 polylines:

- ``create_parts``    — apps/ogrlineref.cpp:421 CreatePartsFromLineString:
  snap milestones (repers) onto the path (10 m / 8.983e-5 deg
  tolerance), reverse the path if repers run backwards, cut
  reper-to-reper sublines, extend to the path ends with UTM-measured
  positions for geographic paths (zone from the half-length point,
  EPSG 32600+zone semantics), then re-cut at regular ``step``
  pickets interpolated inside each subline by its scale factor.
- ``get_position``    — :980 GetPosition: nearest part by point-to-line
  distance, GEOS Project along it, ref = beg + dist / scale.
- ``get_coordinates`` — :1050 GetCoordinates: part with
  beg < pos < end, Value((pos-beg)*scale).
- ``create_subline``  — :260 CreateSubline: parts overlapping
  [beg, end] rounded to the part step, clipped and concatenated.

Polyline primitives mirror ogr/ogrlinestring.cpp: ``value_at``
(:2131 Value), ``sub_line`` (:2250 getSubLine), ``project``
(GEOS-style locate-along), all vectorized numpy.
"""

from __future__ import annotations

import math

import numpy as np

# apps/ogrlineref.cpp:31-37
FIELD_START = "beg"
FIELD_FINISH = "end"
FIELD_SCALE_FACTOR = "scale"
DELTA = 0.00000001
TOLERANCE_DEGREE = 0.00008983153
TOLERANCE_METER = 10.0


# ------------------------------------------------------------------ primitives
def line_length(c: np.ndarray) -> float:
    d = np.diff(c, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def _seg_geometry(c: np.ndarray):
    d = np.diff(c, axis=0)
    seg = np.hypot(d[:, 0], d[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    return d, seg, cum


def project(c: np.ndarray, x: float, y: float) -> float:
    """GEOS Project: distance along ``c`` of the closest point to
    (x, y). Endpoint short-circuits per apps/ogrlineref.cpp:401."""
    if x == c[0, 0] and y == c[0, 1]:
        return 0.0
    if x == c[-1, 0] and y == c[-1, 1]:
        return line_length(c)
    d, seg, cum = _seg_geometry(c)
    px = x - c[:-1, 0]
    py = y - c[:-1, 1]
    seg2 = np.where(seg > 0, seg * seg, 1.0)
    t = np.clip((px * d[:, 0] + py * d[:, 1]) / seg2, 0.0, 1.0)
    cx = c[:-1, 0] + t * d[:, 0]
    cy = c[:-1, 1] + t * d[:, 1]
    dist2 = (x - cx) ** 2 + (y - cy) ** 2
    i = int(np.argmin(dist2))
    return float(cum[i] + t[i] * seg[i])


def point_line_distance(c: np.ndarray, x: float, y: float) -> float:
    d, seg, _cum = _seg_geometry(c)
    px = x - c[:-1, 0]
    py = y - c[:-1, 1]
    seg2 = np.where(seg > 0, seg * seg, 1.0)
    t = np.clip((px * d[:, 0] + py * d[:, 1]) / seg2, 0.0, 1.0)
    cx = c[:-1, 0] + t * d[:, 0]
    cy = c[:-1, 1] + t * d[:, 1]
    return float(np.sqrt(((x - cx) ** 2 + (y - cy) ** 2).min()))


def value_at(c: np.ndarray, dist: float) -> tuple[float, float]:
    """ogr/ogrlinestring.cpp:2131 OGRSimpleCurve::Value."""
    if dist < 0:
        return float(c[0, 0]), float(c[0, 1])
    _d, seg, cum = _seg_geometry(c)
    for i in range(len(seg)):
        if seg[i] > 0 and cum[i] <= dist <= cum[i] + seg[i]:
            r = (dist - cum[i]) / seg[i]
            return (float(c[i, 0] * (1 - r) + c[i + 1, 0] * r),
                    float(c[i, 1] * (1 - r) + c[i + 1, 1] * r))
    return float(c[-1, 0]), float(c[-1, 1])


def sub_line(c: np.ndarray, d_from: float, d_to: float) -> np.ndarray | None:
    """ogr/ogrlinestring.cpp:2250 getSubLine (bAsRatio=FALSE)."""
    total = line_length(c)
    d_from = max(d_from, 0.0)
    d_to = min(d_to, total)
    if d_from > d_to or d_from >= total:
        return None
    pts: list[tuple[float, float]] = []
    _d, seg, cum = _seg_geometry(c)
    i = 0
    if d_from == 0:
        pts.append((float(c[0, 0]), float(c[0, 1])))
    else:
        length = 0.0
        for i in range(len(seg)):
            if seg[i] <= 0:
                continue
            if length <= d_from <= length + seg[i]:
                r = (d_from - length) / seg[i]
                pts.append((float(c[i, 0] * (1 - r) + c[i + 1, 0] * r),
                            float(c[i, 1] * (1 - r) + c[i + 1, 1] * r)))
                if length <= d_to <= length + seg[i]:
                    r = (d_to - length) / seg[i]
                    pts.append((float(c[i, 0] * (1 - r) + c[i + 1, 0] * r),
                                float(c[i, 1] * (1 - r) + c[i + 1, 1] * r)))
                    if len(pts) < 2:
                        return None
                    return np.array(pts)
                i += 1
                break
            length += seg[i]
        else:
            i = len(seg)
    length = float(cum[i])
    n = len(c)
    while i < n - 1:
        pts.append((float(c[i, 0]), float(c[i, 1])))
        if seg[i] > 0:
            if length <= d_to <= length + seg[i]:
                r = (d_to - length) / seg[i]
                pts.append((float(c[i, 0] * (1 - r) + c[i + 1, 0] * r),
                            float(c[i, 1] * (1 - r) + c[i + 1, 1] * r)))
                return np.array(pts)
            length += seg[i]
        i += 1
    pts.append((float(c[-1, 0]), float(c[-1, 1])))
    if len(pts) < 2:
        return None
    return np.array(pts)


def _utm_length(c: np.ndarray) -> float:
    """Geographic part length measured in the UTM zone of its
    half-length point (apps/ogrlineref.cpp:552-585)."""
    from gdal_ray.functions.crs import lonlat_to_utm

    mx, my = value_at(c, line_length(c) / 2)
    zone = int(30 + (mx + 3.0) / 6.0 + 0.5)
    south = my <= 0
    e, n = lonlat_to_utm(c[:, 0], c[:, 1], zone, south=south)
    return line_length(np.column_stack([e, n]))


# ------------------------------------------------------------------ operations
def create_parts(path: np.ndarray, repers: list[tuple[float, float, float]],
                 step: float, geographic: bool) -> list[dict]:
    """CreatePartsFromLineString (apps/ogrlineref.cpp:421). ``repers``
    are (m-value, x, y). Returns parts as dicts with keys
    coords/beg/end/scale, in creation (= position) order."""
    tol = TOLERANCE_DEGREE if geographic else TOLERANCE_METER
    path = np.asarray(path, np.float64)

    snapped: dict[float, tuple[float, float]] = {}
    for pos, x, y in repers:
        if project(path, x, y) < 0:
            continue
        if point_line_distance(path, x, y) < tol:
            snapped[pos] = (x, y)
    if len(snapped) < 2:
        raise ValueError("Not enough repers to proceed.")

    keys = sorted(snapped)
    p1, p2 = snapped[keys[0]], snapped[keys[1]]
    d1 = project(path, *p1)
    d2 = project(path, *p2)
    if d1 > d2:  # path opposite the repers direction -> reverse
        path = path[::-1].copy()
        d1 = project(path, *p1)
        d2 = project(path, *p2)

    sublines: list[dict] = []  # CURVE_DATA: coords, beg, end, factor
    position = keys[0]
    begin_position = keys[0]
    pt_beg = pt_end = None
    pt_beg_pos = pt_end_pos = 0.0

    if d1 > DELTA:  # lead-in part from path start to the first reper
        part = sub_line(path, 0, d1)
        if part is not None:
            ln = _utm_length(part) if geographic else line_length(part)
            sublines.append({"coords": part, "beg": position - ln,
                             "end": position,
                             "factor": line_length(part) / ln})
            pt_beg = (float(part[0, 0]), float(part[0, 1]))
            pt_beg_pos = position - ln

    it = 1
    if d2 - d1 > DELTA:
        part = sub_line(path, d1, d2)
        if part is not None:
            sublines.append({"coords": part, "beg": position, "end": keys[1],
                             "factor": line_length(part) / (keys[1] - position)})

    dist1 = d2
    position = keys[1]
    it = 2
    end_position = 0.0
    while it < len(keys):
        end_position = keys[it]
        dist2 = project(path, *snapped[keys[it]])
        if dist2 - dist1 > DELTA:
            part = sub_line(path, dist1, dist2)
            if part is not None:
                sublines.append({"coords": part, "beg": position,
                                 "end": keys[it],
                                 "factor": line_length(part) / (keys[it] - position)})
                dist1 = dist2
                position = keys[it]
        it += 1

    total = line_length(path)
    if total - dist1 > DELTA:  # tail part to the path end
        part = sub_line(path, dist1, total)
        if part is not None:
            ln = _utm_length(part) if geographic else line_length(part)
            sublines.append({"coords": part, "beg": position,
                             "end": position + ln,
                             "factor": line_length(part) / ln})
            pt_end = (float(part[-1, 0]), float(part[-1, 1]))
            pt_end_pos = position + ln

    # --- pickets at regular step ------------------------------------
    round_beg = (math.ceil(pt_beg_pos / step) * step if pt_beg is not None
                 else math.ceil(begin_position / step) * step)
    if pt_end is not None:
        end_position = pt_end_pos

    pickets: dict[float, tuple[float, float]] = {}
    if pt_beg is not None:
        pickets[pt_beg_pos] = pt_beg
    if pt_end is not None:
        pickets[pt_end_pos] = pt_end
    dist = round_beg
    while dist <= end_position:
        for sl in sublines:
            if sl["beg"] - DELTA <= dist <= sl["end"] + DELTA:
                real = (dist - sl["beg"]) * sl["factor"]
                pickets[dist] = value_at(sl["coords"], real)
                break
        dist += step

    # --- final parts between consecutive pickets ----------------------
    parts: list[dict] = []
    pk = sorted(pickets)
    dist1 = 0.0
    position = pk[0]
    for m in pk:
        dist2 = project(path, *pickets[m])
        if dist2 - dist1 > DELTA:
            part = sub_line(path, dist1, dist2)
            if part is not None:
                parts.append({"coords": part, FIELD_START: position,
                              FIELD_FINISH: m,
                              FIELD_SCALE_FACTOR: line_length(part) / (m - position)})
                dist1 = dist2
                position = m
    return parts


def get_position(parts: list[dict], x: float, y: float) -> float:
    """GetPosition (apps/ogrlineref.cpp:980)."""
    best = None
    best_d = math.inf
    for p in parts:
        d = point_line_distance(p["coords"], x, y)
        if d < best_d:
            best_d = d
            best = p
    if best is None:
        raise ValueError("Failed to find closest part.")
    real = project(best["coords"], x, y)
    return best[FIELD_START] + real / best[FIELD_SCALE_FACTOR]


def get_coordinates(parts: list[dict], pos: float) -> tuple[float, float, float]:
    """GetCoordinates (apps/ogrlineref.cpp:1050): beg < pos < end."""
    for p in parts:
        if p[FIELD_START] < pos < p[FIELD_FINISH]:
            corr = (pos - p[FIELD_START]) * p[FIELD_SCALE_FACTOR]
            x, y = value_at(p["coords"], corr)
            return x, y, 0.0
    raise ValueError(f"Get coordinates for position {pos} failed.")


def create_subline(parts: list[dict], pos_beg: float, pos_end: float) -> np.ndarray:
    """CreateSubline (apps/ogrlineref.cpp:260)."""
    if len(parts) < 2:
        raise ValueError("Get step failed")
    step = parts[1][FIELD_FINISH] - parts[1][FIELD_START]
    lo = math.floor(pos_beg / step) * step
    hi = math.ceil(pos_end / step) * step
    sel = sorted((p[FIELD_START], p) for p in parts
                 if p[FIELD_START] >= lo and p[FIELD_FINISH] <= hi)
    if not sel:
        raise ValueError("Get parts failed")
    if len(sel) == 1:
        start, p = sel[0]
        sf = p[FIELD_SCALE_FACTOR]
        out = sub_line(p["coords"], (pos_beg - start) * sf,
                       (pos_end - start) * sf)
        return out
    chunks = []
    start, p = sel[0]
    sf = p[FIELD_SCALE_FACTOR]
    chunks.append(sub_line(p["coords"], (pos_beg - start) * sf,
                           line_length(p["coords"])))
    for start, p in sel[1:-1]:
        chunks.append(p["coords"])
    start, p = sel[-1]
    sf = p[FIELD_SCALE_FACTOR]
    chunks.append(sub_line(p["coords"], 0, (pos_end - start) * sf))
    return np.concatenate([c for c in chunks if c is not None])
