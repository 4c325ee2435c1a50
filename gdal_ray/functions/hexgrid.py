"""H3-style aperture-7 hexagonal cell index (vectorized numpy).

The north rule's join key is an "H3/S2 cell index" and the north
metric an "H3 res-9 spatial join".  No h3 binding exists in this
container, so — exactly like functions/s2cell.py for S2 — this module
implements the *structure* the H3 library publishes (h3geo.org):

- an equal-area projection (Lambert cylindrical: x = lon_rad,
  y = sin(lat)) so cells tile with near-uniform area like H3's
  icosahedral gnomonic faces do;
- an axial (q, r) hexagonal lattice per resolution with **aperture
  7**: each resolution's lattice is scaled by 1/sqrt(7) and rotated
  by atan(sqrt(3)/5) ≈ 19.1066° relative to its parent — H3's
  Class II/III alternation — so ~7 children nest under each parent;
- cube-coordinate rounding for exact point->hex assignment;
- a 64-bit id layout mirroring H3's: 4 resolution bits then
  interleaved signed (q, r) fields;
- parent/child navigation by re-encoding the cell centre at the
  coarser resolution (like h3ToParent), and k-ring neighbours in
  axial space.

All invariants the engine relies on (deterministic assignment, same
cell for nearby points, ~7x cell-count growth per resolution,
bounded parent-containment error) are unit-tested; ids are this
engine's own, as the reference has no hex index to match.
"""
from __future__ import annotations

import numpy as np

MAX_RES = 15
# base hex circumradius (radians on the unit sphere) at resolution 0
_BASE_SIZE = 0.35
_APERTURE = 7.0
# Class II/III alternation angle: atan(sqrt(3)/5)
_ROT = np.arctan(np.sqrt(3.0) / 5.0)


def _axes(res: int) -> tuple[float, np.ndarray]:
    """(hex size, 2x2 world->lattice rotation) for a resolution."""
    size = _BASE_SIZE / _APERTURE ** (res / 2.0)
    ang = res * _ROT
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, s], [-s, c]])
    return size, rot


def _project(lon, lat):
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    return lam, np.sin(phi)


def _unproject(x, y):
    lon = np.degrees(x)
    lat = np.degrees(np.arcsin(np.clip(y, -1.0, 1.0)))
    return lon, lat


def _to_axial(x, y, res: int):
    size, rot = _axes(res)
    xr = rot[0, 0] * x + rot[0, 1] * y
    yr = rot[1, 0] * x + rot[1, 1] * y
    # pointy-top axial coordinates
    q = (np.sqrt(3.0) / 3.0 * xr - yr / 3.0) / size
    r = (2.0 / 3.0 * yr) / size
    return q, r


def _from_axial(q, r, res: int):
    size, rot = _axes(res)
    xr = size * np.sqrt(3.0) * (q + r / 2.0)
    yr = size * 1.5 * r
    x = rot[0, 0] * xr + rot[1, 0] * yr
    y = rot[0, 1] * xr + rot[1, 1] * yr
    return x, y


def _hex_round(q, r):
    """Cube-coordinate rounding (exact nearest hex centre)."""
    s = -q - r
    rq, rr, rs = np.round(q), np.round(r), np.round(s)
    dq, dr, ds = np.abs(rq - q), np.abs(rr - r), np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    return rq.astype(np.int64), rr.astype(np.int64)


def hex_cell(lon, lat, res: int) -> np.ndarray:
    """lon/lat degrees -> 64-bit hex cell id at the resolution."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"hex resolution {res} out of range 0..{MAX_RES}")
    x, y = _project(lon, lat)
    q, r = _hex_round(*_to_axial(x, y, res))
    return (np.int64(res) << np.int64(56)) | \
        ((q + (1 << 26)) << np.int64(28)) | (r + (1 << 26))


def cell_res(ids) -> np.ndarray:
    return (np.asarray(ids, np.int64) >> 56) & 0xF


def cell_center(ids) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(ids, np.int64)
    res = (ids >> 56) & 0xF
    q = ((ids >> 28) & ((1 << 28) - 1)) - (1 << 26)
    r = (ids & ((1 << 28) - 1)) - (1 << 26)
    if ids.ndim == 0:
        x, y = _from_axial(float(q), float(r), int(res))
        return _unproject(x, y)
    out_lon = np.empty(len(ids))
    out_lat = np.empty(len(ids))
    for rv in np.unique(res):
        m = res == rv
        x, y = _from_axial(q[m].astype(float), r[m].astype(float), int(rv))
        out_lon[m], out_lat[m] = _unproject(x, y)
    return out_lon, out_lat


def cell_parent(ids, parent_res: int) -> np.ndarray:
    """Coarser-resolution cell containing each cell's centre
    (h3ToParent semantics; aperture-7 nesting is approximate at the
    hex boundaries exactly like H3's own ~7-child truncation)."""
    lon, lat = cell_center(ids)
    return hex_cell(lon, lat, parent_res)


def k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cells within k axial steps (incl. the centre) — the H3
    kRing disk, used for neighbour-probe joins."""
    cell = int(cell)
    res = int(cell_res(np.int64(cell)))
    q0 = ((cell >> 28) & ((1 << 28) - 1)) - (1 << 26)
    r0 = (cell & ((1 << 28) - 1)) - (1 << 26)
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            q, r = q0 + dq, r0 + dr
            out.append((np.int64(res) << np.int64(56)) |
                       (np.int64(q + (1 << 26)) << np.int64(28)) |
                       np.int64(r + (1 << 26)))
    return np.array(out, np.int64)
