"""S2-style hierarchical cell index (vectorized numpy).

The north rule calls for an "H3/S2 cell index" as the spatial
partition/join key. No h3/s2 binding exists in this container, so this
module implements the S2 cell-id *structure* from the public S2
geometry description (s2geometry.io):

- sphere point -> cube face (6 faces, canonical S2 face numbering and
  face u/v formulas),
- quadratic u->s projection (the S2 "quadratic" cell-area flattening):
  ``s = sqrt(1+3u)/2`` for u >= 0, ``1 - sqrt(1-3u)/2`` otherwise,
- (s, t) -> 30-level quadtree (i, j),
- Hilbert space-filling curve position (classic per-bit rotation
  algorithm, vectorized over the batch; 30 iterations of O(n) numpy
  ops) — gives the hierarchical-prefix property: a cell's id range
  contains exactly its descendants,
- 64-bit id layout identical to S2: 3 face bits, 2*level position
  bits, then a trailing 1 bit marking the level.

The curve orientation constants are this engine's own (the reference
GDAL has no cell index to match — SURVEY.md §2.6); all invariants the
engine relies on (prefix containment, equal-level disjointness,
locality) hold and are unit-tested.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30


def lonlat_to_face_st(lon, lat):
    """lon/lat degrees -> (face, s, t) on the S2 cube. Vectorized."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    x = np.cos(phi) * np.cos(lam)
    y = np.cos(phi) * np.sin(lam)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ufn(), u)
                v = np.where(m, vfn(), v)
    with np.errstate(invalid="ignore"):
        s = np.where(u >= 0, 0.5 * np.sqrt(np.abs(1.0 + 3.0 * u)), 1.0 - 0.5 * np.sqrt(np.abs(1.0 - 3.0 * u)))
        t = np.where(v >= 0, 0.5 * np.sqrt(np.abs(1.0 + 3.0 * v)), 1.0 - 0.5 * np.sqrt(np.abs(1.0 - 3.0 * v)))
    return face, s, t


def _hilbert_pos(i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Hilbert curve position of (i, j) on a 2^level grid. Vectorized
    classic xy2d: per-bit quadrant accumulate + rotation."""
    x = i.astype(np.int64).copy()
    y = j.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (level - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        rot = ry == 0
        flip = rot & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(rot, y_f, x_f), np.where(rot, x_f, y_f)
        s >>= 1
    return d


def cell_id(lon, lat, level: int) -> np.ndarray:
    """lon/lat degrees -> 64-bit cell ids at ``level``. Vectorized."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be in [0, 30]")
    face, s, t = lonlat_to_face_st(lon, lat)
    n = np.int64(1) << level
    i = np.clip(np.floor(s * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(t * n), 0, n - 1).astype(np.int64)
    if level == 0:
        pos = np.zeros_like(face)
    else:
        pos = _hilbert_pos(i, j, level)
    shift = np.int64(2 * (MAX_LEVEL - level) + 1)
    return (face << np.int64(61)) | (pos << shift) | (np.int64(1) << (shift - 1))


def cell_level(ids) -> np.ndarray:
    """Level of each cell id (position of the trailing 1 bit)."""
    ids = np.asarray(ids, np.int64)
    lsb = ids & -ids
    p = np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)
    return MAX_LEVEL - p // 2


def cell_parent(ids, level: int) -> np.ndarray:
    """Ancestor cell at a coarser ``level`` (prefix truncation)."""
    ids = np.asarray(ids, np.int64)
    shift = np.int64(2 * (MAX_LEVEL - level) + 1)
    lsb = np.int64(1) << (shift - 1)
    return (ids & ~((lsb << 1) - 1)) | lsb


def cell_range(cell: int):
    """[min, max] id range of a cell's descendants (inclusive) — the
    containment test used for prefix joins."""
    lsb = cell & -cell
    return cell - lsb + 1, cell + lsb - 1
