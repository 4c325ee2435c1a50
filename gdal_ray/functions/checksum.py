"""GDALChecksumImage re-implementation — the conformance oracle.

Matches reference alg/gdalchecksum.cpp:28-260 semantics exactly:

- pixels are walked row-major over the window; the prime index for the
  flat pixel position ``i`` is ``i % 11`` over primes
  ``[7,11,13,17,19,23,29,31,37,41,43]`` (both the chunked and the
  line-by-line code paths in the reference reduce to this),
- integer data contributes ``value % prime`` with C truncated-division
  modulo (sign follows the dividend),
- floating point data is converted like GDALCopyWords float->Int32:
  ``floor(v + 0.5)`` clamped to [-2147483647, 2147483647], non-finite
  -> INT_MIN,
- complex data interleaves (real, imag) per pixel,
- the running sum is masked to 16 bits (equivalent to a final
  ``mod 65536`` in two's complement).

Used throughout the reference test-suite as the oracle (e.g.
autotest/gcore/tiff_read.py:45 — byte.tif checksum 4672).
"""

from __future__ import annotations

import numpy as np

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
_INT_MIN = -2147483648


def _to_int32_like(values: np.ndarray) -> np.ndarray:
    """GDALCopyWords float->Int32 conversion, vectorized (int64 carrier)."""
    if values.dtype.kind in "iub":
        return values.astype(np.int64, copy=False)
    v = values.astype(np.float64, copy=False)
    out = np.empty(v.shape, dtype=np.int64)
    finite = np.isfinite(v)
    shifted = np.where(finite, v, 0.0) + 0.5
    clipped = np.clip(np.floor(shifted), -2147483647.0, 2147483647.0)
    out[:] = clipped.astype(np.int64)
    out[~finite] = _INT_MIN
    return out


def checksum_image(band: np.ndarray) -> int:
    """Checksum of one 2-D band (or a flat 1-D value stream).

    For complex input, pass the interleaved real/imag stream yourself.
    """
    flat = np.ascontiguousarray(band).reshape(-1)
    n = flat.size
    if n == 0:
        return 0
    # chunked so every pass stays cache-resident; the prime stream has
    # period 11, so a tiled template + phase offset replaces the
    # arange-%-fancy-index construction (identical values)
    CHUNK = 1 << 20
    tiled = np.tile(_PRIMES, CHUNK // 11 + 2)
    total = 0
    for start in range(0, n, CHUNK):
        vals = flat[start:start + CHUNK]
        ints = _to_int32_like(vals)
        phase = start % 11
        primes = tiled[phase:phase + vals.size]
        # C truncated modulo: np.fmod keeps the dividend's sign, like C %
        total += int(np.fmod(ints, primes).sum())
    return total & 0xFFFF


def checksum_multiband(pixels: np.ndarray) -> list[int]:
    """Per-band checksums for an (h, w) or (h, w, bands) array."""
    if pixels.ndim == 2:
        return [checksum_image(pixels)]
    return [checksum_image(pixels[:, :, b]) for b in range(pixels.shape[2])]
