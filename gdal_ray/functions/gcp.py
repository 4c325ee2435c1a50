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


def apply_homography(h, x, y):
    """GDALApplyHomography (alg/gdal_homography.cpp:545-561):
    geoX = (h0 + P*h1 + L*h2)/w, geoY = (h3 + P*h4 + L*h5)/w,
    w = h6 + P*h7 + L*h8. Affine gt == h with (h6,h7,h8) = (1,0,0)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    w = h[6] + x * h[7] + y * h[8]
    return ((h[0] + x * h[1] + y * h[2]) / w,
            (h[3] + x * h[4] + y * h[5]) / w)


def _h_matrix(h):
    return np.array([[h[0], h[1], h[2]],
                     [h[3], h[4], h[5]],
                     [h[6], h[7], h[8]]], np.float64)


_PERM = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


def compose_homographies(a, b):
    """h = apply `a` then `b` (GDALComposeHomographies semantics)."""
    m = _h_matrix(b) @ _PERM @ _h_matrix(a)
    return m.reshape(-1)


def invert_homography(h):
    """GDALInvHomography (gdal_homography.cpp:565-640). The standard
    homogeneous matrix is S = M @ P where M is the layout matrix
    ((1,x,y) -> (wx,wy,w)) and P converts (x,y,1) -> (1,x,y); the
    inverse in the same layout is inv(S) @ P.T (projective scale is
    irrelevant under the w division)."""
    m = _h_matrix(h)
    s = m @ _PERM
    det = np.linalg.det(s)
    mag = max(abs(h[1]), abs(h[2]), abs(h[4]), abs(h[5]))
    if abs(det) <= 1e-10 * mag * mag:
        raise ValueError("homography not invertible (null determinant)")
    return (np.linalg.inv(s) @ _PERM.T).reshape(-1)


def fit_homography(pixel, line, geo_x, geo_y):
    """GDALGCPsToHomography (gdal_homography.cpp:150-330): normalize
    both point sets to unit boxes, DLT least squares with the
    h_norm[6] = 1 gauge equation, convexity check of the mapped unit
    square, denormalize by composition."""
    px = np.asarray(pixel, np.float64)
    ln = np.asarray(line, np.float64)
    gx = np.asarray(geo_x, np.float64)
    gy = np.asarray(geo_y, np.float64)
    if px.size < 4:
        raise ValueError("homography needs >= 4 GCPs")
    eps = 1e-12
    if (px.ptp() < eps or ln.ptp() < eps or gx.ptp() < eps
            or gy.ptp() < eps):
        raise ValueError("GCPs degenerate in at least one dimension")
    pl_norm = np.array([-px.min() / px.ptp(), 1.0 / px.ptp(), 0.0,
                        -ln.min() / ln.ptp(), 0.0, 1.0 / ln.ptp(),
                        1.0, 0.0, 0.0])
    geo_norm = np.array([-gx.min() / gx.ptp(), 1.0 / gx.ptp(), 0.0,
                         -gy.min() / gy.ptp(), 0.0, 1.0 / gy.ptp(),
                         1.0, 0.0, 0.0])
    p, l_ = apply_homography(pl_norm, px, ln)
    X, Y = apply_homography(geo_norm, gx, gy)

    # DLT rows (gdal_homography.cpp:249-253)
    z = np.zeros_like(p)
    o = np.ones_like(p)
    Ax = np.stack([o, p, l_, z, z, z, -X, -X * p, -X * l_], axis=1)
    Ay = np.stack([z, z, z, o, p, l_, -Y, -Y * p, -Y * l_], axis=1)
    AtA = Ax.T @ Ax + Ay.T @ Ay
    rhs = np.zeros(9)
    rhs[6] = 1.0
    AtA[6, 6] += 1.0
    hn = np.linalg.solve(AtA, rhs)
    if abs(hn[6]) < 1e-15:
        raise ValueError("homography fit failed (w gauge vanished)")

    # unit-square convexity check (gdal_homography.cpp:286-320)
    cx, cy = apply_homography(hn, np.array([0.0, 1, 1, 0]),
                              np.array([0.0, 0, 1, 1]))
    vx, vy = cx - cx[0], cy - cy[0]
    cross12 = vx[1] * vy[2] - vx[2] * vy[1]
    cross23 = vx[2] * vy[3] - vx[3] * vy[2]
    if cross12 * cross23 <= 0:
        raise ValueError("homography maps the unit square non-convexly")

    inv_geo = invert_homography(geo_norm)
    return compose_homographies(compose_homographies(pl_norm, hn), inv_geo)


class HomographyTransform:
    """GDALHomographyTransformer analog (alg/gdal_homography.cpp):
    projective plane transform fitted from >= 4 GCPs, exact closed
    inverse — the link between GCP order-1 (affine) and the
    rational-polynomial family."""

    def __init__(self, pixel, line, geo_x, geo_y):
        self.h = fit_homography(pixel, line, geo_x, geo_y)
        self.h_inv = invert_homography(self.h)

    def pixel_to_geo(self, px, ln):
        return apply_homography(self.h, px, ln)

    def geo_to_pixel(self, x, y):
        return apply_homography(self.h_inv, x, y)

    def rms_residual(self, pixel, line, geo_x, geo_y) -> float:
        fx, fy = self.pixel_to_geo(pixel, line)
        return float(np.sqrt(np.mean((fx - geo_x) ** 2 + (fy - geo_y) ** 2)))


def georef_from_gcps(pixel, line, geo_x, geo_y, order: int | None = None,
                     tps: bool = False, homography: bool = False):
    """gdalwarp's GCP selection rule (apps/gdalwarp_lib.cpp -order /
    -tps): explicit TPS wins; else homography on request; else
    explicit order; else the highest order the GCP count supports,
    capped at 2 like GDALCreateGCPTransformer's auto pick (order 3
    only on request)."""
    if tps:
        return TPSTransform(pixel, line, geo_x, geo_y)
    if homography:
        return HomographyTransform(pixel, line, geo_x, geo_y)
    if order is None:
        n = len(np.asarray(pixel))
        order = 2 if n >= _MIN_GCPS[2] else 1
    return GCPPolyTransform(pixel, line, geo_x, geo_y, order)
