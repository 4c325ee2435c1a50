"""Geolocation-array transformer (GDALCreateGeoLocTransformer analog).

Swath sensors (MODIS/VIIRS/Sentinel-3...) carry no affine/GCP
georeferencing; instead two 2-D arrays give the longitude and latitude
of (subsampled) pixel centers. The reference models this as the
GEOLOCATION metadata domain + GDALGeoLocTransformer
(reference alg/gdalgeoloc.cpp):

- forward (raster pixel -> geo): map the raster coordinate into
  geolocation-array index space with the PIXEL/LINE OFFSET/STEP
  keys and the pixel-center ``-0.5`` shift
  (gdalgeoloc.cpp:623-628), then bilinearly interpolate the X/Y
  arrays with *infinite extension beyond borders* — the border cell's
  plane extrapolates, weights may leave [0,1]
  (GDALGeoLoc::PixelLineToXY, gdalgeoloc.cpp:371-470);
- an optional antimeridian shift for geographic X arrays: neighbor
  samples more than 180° from the cell origin are wrapped by ±360
  before interpolation (ShiftGeoX, gdalgeoloc.cpp:72-90);
- inverse (geo -> raster pixel): the reference builds a BACKMAP — a
  regular geo-space grid sized rasterW*rasterH*oversample
  (default 1.3, gdalgeoloc.cpp:1028) into which every geolocation
  sample (walked at step 1/oversample, gdalgeoloc.cpp:1165) splats
  its raster (pixel, line) with bilinear weights; holes are filled
  from neighbors; a query bilinearly reads the backmap and refines.
  Here the refinement is a vectorized Newton solve on the forward
  transform (finite-difference 2x2 Jacobian), the same shape as the
  RPC inverse (functions/rpc.py) — every point iterates until ITS
  back-projection error drops under the pixel threshold.

``GeolocTransform`` exposes the ``pixel_to_geo`` / ``geo_to_pixel``
pair shared by the GCP/TPS/RPC transformers, so it slots into
``GenImgProjTransform(src_georef=...)`` unchanged (stages/warp.py) and
the whole warp stage — approx grid, kernels, tiling — applies.

Scale note: the transformer is built once per actor (its arrays +
backmap live in the actor), and batches stream through vectorized
evaluations; geolocation arrays are subsampled per the STEP keys, so
even a 100k x 100k scene's geoloc grid is MBs, not the raster.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GeolocTransform", "synthetic_swath"]


class GeolocTransform:
    """Transformer over a pair of 2-D geolocation arrays.

    Parameters mirror the GEOLOCATION metadata domain:
    ``pixel_offset``/``line_offset``/``pixel_step``/``line_step``
    relate geolocation-array indices to raster pixel coordinates
    (raster_px = (col + 0.5) * pixel_step + pixel_offset);
    ``nodata`` marks invalid geolocation samples (X array value);
    ``wrap_x`` enables the ±360 antimeridian shift for geographic
    longitudes; ``oversample`` sizes the inverse backmap
    (dfOversampleFactor, default 1.3 like the reference).
    """

    def __init__(self, geoloc_x, geoloc_y, *, pixel_offset: float = 0.0,
                 line_offset: float = 0.0, pixel_step: float = 1.0,
                 line_step: float = 1.0, nodata: float | None = None,
                 wrap_x: bool = False, oversample: float = 1.3,
                 pix_err_threshold: float = 0.1, max_iterations: int = 10,
                 max_backmap_cells: int = 16_000_000):
        self.gx = np.ascontiguousarray(geoloc_x, np.float64)
        self.gy = np.ascontiguousarray(geoloc_y, np.float64)
        if self.gx.shape != self.gy.shape or self.gx.ndim != 2:
            raise ValueError("geolocation arrays must be equal-shape 2-D")
        self.ny, self.nx = self.gx.shape
        self.pixel_offset = float(pixel_offset)
        self.line_offset = float(line_offset)
        self.pixel_step = float(pixel_step)
        self.line_step = float(line_step)
        self.nodata = nodata
        self.wrap_x = bool(wrap_x)
        self.thresh = pix_err_threshold if pix_err_threshold > 0 else 0.1
        self.max_iter = max_iterations
        self._valid = (np.isfinite(self.gx) & np.isfinite(self.gy)
                       if nodata is None else
                       (self.gx != nodata) & np.isfinite(self.gx)
                       & np.isfinite(self.gy))
        self._build_backmap(float(oversample), int(max_backmap_cells))

    # ------------------------------------------------------- index mapping
    def _raster_to_index(self, px, ln):
        """Raster pixel coords -> fractional geoloc array indices
        (the reference's (x - OFFSET)/STEP - 0.5 pixel-center shift,
        gdalgeoloc.cpp:623-628)."""
        gpx = (np.asarray(px, np.float64) - self.pixel_offset) \
            / self.pixel_step - 0.5
        gln = (np.asarray(ln, np.float64) - self.line_offset) \
            / self.line_step - 0.5
        return gpx, gln

    def _index_to_raster(self, col, row):
        px = (np.asarray(col, np.float64) + 0.5) * self.pixel_step \
            + self.pixel_offset
        ln = (np.asarray(row, np.float64) + 0.5) * self.line_step \
            + self.line_offset
        return px, ln

    # ------------------------------------------------------------- forward
    def _interp(self, gpx, gln):
        """Bilinear sample of the geoloc arrays at fractional indices,
        with infinite extension beyond the borders (weights leave
        [0,1] outside; the border CELL is reused —
        gdalgeoloc.cpp:371-470's clamp-then-step-back)."""
        gpx = np.asarray(gpx, np.float64)
        gln = np.asarray(gln, np.float64)
        ix = np.clip(np.floor(np.clip(gpx, 0, self.nx - 1)), 0,
                     max(self.nx - 2, 0)).astype(np.int64)
        iy = np.clip(np.floor(np.clip(gln, 0, self.ny - 1)), 0,
                     max(self.ny - 2, 0)).astype(np.int64)
        fx = gpx - ix
        fy = gln - iy
        ix1 = np.minimum(ix + 1, self.nx - 1)
        iy1 = np.minimum(iy + 1, self.ny - 1)
        x00 = self.gx[iy, ix]
        x10 = self.gx[iy, ix1]
        x01 = self.gx[iy1, ix]
        x11 = self.gx[iy1, ix1]
        if self.wrap_x:
            # ShiftGeoX: wrap neighbors >180° from the cell origin
            x10 = x10 + 360.0 * np.rint((x00 - x10) / 360.0)
            x01 = x01 + 360.0 * np.rint((x00 - x01) / 360.0)
            x11 = x11 + 360.0 * np.rint((x00 - x11) / 360.0)
        x = ((1 - fy) * (x00 + fx * (x10 - x00))
             + fy * (x01 + fx * (x11 - x01)))
        if self.wrap_x:
            x = np.where(x > 180.0, x - 360.0,
                         np.where(x < -180.0, x + 360.0, x))
        y00 = self.gy[iy, ix]
        y = ((1 - fy) * (y00 + fx * (self.gy[iy, ix1] - y00))
             + fy * (self.gy[iy1, ix]
                     + fx * (self.gy[iy1, ix1] - self.gy[iy1, ix])))
        bad = ~(self._valid[iy, ix] & self._valid[iy, ix1]
                & self._valid[iy1, ix] & self._valid[iy1, ix1])
        if bad.any():
            x = np.where(bad, np.nan, x)
            y = np.where(bad, np.nan, y)
        return x, y

    def pixel_to_geo(self, px, ln):
        """Raster pixel/line -> georeferenced X/Y (vectorized)."""
        return self._interp(*self._raster_to_index(px, ln))

    # ------------------------------------------------------------- inverse
    def _build_backmap(self, oversample: float, max_cells: int):
        v = self._valid
        if not v.any():
            raise ValueError("geolocation arrays contain no valid samples")
        xs = self.gx[v]
        ys = self.gy[v]
        xmin, xmax = float(xs.min()), float(xs.max())
        ymin, ymax = float(ys.min()), float(ys.max())
        if xmax <= xmin:
            xmax = xmin + 1e-9
        if ymax <= ymin:
            ymax = ymin + 1e-9
        # raster footprint the geoloc grid describes
        rw = max(self.nx * abs(self.pixel_step), 1.0)
        rh = max(self.ny * abs(self.line_step), 1.0)
        total = min(rw * rh * oversample, float(max_cells))
        aspect = (xmax - xmin) / (ymax - ymin)
        bw = max(int(np.sqrt(total * aspect)), 2)
        bh = max(int(total / bw), 2)
        self._bm_x0, self._bm_y0 = xmin, ymin
        self._bm_sx = (xmax - xmin) / bw
        self._bm_sy = (ymax - ymin) / bh
        self._bm_w, self._bm_h = bw, bh

        # walk the geoloc grid at step 1/oversample (gdalgeoloc.cpp:1165)
        step = 1.0 / oversample
        cols = np.arange(0.0, self.nx - 1 + 1e-9, step)
        rows = np.arange(0.0, self.ny - 1 + 1e-9, step)
        cg, rg = np.meshgrid(cols, rows)
        geo_x, geo_y = self._interp(cg.ravel(), rg.ravel())
        ras_px, ras_ln = self._index_to_raster(cg.ravel(), rg.ravel())
        ok = np.isfinite(geo_x) & np.isfinite(geo_y)
        geo_x, geo_y = geo_x[ok], geo_y[ok]
        ras_px, ras_ln = ras_px[ok], ras_ln[ok]

        fbx = (geo_x - xmin) / self._bm_sx - 0.5
        fby = (geo_y - ymin) / self._bm_sy - 0.5
        bx0 = np.floor(fbx).astype(np.int64)
        by0 = np.floor(fby).astype(np.int64)
        wx = fbx - bx0
        wy = fby - by0
        acc_p = np.zeros((bh, bw), np.float64)
        acc_l = np.zeros((bh, bw), np.float64)
        acc_w = np.zeros((bh, bw), np.float64)
        for dx, dy, wgt in ((0, 0, (1 - wx) * (1 - wy)),
                            (1, 0, wx * (1 - wy)),
                            (0, 1, (1 - wx) * wy),
                            (1, 1, wx * wy)):
            cx = bx0 + dx
            cy = by0 + dy
            m = (cx >= 0) & (cx < bw) & (cy >= 0) & (cy < bh) & (wgt > 0)
            np.add.at(acc_p, (cy[m], cx[m]), ras_px[m] * wgt[m])
            np.add.at(acc_l, (cy[m], cx[m]), ras_ln[m] * wgt[m])
            np.add.at(acc_w, (cy[m], cx[m]), wgt[m])
        filled = acc_w > 0
        bm_p = np.full((bh, bw), np.nan)
        bm_l = np.full((bh, bw), np.nan)
        bm_p[filled] = acc_p[filled] / acc_w[filled]
        bm_l[filled] = acc_l[filled] / acc_w[filled]
        # hole fill: iterative 3x3 neighbor mean (the reference's
        # FillHoles pass, gdalgeoloc.cpp backmap post-processing)
        for _ in range(64):
            holes = np.isnan(bm_p)
            if not holes.any():
                break
            pp = np.pad(bm_p, 1, constant_values=np.nan)
            pl = np.pad(bm_l, 1, constant_values=np.nan)
            nsum_p = np.zeros_like(bm_p)
            nsum_l = np.zeros_like(bm_l)
            ncnt = np.zeros_like(bm_p)
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    if dx == 1 and dy == 1:
                        continue
                    sp = pp[dy:dy + bh, dx:dx + bw]
                    sl = pl[dy:dy + bh, dx:dx + bw]
                    good = ~np.isnan(sp)
                    nsum_p[good] += sp[good]
                    nsum_l[good] += sl[good]
                    ncnt[good] += 1
            fill = holes & (ncnt > 0)
            if not fill.any():
                break
            bm_p[fill] = nsum_p[fill] / ncnt[fill]
            bm_l[fill] = nsum_l[fill] / ncnt[fill]
        self._bm_p = bm_p
        self._bm_l = bm_l

    def _backmap_read(self, x, y):
        fx = (np.asarray(x, np.float64) - self._bm_x0) / self._bm_sx - 0.5
        fy = (np.asarray(y, np.float64) - self._bm_y0) / self._bm_sy - 0.5
        ix = np.clip(np.floor(fx), 0, self._bm_w - 2).astype(np.int64)
        iy = np.clip(np.floor(fy), 0, self._bm_h - 2).astype(np.int64)
        tx = np.clip(fx - ix, 0.0, 1.0)
        ty = np.clip(fy - iy, 0.0, 1.0)
        out = []
        for g in (self._bm_p, self._bm_l):
            c00 = g[iy, ix]
            c10 = g[iy, ix + 1]
            c01 = g[iy + 1, ix]
            c11 = g[iy + 1, ix + 1]
            v = ((1 - ty) * ((1 - tx) * c00 + tx * c10)
                 + ty * ((1 - tx) * c01 + tx * c11))
            # if any corner is a residual hole fall back to the
            # nearest filled corner
            nanv = np.isnan(v)
            if nanv.any():
                near = np.where(np.isnan(c00), np.where(
                    np.isnan(c10), np.where(np.isnan(c01), c11, c01), c10),
                    c00)
                v = np.where(nanv, near, v)
            out.append(v)
        return out[0], out[1]

    def geo_to_pixel(self, x, y):
        """Geo X/Y -> raster pixel/line: backmap seed + Newton refine
        (vectorized; non-converged points -> NaN)."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        shape = x.shape
        x, y = x.ravel(), y.ravel()
        px, ln = self._backmap_read(x, y)
        px, ln = px.copy(), ln.copy()
        active = np.isfinite(px) & np.isfinite(ln)
        dead = ~active.copy()
        d = 0.25  # finite-difference step, raster pixels
        for _ in range(self.max_iter):
            if not active.any():
                break
            idx = np.flatnonzero(active)
            p, li = px[idx], ln[idx]
            fx0, fy0 = self.pixel_to_geo(p, li)
            ex = fx0 - x[idx]
            ey = fy0 - y[idx]
            if self.wrap_x:
                ex = ex - 360.0 * np.rint(ex / 360.0)
            fx1, fy1 = self.pixel_to_geo(p + d, li)
            fx2, fy2 = self.pixel_to_geo(p, li + d)
            a = (fx1 - fx0) / d   # dX/dpixel
            b = (fx2 - fx0) / d   # dX/dline
            c = (fy1 - fy0) / d   # dY/dpixel
            e = (fy2 - fy0) / d   # dY/dline
            det = a * e - b * c
            bad = ~np.isfinite(det) | (np.abs(det) < 1e-30) \
                | ~np.isfinite(ex) | ~np.isfinite(ey)
            det = np.where(bad, 1.0, det)
            dp = (e * ex - b * ey) / det
            dl = (a * ey - c * ex) / det
            dp = np.where(bad, 0.0, dp)
            dl = np.where(bad, 0.0, dl)
            step_sz = np.maximum(np.abs(dp), np.abs(dl))
            px[idx] -= dp
            ln[idx] -= dl
            done = (step_sz < self.thresh) & ~bad
            active[idx[done]] = False
            active[idx[bad]] = False
            dead[idx[bad]] = True
        px[active | dead] = np.nan
        ln[active | dead] = np.nan
        return px.reshape(shape), ln.reshape(shape)


def synthetic_swath(w: int = 96, h: int = 96, *, step: int = 4,
                    distorted: bool = False, gt=None):
    """Deterministic geolocation arrays for tests/benches.

    With ``gt`` (and distorted=False) the arrays sample an exact
    affine — a geoloc warp must then match the affine warp within the
    resampling bar. ``distorted=True`` bends the swath with smooth
    sinusoids (a scan-geometry stand-in). Returns (GeolocTransform
    kwargs dict) describing a (h x w) raster sampled every ``step``
    pixels."""
    if gt is None:
        gt = (500_000.0, 30.0, 0.0, 4_200_000.0, 0.0, -30.0)
    cols = np.arange(w // step)
    rows = np.arange(h // step)
    cg, rg = np.meshgrid(cols, rows)
    # geoloc sample (i,j) sits at raster pixel ((i+0.5)*step, ...)
    px = (cg + 0.5) * step
    ln = (rg + 0.5) * step
    gx = gt[0] + px * gt[1] + ln * gt[2]
    gy = gt[3] + px * gt[4] + ln * gt[5]
    if distorted:
        gx = gx + 60.0 * np.sin(px / 23.0) + 40.0 * np.cos(ln / 31.0)
        gy = gy + 50.0 * np.cos(px / 29.0) + 30.0 * np.sin(ln / 17.0)
    return dict(geoloc_x=gx, geoloc_y=gy, pixel_offset=0.0, line_offset=0.0,
                pixel_step=float(step), line_step=float(step))
