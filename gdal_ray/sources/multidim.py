"""Multidimensional arrays with lazy views (the GDALGroup/GDALMDArray
model, reference gcore/gdal_priv.h:3700,4246: GetView :4401, Transpose
:4427, GetUnscaled :4429, AsClassicDataset :4455).

An ``MDArray`` is a named N-d array defined by a *chunk provider*
``fn(origin, shape) -> np.ndarray`` — data is produced (or read) one
chunk at a time, never materialized whole. Views (slice, transpose,
unscale) compose by rewriting the requested window before delegating
to the parent — exactly GDAL's lazy-view semantics. ``
as_classic_dataset`` exposes a 2-D (+bands) view as a Ray Dataset of
tile rows, chunked on a grid — the bridge from the netCDF/Zarr model
into the tiling engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa


@dataclass
class MDArray:
    name: str
    dims: tuple[str, ...]
    shape: tuple[int, ...]
    provider: Callable  # fn(origin: tuple[int,...], shape: tuple[int,...]) -> ndarray
    attrs: dict = field(default_factory=dict)

    def read(self, origin: Sequence[int] | None = None,
             shape: Sequence[int] | None = None) -> np.ndarray:
        origin = tuple(origin or [0] * len(self.shape))
        shape = tuple(shape or self.shape)
        if len(origin) != len(self.shape) or len(shape) != len(self.shape):
            raise ValueError("rank mismatch")
        for o, s, n in zip(origin, shape, self.shape):
            if o < 0 or o + s > n:
                raise IndexError((origin, shape, self.shape))
        out = self.provider(origin, shape)
        if tuple(out.shape) != shape:
            raise RuntimeError(f"provider returned {out.shape}, want {shape}")
        return out

    # ------------------------------------------------------------ lazy views
    def slice_view(self, dim: str, start: int, stop: int) -> "MDArray":
        """GetView('[start:stop]') along one named dimension."""
        d = self.dims.index(dim)
        new_shape = tuple(stop - start if i == d else n
                          for i, n in enumerate(self.shape))

        def prov(origin, shape):
            o = tuple(v + start if i == d else v for i, v in enumerate(origin))
            return self.read(o, shape)

        return MDArray(f"{self.name}[{dim}:{start}:{stop}]", self.dims,
                       new_shape, prov, dict(self.attrs))

    def transpose(self, order: Sequence[int]) -> "MDArray":
        order = tuple(order)
        new_dims = tuple(self.dims[i] for i in order)
        new_shape = tuple(self.shape[i] for i in order)
        inv = tuple(order.index(i) for i in range(len(order)))

        def prov(origin, shape):
            o = tuple(origin[inv[i]] for i in range(len(order)))
            s = tuple(shape[inv[i]] for i in range(len(order)))
            return self.read(o, s).transpose(order)

        return MDArray(f"{self.name}.T{order}", new_dims, new_shape, prov,
                       dict(self.attrs))

    def unscaled(self, scale: float | None = None,
                 offset: float | None = None) -> "MDArray":
        """GetUnscaled: value * scale + offset (defaults from attrs)."""
        sc = self.attrs.get("scale", 1.0) if scale is None else scale
        of = self.attrs.get("offset", 0.0) if offset is None else offset

        def prov(origin, shape):
            return self.read(origin, shape).astype(np.float64) * sc + of

        return MDArray(f"{self.name}.unscaled", self.dims, self.shape, prov,
                       {k: v for k, v in self.attrs.items()
                        if k not in ("scale", "offset")})

    def resampled(self, x_dim: str, y_dim: str, new_w: int, new_h: int,
                  method: str = "nearest") -> "MDArray":
        """GetResampled (reference gcore/gdal_priv.h:4439): lazy view
        with the X/Y dims resampled to (new_w, new_h); other dims pass
        through. The provider maps a requested window back to the
        covering parent window and samples it (functions/resample)."""
        from ..functions.resample import sample

        dx = self.dims.index(x_dim)
        dy = self.dims.index(y_dim)
        w, h = self.shape[dx], self.shape[dy]
        fx, fy = w / new_w, h / new_h
        new_shape = tuple(new_w if i == dx else new_h if i == dy else n
                          for i, n in enumerate(self.shape))
        src = self

        def prov(origin, shape):
            # requested dst pixel centers -> fractional src coords
            px = (np.arange(origin[dx], origin[dx] + shape[dx]) + 0.5) * fx
            py = (np.arange(origin[dy], origin[dy] + shape[dy]) + 0.5) * fy
            x0 = max(int(np.floor(px.min() - 3)), 0)
            x1 = min(int(np.ceil(px.max() + 3)), w)
            y0 = max(int(np.floor(py.min() - 3)), 0)
            y1 = min(int(np.ceil(py.max() + 3)), h)
            o = list(origin)
            s = list(shape)
            o[dx], s[dx] = x0, x1 - x0
            o[dy], s[dy] = y0, y1 - y0
            block = src.read(o, s)
            # move (y, x) last, flatten the rest, sample, restore
            other = [i for i in range(len(src.shape)) if i not in (dx, dy)]
            perm = other + [dy, dx]
            moved = block.transpose(perm)
            lead = moved.shape[:-2]
            flat = moved.reshape(-1, s[dy], s[dx])
            gx, gy = np.meshgrid(px - x0, py - y0)
            out = np.stack([sample(b, gx, gy, method)[0] for b in flat])
            out = out.reshape(lead + (shape[dy], shape[dx]))
            inv = np.argsort(perm)
            return out.transpose(inv)

        return MDArray(f"{self.name}.resampled({new_w}x{new_h},{method})",
                       self.dims, new_shape, prov, dict(self.attrs))

    # --------------------------------------------------------- classic bridge
    def as_classic_dataset(self, x_dim: str, y_dim: str,
                           tile: int = 256):
        """2-D (+ leading band dims collapsed) view -> Ray Dataset of
        tile rows (ty, tx, h, w, bands, pixels:binary float64) chunked
        on a tile grid (AsClassicDataset semantics)."""
        import ray.data

        dx = self.dims.index(x_dim)
        dy = self.dims.index(y_dim)
        other = [i for i in range(len(self.dims)) if i not in (dx, dy)]
        if any(self.shape[i] > 8 for i in other):
            raise NotImplementedError("too many bands for classic view")
        h, w = self.shape[dy], self.shape[dx]
        tiles = [(ty, tx) for ty in range(0, h, tile) for tx in range(0, w, tile)]
        src = self

        def gen(batch) -> pa.Table:
            rows = {"ty": [], "tx": [], "h": [], "w": [], "bands": [],
                    "pixels": []}
            for i in batch["id"]:
                ty, tx = tiles[int(i)]
                th = min(tile, h - ty)
                tw = min(tile, w - tx)
                origin = [0] * len(src.shape)
                shape = list(src.shape)
                origin[dy], shape[dy] = ty, th
                origin[dx], shape[dx] = tx, tw
                block = src.read(origin, shape)
                # move y,x last, flatten leading band dims
                perm = other + [dy, dx]
                block = block.transpose(perm).reshape(-1, th, tw)
                rows["ty"].append(ty)
                rows["tx"].append(tx)
                rows["h"].append(th)
                rows["w"].append(tw)
                rows["bands"].append(block.shape[0])
                rows["pixels"].append(
                    np.ascontiguousarray(block, np.float64).tobytes())
            return pa.table({
                "ty": pa.array(rows["ty"], pa.int32()),
                "tx": pa.array(rows["tx"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "w": pa.array(rows["w"], pa.int32()),
                "bands": pa.array(rows["bands"], pa.int32()),
                "pixels": pa.array(rows["pixels"], pa.binary()),
            })

        ds = ray.data.range(len(tiles),
                            override_num_blocks=max(1, len(tiles) // 4))
        return ds.map_batches(gen, batch_format="numpy")


def gridded_from_points(px: np.ndarray, py: np.ndarray, pv: np.ndarray,
                        grid_w: int, grid_h: int, bounds: tuple,
                        power: float = 2.0, name: str = "gridded") -> MDArray:
    """GetGridded (reference gcore/gdal_priv.h:4445 /
    GDALMDArray::GetGridded, backed by gdalgrid invdist): a scattered
    (x, y, value) point set exposed as a LAZY regular-grid MDArray —
    each requested chunk IDW-interpolates only its own cells
    (vectorized cells x points)."""
    xmin, ymin, xmax, ymax = bounds
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pv = np.asarray(pv, np.float64)

    def prov(origin, shape):
        oy, ox = origin
        sy, sx = shape
        cx = xmin + (np.arange(ox, ox + sx) + 0.5) * (xmax - xmin) / grid_w
        cy = ymin + (np.arange(oy, oy + sy) + 0.5) * (ymax - ymin) / grid_h
        gx, gy = np.meshgrid(cx, cy)
        d2 = ((gx.ravel()[:, None] - px[None, :]) ** 2
              + (gy.ravel()[:, None] - py[None, :]) ** 2)
        w = 1.0 / np.maximum(d2, 1e-30) ** (power / 2.0)
        est = (w * pv[None, :]).sum(axis=1) / w.sum(axis=1)
        return est.reshape(sy, sx)

    return MDArray(name, ("y", "x"), (grid_h, grid_w), prov, {})


def synthetic_mdarray(name: str = "temp", t: int = 6, y: int = 300,
                      x: int = 400, seed: int = 77) -> MDArray:
    """Deterministic (time, y, x) field with scale/offset attrs — the
    netCDF-flavored test fixture (chunk provider evaluates the field
    analytically, so any window is exact)."""
    def prov(origin, shape):
        ot, oy, ox = origin
        st, sy, sx = shape
        tt, yy, xx = np.meshgrid(np.arange(ot, ot + st),
                                 np.arange(oy, oy + sy),
                                 np.arange(ox, ox + sx), indexing="ij")
        base = (np.sin(xx / 37.0) * np.cos(yy / 23.0) * 100.0
                + tt * 10.0 + (xx * 31 + yy * 17 + tt * 7 + seed) % 13)
        return base

    return MDArray(name, ("time", "y", "x"), (t, y, x), prov,
                   {"scale": 0.5, "offset": -20.0, "units": "K"})
