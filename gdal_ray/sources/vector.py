"""Deterministic vector layers (FIXTURES.md F2 polygons / F3 points).

OGR-layer-shaped Arrow tables: fixed declared schema, geometry as WKB
binary (matching OGR's Arrow interface defaults, reference
ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp GEOMETRY_ENCODING=WKB), plus
per-row bbox columns like the GeoParquet driver reads for row-group
pruning (reference ogr/ogrsf_frmts/parquet/ogrparquetlayer.cpp:558).

Polygons: seeded convex-ish polygons over the image bbox in lon/lat —
a few large multi-cell ones + many small ones inside the hot cell
(skew on both join sides). Points: scattered, with value/timestamp/
tags fields for scalar-function coverage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geom import geom_area
from ..functions.wkb import Geom, POLYGON, geom_to_wkb, points_to_wkb, wkb_to_geom
from .images import BBOX_LAT, BBOX_LON, HOT_LAT, HOT_LON, SEED

CATEGORIES = ("residential", "industrial", "park", "water", "farmland")


def _convex_polygon(rng, cx, cy, r) -> Geom:
    k = int(rng.integers(5, 12))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = r * rng.uniform(0.5, 1.0, k)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang) * 0.7  # flatten in lat
    ring = np.column_stack([xs, ys])
    ring = np.vstack([ring, ring[:1]])
    return Geom(POLYGON, [ring], [1])


def polygons_table(n: int = 64) -> pa.Table:
    """F2: fid, geometry(WKB), name, category, pop, area_expected +
    bbox columns. ~1/4 large polygons spanning many cells, the rest
    small ones clustered at the hot cell."""
    rng = np.random.default_rng(SEED * 31 + 7)
    fids, wkbs, names, cats, pops, areas = [], [], [], [], [], []
    bxmin, bymin, bxmax, bymax = [], [], [], []
    for fid in range(n):
        if fid % 4 == 0:  # large
            cx = rng.uniform(*BBOX_LON)
            cy = rng.uniform(*BBOX_LAT)
            r = rng.uniform(0.3, 1.2)
        else:  # small, hot cluster
            cx = HOT_LON + rng.uniform(-0.02, 0.02)
            cy = HOT_LAT + rng.uniform(-0.02, 0.02)
            r = rng.uniform(0.001, 0.01)
        g = _convex_polygon(rng, cx, cy, r)
        w = geom_to_wkb(g)
        xmin, ymin, xmax, ymax = g.bbox()
        fids.append(fid)
        wkbs.append(w)
        names.append(f"poly{fid:05d}")
        cats.append(CATEGORIES[fid % len(CATEGORIES)])
        pops.append(int(rng.integers(10, 1_000_000)))
        areas.append(geom_area(g))
        bxmin.append(xmin); bymin.append(ymin); bxmax.append(xmax); bymax.append(ymax)
    return pa.table(
        {
            "fid": pa.array(fids, pa.int64()),
            "geometry": pa.array(wkbs, pa.binary()),
            "name": pa.array(names, pa.string()),
            "category": pa.array(cats, pa.string()),
            "pop": pa.array(pops, pa.int32()),
            "area_expected": pa.array(areas, pa.float64()),
            "bbox_xmin": pa.array(bxmin, pa.float64()),
            "bbox_ymin": pa.array(bymin, pa.float64()),
            "bbox_xmax": pa.array(bxmax, pa.float64()),
            "bbox_ymax": pa.array(bymax, pa.float64()),
        }
    )


def points_table(n: int = 1024) -> pa.Table:
    """F3: fid, geometry(WKB point), x, y, z, t, tags. 30% of points in
    the hot cluster (join-side skew)."""
    rng = np.random.default_rng(SEED * 53 + 11)
    hot = rng.random(n) < 0.3
    x = np.where(hot, HOT_LON + rng.uniform(-0.02, 0.02, n), rng.uniform(*BBOX_LON, n))
    y = np.where(hot, HOT_LAT + rng.uniform(-0.02, 0.02, n), rng.uniform(*BBOX_LAT, n))
    z = rng.uniform(0, 1000, n)
    t = (np.datetime64("2024-01-01") + rng.integers(0, 365 * 24 * 3600, n).astype("timedelta64[s]")).astype(
        "datetime64[us]"
    )
    tags = [[f"tag{int(v) % 7}", f"tag{int(v) % 3}"] for v in z]
    return pa.table(
        {
            "fid": pa.array(np.arange(n), pa.int64()),
            "geometry": pa.array(points_to_wkb(x, y), pa.binary()),
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "z": pa.array(z, pa.float64()),
            "t": pa.array(t, pa.timestamp("us")),
            "tags": pa.array(tags, pa.list_(pa.string())),
        }
    )
