"""Spatial operators with SQL-checkable oracles.

The driver can only verify queries DuckDB can express, and DuckDB here
has no spatial extension — so these queries derive a deterministic
point layer from the `events` table (lon/lat as exact float functions
of `value`, bit-identical in numpy and DuckDB) and rectangle "nation
zone" polygons from `n_nationkey`. The Ray side runs the *real* engine
paths — WKB polygons, PackedPolygonIndex PIP join, vectorized tile
math — while the oracle reduces to arithmetic DuckDB can do. The
general-geometry variants of the same operators (arbitrary polygons,
S2 cells, kNN by boundary distance) are covered by pytest goldens in
tests/ (driver gets rows-only checks for those).

Derivations (both sides, IEEE-exact):
    lon = fmod(value * 7.0, 360.0) - 180.0
    lat = fmod(value * 3.0, 170.0) - 85.0
    zone rect for nation k: x in [-180 + 14k, -167 + 14k],
                            y in [-80 + 16*(k%10), -65 + 16*(k%10)]

Operator mapping (SURVEY.md §2):
    q_tile_assign      — `gdal raster tile` assignment at z=8 (xyz,
                         WebMercatorQuad, MAX_LAT clamp) §2.6
    q_pip_join         — layer-algebra point-in-polygon join §2.4
    q_zonal_stats      — join + per-zone aggregate (Intersection +
                         stats) §2.4/§2.8
    q_knn              — gdalgrid kNN lookup (alg/gdalgrid.cpp:260) §2.4
    q_rasterize_points — MERGE_ALG=ADD point burning into a 64x64 grid
                         (alg/gdalrasterize.cpp:800) §2.7
    q_cell_index       — S2 cell-key encoding (north rule; rows-only,
                         no SQL oracle — DuckDB can't express Hilbert)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.crs import MAX_MERC_LAT
from ..functions.geom import PackedPolygonIndex
from ..functions.s2cell import cell_id
from ..functions.tiles import lonlat_to_tile
from ..functions.wkb import geom_to_wkb, rect_polygon
from .common import partial_groupby_agg, read_table, round_away_np

GRID_N = 64  # q_rasterize_points grid
TILE_Z = 8

_EVENT_COLS = ["event_id", "value"]


def derive_lonlat(value: np.ndarray):
    lon = np.fmod(value * 7.0, 360.0) - 180.0
    lat = np.fmod(value * 3.0, 170.0) - 85.0
    return lon, lat


_DERIVE_SQL = (
    "fmod(value * 7.0, 360.0) - 180.0",
    "fmod(value * 3.0, 170.0) - 85.0",
)


def _points_ds(sf_dir: str):
    ds = read_table(sf_dir, "events", _EVENT_COLS)

    def f(t: pa.Table) -> pa.Table:
        lon, lat = derive_lonlat(t["value"].to_numpy())
        return pa.table({"event_id": t["event_id"], "value": t["value"],
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------------ tiles


def q_tile_assign(sf_dir: str):
    """WebMercatorQuad xyz tile of each derived point at z=8,
    vectorized batched encoding (the north-rule tile assignment)."""
    ds = _points_ds(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        tx, ty = lonlat_to_tile(t["lon"].to_numpy(), t["lat"].to_numpy(), TILE_Z)
        return pa.table({"event_id": t["event_id"],
                         "tile_x": pa.array(tx), "tile_y": pa.array(ty)})

    return ds.map_batches(f, batch_format="pyarrow")


def q_tile_counts(sf_dir: str):
    """Tiles + per-tile point counts (the compose-shuffle key
    distribution) via combiner partials."""
    ds = q_tile_assign(sf_dir)
    out = partial_groupby_agg(ds, ["tile_x", "tile_y"],
                              [("n_points", "event_id", "count_all")])
    return out


def q_cell_index(sf_dir: str):
    """S2 cell ids (level 10) of the derived points — the engine's
    partition/join key. No SQL oracle (Hilbert curve); driver records
    rows-only."""
    ds = _points_ds(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        c = cell_id(t["lon"].to_numpy(), t["lat"].to_numpy(), 10)
        return pa.table({"event_id": t["event_id"], "cell": pa.array(c)})

    return ds.map_batches(f, batch_format="pyarrow")


def q_crs_transform(sf_dir: str):
    """CRS engine over the full projection library: the derived event
    points transform 4326 -> {3857, UTM, Lambert-93 LCC, Conus Albers,
    polar stereographic} and back inside map_batches (per-actor
    Transformer reuse); emits round-trip position error per CRS (max,
    in projected units) and a coordinate checksum. Rows-only
    (PROJ formulas are not SQL-expressible); projection invariants are
    golden-tested in tests/test_crs_projections.py."""
    from ..functions.crs import Transformer

    # (epsg, domain clip (lon_lo, lon_hi, lat_lo, lat_hi)): each CRS is
    # exercised inside its validity domain (UTM zone 33 = lon 12..18;
    # north polar = northern hemisphere)
    CRSS = [(3857, (-180, 180, -84, 84)),
            (32633, (9.0, 21.0, -80, 84)),
            (2154, (-10.0, 12.0, 40.0, 52.0)),
            (5070, (-125.0, -66.0, 22.0, 50.0)),
            (3413, (-180, 180, 35.0, 84.0)),
            # registry codes (crs_registry.py): general-TM / Mercator
            # 1SP / LAEA / UPS variant-A / Helmert-datum grids
            (27700, (-7.0, 1.8, 49.9, 60.8)),   # OSGB + OSGB36 Helmert
            (31467, (6.0, 12.0, 47.0, 55.0)),   # Gauss-Krueger z3 + DHDN
            (25832, (6.0, 12.0, 35.0, 70.0)),   # ETRS89 UTM
            (2193, (166.0, 178.5, -47.5, -34.0)),  # NZTM2000
            (3395, (-180, 180, -80.0, 84.0)),   # World Mercator
            (3035, (-10.0, 30.0, 35.0, 70.0)),  # LAEA Europe
            (32661, (-180, 180, 60.0, 88.0))]   # UPS North
    ds = _points_ds(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        lon0 = t["lon"].to_numpy()
        lat0 = t["lat"].to_numpy()
        rows = {"epsg": [], "n": [], "max_err": [], "cksum": []}
        for epsg, (lo, hi, la, lb) in CRSS:
            lon = np.clip(lon0, lo, hi)
            lat = np.clip(lat0, la, lb)
            fwd = Transformer(4326, epsg)
            inv = Transformer(epsg, 4326)
            x, y = fwd.transform(lon, lat)
            lon2, lat2 = inv.transform(x, y)
            x2, y2 = fwd.transform(lon2, lat2)
            err = float(np.hypot(x2 - x, y2 - y).max())
            rows["epsg"].append(epsg)
            rows["n"].append(len(lon))
            # 2 significant figures, not absolute decimals: the datum
            # Helmert inverse is iterative and vectorized per batch, so
            # batch boundaries shift the last ~nm of the round-trip;
            # nanometer-absolute rounding would make the value depend
            # on the run's block layout
            # the independent claim is the round-trip bar (1 cm in
            # projected units — the documented single-Helmert datum
            # paths sit at ~1 mm, the pure projections at ~nm); exact
            # coordinate pins live in tests/test_crs_projections.py
            rows["max_err"].append(int(err < 0.01))
            # exact engine-value ride-along (ADVICE round-4): the
            # independence claim stays on the flag column; this
            # per-point-rounded coordinate checksum is a
            # determinism-pin that keeps the driver gate sensitive to
            # silent drift.  Raw per-batch sums; mod applied after
            # the aggregation so batch layout cannot shift the value.
            rows["cksum"].append(int(np.round(np.abs(x) + np.abs(y)).sum()))
        return pa.table({"epsg": pa.array(rows["epsg"], pa.int32()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "roundtrip_under_cm": pa.array(
                             rows["max_err"], pa.int64()),
                         "cksum": pa.array(rows["cksum"], pa.int64())})

    part = ds.map_batches(f, batch_format="pyarrow")
    out = partial_groupby_agg(
        part, ["epsg"],
        [("n", "n", "sum"),
         ("roundtrip_under_cm", "roundtrip_under_cm", "min"),
         ("cksum", "cksum", "sum")])
    out = out.set_column(
        out.column_names.index("cksum"), "cksum",
        pa.array(out["cksum"].to_numpy() % 4294967291, pa.int64()))
    idx = np.argsort(out["epsg"].to_numpy())
    return out.take(pa.array(idx))


# ------------------------------------------------------------------ PIP join


def nation_zones(nationkeys: np.ndarray):
    """Deterministic rectangle zone per nation key (WKB polygons)."""
    out = []
    for k in nationkeys.tolist():
        xmin = -180.0 + 14.0 * k
        ymin = -80.0 + 16.0 * (k % 10)
        out.append(geom_to_wkb(rect_polygon(xmin, ymin, xmin + 13.0, ymin + 15.0)))
    return out


class PipJoin:
    """Actor: builds the PackedPolygonIndex once from the broadcast
    zone layer, joins point batches (envelope grid pre-filter + exact
    ray-casting PIP — reference ogrlayer.cpp:3426/3469 semantics)."""

    def __init__(self, fids: np.ndarray, wkbs: list[bytes]):
        self.index = PackedPolygonIndex(fids, wkbs)

    def __call__(self, t: pa.Table) -> pa.Table:
        pi, fid = self.index.query_points(t["lon"].to_numpy(), t["lat"].to_numpy())
        return pa.table({
            "event_id": pa.array(t["event_id"].to_numpy()[pi]),
            "n_nationkey": pa.array(fid.astype(np.int32)),
            "value": pa.array(t["value"].to_numpy()[pi]),
        })


def _pip_ds(sf_dir: str):
    from .common import arrow_table

    nat = arrow_table(sf_dir, "nation", ["n_nationkey"])
    keys = nat["n_nationkey"].to_numpy().astype(np.int64)
    wkbs = nation_zones(keys)
    ds = _points_ds(sf_dir)
    # stateful stage: index built once per actor (concurrency pool)
    return ds.map_batches(PipJoin, fn_constructor_args=(keys, wkbs),
                          batch_format="pyarrow", batch_size=4096, concurrency=2)


def q_pip_join(sf_dir: str):
    """Point-in-polygon join rows (event_id x containing zone)."""
    ds = _pip_ds(sf_dir)
    return ds.map_batches(lambda t: t.select(["event_id", "n_nationkey"]),
                          batch_format="pyarrow")


def q_zonal_stats(sf_dir: str):
    """Per-zone count/sum/avg of point values after the PIP join."""
    out = partial_groupby_agg(_pip_ds(sf_dir), ["n_nationkey"],
                              [("n_points", "value", "count_all"),
                               ("sum_value", "value", "sum")])
    avg = out["sum_value"].to_numpy() / out["n_points"].to_numpy()
    return pa.table({
        "n_nationkey": out["n_nationkey"],
        "n_points": out["n_points"],
        "sum_value": pa.array(round_away_np(out["sum_value"].to_numpy(), 2)),
        "avg_value": pa.array(round_away_np(avg, 2)),
    })


# ------------------------------------------------------------------ kNN


def q_knn(sf_dir: str):
    """k=5 nearest derived points to each region query point
    (brute-force exact kNN per batch: local top-k partials -> final
    top-k merge; ties broken by event_id, matching the SQL oracle's
    row_number order)."""
    from .common import arrow_table

    reg = arrow_table(sf_dir, "region", ["r_regionkey"])
    rk = reg["r_regionkey"].to_numpy().astype(np.int64)
    qx = -150.0 + 60.0 * rk
    qy = -60.0 + 30.0 * (rk % 5)
    K = 5

    ds = _points_ds(sf_dir)

    def local(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(); lat = t["lat"].to_numpy()
        eid = t["event_id"].to_numpy()
        rows = {"r_regionkey": [], "event_id": [], "d2": []}
        for i, r in enumerate(rk.tolist()):
            d2 = (lon - qx[i]) * (lon - qx[i]) + (lat - qy[i]) * (lat - qy[i])
            k = min(K, len(d2))
            # lexsort: ties at equal distance keep the lowest event_id
            part = np.lexsort((eid, d2))[:k]
            rows["r_regionkey"].extend([r] * len(part))
            rows["event_id"].extend(eid[part].tolist())
            rows["d2"].extend(d2[part].tolist())
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    parts = ds.map_batches(local, batch_format="pyarrow")
    merged = pa.concat_tables(
        list(parts.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default",
    )
    out = {"r_regionkey": [], "event_id": [], "knn_rank": []}
    df = merged.to_pandas()
    for r, g in df.groupby("r_regionkey"):
        g = g.sort_values(["d2", "event_id"]).head(K)
        out["r_regionkey"].extend([r] * len(g))
        out["event_id"].extend(g["event_id"].tolist())
        out["knn_rank"].extend(range(1, len(g) + 1))
    return pa.table({"r_regionkey": pa.array(out["r_regionkey"], pa.int32()),
                     "event_id": pa.array(out["event_id"], pa.int64()),
                     "knn_rank": pa.array(out["knn_rank"], pa.int64())})


def _ring_margin(qx: float, qy: float, qtx: int, qty: int, z: int,
                 ring: int) -> float:
    """Guaranteed-coverage radius (degrees) of the (2r+1)^2 tile block
    around the query's tile: min distance from the point to the block
    boundary; sides clamped at the antimeridian wrap / pole rows count
    as unbounded."""
    from ..functions.crs import MAX_MERC_LAT, webmercator_to_lonlat
    from ..functions.tiles import tile_bounds

    n = 1 << z
    margins = []
    if 2 * ring + 1 < n:  # lon wraps -> unbounded once the ring closes
        lon_lo = (qtx - ring) * 360.0 / n - 180.0
        lon_hi = (qtx + ring + 1) * 360.0 / n - 180.0
        margins += [qx - lon_lo, lon_hi - qx]
    top = qty - ring
    bot = qty + ring
    if top > 0:
        _, _, _, ymax = tile_bounds(qtx, top, z)
        _, lat_hi = webmercator_to_lonlat(0.0, ymax)
        margins.append(float(lat_hi) - qy)
    if bot < n - 1:
        _, ymin, _, _ = tile_bounds(qtx, bot, z)
        _, lat_lo = webmercator_to_lonlat(0.0, ymin)
        margins.append(qy - float(lat_lo))
    return min(margins) if margins else np.inf


def q_knn_partitioned(sf_dir: str):
    """Same kNN semantics as q_knn but executed the partitioned way
    (SURVEY.md §2.4): events shuffle once on a coarse tile key (z=3),
    per-cell `map_groups` computes local top-k only for the queries
    whose ring halo covers the cell, then a tiny final merge. Rings
    expand adaptively until every query's k-th distance is provably
    inside its covered block (the gdalgrid quadtree-radius-search
    contract, alg/gdalgrid.cpp:260, made distributed; at scale only
    the unsatisfied queries re-run with the wider ring)."""
    import pandas as pd

    from ..functions.tiles import lonlat_to_tile, tile_neighbors
    from .common import arrow_table

    Z, K = 3, 5
    reg = arrow_table(sf_dir, "region", ["r_regionkey"])
    rk = reg["r_regionkey"].to_numpy().astype(np.int64)
    qx = -150.0 + 60.0 * rk
    qy = -60.0 + 30.0 * (rk % 5)
    qtx, qty = lonlat_to_tile(qx, qy, Z)

    cells_ds = _points_ds(sf_dir)

    def add_cell(t: pa.Table) -> pa.Table:
        tx, ty = lonlat_to_tile(t["lon"].to_numpy(), t["lat"].to_numpy(), Z)
        return t.append_column("cell", pa.array(ty * (1 << Z) + tx))

    # shuffle-keyed ONCE; every ring iteration below filters this
    # materialized dataset to the new shell cells only — points are
    # never re-keyed or re-shuffled
    keyed = cells_ds.map_batches(add_cell, batch_format="pyarrow").materialize()

    def make_cell_topk(cand: dict[int, list[int]]):
        def cell_topk(g: pd.DataFrame) -> pd.DataFrame:
            cell = int(g["cell"].iloc[0])
            queries = cand.get(cell, [])
            if not queries:
                return pd.DataFrame({"qi": pd.Series([], dtype="int64"),
                                     "event_id": pd.Series([], dtype="int64"),
                                     "d2": pd.Series([], dtype="float64")})
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            eid = g["event_id"].to_numpy()
            rows = {"qi": [], "event_id": [], "d2": []}
            for i in queries:
                d2 = (lon - qx[i]) ** 2 + (lat - qy[i]) ** 2
                k = min(K, len(d2))
                # ties broken by event_id here too — a plain
                # argpartition could drop the lower-id duplicate
                part = np.lexsort((eid, d2))[:k]
                rows["qi"].extend([i] * len(part))
                rows["event_id"].extend(eid[part].tolist())
                rows["d2"].extend(d2[part].tolist())
            return pd.DataFrame(rows)

        return cell_topk

    n_cells = 1 << Z
    unsat = list(range(len(rk)))
    seen_cells: dict[int, set[int]] = {i: set() for i in range(len(rk))}
    acc = pd.DataFrame({"qi": pd.Series([], dtype="int64"),
                        "event_id": pd.Series([], dtype="int64"),
                        "d2": pd.Series([], dtype="float64")})
    for ring in range(1, (1 << Z) + 1):
        # only UNSATISFIED queries contribute cells, and only their new
        # shell (ring r minus already-scanned cells)
        cand: dict[int, list[int]] = {}
        for i in unsat:
            for (cx, cy) in tile_neighbors(int(qtx[i]), int(qty[i]), Z, ring):
                c = cy * n_cells + cx
                if c not in seen_cells[i]:
                    seen_cells[i].add(c)
                    cand.setdefault(c, []).append(i)
        if cand:
            wanted = pa.array(np.array(sorted(cand), np.int64))
            sub = keyed.map_batches(
                lambda t, w=wanted: t.filter(pc.is_in(t["cell"], value_set=w)),
                batch_format="pyarrow")
            df_new = sub.groupby("cell").map_groups(
                make_cell_topk(cand), batch_format="pandas").to_pandas()
            acc = pd.concat([acc, df_new], ignore_index=True)
        still = []
        for i in unsat:
            g = acc[acc["qi"] == i].sort_values(["d2", "event_id"]).head(K)
            if len(g) < K or np.sqrt(g["d2"].max()) > _ring_margin(
                    float(qx[i]), float(qy[i]), int(qtx[i]), int(qty[i]), Z, ring):
                still.append(i)
        unsat = still
        if not unsat:
            break

    out = {"r_regionkey": [], "event_id": [], "knn_rank": []}
    for i, g in acc.groupby("qi"):
        g = g.sort_values(["d2", "event_id"]).head(K)
        out["r_regionkey"].extend([int(rk[i])] * len(g))
        out["event_id"].extend(g["event_id"].astype(int).tolist())
        out["knn_rank"].extend(range(1, len(g) + 1))
    return pa.table({"r_regionkey": pa.array(out["r_regionkey"], pa.int32()),
                     "event_id": pa.array(out["event_id"], pa.int64()),
                     "knn_rank": pa.array(out["knn_rank"], pa.int64())})


def q_histogram(sf_dir: str):
    """GetHistogram semantics (gcore/gdalrasterband.cpp): fixed range
    [0, 1000), 20 buckets, out-of-range excluded; merged per-batch
    partial histograms (the scalable ComputeStatistics shape)."""
    LO, HI, NB = 0.0, 1000.0, 20
    width = (HI - LO) / NB
    ds = read_table(sf_dir, "events", ["value"])

    def f(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        v = v[(v >= LO) & (v < HI)]
        b = np.floor((v - LO) / width).astype(np.int64)
        return pa.table({"bucket": pa.array(b),
                         "one": pa.array(np.ones(len(b), np.int64))})

    out = partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                              ["bucket"], [("n", "one", "sum")])
    return pa.table({"bucket": out["bucket"], "n": out["n"]})


# ------------------------------------------------------------------ rasterize


def q_rasterize_points(sf_dir: str):
    """Burn derived points into a 64x64 global grid: count + ADD-merge
    sum per cell (gdal_rasterize MERGE_ALG=ADD on point geometries),
    as a cell-bucketed groupby-aggregate."""
    ds = _points_ds(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(); lat = t["lat"].to_numpy()
        cx = np.clip(np.floor((lon + 180.0) / 360.0 * GRID_N), 0, GRID_N - 1).astype(np.int64)
        cy = np.clip(np.floor((lat + 85.0) / 170.0 * GRID_N), 0, GRID_N - 1).astype(np.int64)
        return pa.table({"cell_x": pa.array(cx), "cell_y": pa.array(cy),
                         "value": t["value"]})

    out = partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                              ["cell_x", "cell_y"],
                              [("n", "value", "count_all"), ("burn_sum", "value", "sum")])
    return pa.table({
        "cell_x": out["cell_x"], "cell_y": out["cell_y"], "n": out["n"],
        "burn_sum": pa.array(round_away_np(out["burn_sum"].to_numpy(), 2)),
    })


# ------------------------------------------------------------------ oracles

_LON = _DERIVE_SQL[0]
_LAT = _DERIVE_SQL[1]
_CLAT = f"least(greatest({_LAT}, -85.0511287798066), 85.0511287798066)"

def q_hex_join(sf_dir: str):
    """The north rule's join shape verbatim: a partitioned hash-join
    on hex cell prefix followed by exact refinement.  Zone polygons
    are broadcast as a coarse-resolution aperture-7 hex covering
    (functions/hexgrid.py, the H3-style index) built once per actor;
    each point batch encodes its hex cell (vectorized), probes the
    covering dict for candidate zones only, and exact-tests the
    survivors.  Result must hash-match the plain SQL PIP aggregate —
    any covering-cell omission would change the counts.  At 100 TB
    the probe is a per-batch dict lookup against a broadcast index
    (no shuffle); only the tiny per-zone partials aggregate."""
    from ..functions.hexgrid import hex_cell, k_ring
    from .common import arrow_table

    nat = arrow_table(sf_dir, "nation", ["n_nationkey"])
    keys = nat["n_nationkey"].to_numpy().astype(np.int64)
    COARSE = 3

    class HexJoin:
        def __init__(self, zone_keys):
            self.bounds = {}
            cover: dict[int, list[int]] = {}
            for k in zone_keys:
                x0, x1 = -180.0 + 14.0 * k, -167.0 + 14.0 * k
                y0, y1 = -80.0 + 16.0 * (k % 10), -65.0 + 16.0 * (k % 10)
                self.bounds[int(k)] = (x0, x1, y0, y1)
                gx = np.linspace(x0, x1, 24)
                gy = np.linspace(y0, y1, 24)
                mx, my = np.meshgrid(gx, gy)
                cells = np.unique(hex_cell(mx.ravel(), my.ravel(), COARSE))
                dilated = np.unique(np.concatenate(
                    [k_ring(int(c), 1) for c in cells]))
                for c in dilated:
                    cover.setdefault(int(c), []).append(int(k))
            self.cover = {c: np.array(v, np.int64)
                          for c, v in cover.items()}

        def __call__(self, t: pa.Table) -> pa.Table:
            lon = t["lon"].to_numpy()
            lat = t["lat"].to_numpy()
            val = t["value"].to_numpy()
            cells = hex_cell(lon, lat, COARSE)
            out_key, out_val = [], []
            order = np.argsort(cells, kind="stable")
            cs = cells[order]
            starts = np.flatnonzero(np.concatenate(
                [[True], cs[1:] != cs[:-1]]))
            for s, e in zip(starts, np.append(starts[1:], len(cs))):
                cand = self.cover.get(int(cs[s]))
                if cand is None:
                    continue
                idx = order[s:e]
                for k in cand:
                    x0, x1, y0, y1 = self.bounds[int(k)]
                    m = ((lon[idx] > x0) & (lon[idx] < x1) &
                         (lat[idx] > y0) & (lat[idx] < y1))
                    if m.any():
                        out_key.append(np.full(int(m.sum()), k, np.int64))
                        out_val.append(val[idx][m])
            if not out_key:
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "value": pa.array([], pa.float64())})
            return pa.table({
                "n_nationkey": pa.array(np.concatenate(out_key)),
                "value": pa.array(np.concatenate(out_val))})

    joined = _points_ds(sf_dir).map_batches(
        HexJoin, fn_constructor_args=(keys,), batch_format="pyarrow",
        batch_size=4096, concurrency=2)
    out = partial_groupby_agg(joined, ["n_nationkey"],
                              [("n_points", "value", "count_all"),
                               ("sum_value", "value", "sum")])
    return pa.table({
        "n_nationkey": out["n_nationkey"],
        "n_points": out["n_points"],
        "sum_value": pa.array(round_away_np(out["sum_value"].to_numpy(),
                                            2)),
    })


_SWQ_LON = "(value * 7.0) % 360.0 - 180.0"
_SWQ_LAT = "(value * 3.0) % 170.0 - 85.0"


def q_sql_spatial(sf_dir: str):
    """SQLite-dialect ST_* functions through the ExecuteSQL planner
    (functions/sql_spatial.py re-deriving ogrsqlitesqlfunctions.cpp
    :124-675): per-event point construction, buffer area, distance to
    the hot cell, point-in-zone predicate — the same SQL a reference
    user would issue as `ExecuteSQL(..., dialect="SQLite")`.  Oracle:
    the analytic DuckDB recomputation (32-gon buffer area formula,
    hypot distance, bbox PIP)."""
    from ..functions.sql_exec import execute

    return execute(
        "SELECT event_id, "
        "ROUND(ST_AREA(ST_BUFFER(ST_MAKEPOINT("
        f"{_SWQ_LON}, {_SWQ_LAT}), 0.5)), 6) AS buf_area, "
        "ROUND(ST_DISTANCE(ST_MAKEPOINT("
        f"{_SWQ_LON}, {_SWQ_LAT}), "
        "ST_GEOMFROMTEXT('POINT (2.2945 48.8584)')), 6) AS d_hot, "
        "ST_INTERSECTS(ST_MAKEPOINT("
        f"{_SWQ_LON}, {_SWQ_LAT}), "
        "ST_GEOMFROMTEXT("
        "'POLYGON ((0 40, 10 40, 10 50, 0 50, 0 40))')) AS in_zone, "
        "ST_SRID(ST_MAKEPOINT("
        f"{_SWQ_LON}, {_SWQ_LAT})) AS srid "
        "FROM events", sf_dir)


ORACLE: dict[str, str] = {
    "q_hex_join": f"""
        SELECT n_nationkey, count(*) AS n_points,
               round(sum(value), 2) AS sum_value
        FROM events, nation
        WHERE ({_LON}) >  -180.0 + 14.0 * n_nationkey
          AND ({_LON}) <  -167.0 + 14.0 * n_nationkey
          AND ({_LAT}) >  -80.0 + 16.0 * (n_nationkey % 10)
          AND ({_LAT}) <  -65.0 + 16.0 * (n_nationkey % 10)
        GROUP BY n_nationkey
    """,
    "q_tile_assign": f"""
        SELECT event_id,
               CAST(least(floor((({_LON}) + 180.0) / 360.0 * 256.0), 255) AS BIGINT) AS tile_x,
               CAST(least(greatest(floor((1.0 - ln(tan(pi()/4.0 + radians({_CLAT})/2.0)) / pi()) / 2.0 * 256.0), 0), 255) AS BIGINT) AS tile_y
        FROM events
    """,
    "q_tile_counts": f"""
        SELECT CAST(least(floor((({_LON}) + 180.0) / 360.0 * 256.0), 255) AS BIGINT) AS tile_x,
               CAST(least(greatest(floor((1.0 - ln(tan(pi()/4.0 + radians({_CLAT})/2.0)) / pi()) / 2.0 * 256.0), 0), 255) AS BIGINT) AS tile_y,
               count(*) AS n_points
        FROM events GROUP BY 1, 2
    """,
    "q_pip_join": f"""
        SELECT event_id, n_nationkey
        FROM events, nation
        WHERE ({_LON}) >  -180.0 + 14.0 * n_nationkey
          AND ({_LON}) <  -167.0 + 14.0 * n_nationkey
          AND ({_LAT}) >  -80.0 + 16.0 * (n_nationkey % 10)
          AND ({_LAT}) <  -65.0 + 16.0 * (n_nationkey % 10)
    """,
    "q_zonal_stats": f"""
        SELECT n_nationkey, count(*) AS n_points,
               round(sum(value), 2) AS sum_value,
               round(sum(value) / count(*), 2) AS avg_value
        FROM events, nation
        WHERE ({_LON}) >  -180.0 + 14.0 * n_nationkey
          AND ({_LON}) <  -167.0 + 14.0 * n_nationkey
          AND ({_LAT}) >  -80.0 + 16.0 * (n_nationkey % 10)
          AND ({_LAT}) <  -65.0 + 16.0 * (n_nationkey % 10)
        GROUP BY n_nationkey
    """,
    "q_knn": f"""
        SELECT r_regionkey, event_id, knn_rank FROM (
            SELECT r_regionkey, event_id,
                   row_number() OVER (
                       PARTITION BY r_regionkey
                       ORDER BY (({_LON}) - (-150.0 + 60.0 * r_regionkey)) * (({_LON}) - (-150.0 + 60.0 * r_regionkey))
                              + (({_LAT}) - (-60.0 + 30.0 * (r_regionkey % 5))) * (({_LAT}) - (-60.0 + 30.0 * (r_regionkey % 5))),
                              event_id) AS knn_rank
            FROM region, events
        ) WHERE knn_rank <= 5
    """,
    "q_knn_partitioned": f"""
        SELECT r_regionkey, event_id, knn_rank FROM (
            SELECT r_regionkey, event_id,
                   row_number() OVER (
                       PARTITION BY r_regionkey
                       ORDER BY (({_LON}) - (-150.0 + 60.0 * r_regionkey)) * (({_LON}) - (-150.0 + 60.0 * r_regionkey))
                              + (({_LAT}) - (-60.0 + 30.0 * (r_regionkey % 5))) * (({_LAT}) - (-60.0 + 30.0 * (r_regionkey % 5))),
                              event_id) AS knn_rank
            FROM region, events
        ) WHERE knn_rank <= 5
    """,
    "q_histogram": f"""
        SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS n
        FROM events WHERE value >= 0.0 AND value < 1000.0
        GROUP BY 1
    """,
    "q_sql_spatial": f"""
        SELECT event_id,
               round(0.5 * 32.0 * 0.25 * sin(2.0 * pi() / 32.0), 6) AS buf_area,
               round(sqrt(pow(({_LON}) - 2.2945, 2) + pow(({_LAT}) - 48.8584, 2)), 6) AS d_hot,
               CAST(({_LON}) > 0.0 AND ({_LON}) < 10.0
                    AND ({_LAT}) > 40.0 AND ({_LAT}) < 50.0 AS BIGINT) AS in_zone,
               CAST(0 AS BIGINT) AS srid
        FROM events
    """,
    "q_rasterize_points": f"""
        SELECT CAST(least(greatest(floor((({_LON}) + 180.0) / 360.0 * 64.0), 0), 63) AS BIGINT) AS cell_x,
               CAST(least(greatest(floor((({_LAT}) + 85.0) / 170.0 * 64.0), 0), 63) AS BIGINT) AS cell_y,
               count(*) AS n, round(sum(value), 2) AS burn_sum
        FROM events GROUP BY 1, 2
    """,
}

QUERIES = {
    "q_sql_spatial": q_sql_spatial,
    "q_hex_join": q_hex_join,
    "q_tile_assign": q_tile_assign,
    "q_tile_counts": q_tile_counts,
    "q_cell_index": q_cell_index,
    "q_crs_transform": q_crs_transform,
    "q_pip_join": q_pip_join,
    "q_zonal_stats": q_zonal_stats,
    "q_knn": q_knn,
    "q_knn_partitioned": q_knn_partitioned,
    "q_histogram": q_histogram,
    "q_rasterize_points": q_rasterize_points,
}
