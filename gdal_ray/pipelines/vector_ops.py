"""Vector geometry-operation query surface (ogr2ogr GeomOperation set
+ layer algebra clip, SURVEY.md §2.2/§2.4).

The Ray side runs the real kernels (WKB codec -> numpy rings ->
Douglas-Peucker / segmentize / Sutherland-Hodgman / explode); the
DuckDB oracle computes the analytically-known results for the
rectangular nation-zone layer (no spatial extension available). This
verifies the *kernel plumbing row-for-row*; irregular-geometry
behavior is golden-tested in tests/test_geom_text.py.

Queries:
    q_geom_simplify   — -simplify tol (apps/ogr2ogr_lib.cpp
                        GeomOperation SIMPLIFY_PRESERVE_TOPOLOGY)
    q_geom_segmentize — -segmentize max_len (:260)
    q_clip_zones      — -clipsrc / layer-algebra Clip
                        (ogr2ogr_lib.cpp:310, ogrlayer.cpp Clip)
    q_explode         — -explodecollections (:349)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geom import (clip_ring_to_rect, geom_area, segmentize_ring,
                              simplify_ring)
from ..functions.wkb import (MULTIPOLYGON, Geom, geom_to_wkb, rect_polygon,
                             wkb_to_geom)
from .common import arrow_table, round_away_np
from .spatial_sql import nation_zones

CLIP_RECT = (-100.0, -50.0, 100.0, 50.0)
SEG_MAXLEN = 4.0


def _zones(sf_dir: str):
    nat = arrow_table(sf_dir, "nation", ["n_nationkey"])
    keys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))
    return keys, nation_zones(keys)


def q_geom_simplify(sf_dir: str):
    """Douglas-Peucker simplify (tol=0.5) on a densified copy of each
    zone ring: densify to max_len 2 first, then simplify — the result
    must recover exactly the 5 corner vertices."""
    keys, wkbs = _zones(sf_dir)
    out_n = []
    for w in wkbs:
        g = wkb_to_geom(w)
        dense = segmentize_ring(g.rings[0], 2.0)
        simp = simplify_ring(dense, 0.5)
        out_n.append(len(simp))
    return pa.table({"n_nationkey": pa.array(keys.astype(np.int32)),
                     "n_vertices": pa.array(out_n, pa.int64())})


def q_geom_segmentize(sf_dir: str):
    """Segmentize (max_len=4): vertex count per densified zone ring."""
    keys, wkbs = _zones(sf_dir)
    out_n = []
    for w in wkbs:
        g = wkb_to_geom(w)
        out_n.append(len(segmentize_ring(g.rings[0], SEG_MAXLEN)))
    return pa.table({"n_nationkey": pa.array(keys.astype(np.int32)),
                     "n_vertices": pa.array(out_n, pa.int64())})


def q_clip_zones(sf_dir: str):
    """Clip each zone to a window rect; report the clipped area
    (Sutherland-Hodgman through the real WKB round-trip)."""
    keys, wkbs = _zones(sf_dir)
    xmin, ymin, xmax, ymax = CLIP_RECT
    out_area = []
    for w in wkbs:
        g = wkb_to_geom(w)
        clipped = clip_ring_to_rect(g.rings[0], xmin, ymin, xmax, ymax)
        if len(clipped) < 4:
            out_area.append(0.0)
            continue
        cg = Geom(3, [clipped], [1])
        # round-trip through WKB (codec exercised on every row)
        out_area.append(geom_area(wkb_to_geom(geom_to_wkb(cg))))
    return pa.table({
        "n_nationkey": pa.array(keys.astype(np.int32)),
        "clip_area": pa.array(round_away_np(np.array(out_area), 2)),
    })


def q_explode(sf_dir: str):
    """-explodecollections: build a MultiPolygon (zone + its 1x1
    corner marker) per nation, explode into single-polygon rows."""
    keys, wkbs = _zones(sf_dir)
    rows_key, rows_part, rows_area = [], [], []
    for k, w in zip(keys.tolist(), wkbs):
        g = wkb_to_geom(w)
        marker = rect_polygon(-200.0 + k, -95.0, -199.0 + k, -94.0)
        multi = Geom(MULTIPOLYGON, [g.rings[0], marker.rings[0]], [1, 1])
        mg = wkb_to_geom(geom_to_wkb(multi))  # codec round-trip
        i = 0
        for part, cnt in enumerate(mg.poly_ring_counts):
            sub = Geom(3, mg.rings[i:i + cnt], [cnt])
            rows_key.append(k)
            rows_part.append(part)
            rows_area.append(geom_area(sub))
            i += cnt
    return pa.table({
        "n_nationkey": pa.array(rows_key, pa.int32()),
        "part": pa.array(rows_part, pa.int64()),
        "area": pa.array(round_away_np(np.array(rows_area), 2)),
    })


REGION_Y = (-40.0, 40.0)  # B-layer window rects span this lat band


def _region_rects(sf_dir: str):
    reg = arrow_table(sf_dir, "region", ["r_regionkey"])
    keys = np.sort(reg["r_regionkey"].to_numpy().astype(np.int64))
    wkbs = [geom_to_wkb(rect_polygon(-180.0 + 72.0 * k, REGION_Y[0],
                                     -108.0 + 72.0 * k, REGION_Y[1]))
            for k in keys.tolist()]
    return keys, wkbs


def _algebra_ds(sf_dir: str):
    import ray.data

    from ..stages.layer_algebra import LayerAlgebra

    keys, zone_wkbs = _zones(sf_dir)
    a = pa.table({"fid": pa.array(keys), "geometry": pa.array(zone_wkbs, pa.binary())})
    b_keys, b_wkbs = _region_rects(sf_dir)
    ds = ray.data.from_arrow(a).repartition(4)
    return ds.map_batches(LayerAlgebra, fn_constructor_args=(b_keys, b_wkbs),
                          batch_format="pyarrow", batch_size=8, concurrency=2)


def q_layer_intersection(sf_dir: str):
    """Layer algebra Intersection (nation zones x region bands):
    broadcast B + envelope pre-filter + exact convex clip — the
    ogrlayer.cpp:3345 join shape. Oracle = analytic rect overlap."""
    import pyarrow.compute as pc

    ds = _algebra_ds(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "inter"))
        return pa.table({
            "n_nationkey": pc.cast(t["a_fid"], pa.int32()),
            "r_regionkey": pc.cast(t["b_fid"], pa.int32()),
            "inter_area": pa.array(round_away_np(t["area"].to_numpy(), 2)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_layer_erase(sf_dir: str):
    """Layer algebra Erase: zone minus all region bands (exact since
    the bands don't overlap each other)."""
    import pyarrow.compute as pc

    ds = _algebra_ds(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "erase"))
        return pa.table({
            "n_nationkey": pc.cast(t["a_fid"], pa.int32()),
            "erase_area": pa.array(round_away_np(t["area"].to_numpy(), 2)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_layer_union_symdiff(sf_dir: str):
    """Layer algebra Union / SymDifference areas per (A, B) pair:
    derived from the exact intersection (union = a + b - i, symdiff =
    a + b - 2i — reference ogrlayer.cpp Union :3763 / SymDifference
    :4300 compute the same value space on geometries)."""
    import pyarrow.compute as pc

    ds = _algebra_ds(sf_dir)
    ZONE_AREA = 13.0 * 15.0
    BAND_AREA = 72.0 * (REGION_Y[1] - REGION_Y[0])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], "inter"))
        inter = t["area"].to_numpy()
        return pa.table({
            "n_nationkey": pc.cast(t["a_fid"], pa.int32()),
            "r_regionkey": pc.cast(t["b_fid"], pa.int32()),
            "union_area": pa.array(round_away_np(
                ZONE_AREA + BAND_AREA - inter, 2)),
            "symdiff_area": pa.array(round_away_np(
                ZONE_AREA + BAND_AREA - 2.0 * inter, 2)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_layer_nonconvex(sf_dir: str):
    """NON-CONVEX layer algebra: each region's B feature is an
    L-shaped (rectilinear) polygon; the Ray side clips every nation
    zone against it with the general Greiner-Hormann overlay
    (functions/overlay.py — no convexity assumption), while the SQL
    oracle computes the same area by rectangle inclusion-exclusion
    (the L is two interior-disjoint rects)."""
    from ..functions.overlay import polygon_intersection_area

    keys, zone_wkbs = _zones(sf_dir)
    reg = arrow_table(sf_dir, "region", ["r_regionkey"])
    rkeys = np.sort(reg["r_regionkey"].to_numpy().astype(np.int64))

    def l_ring(r: int) -> np.ndarray:
        x0 = -150.0 + 70.0 * r
        return np.array([
            (x0, -40.0), (x0 + 40.0, -40.0), (x0 + 40.0, -20.0),
            (x0 + 60.0, -20.0), (x0 + 60.0, 0.0), (x0 + 40.0, 0.0),
            (x0 + 40.0, 20.0), (x0, 20.0), (x0, -40.0)], np.float64)

    rows = {"n_nationkey": [], "r_regionkey": [], "inter_area": []}
    for k, w in zip(keys.tolist(), zone_wkbs):
        zone = wkb_to_geom(w).rings[0]
        for r in rkeys.tolist():
            area = round_away_np(np.array(
                [polygon_intersection_area(zone, l_ring(int(r)))]), 2)[0]
            if area > 0:
                rows["n_nationkey"].append(k)
                rows["r_regionkey"].append(int(r))
                rows["inter_area"].append(area)
    return pa.table({
        "n_nationkey": pa.array(rows["n_nationkey"], pa.int32()),
        "r_regionkey": pa.array(rows["r_regionkey"], pa.int32()),
        "inter_area": pa.array(round_away_np(np.array(rows["inter_area"]), 2)),
    })


def q_constructive(sf_dir: str):
    """Constructive geometry over the real kernels
    (functions/constructive.py — OGRGeometry::Buffer / Delaunay /
    MakeValid analogs, ogr/ogr_geometry.h:563-591), SQL-verified via
    the analytic identities: buffer area = A + P*r + n-gon disc;
    Delaunay count = 2n - hull - 2 with triangle areas summing to the
    bounding square; bow-tie MakeValid area = w*h/2."""
    from ..functions.constructive import (buffer_area, delaunay,
                                          make_valid_area)
    from ..functions.geom import ring_area as _ra

    keys, wkbs = _zones(sf_dir)
    R = 1.5
    rows = {"n_nationkey": [], "buffer_area": [], "n_triangles": [],
            "tri_area": [], "makevalid_area": []}
    for k, w in zip(keys.tolist(), wkbs):
        zone = wkb_to_geom(w).rings[0]
        rows["n_nationkey"].append(k)
        rows["buffer_area"].append(buffer_area(zone, R))
        side = 3 + k % 3
        pts = np.array([(x, y) for y in range(side) for x in range(side)],
                       np.float64)
        tris = delaunay(pts)
        rows["n_triangles"].append(len(tris))
        rows["tri_area"].append(sum(
            abs(_ra(np.vstack([pts[t], pts[t[:1]]]))) for t in tris))
        bw, bh = 2.0 + k % 5, 3.0
        bow = np.array([(0, 0), (bw, bh), (bw, 0), (0, bh)], np.float64)
        rows["makevalid_area"].append(make_valid_area(bow))
    return pa.table({
        "n_nationkey": pa.array(rows["n_nationkey"], pa.int32()),
        "buffer_area": pa.array(round_away_np(
            np.array(rows["buffer_area"]), 2)),
        "n_triangles": pa.array(rows["n_triangles"], pa.int64()),
        "tri_area": pa.array(round_away_np(np.array(rows["tri_area"]), 2)),
        "makevalid_area": pa.array(round_away_np(
            np.array(rows["makevalid_area"]), 2)),
    })


_GPKG_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1.gpkg"


def q_gpkg_layer(sf_dir: str):
    """Real vector file format (VERDICT r2 Missing #2): the canonical
    polygon + point fixtures written to a conformant GeoPackage
    (sources/gpkg.py, stdlib sqlite3), the zones layer read back
    through the fid-range-sharded Ray reader, per-category aggregate
    over the decoded attributes. Deterministic (corpus-only) —
    oracle is a pinned literal VALUES table.

    Reference parity: GPKG blob header per
    ogr/ogrsf_frmts/gpkg/ogrgeopackageutility.cpp:352."""
    import os

    from ..sources.gpkg import gpkg_dataset, write_gpkg
    from ..sources.vector import points_table, polygons_table
    from .common import partial_groupby_agg

    if not os.path.exists(_GPKG_FIXTURE):
        os.makedirs(os.path.dirname(_GPKG_FIXTURE), exist_ok=True)
        tmp = _GPKG_FIXTURE + f".tmp{os.getpid()}"
        write_gpkg(tmp, {"zones": polygons_table(64),
                         "pts": points_table(256)})
        os.replace(tmp, _GPKG_FIXTURE)

    ds = gpkg_dataset(_GPKG_FIXTURE, "zones",
                      columns=["category", "pop", "area_expected"],
                      num_shards=4)
    agg = partial_groupby_agg(ds, ["category"], [
        ("n", "fid", "count"),
        ("pop_sum", "pop", "sum"),
        ("area_sum", "area_expected", "sum"),
    ])
    agg = agg.sort_by("category")
    return pa.table({
        "category": agg["category"],
        "n": agg["n"].cast(pa.int64()),
        "pop_sum": agg["pop_sum"].cast(pa.int64()),
        "area_sum": pa.array(round_away_np(
            agg["area_sum"].to_numpy(zero_copy_only=False), 6)),
    })


_GJL_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1.geojsonl"


def q_geojson_layer(sf_dir: str):
    """Second real vector file format: the canonical point fixture as
    newline-delimited GeoJSON (GeoJSONSeq, reference
    ogr/ogrsf_frmts/geojson/ogrgeojsonseqdriver.cpp), read back through
    the byte-range-sharded Ray reader (sources/geojson.py), altitude-
    bucket aggregate over the decoded attributes. Deterministic
    (corpus-only) — oracle is a pinned literal VALUES table."""
    import os

    from ..sources.geojson import geojsonl_dataset, write_geojsonl
    from ..sources.vector import points_table
    from .common import partial_groupby_agg

    if not os.path.exists(_GJL_FIXTURE):
        os.makedirs(os.path.dirname(_GJL_FIXTURE), exist_ok=True)
        tmp = _GJL_FIXTURE + f".tmp{os.getpid()}"
        write_geojsonl(tmp, points_table(256).drop_columns(["tags", "t"]),
                       precision=12)
        os.replace(tmp, _GJL_FIXTURE)

    ds = geojsonl_dataset(_GJL_FIXTURE, columns=["x", "y", "z"], num_shards=4)
    ds = ds.add_column("zband", lambda t: pa.compute.floor(
        pa.compute.divide(t["z"], 200.0)), batch_format="pyarrow")
    agg = partial_groupby_agg(ds, ["zband"], [
        ("n", "fid", "count"),
        ("x_sum", "x", "sum"),
        ("y_sum", "y", "sum"),
    ])
    agg = agg.sort_by("zband")
    return pa.table({
        "zband": agg["zband"].cast(pa.int64()),
        "n": agg["n"].cast(pa.int64()),
        "x_sum": pa.array(round_away_np(
            agg["x_sum"].to_numpy(zero_copy_only=False), 6)),
        "y_sum": pa.array(round_away_np(
            agg["y_sum"].to_numpy(zero_copy_only=False), 6)),
    })


_FGB_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1.fgb"


def q_fgb_layer(sf_dir: str):
    """Third real vector file format: the canonical polygon fixture as
    FlatGeobuf (sources/fgb.py — pure-Python flatbuffers codec +
    packed Hilbert R-tree per ogr/ogrsf_frmts/flatgeobuf/
    packedrtree.cpp), read back through the R-tree-sharded Ray reader
    with a hot-cluster bbox pushed down THROUGH the index, per-category
    aggregate. Deterministic (corpus-only) — pinned literal oracle."""
    import os

    from ..sources.fgb import fgb_dataset, write_fgb
    from ..sources.vector import polygons_table
    from .common import partial_groupby_agg

    if not os.path.exists(_FGB_FIXTURE):
        os.makedirs(os.path.dirname(_FGB_FIXTURE), exist_ok=True)
        tmp = _FGB_FIXTURE + f".tmp{os.getpid()}"
        write_fgb(tmp, polygons_table(64), name="zones")
        os.replace(tmp, _FGB_FIXTURE)

    ds = fgb_dataset(_FGB_FIXTURE, columns=["category", "pop"],
                     bbox=(2.25, 48.8, 2.35, 48.92), num_shards=4)
    agg = partial_groupby_agg(ds, ["category"], [
        ("n", "fid", "count"),
        ("pop_sum", "pop", "sum"),
    ])
    agg = agg.sort_by("category")
    return pa.table({
        "category": agg["category"],
        "n": agg["n"].cast(pa.int64()),
        "pop_sum": agg["pop_sum"].cast(pa.int64()),
    })


_SHP_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1"


def q_shp_layer(sf_dir: str):
    """Fourth real vector file format: the canonical polygon fixture
    written as an ESRI Shapefile (sources/shapefile.py — .shp/.shx
    record framing per the published ESRI whitepaper and the
    reference's shpopen.c/dbfopen.c, ring winding per shape2ogr.cpp),
    read back through the .shx-index-sharded Ray reader, per-category
    aggregate over the decoded dBase attributes. Deterministic
    (corpus-only) — oracle is a pinned literal VALUES table. The
    geometry column round-trips bit-exactly (float64 coordinates);
    the numeric dBase attributes are fixed-width decimal, so the
    aggregate uses the integer column only."""
    import os

    from ..sources.shapefile import shapefile_dataset, write_shapefile
    from ..sources.vector import polygons_table
    from .common import partial_groupby_agg

    if not os.path.exists(_SHP_FIXTURE + ".shp"):
        os.makedirs(os.path.dirname(_SHP_FIXTURE), exist_ok=True)
        tmp = _SHP_FIXTURE + f".tmp{os.getpid()}"
        write_shapefile(tmp, polygons_table(64))
        # publish the sidecars FIRST: the existence guard checks only
        # .shp, so a crash between replaces must never leave a .shp
        # without its .shx/.dbf (permanent wedge)
        for ext in (".shx", ".dbf", ".shp"):
            os.replace(tmp + ext, _SHP_FIXTURE + ext)

    ds = shapefile_dataset(_SHP_FIXTURE, columns=["category", "pop"],
                           num_shards=4)
    agg = partial_groupby_agg(ds, ["category"], [
        ("n", "fid", "count"),
        ("pop_sum", "pop", "sum"),
    ])
    agg = agg.sort_by("category")
    return pa.table({
        "category": agg["category"],
        "n": agg["n"].cast(pa.int64()),
        "pop_sum": agg["pop_sum"].cast(pa.int64()),
    })


_CSV_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1.csv"


def q_csv_layer(sf_dir: str):
    """Fifth real vector file format: the canonical point fixture as
    OGR CSV (sources/ogrcsv.py — AS_XY geometry + .csvt type sidecar
    per ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp), read back through the
    byte-range-sharded pyarrow.csv reader; the per-bucket coordinate
    sums are taken from the DECODED WKB geometry column (proving the
    X/Y possible-name geometry resolution), z from the typed
    attribute. Deterministic (corpus-only) — pinned literal oracle."""
    import os

    from ..functions.wkb import wkb_to_points
    from ..sources.ogrcsv import csv_dataset, write_csv_layer
    from ..sources.vector import points_table
    from .common import partial_groupby_agg

    if not os.path.exists(_CSV_FIXTURE):
        os.makedirs(os.path.dirname(_CSV_FIXTURE), exist_ok=True)
        tmp = _CSV_FIXTURE + f".tmp{os.getpid()}"
        write_csv_layer(tmp, points_table(256).drop_columns(
            ["tags", "t", "x", "y"]), geometry="AS_XY", create_csvt=True)
        # type sidecar FIRST: the guard checks only the .csv, so the
        # .csvt must already be in place when the .csv appears
        os.replace(os.path.splitext(tmp)[0] + ".csvt",
                   os.path.splitext(_CSV_FIXTURE)[0] + ".csvt")
        os.replace(tmp, _CSV_FIXTURE)

    ds = csv_dataset(_CSV_FIXTURE, num_shards=4)

    def derive(t: pa.Table) -> pa.Table:
        gx, gy = wkb_to_points(t["geometry"].to_pylist())
        return pa.table({
            "zband": pa.compute.floor(pa.compute.divide(t["z"], 200.0)),
            "fid": t["fid"],
            "gx": pa.array(gx),
            "gy": pa.array(gy),
        })

    agg = partial_groupby_agg(ds.map_batches(derive, batch_format="pyarrow"),
                              ["zband"], [
        ("n", "fid", "count"),
        ("gx_sum", "gx", "sum"),
        ("gy_sum", "gy", "sum"),
    ])
    agg = agg.sort_by("zband")
    return pa.table({
        "zband": agg["zband"].cast(pa.int64()),
        "n": agg["n"].cast(pa.int64()),
        "gx_sum": pa.array(round_away_np(
            agg["gx_sum"].to_numpy(zero_copy_only=False), 6)),
        "gy_sum": pa.array(round_away_np(
            agg["gy_sum"].to_numpy(zero_copy_only=False), 6)),
    })


class ReprojectGeoms:
    """ogr2ogr -t_srs as a stateful actor stage: the coordinate
    transformer is built once per actor (the OGRProjCT cache pattern,
    reference ogr/ogrct.cpp:1654 + apps/ogr2ogr_lib.cpp:474-478
    per-layer CT reuse) and applied vectorized per batch. Point
    columns take the fully-vectorized WKB fast path; general
    geometries transform ring-by-ring."""

    def __init__(self, src: int | str, dst: int | str,
                 geometry_col: str = "geometry"):
        from ..functions.crs import Transformer

        self.tr = Transformer(src, dst)
        self.col = geometry_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.wkb import (points_to_wkb, wkb_to_geom,
                                     wkb_to_points)

        blobs = t[self.col].to_pylist()
        if blobs and all(b is not None and len(b) == 21 for b in blobs):
            x, y = wkb_to_points(blobs)           # vectorized points path
            nx, ny = self.tr.transform(x, y)
            out = points_to_wkb(nx, ny)
        else:
            out = []
            for b in blobs:
                if b is None:
                    out.append(None)
                    continue
                g = wkb_to_geom(b)
                g2 = Geom(g.kind,
                          [np.column_stack(self.tr.transform(r[:, 0],
                                                             r[:, 1]))
                           for r in g.rings],
                          list(g.poly_ring_counts), zs=g.zs)
                out.append(geom_to_wkb(g2))
        i = t.column_names.index(self.col)
        return t.set_column(i, self.col, pa.array(out, pa.binary()))


def q_vector_reproject(sf_dir: str):
    """ogr2ogr -t_srs EPSG:3857 over the events-derived point layer:
    WKB points reprojected 4326 -> 3857 in an actor pool (transformer
    cached per actor), coordinates re-read from the produced WKB. The
    DuckDB oracle recomputes the spherical-mercator closed form —
    a full computed-oracle check of the CRS engine through the vector
    path."""
    from ..functions.wkb import points_to_wkb, wkb_to_points
    from .common import read_table
    from .spatial_sql import derive_lonlat

    ds = read_table(sf_dir, "events", ["event_id", "value"])

    def mk(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(
            pa.compute.bit_wise_and(t["event_id"], 7), 2))
        lon, lat = derive_lonlat(t["value"].to_numpy())
        return pa.table({"event_id": t["event_id"],
                         "geometry": pa.array(points_to_wkb(lon, lat),
                                              pa.binary())})

    proj = ds.map_batches(mk, batch_format="pyarrow").map_batches(
        ReprojectGeoms, fn_constructor_args=(4326, 3857),
        batch_format="pyarrow", concurrency=(1, 4))

    def unpack(t: pa.Table) -> pa.Table:
        x, y = wkb_to_points(t["geometry"].to_pylist())
        return pa.table({"event_id": t["event_id"],
                         "mx": pa.array(round_away_np(x, 3)),
                         "my": pa.array(round_away_np(y, 3))})

    return proj.map_batches(unpack, batch_format="pyarrow")


_REPROJ_SQL = """
SELECT event_id,
       ROUND(6378137.0 * RADIANS(fmod(value * 7.0, 360.0) - 180.0), 3) AS mx,
       ROUND(6378137.0 * LN(TAN(PI()/4.0 +
             RADIANS(GREATEST(LEAST(fmod(value * 3.0, 170.0) - 85.0,
                                    85.0511287798066),
                              -85.0511287798066)) / 2.0)), 3) AS my
FROM events WHERE (event_id & 7) = 2
"""


def q_layer_info(sf_dir: str):
    """ogrinfo -so layer summary (OGRLayer::GetFeatureCount +
    GetExtent, reference ogr/ogrsf_frmts/ogrsf_frmts.h:260): feature
    count and layer extent computed FROM the WKB geometry column via
    distributed min/max partials; the oracle recomputes the extent
    arithmetically."""
    from ..functions.wkb import points_to_wkb, wkb_to_points
    from .common import read_table
    from .spatial_sql import derive_lonlat

    ds = read_table(sf_dir, "events", ["event_id", "value"])

    def mk(t: pa.Table) -> pa.Table:
        lon, lat = derive_lonlat(t["value"].to_numpy())
        wkb = points_to_wkb(lon, lat)
        x, y = wkb_to_points(wkb)  # extent read back from real WKB
        return pa.table({"layer": pa.array(["events_pts"] * len(x)),
                         "x": pa.array(x), "y": pa.array(y)})

    from .common import partial_groupby_agg

    agg = partial_groupby_agg(ds.map_batches(mk, batch_format="pyarrow"),
                              ["layer"], [
        ("n", "x", "count"),
        ("minx", "x", "min"),
        ("maxx", "x", "max"),
        ("miny", "y", "min"),
        ("maxy", "y", "max"),
    ])
    return pa.table({
        "layer": agg["layer"],
        "n": agg["n"].cast(pa.int64()),
        "minx": pa.array(round_away_np(
            agg["minx"].to_numpy(zero_copy_only=False), 6)),
        "maxx": pa.array(round_away_np(
            agg["maxx"].to_numpy(zero_copy_only=False), 6)),
        "miny": pa.array(round_away_np(
            agg["miny"].to_numpy(zero_copy_only=False), 6)),
        "maxy": pa.array(round_away_np(
            agg["maxy"].to_numpy(zero_copy_only=False), 6)),
    })


_LAYER_INFO_SQL = """
SELECT 'events_pts' AS layer, COUNT(*) AS n,
       ROUND(MIN(fmod(value * 7.0, 360.0) - 180.0), 6) AS minx,
       ROUND(MAX(fmod(value * 7.0, 360.0) - 180.0), 6) AS maxx,
       ROUND(MIN(fmod(value * 3.0, 170.0) - 85.0), 6) AS miny,
       ROUND(MAX(fmod(value * 3.0, 170.0) - 85.0), 6) AS maxy
FROM events
"""


_ARROW_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1.feather"


def q_arrow_layer(sf_dir: str):
    """Eighth real vector format: Arrow IPC / Feather V2 with OGR's
    'geo' WKB metadata (ogr/ogrsf_frmts/arrow), read back through the
    footer-addressed batch-sharded Ray reader; aggregate coordinates
    come from the decoded WKB geometry. Deterministic — pinned literal
    oracle (same expected values as q_csv_layer's geometry sums: the
    two formats carry identical features)."""
    import os

    from ..functions.wkb import wkb_to_points
    from ..sources.arrowipc import feather_dataset, write_feather
    from ..sources.vector import points_table
    from .common import partial_groupby_agg

    if not os.path.exists(_ARROW_FIXTURE):
        os.makedirs(os.path.dirname(_ARROW_FIXTURE), exist_ok=True)
        tmp = _ARROW_FIXTURE + f".tmp{os.getpid()}"
        write_feather(tmp, points_table(256).drop_columns(["tags", "t"]),
                      crs_epsg=4326, batch_rows=32)
        os.replace(tmp, _ARROW_FIXTURE)

    ds = feather_dataset(_ARROW_FIXTURE, columns=["fid", "z", "geometry"],
                         num_shards=4)

    def derive(t: pa.Table) -> pa.Table:
        gx, gy = wkb_to_points(t["geometry"].to_pylist())
        return pa.table({
            "zband": pa.compute.floor(pa.compute.divide(t["z"], 200.0)),
            "fid": t["fid"],
            "gx": pa.array(gx),
            "gy": pa.array(gy),
        })

    agg = partial_groupby_agg(ds.map_batches(derive, batch_format="pyarrow"),
                              ["zband"], [
        ("n", "fid", "count"),
        ("gx_sum", "gx", "sum"),
        ("gy_sum", "gy", "sum"),
    ])
    agg = agg.sort_by("zband")
    return pa.table({
        "zband": agg["zband"].cast(pa.int64()),
        "n": agg["n"].cast(pa.int64()),
        "gx_sum": pa.array(round_away_np(
            agg["gx_sum"].to_numpy(zero_copy_only=False), 6)),
        "gy_sum": pa.array(round_away_np(
            agg["gy_sum"].to_numpy(zero_copy_only=False), 6)),
    })


_XML_FIXDIR = "/tmp/gdal_ray_fixtures"


def q_kml_gml_layer(sf_dir: str):
    """Sixth + seventh real vector formats: the polygon fixture written
    as KML (Folder of Placemarks + ExtendedData, sources/kml.py) and
    OGR-style GML3 (featureMember / gml:posList, sources/gml.py), each
    parsed back in a worker task (single-XML-document formats ride the
    per-file task path), per-(fmt, category) aggregates from the
    decoded attributes AND ring vertex counts from the decoded WKB —
    both formats must agree exactly. Deterministic — pinned literal
    oracle. Parsers golden-tested against the reference's own
    samples.kml / expected_gml_gml3.gml expectations."""
    import os

    import ray.data

    from ..functions.wkb import wkb_to_geom
    from ..sources.gml import read_gml, write_gml
    from ..sources.kml import read_kml, write_kml
    from ..sources.vector import polygons_table
    from .common import partial_groupby_agg

    kml_path = os.path.join(_XML_FIXDIR, "vector_fixture_v1.kml")
    gml_path = os.path.join(_XML_FIXDIR, "vector_fixture_v1.gml")
    if not (os.path.exists(kml_path) and os.path.exists(gml_path)):
        os.makedirs(_XML_FIXDIR, exist_ok=True)
        zones = polygons_table(64)
        tmp = kml_path + f".tmp{os.getpid()}"
        write_kml(tmp, zones.drop_columns(["area_expected"]),
                  layer_name="zones", name_col=None, desc_col=None)
        os.replace(tmp, kml_path)
        tmp = gml_path + f".tmp{os.getpid()}"
        write_gml(tmp, zones.drop_columns(["area_expected"]),
                  layer_name="zones")
        os.replace(tmp, gml_path)

    items = [{"fmt": "kml", "path": kml_path},
             {"fmt": "gml", "path": gml_path}]

    def load(b: pa.Table) -> pa.Table:
        out = []
        for row in b.to_pylist():
            if row["fmt"] == "kml":
                lyr = read_kml(row["path"])["zones"]
                cats = lyr["category"].to_pylist()          # ExtendedData
                pops = [int(p) for p in lyr["pop"].to_pylist()]
            else:
                lyr = read_gml(row["path"])["zones"]
                cats = lyr["category"].to_pylist()
                pops = lyr["pop"].to_pylist()
            verts = [len(wkb_to_geom(g).rings[0])
                     for g in lyr["geometry"].to_pylist()]
            out.append(pa.table({
                "fmt": pa.array([row["fmt"]] * lyr.num_rows, pa.string()),
                "category": pa.array([str(c) for c in cats], pa.string()),
                "pop": pa.array(pops, pa.int64()),
                "verts": pa.array(verts, pa.int64()),
            }))
        return pa.concat_tables(out)

    ds = ray.data.from_items(items, override_num_blocks=2).map_batches(
        load, batch_format="pyarrow", batch_size=1)
    agg = partial_groupby_agg(ds, ["fmt", "category"], [
        ("n", "pop", "count"),
        ("pop_sum", "pop", "sum"),
        ("verts_sum", "verts", "sum"),
    ])
    agg = agg.sort_by([("fmt", "ascending"), ("category", "ascending")])
    return pa.table({
        "fmt": agg["fmt"],
        "category": agg["category"],
        "n": agg["n"].cast(pa.int64()),
        "pop_sum": agg["pop_sum"].cast(pa.int64()),
        "verts_sum": agg["verts_sum"].cast(pa.int64()),
    })


def q_gpx_layer(sf_dir: str):
    """GPX vector driver (ogr/ogrsf_frmts/gpx): a deterministic
    waypoints+tracks GPX written through the driver's writer, parsed
    back in a worker task into the five OGR layers, per-layer
    aggregates from the decoded WKB; plus structural golden rows from
    the reference's own test.gpx (waypoint ele/link fields, empty
    LINESTRING/MULTILINESTRING handling, route/track point
    back-references — the ogr_gpx.py expectations)."""
    import os

    import ray.data

    from ..functions.wkb import wkb_to_geom
    from ..sources.gpx import read_gpx, write_gpx

    path = os.path.join(_XML_FIXDIR, "vector_fixture_v1.gpx")
    if not os.path.exists(path):
        os.makedirs(_XML_FIXDIR, exist_ok=True)
        from ..functions.wkb import Geom, geom_to_wkb

        ids = np.arange(40)
        lon = -120.0 + (ids * 7 % 40) * 0.25
        lat = 30.0 + (ids * 11 % 30) * 0.125
        wpts = pa.table({
            "geometry": pa.array(
                [geom_to_wkb(Geom(1, [np.array([[x, y]])]))
                 for x, y in zip(lon, lat)], pa.binary()),
            "ele": pa.array((ids % 17).astype(np.float64)),
            "name": pa.array([f"wp{i:02d}" for i in ids], pa.string()),
        })
        trks = []
        for t in range(8):
            parts = []
            for s in range(2):
                k = np.arange(5)
                parts.append(np.stack([
                    -100.0 + t + 0.1 * k + 0.5 * s,
                    40.0 + 0.05 * k * (s + 1)], axis=1))
            trks.append(geom_to_wkb(Geom(5, parts)))
        trk_t = pa.table({
            "geometry": pa.array(trks, pa.binary()),
            "name": pa.array([f"trk{t}" for t in range(8)], pa.string()),
        })
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(write_gpx(waypoints=wpts, tracks=trk_t))
        os.replace(tmp, path)

    def load(b: pa.Table) -> pa.Table:
        rows = []
        for row in b.to_pylist():
            layers = read_gpx(row["path"])
            for lname, t in sorted(layers.items()):
                verts = sum(sum(len(r) for r in wkb_to_geom(g).rings)
                            for g in t["geometry"].to_pylist())
                ele = 0.0
                if "ele" in t.column_names:
                    ele = sum(v for v in t["ele"].to_pylist()
                              if v is not None)
                rows.append((row["case"] + ":" + lname, t.num_rows,
                             verts, int(round(ele * 100))))
        return pa.table({
            "case": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "verts": pa.array([r[2] for r in rows], pa.int64()),
            "ele_x100": pa.array([r[3] for r in rows], pa.int64())})

    items = [{"case": "fixture", "path": path},
             {"case": "test.gpx",
              "path": "/root/reference/autotest/ogr/data/gpx/test.gpx"}]
    return ray.data.from_items(items, override_num_blocks=2).map_batches(
        load, batch_format="pyarrow", batch_size=1)


_SL_FIXTURE = "/tmp/gdal_ray_fixtures/vector_fixture_v1.sqlite"


def q_sqlite_layer(sf_dir: str):
    """SQLite / SpatiaLite vector driver (ogr/ogrsf_frmts/sqlite):
    the polygon fixture written as a SpatiaLite DB (stdlib sqlite3 +
    SpatiaLite geometry blobs), read back through the rowid-sharded
    Ray reader, per-category aggregates; plus golden rows from the
    reference's own poly_spatialite.sqlite (COMPRESSED-geometry
    decode: the stored area field vs the shoelace area of the
    decoded rings must agree to float32-delta precision)."""
    import os

    import ray.data

    from ..functions.wkb import wkb_to_geom
    from ..sources.spatialite import (read_sqlite_layer, sqlite_dataset,
                                      write_sqlite)
    from ..sources.vector import polygons_table
    from .common import partial_groupby_agg

    if not os.path.exists(_SL_FIXTURE):
        os.makedirs(os.path.dirname(_SL_FIXTURE), exist_ok=True)
        tmp = _SL_FIXTURE + f".tmp{os.getpid()}"
        write_sqlite(tmp, {"zones": polygons_table(64)})
        os.replace(tmp, _SL_FIXTURE)

    ds = sqlite_dataset(_SL_FIXTURE, "zones", shard_rows=16)
    agg = partial_groupby_agg(ds, ["category"], [
        ("n", "fid", "count"),
        ("pop_sum", "pop", "sum"),
    ])
    agg = agg.sort_by("category")
    fixture = pa.table({
        "category": agg["category"],
        "n": agg["n"].cast(pa.int64()),
        "pop_sum": agg["pop_sum"].cast(pa.int64()),
    })

    def golden(b: pa.Table) -> pa.Table:
        t = read_sqlite_layer(
            "/root/reference/autotest/ogr/data/sqlite/poly_spatialite.sqlite",
            "poly")
        areas = np.asarray(t["area"].to_pylist())

        def shoelace(r):
            x, y = r[:, 0], r[:, 1]
            return 0.5 * abs(np.dot(x, np.roll(y, -1))
                             - np.dot(y, np.roll(x, -1)))

        calc = np.array([
            sum(shoelace(r) * (1 if i == 0 else -1)
                for i, r in enumerate(wkb_to_geom(g).rings))
            for g in t["geometry"].to_pylist()])
        ok = int(np.all(np.abs(calc - areas) / areas < 1e-6))
        return pa.table({
            "category": pa.array(["__golden_poly__"]),
            "n": pa.array([t.num_rows], pa.int64()),
            "pop_sum": pa.array(
                [int(round(float(t["eas_id"].to_numpy().sum()))) * ok],
                pa.int64())})

    gold = ray.data.from_items([{"go": 1}]).map_batches(
        golden, batch_format="pyarrow")
    return ray.data.from_arrow(fixture).union(gold)


def q_zfield_precision(sf_dir: str):
    """ogr2ogr -zfield + -xyRes/-zRes coordinate precision
    (apps/ogr2ogr_lib.cpp zField -> setZ; OGRGeomCoordinatePrecision,
    OGRGeometry::roundCoordinates): events become POINT Z features
    whose Z comes from the value field, coordinates snapped to
    xy_res=0.01 / z_res=0.1 with std::round (half away from zero)
    semantics, written and re-read through the vectorized ISO
    POINT Z WKB codec. Streams as map_batches; the oracle recomputes
    the snapping arithmetic in SQL."""
    from ..functions.wkb import (points_to_wkb_z, snap_resolution,
                                 wkb_to_points_z)
    from .common import read_table
    from .spatial_sql import derive_lonlat

    ds = read_table(sf_dir, "events", ["event_id", "value"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(
            pa.compute.bit_wise_and(t["event_id"], 15), 3))
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "z": pa.array([], pa.float64())})
        lon, lat = derive_lonlat(t["value"].to_numpy())
        z = t["value"].to_numpy()
        wkbz = points_to_wkb_z(snap_resolution(lon, 0.01),
                               snap_resolution(lat, 0.01),
                               snap_resolution(z, 0.1))
        x2, y2, z2 = wkb_to_points_z(wkbz)  # real codec round-trip
        return pa.table({"event_id": t["event_id"],
                         "x": pa.array(x2), "y": pa.array(y2),
                         "z": pa.array(z2)})

    return ds.map_batches(f, batch_format="pyarrow")


_SNAP = ("trunc({v} / {r} + CASE WHEN {v} < 0 THEN -0.5 ELSE 0.5 END)"
         " * {r}")

ORACLE: dict[str, str] = {
    "q_vector_reproject": _REPROJ_SQL,
    "q_layer_info": _LAYER_INFO_SQL,
    "q_zfield_precision": f"""
        SELECT event_id,
               {_SNAP.format(v='(fmod(value * 7.0, 360.0) - 180.0)', r='0.01')} AS x,
               {_SNAP.format(v='(fmod(value * 3.0, 170.0) - 85.0)', r='0.01')} AS y,
               {_SNAP.format(v='value', r='0.1')} AS z
        FROM events WHERE event_id % 16 = 3
    """,
    "q_constructive": """
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(round(195.0 + 2.0 * (13.0 + 15.0) * 1.5
                          + 0.5 * 32.0 * 1.5 * 1.5 * sin(2.0 * pi() / 32.0),
                          2) AS DOUBLE) AS buffer_area,
               CAST(2 * (3 + n_nationkey % 3) * (3 + n_nationkey % 3)
                    - 4 * (3 + n_nationkey % 3 - 1) - 2 AS BIGINT) AS n_triangles,
               CAST(round((3 + n_nationkey % 3 - 1.0)
                          * (3 + n_nationkey % 3 - 1.0), 2) AS DOUBLE) AS tri_area,
               CAST(round((2.0 + n_nationkey % 5) * 3.0 / 2.0, 2)
                    AS DOUBLE) AS makevalid_area
        FROM nation
    """,
    # L = [x0, x0+40]x[-40, 20] ∪ [x0+40, x0+60]x[-20, 0] (disjoint
    # interiors) with x0 = -150 + 70 r; zone = the nation rect
    "q_layer_nonconvex": """
        WITH parts AS (
            SELECT n_nationkey, r_regionkey,
                   greatest(0.0, least(-167.0 + 14.0 * n_nationkey, -110.0 + 70.0 * r_regionkey)
                                - greatest(-180.0 + 14.0 * n_nationkey, -150.0 + 70.0 * r_regionkey))
                   * greatest(0.0, least(-65.0 + 16.0 * (n_nationkey % 10), 20.0)
                                  - greatest(-80.0 + 16.0 * (n_nationkey % 10), -40.0))
                   + greatest(0.0, least(-167.0 + 14.0 * n_nationkey, -90.0 + 70.0 * r_regionkey)
                                  - greatest(-180.0 + 14.0 * n_nationkey, -110.0 + 70.0 * r_regionkey))
                   * greatest(0.0, least(-65.0 + 16.0 * (n_nationkey % 10), 0.0)
                                  - greatest(-80.0 + 16.0 * (n_nationkey % 10), -20.0))
                   AS inter
            FROM nation, region)
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(r_regionkey AS INTEGER) AS r_regionkey,
               CAST(round(inter, 2) AS DOUBLE) AS inter_area
        FROM parts WHERE round(inter, 2) > 0
    """,
    # densify-then-simplify recovers the 4 corners + closing vertex
    "q_geom_simplify": """
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(5 AS BIGINT) AS n_vertices
        FROM nation
    """,
    # per edge: ceil(len/4) segments; ring = sum(segments) + 1 closing
    "q_geom_segmentize": f"""
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(2 * (ceil(13.0 / {SEG_MAXLEN}) + ceil(15.0 / {SEG_MAXLEN})) + 1
                    AS BIGINT) AS n_vertices
        FROM nation
    """,
    # rect-intersection area, analytic
    "q_clip_zones": f"""
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(round(
                 greatest(0.0, least(-167.0 + 14.0 * n_nationkey, {CLIP_RECT[2]})
                              - greatest(-180.0 + 14.0 * n_nationkey, {CLIP_RECT[0]}))
                 * greatest(0.0, least(-65.0 + 16.0 * (n_nationkey % 10), {CLIP_RECT[3]})
                                - greatest(-80.0 + 16.0 * (n_nationkey % 10), {CLIP_RECT[1]})),
                 2) AS DOUBLE) AS clip_area
        FROM nation
    """,
    "q_explode": """
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, part,
               CAST(CASE WHEN part = 0 THEN 195.0 ELSE 1.0 END AS DOUBLE) AS area
        FROM nation, (SELECT unnest(range(2)) AS part)
    """,
    "q_layer_intersection": """
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(r_regionkey AS INTEGER) AS r_regionkey,
               CAST(round(
                 greatest(0.0, least(-167.0 + 14.0 * n_nationkey, -108.0 + 72.0 * r_regionkey)
                              - greatest(-180.0 + 14.0 * n_nationkey, -180.0 + 72.0 * r_regionkey))
                 * greatest(0.0, least(-65.0 + 16.0 * (n_nationkey % 10), 40.0)
                                - greatest(-80.0 + 16.0 * (n_nationkey % 10), -40.0)),
                 2) AS DOUBLE) AS inter_area
        FROM nation, region
        WHERE greatest(0.0, least(-167.0 + 14.0 * n_nationkey, -108.0 + 72.0 * r_regionkey)
                           - greatest(-180.0 + 14.0 * n_nationkey, -180.0 + 72.0 * r_regionkey))
              * greatest(0.0, least(-65.0 + 16.0 * (n_nationkey % 10), 40.0)
                             - greatest(-80.0 + 16.0 * (n_nationkey % 10), -40.0)) > 0
    """,
    "q_layer_union_symdiff": """
        WITH pairs AS (
            SELECT n_nationkey, r_regionkey,
                   greatest(0.0, least(-167.0 + 14.0 * n_nationkey, -108.0 + 72.0 * r_regionkey)
                                - greatest(-180.0 + 14.0 * n_nationkey, -180.0 + 72.0 * r_regionkey))
                   * greatest(0.0, least(-65.0 + 16.0 * (n_nationkey % 10), 40.0)
                                  - greatest(-80.0 + 16.0 * (n_nationkey % 10), -40.0)) AS inter
            FROM nation, region)
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(r_regionkey AS INTEGER) AS r_regionkey,
               CAST(round(195.0 + 5760.0 - inter, 2) AS DOUBLE) AS union_area,
               CAST(round(195.0 + 5760.0 - 2.0 * inter, 2) AS DOUBLE) AS symdiff_area
        FROM pairs WHERE inter > 0
    """,
    "q_layer_erase": """
        SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
               CAST(round(195.0 - coalesce((
                 SELECT sum(
                   greatest(0.0, least(-167.0 + 14.0 * n.n_nationkey, -108.0 + 72.0 * r_regionkey)
                                - greatest(-180.0 + 14.0 * n.n_nationkey, -180.0 + 72.0 * r_regionkey))
                   * greatest(0.0, least(-65.0 + 16.0 * (n.n_nationkey % 10), 40.0)
                                  - greatest(-80.0 + 16.0 * (n.n_nationkey % 10), -40.0)))
                 FROM region), 0.0), 2) AS DOUBLE) AS erase_area
        FROM nation n
    """,
}

def q_mif_layer(sf_dir: str):
    """MapInfo MIF/MID driver (ogr/ogrsf_frmts/mitab): one task per
    reference fixture, emitting (layer, n_rows, n_cols, wkt_crc) —
    wkt_crc is crc32 of the newline-joined WKTs, pinning the geometry
    text bit-exactly (core rows equal all_geoms.mif.golden.csv; see
    tests/test_mif.py)."""
    import os
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/mitab"
    names = ["all_geoms", "small", "single_field", "nomid",
             "multilinemid", "all_possible_fields",
             "empty_first_field_with_tab_delimiter"]
    if not os.path.exists(f"{fixdir}/small.mif"):
        return pa.table({"layer": pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64()),
                         "n_cols": pa.array([], pa.int64()),
                         "wkt_crc": pa.array([], pa.int64())})

    def f(t: pa.Table) -> pa.Table:
        from ..sources.mif import read_mif

        layers, nr, nc, crc = [], [], [], []
        for rec in t.to_pylist():
            name = rec["name"]
            with open(f"{fixdir}/{name}.mif") as fh:
                mif = fh.read()
            mid = None
            midp = f"{fixdir}/{name}.mid"
            if os.path.exists(midp):
                with open(midp) as fh:
                    mid = fh.read()
            tab = read_mif(mif, mid)
            layers.append(name)
            nr.append(tab.num_rows)
            nc.append(tab.num_columns)
            crc.append(zlib.crc32(
                "\n".join(tab["wkt"].to_pylist()).encode()))
        return pa.table({"layer": pa.array(layers, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "n_cols": pa.array(nc, pa.int64()),
                         "wkt_crc": pa.array(crc, pa.int64())})

    ds = ray.data.from_items([{"name": n} for n in names])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=2)


def q_mitab_tab(sf_dir: str):
    """MapInfo TAB binary driver (sources/mitab.py; reference
    ogr/ogrsf_frmts/mitab .dat/.id/.map layout): one task per
    reference fixture, emitting (layer, n_rows, n_cols, wkt_crc,
    attr_crc) — wkt_crc pins the geometry text bit-exactly
    (all_geoms rows equal all_geoms.mif.golden.csv; see
    tests/test_mitab.py), attr_crc pins the typed .dat decode."""
    import os
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/mitab"
    names = ["all_geoms", "all_possible_fields", "first_table",
             "poly_indexed", "polygon_without_index", "aspatial",
             "aspatial-table"]
    if not os.path.exists(f"{fixdir}/all_geoms.tab"):
        return pa.table({"layer": pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64()),
                         "n_cols": pa.array([], pa.int64()),
                         "wkt_crc": pa.array([], pa.int64()),
                         "attr_crc": pa.array([], pa.int64())})

    def f(t: pa.Table) -> pa.Table:
        from ..sources.mitab import read_tab

        layers, nr, nc, wcrc, acrc = [], [], [], [], []
        for rec in t.to_pylist():
            name = rec["name"]
            tab = read_tab(f"{fixdir}/{name}.tab")
            layers.append(name)
            nr.append(tab.num_rows)
            nc.append(tab.num_columns)
            wkts = (tab["wkt"].to_pylist()
                    if "wkt" in tab.column_names else [])
            wcrc.append(zlib.crc32("\n".join(wkts).encode()))
            attrs = tab.drop_columns(
                ["wkt"] if "wkt" in tab.column_names else [])
            acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"layer": pa.array(layers, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "n_cols": pa.array(nc, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"name": n} for n in names])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=2)


def q_feed_vector(sf_dir: str):
    """GeoRSS (simple + GML encodings) and VDV IDF drivers
    (sources/georss.py, idf.py; reference ogr/ogrsf_frmts/georss +
    vdv, conformed against ogr_georss.py / ogr_vdv.py in
    tests/test_georss_idf.py).  Rows (case, value)."""
    import zlib

    import ray.data

    FIX = "/root/reference/autotest/ogr/data"

    def f(t: pa.Table) -> pa.Table:
        from ..sources.georss import read_georss
        from ..sources.idf import read_idf

        cases, values = [], []

        def add(case, v):
            cases.append(case)
            values.append(int(v))

        for rec in t.to_pylist():
            if rec["which"] == "georss":
                for fname in ("test_georss_simple.xml",
                              "test_georss_gml.xml"):
                    tab = read_georss(f"{FIX}/georss/{fname}")
                    add(f"{fname}_rows", tab.num_rows)
                    add(f"{fname}_crc", zlib.crc32("\n".join(
                        w or "" for w in tab["wkt"].to_pylist()).encode()))
            elif rec["which"] == "idf":
                L = read_idf(f"{FIX}/vdv/test.idf")
                for lname in sorted(L):
                    tab = L[lname]
                    add(f"idf_{lname}_rows", tab.num_rows)
                    add(f"idf_{lname}_crc",
                        zlib.crc32(repr(tab.to_pylist()).encode()))
            elif rec["which"] == "gmt":
                from ..sources.gmtvec import read_gmt

                tab = read_gmt(f"{FIX}/gmt/test_multi.gmt")
                add("gmt_rows", tab.num_rows)
                add("gmt_crc", zlib.crc32(repr(tab.to_pylist()).encode()))
            else:  # fgd
                from ..sources.gml import read_fgd_gml

                for fname, lname in (("ElevPt.xml", "ElevPt"),
                                     ("BldA.xml", "BldA")):
                    L = read_fgd_gml(f"{FIX}/gml_jpfgd/{fname}")
                    tab = L[lname]
                    add(f"fgd_{lname}_rows", tab.num_rows)
                    add(f"fgd_{lname}_crc",
                        zlib.crc32(repr(tab.to_pylist()).encode()))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    ds = ray.data.from_items(
        [{"which": w} for w in ("georss", "idf", "gmt", "fgd")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_json_layer(sf_dir: str):
    """ESRIJSON + TopoJSON drivers (sources/jsonfmts.py; reference
    ogr/ogrsf_frmts/geojson OGRESRIJSON/OGRTopoJSON readers,
    conformed row-for-row against ogr_esrijson.py + ogr_topojson.py
    in tests/test_jsonfmts.py — incl. the 35-entry TopoJSON
    edge-case matrix).  Rows (file, layer, n_rows, wkt_crc,
    attr_crc)."""
    import zlib

    import ray.data

    E = "/root/reference/autotest/ogr/data/esrijson"
    T = "/root/reference/autotest/ogr/data/topojson"
    cases = [("topo", f"{T}/topojson1.topojson"),
             ("topo", f"{T}/topojson2.topojson"),
             ("topo", f"{T}/topojson3.topojson"),
             ("esri", f"{E}/esripoint.json"),
             ("esri", f"{E}/esripolygon.json"),
             ("esri", f"{E}/esrizmmultipoint.json"),
             ("esri", f"{E}/esrilinestring.json"),
             ("jsonfg", "/root/reference/autotest/ogr/data/jsonfg/"
              "crs_32631_fc_only.json"),
             ("jsonfg", "/root/reference/autotest/ogr/data/jsonfg/"
              "two_feature_types.json")]

    def f(t: pa.Table) -> pa.Table:
        import os

        from ..sources.jsonfmts import read_esrijson, read_topojson

        fs, ls, nr, wcrc, acrc = [], [], [], [], []
        for rec in t.to_pylist():
            kind, path = rec["kind"], rec["path"]
            base = os.path.basename(path)
            if kind == "topo":
                L = read_topojson(path)
            elif kind == "jsonfg":
                from ..sources.jsonfg import read_jsonfg

                L = read_jsonfg(path)
            else:
                L = {"layer": read_esrijson(path)}
            for lname in sorted(L):
                tab = L[lname]
                fs.append(base)
                ls.append(lname)
                nr.append(tab.num_rows)
                wcrc.append(zlib.crc32("\n".join(
                    w or "" for w in tab["wkt"].to_pylist()).encode()))
                attrs = tab.drop_columns(["wkt"])
                acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "layer": pa.array(ls, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"kind": k, "path": p} for k, p in cases])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=3)


def q_vfk_layer(sf_dir: str):
    """Czech VFK cadastre driver (sources/vfk.py; reference
    ogr/ogrsf_frmts/vfk, conformed against ogr_vfk.py in
    tests/test_vfk.py — 61-table &B schema parse, latin-2 decode,
    S-JTSK point geometry).  Rows (case, value)."""
    import zlib

    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from ..sources.vfk import read_vfk

        L = read_vfk("/root/reference/autotest/ogr/data/vfk/bylany.vfk")
        names = list(L)
        cases = ["n_layers", "par_fields", "par_rows", "sobr_rows",
                 "sobr_wkt_crc", "layers_crc"]
        values = [len(names), L["PAR"].num_columns, L["PAR"].num_rows,
                  L["SOBR"].num_rows,
                  zlib.crc32("\n".join(
                      w or "" for w in
                      L["SOBR"]["wkt"].to_pylist()).encode()),
                  zlib.crc32("|".join(names).encode())]
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    return ray.data.from_items([{"x": 0}]).map_batches(
        f, batch_format="pyarrow", batch_size=1)


def q_miramon_layer(sf_dir: str):
    """MiraMon vector driver (sources/miramon.py; reference
    ogr/ogrsf_frmts/miramon, conformed against
    ogr_miramon_vector.py in tests/test_miramon.py — PNT/ARC/POL
    binary v1.1, PAL ring assembly, extended-dBase long names).
    Rows (file, n_rows, wkt_crc, attr_crc)."""
    import zlib

    import ray.data

    M = "/root/reference/autotest/ogr/data/miramon"
    files = ["Points/SimplePoints/SimplePointsFile.pnt",
             "Arcs/SimpleArcs/SimpleArcFile.arc",
             "Polygons/SimplePolygons/SimplePolFile.pol"]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.miramon import read_miramon

        fs, nr, wcrc, acrc = [], [], [], []
        for rec in t.to_pylist():
            fname = rec["file"]
            tab = read_miramon(f"{M}/{fname}")
            fs.append(fname.rsplit("/", 1)[-1])
            nr.append(tab.num_rows)
            wcrc.append(zlib.crc32("\n".join(
                tab["wkt"].to_pylist()).encode()))
            attrs = tab.drop_columns(["wkt"])
            acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"file": fn} for fn in files])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_avc_layer(sf_dir: str):
    """Arc/Info E00 driver (sources/avc.py; reference
    ogr/ogrsf_frmts/avc, conformed against ogr_avc.py in
    tests/test_avc.py — arc lists, INFO fixed-width tables, PAL ring
    assembly).  Rows (file, layer, n_rows, wkt_crc, attr_crc)."""
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/avc"
    files = ["test.e00", "testpoint.e00", "testpoly.e00"]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.avc import read_e00

        fs, ls, nr, wcrc, acrc = [], [], [], [], []
        for rec in t.to_pylist():
            fname = rec["file"]
            L = read_e00(f"{fixdir}/{fname}")
            for lname in sorted(L):
                tab = L[lname]
                fs.append(fname)
                ls.append(lname)
                nr.append(tab.num_rows)
                wcrc.append(zlib.crc32("\n".join(
                    w or "" for w in (tab["wkt"].to_pylist()
                                      if "wkt" in tab.column_names
                                      else [])).encode()))
                attrs = tab.drop_columns(
                    [c for c in ("wkt",) if c in tab.column_names])
                acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "layer": pa.array(ls, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"file": fn} for fn in files])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_dgn_layer(sf_dir: str):
    """MicroStation DGN v7 driver (sources/dgn.py; reference
    ogr/ogrsf_frmts/dgn, conformed against ogr_dgn.py in
    tests/test_dgn.py — text LABEL style, stroked ellipse envelope,
    VAX doubles, UOR transform).  Rows (case, value)."""
    import zlib

    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from ..sources.dgn import read_dgn

        tab = read_dgn(
            "/root/reference/autotest/ogr/data/dgn/smalltest.dgn")
        rows = tab.to_pylist()
        cases = ["n_rows", "types_crc", "wkt_crc", "style_crc"]
        values = [
            tab.num_rows,
            zlib.crc32(repr([r["Type"] for r in rows]).encode()),
            zlib.crc32("\n".join(r["wkt"] or "" for r in rows).encode()),
            zlib.crc32("\n".join(r["style"] or "" for r in rows).encode()),
        ]
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    return ray.data.from_items([{"x": 0}]).map_batches(
        f, batch_format="pyarrow", batch_size=1)


def q_pmtiles_layer(sf_dir: str):
    """PMTiles v3 archive reader (sources/pmtiles.py; reference
    ogr/ogrsf_frmts/pmtiles, conformed against ogr_pmtiles.py in
    tests/test_pmtiles_los.py) + IsLineOfSightVisible
    (functions/viewshed.line_of_sight; alg/los.cpp + alg/los.py).
    Rows (case, value): PMTiles directory/Hilbert/metadata decode
    counts + attribute CRCs, and LOS truth cases on synthetic DEMs."""
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/pmtiles"

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.viewshed import line_of_sight
        from ..sources.pmtiles import PmtilesFile, read_pmtiles

        cases, values = [], []

        def add(case, v):
            cases.append(case)
            values.append(int(v))

        for rec in t.to_pylist():
            if rec["which"] == "pmtiles":
                pf = PmtilesFile(f"{fixdir}/poly.pmtiles")
                add("pm_maxzoom", pf.max_zoom)
                L = read_pmtiles(f"{fixdir}/poly.pmtiles")
                add("pm_rows", L["poly"].num_rows)
                add("pm_attr_crc", zlib.crc32(repr(sorted(
                    L["poly"]["EAS_ID"].to_pylist())).encode()))
                Lb = read_pmtiles(f"{fixdir}/poly_with_leaf_dir.pmtiles")
                add("pm_leaf_rows", Lb["poly"].num_rows)
                Lf = read_pmtiles(
                    f"{fixdir}/ne_10m_admin_0_france.pmtiles")
                add("pm_france_rows",
                    sum(t2.num_rows for t2 in Lf.values()))
            else:
                dem = np.zeros((1, 2))
                add("los_flat", line_of_sight(dem, 0, 0, 1, 1, 0, 1)[0])
                add("los_below_a",
                    line_of_sight(dem, 0, 0, -1, 1, 0, 1)[0])
                dem2 = np.array([[0, 5, 0]], float)
                vis, ix, iy = line_of_sight(dem2, 0, 0, 1, 2, 0, 1)
                add("los_blocked", vis)
                add("los_block_x", ix)
                dem3 = np.zeros((8, 8))
                dem3[4, 4] = 9
                vis, ix, iy = line_of_sight(dem3, 0, 0, 1, 7, 7, 1)
                add("los_diag_x", ix)
                add("los_diag_y", iy)
                from ..functions.checksum import checksum_image
                from ..functions.resample import (
                    apply_vertical_shift_grid, resize)
                from ..sources.tiff import decode_tiff

                with open("/root/reference/autotest/gcore/data/"
                          "byte.tif", "rb") as fh:
                    srcpx = decode_tiff(fh.read())[0]
                src2 = resize(srcpx, 40, 20, method="nearest")
                gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -30.0)
                out = apply_vertical_shift_grid(src2, gt, src2, gt,
                                                out_dtype=np.uint8)
                add("vshift_cs", checksum_image(out))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    ds = ray.data.from_items([{"which": w} for w in ("pmtiles", "los")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_mvt_layer(sf_dir: str):
    """Mapbox Vector Tiles driver (sources/mvt.py; reference
    ogr/ogrsf_frmts/mvt, conformed against autotest/ogr/ogr_mvt.py in
    tests/test_mvt.py).  One task per fixture; rows (file, layer,
    n_rows, wkt_crc, attr_crc) pin the command-stream decode,
    tile->EPSG:3857 mapping and typed value decode bit-exactly."""
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/mvt"
    cases = ["linestring/0/0/0.pbf", "multilinestring/0/0/0.pbf",
             "datatypes/0/0/0.pbf", "point_polygon/0", "polygon/0/0/0.pbf",
             "mixed/0/0/0.pbf"]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.mvt import read_mvt

        fs, ls, nr, wcrc, acrc = [], [], [], [], []
        for rec in t.to_pylist():
            case = rec["case"]
            L = read_mvt(f"{fixdir}/{case}")
            for lname in sorted(L):
                tab = L[lname]
                fs.append(case)
                ls.append(lname)
                nr.append(tab.num_rows)
                wcrc.append(zlib.crc32("\n".join(
                    w or "" for w in tab["wkt"].to_pylist()).encode()))
                attrs = tab.drop_columns(["wkt"])
                acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "layer": pa.array(ls, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"case": c} for c in cases])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=2)


def q_lvbag_layer(sf_dir: str):
    """LVBAG (Dutch BAG 2.0 extract) driver (sources/lvbag.py;
    reference ogr/ogrsf_frmts/lvbag, conformed against ogr_lvbag.py
    in tests/test_lvbag.py — fixed per-type schemas, domein-prefixed
    ids with 15->16 zero-padding, J/N booleans, gml polygon WKT,
    zip-archive merge).  Rows (case, value)."""
    import zlib

    import ray.data

    D = "/root/reference/autotest/ogr/data/lvbag"

    def f(t: pa.Table) -> pa.Table:
        from ..sources.lvbag import read_lvbag

        cases, values = [], []

        def add(c, v):
            cases.append(c)
            values.append(int(v))

        for fn, lyr in (("lig.xml", "Ligplaats"), ("num.xml",
                        "Nummeraanduiding"), ("opr.xml", "Openbareruimte"),
                        ("pnd.xml", "Pand"), ("sta.xml", "Standplaats"),
                        ("vbo.xml", "Verblijfsobject"),
                        ("wpl.xml", "Woonplaats")):
            tab = read_lvbag(f"{D}/{fn}")[lyr]
            add(f"{fn}_rows", tab.num_rows)
            add(f"{fn}_cols", tab.num_columns)
            add(f"{fn}_id_crc", zlib.crc32("|".join(
                x or "" for x in tab["identificatie"].to_pylist()
            ).encode()))
        add("pnd2_id_crc", zlib.crc32(read_lvbag(
            f"{D}/pnd2.xml")["Pand"].to_pylist()[0][
            "identificatie"].encode()))
        add("zip_pnd_rows", read_lvbag(
            f"{D}/archive_pnd.zip")["Pand"].num_rows)
        add("zip_mixed_layers", len(read_lvbag(f"{D}/archive_mixed.zip")))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    return ray.data.from_items([{"x": 0}]).map_batches(
        f, batch_format="pyarrow", batch_size=1)


def q_pds_table(sf_dir: str):
    """PDS3 TABLE vector driver (sources/pdstable.py; reference
    ogr/ogrsf_frmts/pds, conformed against ogr_pds.py in
    tests/test_pdstable.py — ^TABLE pointer, ^STRUCTURE .fmt include,
    ASCII + MSB binary columns, ITEMS array expansion to NAME_1..N,
    LONGITUDE/LATITUDE point geometry).  Rows (case, value)."""
    import zlib

    import ray.data

    P = "/root/reference/autotest/ogr/data/pds"

    def f(t: pa.Table) -> pa.Table:
        from ..sources.pdstable import read_pds_table

        a = read_pds_table(f"{P}/ap01578l.lbl")
        b = read_pds_table(f"{P}/virsvd_orb_11187_050618.lbl")
        r0, r1 = a.slice(0, 2).to_pylist()
        rb = b.to_pylist()[0]
        cases = ["ascii_rows", "ascii_cols", "noise_counts_1",
                 "wkt_crc", "mars_radius_x10", "bin_cols",
                 "incidence_angle_u", "temp_2_u"]
        values = [a.num_rows, a.num_columns, r0["NOISE_COUNTS_1"],
                  zlib.crc32((r0["wkt"] or "").encode()),
                  int(round(r1["MARS_RADIUS"] * 10)), b.num_columns,
                  int(round(rb["INCIDENCE_ANGLE"] * 1e6)),
                  int(round(rb["TEMP_2"] * 1e6))]
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    return ray.data.from_items([{"x": 0}]).map_batches(
        f, batch_format="pyarrow", batch_size=1)


def q_feed_formats(sf_dir: str):
    """GTFS (zip-of-CSVs with trips/shapes_geom derived linestrings),
    DIMAP v1 (XML product + tie-point GCPs), PDS4 (XML label + raw
    array, 4 cart namespace versions), OpenJUMP JML (column-template
    XML) — reference autotest goldens (tests/test_feedformats.py).
    One task per family; rows (case, value)."""
    import ray.data

    OGR = "/root/reference/autotest/ogr/data"
    GDR = "/root/reference/autotest/gdrivers/data"

    def run(t: pa.Table) -> pa.Table:
        import zlib

        from ..functions.checksum import checksum_image

        cases, values = [], []

        def add(case, v):
            cases.append(case)
            values.append(int(v))

        for rec in t.to_pylist():
            fam = rec["family"]
            if fam == "gtfs":
                from ..sources.gtfs import read_gtfs

                L = read_gtfs(f"{OGR}/gtfs/gtfs_extract.zip")
                add("gtfs_layers", len(L))
                add("gtfs_routes", L["routes"].num_rows)
                add("gtfs_stops", L["stops"].num_rows)
                add("gtfs_trip_wkt_crc", zlib.crc32(
                    (L["trips"].to_pylist()[0]["wkt"] or "").encode()))
                add("gtfs_shapes_wkt_crc", zlib.crc32(
                    (L["shapes_geom"].to_pylist()[0]["wkt"] or "").encode()))
            elif fam == "dimap_pds4":
                import os
                import shutil

                d = "/tmp/gdal_ray_fixtures/dimap"
                os.makedirs(d, exist_ok=True)
                for f in ("METADATA.DIM", "IMAGERY.TIF"):
                    if not os.path.exists(f"{d}/{f}"):
                        shutil.copy(f"{GDR}/dimap/{f}", d)
                rgb = "/root/reference/autotest/gcore/data/rgbsmall.tif"
                if not os.path.exists(f"{d}/rgbsmall.tif"):
                    shutil.copy(rgb, d)
                from ..sources.dimap import read_dimap

                px, gcps, meta = read_dimap(f"{d}/METADATA.DIM")
                add("dimap_cs100", checksum_image(px[:100, :100]))
                add("dimap_ngcps", len(gcps))
                add("dimap_gcp0_x_x1e7", round(gcps[0]["x"] * 1e7))
                from ..sources.pds4 import read_pds4

                for name in ("byte_pds4_cart_1700", "byte_pds4_cart_1b00",
                             "byte_pds4_cart_1d00_1933",
                             "byte_pds4_cart_1g00_1950"):
                    px, gt, _m = read_pds4(f"{GDR}/pds4/{name}.xml")
                    add(f"{name}_cs", checksum_image(px))
                    add(f"{name}_gt0", gt[0])
                from ..sources.safe import read_safe

                bands, names, fp = read_safe(
                    f"{GDR}/SAFE_FAKE/test.SAFE/manifest.safe")
                add("safe_vh_cs", checksum_image(bands[0]))
                add("safe_vv_cs", checksum_image(bands[1]))
                add("safe_fp_crc", zlib.crc32((fp or "").encode()))
                from ..sources.dimap import read_dimap2

                px2, meta2 = read_dimap2(f"{GDR}/dimap2/single_component")
                add("dimap2_b1_cs", checksum_image(px2[:, :, 0]))
                add("dimap2_nbands", px2.shape[2])
            else:  # jml
                from ..sources.jml import read_jml

                tab = read_jml(f"{OGR}/jml/test.jml")
                add("jml_rows", tab.num_rows)
                add("jml_cols", tab.num_columns)
                payload = repr([[r[k] for k in sorted(r)]
                                for r in tab.to_pylist()])
                add("jml_crc", zlib.crc32(payload.encode()))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    return ray.data.from_items(
        [{"family": f} for f in ("gtfs", "dimap_pds4", "jml")]
    ).map_batches(run, batch_format="pyarrow", batch_size=1)


def q_s57_layer(sf_dir: str):
    """S-57 ENC driver on a generic ISO 8211 parser (sources/s57.py;
    reference frmts/iso8211 + ogr/ogrsf_frmts/s57/s57reader.cpp,
    conformed against autotest/ogr/ogr_s57.py in tests/test_s57.py).
    One task per fixture cell; rows (file, layer, n_rows, wkt_crc,
    lnam_crc) pin edge-chained line/ring geometry, SOUNDG 3-D
    multipoints (COMF/SOMF scaling) and LNAM feature ids."""
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/s57"
    files = ["1B5X02NE.000", "bug1526.000", "bug2147_3R7D0889.000"]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.s57 import read_s57

        fs, ls, nr, wcrc, lcrc = [], [], [], [], []
        for rec in t.to_pylist():
            fname = rec["file"]
            L = read_s57(f"{fixdir}/{fname}")
            for lname in sorted(L):
                tab = L[lname]
                fs.append(fname)
                ls.append(lname)
                nr.append(tab.num_rows)
                wkts = (tab["wkt"].to_pylist()
                        if "wkt" in tab.column_names else [])
                wcrc.append(zlib.crc32("\n".join(
                    w or "" for w in wkts).encode()))
                lnams = (tab["LNAM"].to_pylist()
                         if "LNAM" in tab.column_names else [])
                lcrc.append(zlib.crc32("\n".join(lnams).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "layer": pa.array(ls, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "lnam_crc": pa.array(lcrc, pa.int64())})

    ds = ray.data.from_items([{"file": fn} for fn in files])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_osm_layer(sf_dir: str):
    """OSM PBF/XML driver (sources/osm.py; reference
    ogr/ogrsf_frmts/osm + default osmconf.ini, conformed against
    autotest/ogr/ogr_osm.py in tests/test_osm.py).  One task per
    (fixture, layer) over test.pbf, its dense=false / uncompressed
    re-encodings, the XML twin and the real-world base-64 extract;
    rows (file, layer, n_rows, wkt_crc, tag_crc) pin geometry
    resolution (node joins, ring assembly, tag inheritance) and the
    other_tags hstore rendering bit-exactly."""
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/osm"
    files = ["test.pbf", "test.osm", "test_uncompressed_dense_false.pbf",
             "base-64.osm.pbf"]
    layers = ["points", "lines", "multipolygons", "multilinestrings",
              "other_relations"]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.osm import read_osm_layers

        fs, ls, nr, wcrc, tcrc = [], [], [], [], []
        for rec in t.to_pylist():
            fname = rec["file"]
            L = read_osm_layers(f"{fixdir}/{fname}")
            for lname in layers:
                tab = L[lname]
                fs.append(fname)
                ls.append(lname)
                nr.append(tab.num_rows)
                wcrc.append(zlib.crc32("\n".join(
                    w or "" for w in tab["wkt"].to_pylist()).encode()))
                tcrc.append(zlib.crc32("\n".join(
                    "%s|%s" % (r.get("osm_id") or r.get("osm_way_id") or "",
                               r.get("other_tags") or "")
                    for r in tab.to_pylist()).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "layer": pa.array(ls, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "tag_crc": pa.array(tcrc, pa.int64())})

    ds = ray.data.from_items([{"file": fn} for fn in files])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_fgdb_layer(sf_dir: str):
    """ESRI File Geodatabase reader (sources/openfilegdb.py; reference
    ogr/ogrsf_frmts/openfilegdb/filegdbtable.cpp, conformed against
    autotest/ogr/ogr_openfilegdb.py in tests/test_openfilegdb.py).
    One task per layer of the reference's own testopenfilegdb.gdb
    (v10) + polygon_golden.gdb + arcgis_pro_32_types.gdb (v4 int64/
    date/time), emitting (gdb, layer, n_rows, wkt_crc, attr_crc):
    wkt_crc pins the decoded geometry text (coords rounded 1e-7),
    attr_crc the row-major attribute repr."""
    import os
    import zipfile as _zip

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/filegdb"
    tmp = "/tmp/gdal_ray_fixtures/fgdb"
    main = os.path.join(tmp, "testopenfilegdb.gdb")
    if not os.path.exists(main) and os.path.exists(
            os.path.join(fixdir, "testopenfilegdb.gdb.zip")):
        # crash-safe publish: extract into a pid-suffixed dir, then
        # rename the .gdb into place (a killed extractall must not
        # leave a partial dir the existence guard then trusts)
        stage = f"{tmp}.stage{os.getpid()}"
        os.makedirs(stage, exist_ok=True)
        with _zip.ZipFile(os.path.join(fixdir,
                                       "testopenfilegdb.gdb.zip")) as z:
            z.extractall(stage)
        os.makedirs(tmp, exist_ok=True)
        try:
            os.rename(os.path.join(stage, "testopenfilegdb.gdb"), main)
        except OSError:
            pass  # a concurrent worker won the publish
        import shutil as _shutil

        _shutil.rmtree(stage, ignore_errors=True)

    cases = [(main, n) for n in
             ("point", "multipoint", "linestring",
              "multilinestring_multipart", "polygon", "multipolygon",
              "point25D", "polygon25D", "pointzm", "multipointzm",
              "linestringzm", "polygonzm", "big_layer", "hole",
              "several_polygons")]
    cases.append(("/root/reference/autotest/ogr/data/openfilegdb/"
                  "polygon_golden.gdb", "OGRGeoJSON"))
    cases.append((os.path.join(fixdir, "arcgis_pro_32_types.gdb"),
                  "big_int"))
    cases.append((os.path.join(fixdir, "arcgis_pro_32_types.gdb"),
                  "date_types"))
    cases = [c for c in cases if os.path.exists(c[0])]

    def f(t: pa.Table) -> pa.Table:
        import re
        import zlib

        from ..sources.openfilegdb import read_gdb_layer

        def round_wkt(w):
            if w is None:
                return ""
            def rep(m):
                v = round(float(m.group(0)), 7)
                return str(int(v)) if v == int(v) else repr(v)
            return re.sub(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", rep, w)

        gdbs, layers, nr, wcrc, acrc = [], [], [], [], []
        for rec in t.to_pylist():
            gdb, name = rec["gdb"], rec["layer"]
            tab = read_gdb_layer(gdb, name)
            gdbs.append(os.path.basename(gdb))
            layers.append(name)
            nr.append(tab.num_rows)
            if "wkt" in tab.column_names:
                wcrc.append(zlib.crc32("\n".join(
                    round_wkt(w) for w in tab["wkt"].to_pylist()).encode()))
            else:
                wcrc.append(0)
            attrs = tab.drop_columns(
                [c for c in ("geometry", "wkt") if c in tab.column_names])
            acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"gdb": pa.array(gdbs, pa.string()),
                         "layer": pa.array(layers, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"gdb": g, "layer": n} for g, n in cases])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=3)


def q_spreadsheet(sf_dir: str):
    """XLSX + ODS spreadsheet drivers (sources/spreadsheet.py;
    reference ogr/ogrsf_frmts/xlsx + ods, conformed against
    autotest/ogr/ogr_xlsx.py and ogr_ods.py in
    tests/test_spreadsheet.py).  One task per fixture file, rows
    (fmt, layer, n_rows, n_cols, type_sig, value_crc): type_sig is
    the '/'-joined OGR field types, value_crc the crc32 of the
    row-major repr of every cell — pinning header detection, type
    autodetection and date rendering bit-exactly.  A roundtrip row
    (write_xlsx/write_ods -> reread) per format guards the writers."""
    import zlib

    import ray.data

    cases = [
        ("xlsx", "/root/reference/autotest/ogr/data/xlsx/test.xlsx"),
        ("ods", "/root/reference/autotest/ogr/data/ods/test.ods"),
        ("xls", "/root/reference/autotest/ogr/data/xls/test972000xp.xls"),
    ]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.spreadsheet import (read_ods, read_xlsx, write_ods,
                                           write_xlsx)

        fmts, layers, nr, nc, sigs, crcs = [], [], [], [], [], []

        def emit(fmt, name, tab):
            fmts.append(fmt)
            layers.append(name)
            nr.append(tab.num_rows)
            nc.append(tab.num_columns - 1)
            sigs.append("/".join(
                f.metadata[b"ogr_type"].decode()
                for f in tab.schema if f.name != "fid"))
            payload = repr([[r[k] for k in sorted(r)]
                            for r in tab.to_pylist()])
            crcs.append(zlib.crc32(payload.encode()))

        for rec in t.to_pylist():
            fmt, path = rec["fmt"], rec["path"]
            if fmt == "xls":
                from ..sources.xls import read_xls

                emit("xls", "Feuille1", read_xls(path)["Feuille1"])
                continue
            reader = read_xlsx if fmt == "xlsx" else read_ods
            writer = write_xlsx if fmt == "xlsx" else write_ods
            all_layers = reader(path)
            for name in ("Feuille1", "Feuille7"):
                emit(fmt, name, all_layers[name])
            back = reader(writer({"rt": all_layers["Feuille7"]}))["rt"]
            emit(fmt + "_roundtrip", "rt", back)
        return pa.table({"fmt": pa.array(fmts, pa.string()),
                         "layer": pa.array(layers, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "n_cols": pa.array(nc, pa.int64()),
                         "type_sig": pa.array(sigs, pa.string()),
                         "value_crc": pa.array(crcs, pa.int64())})

    ds = ray.data.from_items([{"fmt": f_, "path": p} for f_, p in cases])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_dxf_layer(sf_dir: str):
    """AutoCAD DXF driver (sources/dxf.py; reference ogr/ogrsf_frmts/
    dxf, conformed feature-by-feature against autotest/ogr/ogr_dxf.py
    in tests/test_dxf.py — assorted.dxf 22-feature walk incl. ellipse/
    arc tessellation, OCS bulge polylines, dimension fallback
    rendering, block inlining, exact circle vertices). One task per
    fixture, rows (layer, n_feats, wkt_crc, style_crc) pin the whole
    translated output bit-exactly."""
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/dxf"
    names = ["assorted", "entities_only", "LWPOLYLINE-OCS", "circle",
             "3dface", "solid", "polyline_smooth",
             "closed_polyline_with_bulge", "insert_only"]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.dxf import read_dxf

        layers, nf, wcrc, scrc = [], [], [], []
        for rec in t.to_pylist():
            name = rec["name"]
            feats = read_dxf(f"{fixdir}/{name}.dxf")
            layers.append(name)
            nf.append(len(feats))
            wcrc.append(zlib.crc32("\n".join(
                x["wkt"] or "" for x in feats).encode()))
            scrc.append(zlib.crc32("\n".join(
                x["style"] or "" for x in feats).encode()))
        return pa.table({"layer": pa.array(layers, pa.string()),
                         "n_feats": pa.array(nf, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "style_crc": pa.array(scrc, pa.int64())})

    ds = ray.data.from_items([{"name": n} for n in names])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=2)


def q_sg_vct_layers(sf_dir: str):
    """CF-1.8 Simple Geometries (sources/netcdf_sg.py; reference
    frmts/netcdf/netcdfsg.cpp, conformed against
    autotest/gdrivers/netcdf.py SG suite in tests/test_netcdf_sg.py)
    + Idrisi .vct vector driver (sources/idrisi_vct.py; reference
    ogr/ogrsf_frmts/idrisi, autotest/ogr/ogr_idrisi.py).
    Rows (file, layer, n_rows, wkt_crc, attr_crc)."""
    import zlib

    import ray.data

    NC = "/root/reference/autotest/gdrivers/data/netcdf-sg"
    ID = "/root/reference/autotest/ogr/data/idrisi"
    files = [f"{NC}/cf1.8_states.nc", f"{NC}/Yahara_alb.nc",
             f"{NC}/multiple_containers.nc", f"{NC}/multipolygon3D_test.nc",
             f"{ID}/points.vct", f"{ID}/lines.vct", f"{ID}/polygons.vct"]

    def f(t: pa.Table) -> pa.Table:
        from ..functions.wkb import geom_to_wkt, wkb_to_geom
        from ..sources.vector_open import open_vector

        fs, lays, nr, wcrc, acrc = [], [], [], [], []
        for rec in t.to_pylist():
            path = rec["file"]
            for lname, tab in sorted(open_vector(path).items()):
                fs.append(path.rsplit("/", 1)[-1])
                lays.append(lname)
                nr.append(tab.num_rows)
                wkts = [geom_to_wkt(wkb_to_geom(b))
                        for b in tab["geometry"].to_pylist()]
                wcrc.append(zlib.crc32("\n".join(wkts).encode()))
                attrs = tab.drop_columns(["geometry"])
                acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"file": pa.array(fs, pa.string()),
                         "layer": pa.array(lays, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"file": fn} for fn in files])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_gnm(sf_dir: str):
    """Geographic Network Model analysis (gnm/gnmgraph.cpp,
    gnmgenericnetwork.cpp; autotest/gnm/gnm_test.py): build the
    pipes+wells network (GFIDs in import order, endpoint autoconnect
    at tolerance 1e-6) and run the three GetPath algorithms —
    Dijkstra 61->50, Yen K-shortest (num_paths=3) and connected
    components — one ray task per algorithm; rows are the result
    layer's (vertex|edge, gfid) sequence per path."""
    import os

    import ray.data

    fixdir = "/root/reference/autotest/gnm/data"
    schema = pa.schema([("alg", pa.string()), ("path_num", pa.int32()),
                        ("seq", pa.int32()), ("gfid", pa.int64()),
                        ("kind", pa.string()), ("layer", pa.string())])
    if not os.path.exists(f"{fixdir}/pipes.shp"):
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    def f(t: pa.Table) -> pa.Table:
        from ..functions.gnm import build_autotest_network

        net = build_autotest_network(fixdir)
        out = []
        for rec in t.to_pylist():
            alg = rec["alg"]
            res = net.get_path(61, 50, alg, num_paths=3)
            res = (res.append_column("seq", pa.array(
                       np.arange(res.num_rows, dtype=np.int32)))
                   .append_column("alg", pa.array(
                       [alg] * res.num_rows, pa.string())))
            out.append(res.select([f.name for f in schema]))
        return pa.concat_tables(out) if out else \
            pa.table({f.name: pa.array([], f.type) for f in schema})

    ds = ray.data.from_items(
        [{"alg": a} for a in ("dijkstra", "kshortest", "connected")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_lineref(sf_dir: str):
    """ogrlineref linear referencing (apps/ogrlineref.cpp;
    autotest/utilities/test_ogrlineref.py): create 1000-m parts from
    path.shp + mstones.shp, then get_pos / get_coord / get_subline —
    one ray task per operation, rows pinned to the reference's own
    printed goldens (15977.724709 / -1.435097,51.950080)."""
    import os

    import ray.data

    data = "/root/reference/autotest/utilities/data"
    schema = pa.schema([("case", pa.string()), ("value_a", pa.float64()),
                        ("value_b", pa.float64()), ("pin", pa.float64())])
    if not os.path.exists(f"{data}/path.shp"):
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    def f(t: pa.Table) -> pa.Table:
        from ..functions import lineref as lr
        from ..functions.wkb import wkb_to_geom
        from ..sources.shapefile import read_shapefile

        path_t = read_shapefile(f"{data}/path.shp")
        ms_t = read_shapefile(f"{data}/mstones.shp")
        g = wkb_to_geom(path_t["geometry"][0].as_py())
        repers = []
        for i in range(ms_t.num_rows):
            pg = wkb_to_geom(ms_t["geometry"][i].as_py())
            repers.append((float(ms_t["pos"][i].as_py()),
                           float(pg.rings[0][0, 0]),
                           float(pg.rings[0][0, 1])))
        parts = lr.create_parts(g.rings[0], repers, 1000.0, geographic=True)
        cases, va, vb, pin = [], [], [], []
        for rec in t.to_pylist():
            op = rec["op"]
            if op == "n_parts":
                # test_ogrlineref.py publishes the part count (9); the
                # summed part extent rides along in the `pin` column
                # as an exact determinism-pin (ADVICE round-4)
                cases.append(op)
                va.append(float(len(parts)))
                vb.append(0.0)
                pin.append(round(sum(p[lr.FIELD_FINISH] - p[lr.FIELD_START]
                                     for p in parts), 3))
            elif op == "get_pos":
                cases.append(op)
                va.append(round(lr.get_position(parts, -1.4345, 51.9497), 6))
                vb.append(0.0)
                pin.append(0.0)
            elif op == "get_coord":
                x, y, _z = lr.get_coordinates(parts, 15977.724709)
                cases.append(op)
                va.append(round(x, 6))
                vb.append(round(y, 6))
                pin.append(0.0)
            elif op == "get_subline":
                # the reference publishes feature_count == 1 for the
                # -mb 13300 -me 17400 subline (test_ogrlineref_4)
                sub = lr.create_subline(parts, 13300, 17400)
                cases.append(op)
                va.append(1.0 if len(sub) else 0.0)
                vb.append(0.0)
                # exact vertex count of the assembled subline — a
                # determinism-pin ride-along (ADVICE round-4)
                pin.append(float(len(sub)))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value_a": pa.array(va, pa.float64()),
                         "value_b": pa.array(vb, pa.float64()),
                         "pin": pa.array(pin, pa.float64())})

    ds = ray.data.from_items(
        [{"op": o} for o in ("n_parts", "get_pos", "get_coord",
                             "get_subline")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_sosi_layer(sf_dir: str):
    """SOSI vector driver (ogr/ogrsf_frmts/sosi, sources/sosi.py):
    one ray task per appendFieldsMap variant over the reference's own
    test_duplicate_fields.sos, emitting per-layer (variant, layer,
    n_rows, reinbeite, wkb_crc) — reinbeite pins the duplicate-field
    fold (YD / YD,YG / YD;YG per ogr_sosi.py tests 2-4), wkb_crc the
    assembled geometry bytes."""
    import os
    import zlib

    import ray.data

    fix = "/root/reference/autotest/ogr/data/sosi/test_duplicate_fields.sos"
    schema = pa.schema([("variant", pa.string()), ("layer", pa.string()),
                        ("n_rows", pa.int64()), ("reinbeite", pa.string()),
                        ("wkb_crc", pa.int64())])
    if not os.path.exists(fix):
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    variants = {"default": None, "comma": "BEITEBRUKERID&OPPHAV",
                "semicolon": "BEITEBRUKERID:;&OPPHAV:;"}

    def f(t: pa.Table) -> pa.Table:
        from ..sources.sosi import read_sosi

        va, ly, nr, rb, crc = [], [], [], [], []
        for rec in t.to_pylist():
            name = rec["variant"]
            lay = read_sosi(fix, append_fields_map=variants[name])
            lay.pop("__epsg__", None)
            for lname, tab in lay.items():
                va.append(name)
                ly.append(lname)
                nr.append(tab.num_rows)
                r = tab["reinbeitebrukerID"].to_pylist()
                rb.append(",".join(x for x in r if x) or "")
                crc.append(zlib.crc32(b"".join(
                    tab["geometry"].to_pylist())))
        return pa.table({"variant": pa.array(va, pa.string()),
                         "layer": pa.array(ly, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "reinbeite": pa.array(rb, pa.string()),
                         "wkb_crc": pa.array(crc, pa.int64())})

    ds = ray.data.from_items([{"variant": v} for v in variants])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_sxf_layer(sf_dir: str):
    """Panorama SXF driver (sources/sxf.py; reference
    ogr/ogrsf_frmts/sxf, autotest/ogr/ogr_sxf.py + the shipped
    default.rsc classifier). Rows (layer, n_rows, wkt_crc, attr_crc)
    over the reference's own 100_test.sxf."""
    import zlib

    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from ..functions.wkb import geom_to_wkt, wkb_to_geom
        from ..sources.sxf import read_sxf

        mode = t["mode"][0].as_py()
        r = read_sxf(
            "/root/reference/autotest/ogr/data/sxf/100_test.sxf",
            rsc_path=("/root/reference/ogr/ogrsf_frmts/sxf/data/default.rsc"
                      if mode != "norsc" else None),
            layer_fullname=(mode == "full"))
        lays, nr, wcrc, acrc = [], [], [], []
        for name, tab in r.items():
            lays.append(f"{mode}:{name}")
            nr.append(tab.num_rows)
            wkts = [geom_to_wkt(wkb_to_geom(b), precision=10)
                    for b in tab["geometry"].to_pylist()]
            wcrc.append(zlib.crc32("\n".join(wkts).encode()))
            attrs = tab.drop_columns(["geometry"])
            acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"layer": pa.array(lays, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"mode": m} for m in ("norsc", "short", "full")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_duckdb_layer(sf_dir: str):
    """ADBC/DuckDB vector driver (sources/adbc.py; reference
    ogr/ogrsf_frmts/adbc, autotest/ogr/ogr_adbc.py). One task per open
    mode over the reference's own poly.duckdb fixtures: full table,
    SQL= open option (RESULTSET layer), spatial-index variant. Rows
    (case, n_rows, sum_eas, wkt_crc): feature counts, EAS_ID sums and
    the CRC of the decoded WKT stream (DuckDB-spatial GEOMETRY ->
    WKB)."""
    import zlib

    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from ..functions.wkb import geom_to_wkt, wkb_to_geom
        from ..sources.adbc import read_duckdb

        base = "/root/reference/autotest/ogr/data/duckdb"
        mode = t["mode"][0].as_py()
        if mode == "table":
            tab = read_duckdb(f"{base}/poly.duckdb")["poly"]
        elif mode == "sql":
            tab = read_duckdb(
                f"{base}/poly.duckdb",
                sql="SELECT * FROM poly WHERE EAS_ID >= 170 "
                    "ORDER BY EAS_ID")["RESULTSET"]
        else:
            tab = read_duckdb(
                f"{base}/poly_with_spatial_index.duckdb")["poly"]
        wkts = [geom_to_wkt(wkb_to_geom(b), precision=8)
                for b in tab["geometry"].to_pylist()]
        return pa.table({
            "case": pa.array([mode], pa.string()),
            "n_rows": pa.array([tab.num_rows], pa.int64()),
            "sum_eas": pa.array([sum(tab["EAS_ID"].to_pylist())],
                                pa.int64()),
            "wkt_crc": pa.array([zlib.crc32("\n".join(wkts).encode())],
                                pa.int64())})

    ds = ray.data.from_items(
        [{"mode": m} for m in ("table", "sql", "spatial_index")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_slf_wasp_kmz(sf_dir: str):
    """Round-3 continuation drivers: Selafin mesh (sources/selafin.py),
    WAsP .map roughness boundaries (sources/wasp.py), KMLSuperOverlay
    tile pyramid (sources/kmlsuperoverlay.py) — each builds its
    deterministic fixture, writes, reads back through the engine and
    emits (case, value) rows. Oracle is the pinned literal table."""
    import math
    import os
    import zlib

    import numpy as np
    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from ..functions.checksum import checksum_image
        from ..sources.kmlsuperoverlay import (read_superoverlay,
                                               write_superoverlay)
        from ..sources.selafin import selafin_layers, write_selafin
        from ..sources.wasp import read_wasp, write_wasp_roughness_polys

        cases, values = [], []

        def add(c, v):
            cases.append(c)
            values.append(int(v))

        which = t["which"][0].as_py()
        base = f"/tmp/gdal_ray_fixtures/r3fmt_{os.getpid()}"
        os.makedirs(base, exist_ok=True)
        if which == "selafin":
            xs, ys, vals = [], [], []
            for i in range(5):
                for j in range(5):
                    xs.append(float(i))
                    ys.append(float(j))
                    vals.append(float(i * 5 + j))
            ikle = [[i * 5 + j + 1, i * 5 + j + 2, i * 5 + j + 7,
                     i * 5 + j + 6] for i in range(4) for j in range(4)]
            p = f"{base}/m.slf"
            write_selafin(p, xs, ys, np.array(ikle), {"value": vals})
            lay = selafin_layers(p)
            add("slf_points", lay["m_p0"].num_rows)
            add("slf_elements", lay["m_e0"].num_rows)
            add("slf_elem5_mean_x100",
                round(lay["m_e0"]["value"][5].as_py() * 100))
        elif which == "wasp":
            rings, zs = [], []
            for i in range(6):
                p0 = (0.0, 0.0)
                p1 = (round(math.cos(i * math.pi / 3), 6),
                      round(math.sin(i * math.pi / 3), 6))
                p2 = (round(math.cos((i + 1) * math.pi / 3), 6),
                      round(math.sin((i + 1) * math.pi / 3), 6))
                rings.append(np.array([p0, p1, p2, p0]))
                zs.append(float(i))
            p = f"{base}/r.map"
            write_wasp_roughness_polys(p, rings, zs)
            tb = read_wasp(p)
            add("wasp_boundaries", tb.num_rows)
            pairs = sorted((min(a, b), max(a, b)) for a, b in
                           zip(tb["z_left"].to_pylist(),
                               tb["z_right"].to_pylist()))
            add("wasp_pairs_crc", zlib.crc32(repr(pairs).encode()))
        else:  # kmz
            from ..sources.tiff import decode_tiff

            px, gt = decode_tiff(open(
                "/root/reference/autotest/gdrivers/data/small_world.tif",
                "rb").read())[:2]
            px = np.moveaxis(px, 2, 0)
            p = f"{base}/x.kmz"
            write_superoverlay(px, gt, 4326, p, fmt="PNG")
            rd = read_superoverlay(p)
            add("kmz_cs_band1", checksum_image(rd["pixels"][0]))
            add("kmz_h", rd["pixels"].shape[1])
            add("kmz_w", rd["pixels"].shape[2])
        import shutil as _shutil

        _shutil.rmtree(base, ignore_errors=True)
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    ds = ray.data.from_items([{"which": w}
                              for w in ("selafin", "wasp", "kmz")])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_ogrvrt_layer(sf_dir: str):
    """OGR VRT driver conformance rows vs the reference's own
    ogr_vrt.py expectations: vrt_test.vrt PointFromColumns/WKT/SrcSQL
    layers, poly_vrt.vrt shapefile passthrough, SrcRegion clip, union
    schema merge, warped-layer reprojection. Reader:
    sources/ogrvrt.py over sources/vector_open.py."""
    import os
    import tempfile

    import ray.data

    OGR = "/root/reference/autotest/ogr"
    if not os.path.exists(f"{OGR}/data/vrt/vrt_test.vrt"):
        return pa.table({"case": pa.array([], pa.string()),
                         "value": pa.array([], pa.int64()),
                         "expected": pa.array([], pa.int64())})

    def run(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.wkb import (geom_to_wkt, points_to_wkb,
                                     wkb_to_geom, wkb_to_points)
        from ..sources.ogrvrt import read_ogrvrt

        cases, values, exps = [], [], []

        def add(c, v, e):
            cases.append(c)
            values.append(int(v))
            exps.append(int(e))

        for r in t.to_pylist():
            which = r["which"]
            if which == "core":
                layers = read_ogrvrt(f"{OGR}/data/vrt/vrt_test.vrt")
                t2 = layers["test2"]
                add("vrt:test2_fids",
                    sum(t2["fid"].to_pylist()), 1)   # 0 + 1
                g = wkb_to_geom(t2["geometry"][0].as_py())
                add("vrt:test2_wkt",
                    geom_to_wkt(g) == "POINT Z (12.5 17 1.2)", 1)
                t3 = layers["test3"]
                add("vrt:test3_fids",
                    sum(t3["fid"].to_pylist()), 3)   # 1 + 2 (column)
                t4 = layers["test4"]
                add("vrt:test4_rows", t4.num_rows, 2)
                add("vrt:test6_cols", len(layers["test6"].column_names),
                    2)
                poly = read_ogrvrt(
                    f"{OGR}/data/vrt/poly_vrt.vrt")["poly"]
                add("vrt:poly_rows", poly.num_rows, 10)
                add("vrt:poly_eas",
                    sum(poly["EAS_ID"].to_pylist()), 1686)
            elif which == "clip":
                d = tempfile.mkdtemp()
                with open(f"{d}/test.csv", "w") as f:
                    f.write('wkt_geom,v\n'
                            '"LINESTRING (-1 0.5,1.5 0.5)",\n')
                xml = f"""<OGRVRTDataSource><OGRVRTLayer name="test">
                    <SrcDataSource>{d}/test.csv</SrcDataSource>
                    <SrcLayer>test</SrcLayer>
                    <GeometryField encoding="WKT" field="wkt_geom"/>
                    <SrcRegion clip="true">POLYGON((0 0,0 1,1 1,1 0,0 0))</SrcRegion>
                    </OGRVRTLayer></OGRVRTDataSource>"""
                c = read_ogrvrt(xml)["test"]
                add("vrt:clip_wkt",
                    geom_to_wkt(wkb_to_geom(c["geometry"][0].as_py()))
                    == "LINESTRING (0 0.5, 1 0.5)", 1)
            else:  # union + warped
                from ..sources.shapefile import write_shapefile

                d = tempfile.mkdtemp()
                pts = [(2 + i / 5.0, 49 + j / 5.0)
                       for i in range(5) for j in range(5)]
                x = np.array([p[0] for p in pts])
                y = np.array([p[1] for p in pts])
                t1 = pa.table({
                    "geometry": pa.array(points_to_wkb(x, y),
                                         pa.binary()),
                    "id1": pa.array(range(25), pa.int32())})
                write_shapefile(f"{d}/a", t1)
                t2v = pa.table({
                    "geometry": pa.array(points_to_wkb(x + 2, y),
                                         pa.binary()),
                    "id2": pa.array(range(25), pa.int32())})
                write_shapefile(f"{d}/b", t2v)
                xml = f"""<OGRVRTDataSource>
                <OGRVRTUnionLayer name="u">
                  <OGRVRTLayer name="a"><SrcDataSource>{d}/a.shp</SrcDataSource></OGRVRTLayer>
                  <OGRVRTLayer name="b"><SrcDataSource>{d}/b.shp</SrcDataSource></OGRVRTLayer>
                </OGRVRTUnionLayer></OGRVRTDataSource>"""
                u = read_ogrvrt(xml)["u"]
                add("vrt:union_rows", u.num_rows, 50)
                ux, _ = wkb_to_points(u["geometry"].to_pylist())
                add("vrt:union_xmax_x10", round(ux.max() * 10), 48)
                add("vrt:union_id2_nulls", u["id2"].null_count, 25)
                xml = f"""<OGRVRTDataSource><OGRVRTWarpedLayer>
                  <OGRVRTLayer name="a"><SrcDataSource>{d}/a.shp</SrcDataSource><LayerSRS>WGS84</LayerSRS></OGRVRTLayer>
                  <TargetSRS>EPSG:32631</TargetSRS>
                </OGRVRTWarpedLayer></OGRVRTDataSource>"""
                w = read_ogrvrt(xml)["a"]
                wx, wy = wkb_to_points(w["geometry"].to_pylist())
                add("vrt:warped_x", round(wx[0]), 426858)
                add("vrt:warped_y", round(wy[0]), 5427938)
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64()),
                         "expected": pa.array(exps, pa.int64())})

    return ray.data.from_items(
        [{"which": w} for w in ("core", "clip", "union")]
    ).map_batches(run, batch_format="pyarrow", batch_size=1)


def q_mapml_pgdump(sf_dir: str):
    """MapML driver (sources/mapml.py; reference ogr/ogrsf_frmts/mapml,
    autotest data/mapml/poly.mapml) and PGDump SQL writer
    (sources/pgdump.py; reference ogr/ogrsf_frmts/pgdump, statement
    stream pinned against ogr_pgdump.py tests 1-2 in
    tests/test_pgdump.py). Rows (case, value): fixture goldens,
    write->read roundtrip CRCs, and CRCs of the generated SQL."""
    import os
    import tempfile
    import zlib

    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from ..sources.mapml import read_mapml, wkb_to_wkt_mapml, write_mapml
        from ..sources.pgdump import write_pgdump
        from ..sources.shapefile import read_shapefile

        cases, values = [], []

        def add(c, v):
            cases.append(c)
            values.append(int(v))

        which = t["which"][0].as_py()
        if which == "mapml":
            lay = read_mapml(
                "/root/reference/autotest/ogr/data/mapml/poly.mapml")
            tab = lay["poly"]
            add("mapml:poly_rows", tab.num_rows)
            add("mapml:poly_eas_sum", sum(tab["EAS_ID"].to_pylist()))
            add("mapml:poly_area_sum",
                round(sum(tab["AREA"].to_pylist())))
            wkts = [wkb_to_wkt_mapml(b)
                    for b in tab["geometry"].to_pylist()]
            add("mapml:poly_wkt_crc", zlib.crc32("\n".join(wkts).encode()))
            with tempfile.TemporaryDirectory() as d:
                out = os.path.join(d, "rt.mapml")
                write_mapml(out, {"poly": tab})
                rt = read_mapml(out)["poly"]
                wkts2 = [wkb_to_wkt_mapml(b)
                         for b in rt["geometry"].to_pylist()]
                add("mapml:roundtrip_wkt_same",
                    int(wkts2 == wkts))
                add("mapml:roundtrip_attr_crc", zlib.crc32(repr(
                    rt.drop_columns(["geometry"]).to_pylist()).encode()))
        else:
            shp = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
            cols = {c.lower(): shp[c] for c in shp.column_names}
            tab = pa.table({
                "AREA": cols["area"].cast(pa.float64()),
                "EAS_ID": cols["eas_id"].cast(pa.int32()),
                "PRFEDEA": cols["prfedea"].cast(pa.string()),
                "geometry": cols["geometry"]})
            with tempfile.TemporaryDirectory() as d:
                ins = os.path.join(d, "i.sql")
                write_pgdump(ins, tab, "tpoly", dim=3,
                             postgis_version="1.5")
                add("pgdump:insert_crc",
                    zlib.crc32(open(ins, "rb").read()))
                cp = os.path.join(d, "c.sql")
                write_pgdump(cp, tab, "tpoly", srid=4326,
                             geom_type="POLYGON", use_copy=True)
                add("pgdump:copy_crc", zlib.crc32(open(cp, "rb").read()))
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    return ray.data.from_items(
        [{"which": w} for w in ("mapml", "pgdump")]
    ).map_batches(f, batch_format="pyarrow", batch_size=1)


def q_cad_layer(sf_dir: str):
    """AutoCAD DWG R2000 driver (sources/cad.py; reference
    ogr/ogrsf_frmts/cad + libopencad dwg/r2000.cpp bit-stream parse,
    conformed against autotest/ogr/ogr_cad.py in tests/test_cad.py).
    One task per reference fixture, rows (layer, n_rows, wkt_crc,
    attr_crc)."""
    import os
    import zlib

    import ray.data

    fixdir = "/root/reference/autotest/ogr/data/cad"
    names = ["ellipse_r2000", "triple_circles_r2000", "point2d_r2000",
             "line_r2000", "text_mtext_attdef_r2000"]
    if not os.path.exists(f"{fixdir}/ellipse_r2000.dwg"):
        return pa.table({"layer": pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64()),
                         "wkt_crc": pa.array([], pa.int64()),
                         "attr_crc": pa.array([], pa.int64())})

    def f(t: pa.Table) -> pa.Table:
        from ..sources.cad import read_cad

        lays, nr, wcrc, acrc = [], [], [], []
        for rec in t.to_pylist():
            name = rec["name"]
            for lname, tab in read_cad(f"{fixdir}/{name}.dwg").items():
                lays.append(f"{name}:{lname}")
                nr.append(tab.num_rows)
                wcrc.append(zlib.crc32(
                    "\n".join(tab["wkt"].to_pylist()).encode()))
                attrs = tab.drop_columns(["wkt"])
                acrc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
        return pa.table({"layer": pa.array(lays, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "wkt_crc": pa.array(wcrc, pa.int64()),
                         "attr_crc": pa.array(acrc, pa.int64())})

    ds = ray.data.from_items([{"name": n} for n in names])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=2)


def q_xodr_layers(sf_dir: str):
    """XODR/OpenDRIVE driver (ogr/ogrsf_frmts/xodr, sources/xodr.py):
    one ray task per OGR layer over the reference's own Wolfsburg-West
    fixture, emitting (layer, n_rows, crc) where crc covers the
    attribute columns — the geometry engine itself is pinned bit-level
    against the autotest WKT goldens in tests/test_xodr.py."""
    import os
    import zlib

    import ray.data

    fix = ("/root/reference/autotest/ogr/data/xodr/"
           "5g_living_lab_A39_Wolfsburg-West.xodr")
    schema = pa.schema([("layer", pa.string()), ("n_rows", pa.int64()),
                        ("attr_crc", pa.int64()), ("n_tris", pa.int64())])
    if not os.path.exists(fix):
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    names = ["ReferenceLine", "LaneBorder", "RoadMark", "RoadObject",
             "Lane", "RoadSignal"]

    def f(t: pa.Table) -> pa.Table:
        import struct

        from ..sources.xodr import read_xodr

        lay = read_xodr(fix, epsilon=1.0)
        ly, nr, crc, nt = [], [], [], []
        for rec in t.to_pylist():
            name = rec["name"]
            tab = lay[name]
            ly.append(name)
            nr.append(tab.num_rows)
            attrs = tab.drop_columns(["geometry"])
            crc.append(zlib.crc32(repr(attrs.to_pylist()).encode()))
            tris = 0
            for wkb in tab["geometry"].to_pylist():
                kind = struct.unpack("<I", wkb[1:5])[0]
                if kind == 1016:
                    tris += struct.unpack("<I", wkb[5:9])[0]
            nt.append(tris)
        return pa.table({"layer": pa.array(ly, pa.string()),
                         "n_rows": pa.array(nr, pa.int64()),
                         "attr_crc": pa.array(crc, pa.int64()),
                         "n_tris": pa.array(nt, pa.int64())})

    ds = ray.data.from_items([{"name": n} for n in names])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_sar_product_formats(sf_dir: str):
    """SAR/product driver batch (COSAR, TSX, GFF, COASP, AIRSAR,
    JAXA PALSAR, ENVISAT, RIK, EDIGEO): one ray task per driver over
    deterministically synthesized in-format fixtures (the reference's
    own autotests download their data), emitting (driver, n_items,
    checksum) where checksum folds the decoded pixels/features."""
    import ray.data

    drivers = ["COSAR", "TSX", "GFF", "COASP", "AIRSAR", "PALSAR",
               "ESAT", "RIK", "EDIGEO"]

    def f(t: pa.Table) -> pa.Table:
        import os
        import tempfile
        import zlib

        import numpy as np

        from ..sources import sar_formats as sf
        from ..sources.cosar import read_cosar, read_tsx, write_cosar
        from ..sources.edigeo import read_edigeo
        from ..sources.envisat import read_envisat, write_envisat
        from ..sources.rik import read_rik, write_rik

        rng = np.random.default_rng(12345)
        cplx = (rng.integers(-900, 900, (12, 17)) +
                1j * rng.integers(-900, 900, (12, 17))).astype(np.complex64)
        byte = rng.integers(0, 255, (19, 23)).astype(np.uint8)
        u16 = rng.integers(0, 60000, (11, 13)).astype(np.uint16)
        stokes = rng.integers(-90, 90, (9, 8, 10)).astype(np.int8)

        def crc(arr) -> int:
            return zlib.crc32(np.ascontiguousarray(arr).tobytes())

        dd, nn, cc = [], [], []
        for rec in t.to_pylist():
            drv = rec["driver"]
            with tempfile.TemporaryDirectory() as d:
                if drv == "COSAR":
                    rd = read_cosar(write_cosar(cplx))
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                elif drv == "TSX":
                    from ..sources.cosar import synth_tsx_product

                    path, _ = synth_tsx_product(d)
                    rd = read_tsx(path)
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                elif drv == "GFF":
                    rd = sf.read_gff(sf.write_gff(cplx))
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                elif drv == "COASP":
                    hdr = sf.write_coasp(d, "x_hh_y", {"hh": cplx,
                                                       "vv": cplx * 2})
                    rd = sf.read_coasp(hdr)
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                elif drv == "AIRSAR":
                    rd = sf.read_airsar(sf.write_airsar(stokes))
                    n, c = rd["pixels"].size, crc(
                        rd["pixels"].astype(np.complex128))
                elif drv == "PALSAR":
                    vol = sf.write_palsar(d, "P42", {"HH": cplx})
                    rd = sf.read_palsar(vol)
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                elif drv == "ESAT":
                    rd = read_envisat(write_envisat([u16]))
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                elif drv == "RIK":
                    rd = read_rik(write_rik(byte, options=0x0D))
                    n, c = rd["pixels"].size, crc(rd["pixels"])
                else:   # EDIGEO
                    from ..sources.edigeo import synth_edigeo_lot

                    thf = synth_edigeo_lot(d)
                    lay = read_edigeo(thf)
                    lay.pop("__epsg__", None)
                    n = sum(tb.num_rows for tb in lay.values())
                    c = zlib.crc32(b"".join(
                        b"".join(tb["geometry"].to_pylist())
                        for tb in lay.values()))
            dd.append(drv)
            nn.append(int(n))
            cc.append(int(c))
        return pa.table({"driver": pa.array(dd, pa.string()),
                         "n_items": pa.array(nn, pa.int64()),
                         "checksum": pa.array(cc, pa.int64())})

    ds = ray.data.from_items([{"driver": n} for n in drivers])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_sar_ceos(sf_dir: str):
    """SAR_CEOS driver (frmts/ceos2, sources/sar_ceos.py) over the
    reference's own autotest fixtures — one ray task per product,
    emitting (file, w, h, lines_avail, pix_sum, crc, n_gcps)."""
    import os

    import ray.data

    fixdir = "/root/reference/autotest/gdrivers/data/sar_ceos"
    schema = pa.schema([("file", pa.string()), ("w", pa.int64()),
                        ("h", pa.int64()), ("lines_avail", pa.int64()),
                        ("pix_sum", pa.int64()), ("crc", pa.int64()),
                        ("n_gcps", pa.int64())])
    names = ["ottawa_patch.img", "R1_26161_FN1_F164.D"]
    if not os.path.exists(os.path.join(fixdir, names[0])):
        return pa.table({f.name: pa.array([], f.type) for f in schema})

    def f(t: pa.Table) -> pa.Table:
        import zlib

        import numpy as np

        from ..sources.sar_ceos import read_sar_ceos

        rows = {k: [] for k in schema.names}
        for rec in t.to_pylist():
            rd = read_sar_ceos(os.path.join(fixdir, rec["file"]))
            px = rd["pixels"]
            rows["file"].append(rec["file"])
            rows["h"].append(px.shape[0])
            rows["w"].append(px.shape[1])
            rows["lines_avail"].append(
                int(rd["metadata"]["CEOS_LINES_AVAILABLE"]))
            rows["pix_sum"].append(int(np.asarray(px, np.float64).sum()))
            rows["crc"].append(
                zlib.crc32(np.ascontiguousarray(px).tobytes()))
            rows["n_gcps"].append(len(rd["gcps"]))
        return pa.table({k: pa.array(v, schema.field(k).type)
                         for k, v in rows.items()})

    ds = ray.data.from_items([{"file": n} for n in names])
    return ds.map_batches(f, batch_format="pyarrow", batch_size=1)


def q_simplify_coverage(sf_dir: str):
    """`gdal vector simplify-coverage` (VERDICT r4 directive #4;
    apps/gdalalg_vector_simplify_coverage.cpp, GEOS CoverageSimplifier
    contract) over the synthetic jagged-grid coverage: per-cell rows
    (fid, pts_before, pts_after, area_q, topo_ok) plus a fid=-1
    summary row.  topo_ok asserts the coverage CONTRACT after
    simplification — feature count preserved, every interior segment
    still shared by exactly two cells, exterior segments unshared,
    vertex count reduced, total area exactly the frame area (the
    partition sums to 96^2 bit-for-bit because shared arcs are
    replaced identically on both sides).  The oracle pins fid /
    pts_before / topo_ok independently (coverage synthesis
    arithmetic); pts_after / area_q ride along as determinism pins.
    """
    from collections import Counter

    from ..functions.geom import geom_area
    from ..functions.wkb import wkb_to_geom
    from ..stages.coverage import (COV_TOL, jagged_coverage,
                                   segments_table,
                                   simplify_coverage_table)

    fids, wkbs = jagged_coverage()
    pts_before = np.array([len(wkb_to_geom(w).rings[0]) for w in wkbs],
                          np.int64)
    out = simplify_coverage_table(fids, wkbs, COV_TOL,
                                  preserve_boundary=True)
    wo = [w.as_py() for w in out["geometry"]]
    fo = out["fid"].to_numpy()
    pts_after = out["n_pts"].to_numpy()
    areas = np.array([geom_area(wkb_to_geom(w)) for w in wo])

    before_mult = Counter(
        Counter(segments_table(fids, wkbs)["seg"].to_numpy().tolist())
        .values())
    s2 = segments_table(fo, wo)
    after_mult = Counter(Counter(s2["seg"].to_numpy().tolist()).values())
    topo = (len(fo) == len(fids)
            and set(after_mult) <= {1, 2}
            and int(pts_after.sum()) < int(pts_before.sum())
            and abs(float(areas.sum()) - 9216.0) < 1e-6)

    rows_fid = np.concatenate([fo, [-1]])
    rows_pb = np.concatenate([pts_before, [int(pts_before.sum())]])
    rows_pa = np.concatenate([pts_after, [int(pts_after.sum())]])
    rows_ar = np.concatenate([np.round(areas, 6),
                              [round(float(areas.sum()), 6)]])
    rows_ok = np.concatenate([np.ones(len(fo), np.int64),
                              [int(topo)]])
    return pa.table({
        "fid": pa.array(rows_fid, pa.int64()),
        "pts_before": pa.array(rows_pb, pa.int64()),
        "pts_after": pa.array(rows_pa, pa.int64()),
        "area_q": pa.array(rows_ar, pa.float64()),
        "topo_ok": pa.array(rows_ok, pa.int64()),
    })


def q_gmlas_layer(sf_dir: str):
    """GMLAS schema-driven flattening subset (VERDICT r4 directive
    #8; ogr/ogrsf_frmts/gmlas re-derivation in sources/gmlas.py) over
    the reference's own autotest/ogr/data/gmlas fixtures: the
    choice_*_inlined list-field family (ogr_gmlas.py:3503-3506
    published values), no-namespace open, independent-child linking
    and the geosciml composition/compositionPart junction shape.
    Every value is either an ogr_gmlas.py assertion or fixture-file
    content — the oracle builder transcribes them engine-free."""
    import ray.data

    D = "/root/reference/autotest/ogr/data/gmlas"
    items = [{"case": c} for c in (
        "choice_str", "choice_int", "choice_int64", "choice_double",
        "no_namespace_foo", "link_second_my_id",
        "comp_junction_rows", "comp_part_rows", "comp_part_ids",
        "comp_part_a", "comp_links_set")]

    def f(t: pa.Table) -> pa.Table:
        from ..sources.gmlas import read_gmlas

        cases, values = [], []
        for rec in t.to_pylist():
            c = rec["case"]
            if c.startswith("choice_"):
                kind = c.split("_", 1)[1]
                out = read_gmlas(f"{D}/choice_{kind}_inlined.xml")
                vals = out["main"][f"a_b_{kind}_attr"][0].as_py()
                v = "|".join(str(x) for x in vals)
            elif c == "no_namespace_foo":
                v = read_gmlas(
                    f"{D}/gmlas_no_namespace.xml")["main_elt"]["foo"][0].as_py()
            elif c == "link_second_my_id":
                v = read_gmlas(
                    f"{D}/gmlas_link_nested_independant_child.xml"
                )["first"]["second_my_id"][0].as_py()
            else:
                out = read_gmlas(
                    f"{D}/gmlas_composition_compositionPart.xml")
                junction = out["first_composition"]
                part = out["CompositionPart"]
                if c == "comp_junction_rows":
                    v = str(junction.num_rows)
                elif c == "comp_part_rows":
                    v = str(part.num_rows)
                elif c == "comp_part_ids":
                    v = "|".join(part["my_id"].to_pylist())
                elif c == "comp_part_a":
                    v = "|".join(part["a"].to_pylist())
                else:  # both link fields set on every junction row
                    ok = (junction["parent_ogr_pkid"].null_count == 0
                          and junction["CompositionPart_pkid"]
                          .null_count == 0)
                    v = str(int(ok))
            cases.append(c)
            values.append(v)
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.string())})

    return (ray.data.from_items(items)
            .map_batches(f, batch_format="pyarrow", batch_size=3))


def q_sozip(sf_dir: str):
    """SOZip create / validate / ranged read (sources/sozip.py;
    reference port/cpl_minizip_zip.cpp writer + `gdal vsi sozip`,
    autotest/utilities/test_sozip.py published fixture facts).  Rows
    (case, value): the reference's own zero_5GB_sozip_of_sozip.zip
    facts (member size 5232873, chunk 32768, nested zip64 member of
    exactly 5 GiB), auto/yes enable thresholds, analytic chunk
    counts, python-zipfile conformance, ranged-read equality, and a
    parallel chunk Dataset reassembly."""
    import os
    import tempfile
    import zipfile

    import ray.data

    from ..sources.sozip import (AUTO_MIN_SIZE, sozip_chunk_dataset,
                                 sozip_create, sozip_info, sozip_read,
                                 sozip_read_range)

    REF = ("/root/reference/autotest/gcore/data/"
           "zero_5GB_sozip_of_sozip.zip")

    def f(t: pa.Table) -> pa.Table:
        cases, values = [], []

        def add(c, v):
            cases.append(c)
            values.append(int(v))

        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, AUTO_MIN_SIZE + 1, np.uint8).tobytes()
        pays = [("a", a), ("b", b"x" * 40000)]
        with tempfile.TemporaryDirectory() as d:
            zp = os.path.join(d, "out.zip")
            on = sozip_create(zp, pays, chunk_size=16384,
                              enable="auto")
            add("auto_a_enabled", on["a"])
            add("auto_b_enabled", on["b"])
            info = {r["name"]: r for r in sozip_info(zp)}
            add("a_chunks", info["a"]["n_chunks"])
            add("a_index_valid", info["a"]["index_valid"])
            z = zipfile.ZipFile(zp)
            add("zipfile_roundtrip",
                z.read("a") == a and z.read("b") == pays[1][1])
            probe = sozip_read_range(zp, "a", 16384 * 3 + 5, 40000)
            add("range_probe_ok", probe == a[16384 * 3 + 5:][:40000])
            on2 = sozip_create(os.path.join(d, "y.zip"),
                               [("b", pays[1][1])],
                               chunk_size=16384, enable="yes")
            add("yes_b_enabled", on2["b"])
        if os.path.exists(REF):
            r = sozip_info(REF)[0]
            add("ref_member_size", r["size"])
            add("ref_chunk_size", r["chunk_size"])
            add("ref_sozip_valid", r["sozip"] and r["index_valid"])
            with tempfile.TemporaryDirectory() as d:
                ip = os.path.join(d, "inner.zip")
                open(ip, "wb").write(sozip_read(REF,
                                                "zero_5GB.bin.zip"))
                ir = sozip_info(ip)[0]
                add("ref_inner_size", ir["size"])
                add("ref_inner_sozip", ir["sozip"]
                    and ir["index_valid"])
        return pa.table({"case": pa.array(cases, pa.string()),
                         "value": pa.array(values, pa.int64())})

    out = pa.concat_tables(
        ray.data.range(1).map_batches(
            lambda t: f(t), batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    # the parallel chunk Dataset path runs OUTSIDE the task (it owns
    # its own Ray stages)
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, AUTO_MIN_SIZE + 1, np.uint8).tobytes()
        zp = os.path.join(d, "p.zip")
        sozip_create(zp, [("a", a)], chunk_size=65536, enable="yes")
        ds = sozip_chunk_dataset(zp, "a")
        total = 0
        for b in ds.iter_batches(batch_size=None,
                                 batch_format="pyarrow"):
            total += sum(len(x) for x in b["data"].to_pylist())
    return pa.concat_tables([out, pa.table(
        {"case": pa.array(["parallel_chunk_bytes"], pa.string()),
         "value": pa.array([total], pa.int64())})]).sort_by("case")


QUERIES = {
    "q_xodr_layers": q_xodr_layers,
    "q_sar_product_formats": q_sar_product_formats,
    "q_sar_ceos": q_sar_ceos,
    "q_gnm": q_gnm,
    "q_lineref": q_lineref,
    "q_sosi_layer": q_sosi_layer,
    "q_cad_layer": q_cad_layer,
    "q_mapml_pgdump": q_mapml_pgdump,
    "q_ogrvrt_layer": q_ogrvrt_layer,
    "q_sg_vct_layers": q_sg_vct_layers,
    "q_slf_wasp_kmz": q_slf_wasp_kmz,
    "q_sxf_layer": q_sxf_layer,
    "q_duckdb_layer": q_duckdb_layer,
    "q_mitab_tab": q_mitab_tab,
    "q_feed_vector": q_feed_vector,
    "q_json_layer": q_json_layer,
    "q_vfk_layer": q_vfk_layer,
    "q_pds_table": q_pds_table,
    "q_lvbag_layer": q_lvbag_layer,
    "q_miramon_layer": q_miramon_layer,
    "q_avc_layer": q_avc_layer,
    "q_dgn_layer": q_dgn_layer,
    "q_pmtiles_layer": q_pmtiles_layer,
    "q_mvt_layer": q_mvt_layer,
    "q_feed_formats": q_feed_formats,
    "q_s57_layer": q_s57_layer,
    "q_osm_layer": q_osm_layer,
    "q_fgdb_layer": q_fgdb_layer,
    "q_spreadsheet": q_spreadsheet,
    "q_dxf_layer": q_dxf_layer,
    "q_mif_layer": q_mif_layer,
    "q_vector_reproject": q_vector_reproject,
    "q_layer_info": q_layer_info,
    "q_geom_simplify": q_geom_simplify,
    "q_geom_segmentize": q_geom_segmentize,
    "q_clip_zones": q_clip_zones,
    "q_explode": q_explode,
    "q_layer_intersection": q_layer_intersection,
    "q_layer_erase": q_layer_erase,
    "q_layer_union_symdiff": q_layer_union_symdiff,
    "q_layer_nonconvex": q_layer_nonconvex,
    "q_constructive": q_constructive,
    "q_gpkg_layer": q_gpkg_layer,
    "q_geojson_layer": q_geojson_layer,
    "q_fgb_layer": q_fgb_layer,
    "q_shp_layer": q_shp_layer,
    "q_csv_layer": q_csv_layer,
    "q_kml_gml_layer": q_kml_gml_layer,
    "q_gpx_layer": q_gpx_layer,
    "q_sqlite_layer": q_sqlite_layer,
    "q_arrow_layer": q_arrow_layer,
    "q_zfield_precision": q_zfield_precision,
    "q_simplify_coverage": q_simplify_coverage,
    "q_gmlas_layer": q_gmlas_layer,
    "q_sozip": q_sozip,
}
