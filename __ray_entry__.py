"""Driver contract for the gdal_ray engine.

The driver initialises Ray itself before importing this module; none
of these callables (or the library underneath) calls ray.init()/
ray.shutdown().

- entry():      flagship image pipeline (decode actor pool -> tile +
                S2 cell assignment -> broadcast PIP join) at sf0.001
                scale.
- queries():    one callable per implemented operator/pipeline from
                SURVEY.md §2 (+ the training-data extensions), each
                taking sf_dir.
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query
                (identical column names and rounding). Sketch/
                heuristic operators are intentionally absent here ->
                rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline; Ray already initialised by the driver."""
    from gdal_ray.pipelines.flagship import flagship

    return flagship(num_images=128, concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    """Ordered so that operators without a green CORRECTNESS_r01 row
    come FIRST: the round-1 driver recorded only the first 50 keys, so
    never-yet-verified pipelines (raster, vector_ops, multimodal, the
    rows-only sketches) lead, and the 42 round-1-green queries fill the
    tail. scripts/check_correctness.py mirrors the full set."""
    from gdal_ray.pipelines import raster, relational, spatial_sql, text_embed, vector_ops
    from gdal_ray.stages.multimodal import audio_features_query, video_frames_query

    merged: dict[str, Callable[[str], Any]] = {}
    merged.update(relational.QUERIES)
    merged.update(spatial_sql.QUERIES)
    merged.update(text_embed.QUERIES)
    merged.update(raster.QUERIES)
    merged.update(vector_ops.QUERIES)
    merged["q_audio_features"] = audio_features_query
    merged["q_video_frames"] = video_frames_query
    merged["q_multidim"] = _q_multidim

    # priority tiers (highest first):
    # 2 = implementation OR oracle changed this round (round 3): the
    #     29 queries that gained literal-VALUES oracles, the ExecuteSQL
    #     planner family (string-literal masking touched every plan),
    #     the reworked distributed folds, and every corpus-decoding
    #     query (JPEG codec rewritten; pixels should be unchanged —
    #     the driver hash is the proof)
    # 1 = rows-only (driver row exists, no oracle)
    # 0 = hash-green and untouched this round
    # everything NOT listed (never driver-rowed / new) leads at tier 3
    from gdal_ray.pipelines.literal_oracles import ORACLE as _LIT

    oracled = set(_LIT) | set(computed_oracles())
    tier = {}
    for k in merged:
        tier[k] = 0 if k in oracled else 1   # default: green < rows-only
    for k in _LIT:
        tier[k] = 2
    for k in ("q_sql_execute", "q_sql_join", "q_sql_union", "q_sql_having",
              "q_count_distinct", "q_jaccard_verify", "q_contour_lines",
              "q_polygonize", "q_proximity", "q_minhash_lsh",
              "q_raster_stats", "q_raster_stats_approx", "q_histogram",
              "q_pixel_info", "q_tile_counts", "q_tile_assign",
              "q_pyramid", "q_footprint"):
        tier[k] = 2
    for k in ("q_gnm", "q_lineref", "q_sosi_layer",
              "q_sql_left_join", "q_sql_count_distinct", "q_sql_multi_join",
              "q_sql_subquery", "q_geoloc_warp", "q_zfield_precision",
              "q_gpkg_layer", "q_geojson_layer", "q_fgb_layer",
              "q_viewshed", "q_viewshed_cumulative", "q_zarr",
              "q_csv_layer", "q_nearblack", "q_ascii_raster",
              "q_kml_gml_layer", "q_gdaltindex", "q_vector_reproject",
              "q_layer_info", "q_cog", "q_vrt", "q_arrow_layer",
              "q_netcdf", "q_envi_ehdr", "q_terrain", "q_gpx_layer",
              "q_sqlite_layer", "q_grib", "q_tile_geodetic",
              "q_rgb_to_palette", "q_color_merge", "q_grid_linear",
              "q_raster_open", "q_gcp_warp", "q_binary_raster",
              "q_shp_layer", "q_hfa", "q_nitf", "q_mif_layer",
              "q_spreadsheet", "q_fgdb_layer", "q_osm_layer",
              "q_grid_formats", "q_s57_layer", "q_feed_formats",
              "q_mvt_layer", "q_pmtiles_layer", "q_dgn_layer",
              "q_avc_layer", "q_json_layer", "q_feed_vector",
              "q_esric", "q_mrf", "q_military_formats",
              "q_miramon_layer", "q_vfk_layer", "q_pds_table",
              "q_lvbag_layer", "q_hdf5", "q_grib2",
              "q_simple_formats", "q_srp_nwt", "q_fits",
              "q_sg_vct_layers", "q_slf_wasp_kmz", "q_sxf_layer",
              "q_mitab_tab", "q_mapml_pgdump", "q_cad_layer",
              "q_snap_tiff", "q_webp_codec", "q_duckdb_layer",
              "q_pdf_raster", "q_exr_codec", "q_rasterlite2",
              "q_xodr_layers", "q_sar_product_formats", "q_sar_ceos",
              "q_hex_join"):
        tier[k] = 3                           # new this round, never rowed
    ranked = sorted(merged, key=lambda k: -tier.get(k, 3))
    return {k: merged[k] for k in ranked}


def _q_multidim(sf_dir: str):
    """GDALMDArray bridge: lazy (slice+unscale) view of the synthetic
    (time,y,x) field -> classic tile Dataset -> per-tile mean partials
    (rows-only; view semantics golden-tested)."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.sources.multidim import synthetic_mdarray

    arr = synthetic_mdarray()
    ds = arr.slice_view("time", 0, 2).unscaled().as_classic_dataset("x", "y", tile=128)

    def f(t: pa.Table) -> pa.Table:
        blocks = [np.frombuffer(b, np.float64)
                  for b in t["pixels"].to_pylist()]
        sums = np.array([b.sum() for b in blocks])
        ns = np.array([b.size for b in blocks], np.float64)
        return pa.table({"ty": t["ty"], "tx": t["tx"],
                         "mean": pa.array(np.round(sums / ns, 6))})

    return ds.map_batches(f, batch_format="pyarrow")


def computed_oracles() -> dict[str, str]:
    """Oracles that recompute the answer from the sf tables in SQL."""
    from gdal_ray.pipelines import raster, relational, spatial_sql, text_embed, vector_ops

    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(spatial_sql.ORACLE)
    out.update(text_embed.ORACLE)
    out.update(raster.ORACLE)
    out.update(vector_ops.ORACLE)
    return out


def oracle_sql() -> dict[str, str]:
    """Computed oracles + literal-VALUES oracles for the deterministic
    golden pipelines (pinned at sf0.01 by scripts/gen_literal_oracles.py;
    computed oracles win on any key collision)."""
    from gdal_ray.pipelines.literal_oracles import ORACLE as literal

    out = dict(literal)
    out.update(computed_oracles())
    return out
