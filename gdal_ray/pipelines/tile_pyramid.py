"""End-to-end tiling pipeline: corpus -> warp (actor pool) -> shuffle
on tile key -> compose -> overview pyramid -> partitioned output with
lineage manifests (the `gdal raster tile` equivalent, SURVEY.md §2.6,
reference apps/gdalalg_raster_tile.cpp).

Stages and their physical shapes:
    synthesize/read   tasks (or read_parquet of the stored corpus)
    WarpToTiles       actor pool, stateful decode+warp
    compose           groupby(tile_key) shuffle + map_groups mosaic
    overviews         per level: groupby(parent_key) 2x2 masked average
    write             partitioned parquet + manifest.jsonl (resume)
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..stages.tiling import (build_overview_level, clean_orphans,
                             compose_tiles, resume_filter, write_tiles)
from ..stages.warp import WarpToTiles


def warp_fragments(num_images: int, *, zoom: int | None = None,
                   resampling: str = "bilinear", concurrency: int = 8,
                   source_path: str | None = None, batch_size: int = 16):
    """Corpus -> warped tile fragments (the heavy, perfectly-parallel
    stage). ``source_path`` reads a stored corpus parquet instead of
    synthesizing (the read_lance stand-in)."""
    import ray.data

    if source_path is not None:
        ds = ray.data.read_parquet(source_path, columns=["image_id", "bytes"])
    else:
        from ..sources.images import corpus_dataset

        ds = corpus_dataset(num_images)
    # Fixed-size pool (pre-started actors; autoscaling ramps too slowly
    # for bounded jobs). Upstream read/synth tasks fuse into the actor
    # stage, so the pool must stay below the CPU count by a margin for
    # unfused stages — callers size `concurrency` <= cpus - 2.
    return ds.map_batches(
        WarpToTiles, fn_constructor_kwargs=dict(zoom=zoom, resampling=resampling),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=max(2, concurrency))


def warp_compose(num_images: int, *, zoom: int | None = None,
                 resampling: str = "bilinear", concurrency: int = 8,
                 salt: int | None = None, source_path: str | None = None):
    """Warp + compose: the benchmark/scaling headline job. Returns the
    composed-tiles Dataset (lazy)."""
    frags = warp_fragments(num_images, zoom=zoom, resampling=resampling,
                           concurrency=concurrency, source_path=source_path)
    return compose_tiles(frags, salt=salt)


def tile_pyramid(num_images: int, out_dir: str, *, zoom: int,
                 min_zoom: int = 0, resampling: str = "bilinear",
                 concurrency: int = 8, salt: int | None = None,
                 resume: bool = False, source_path: str | None = None) -> dict:
    """Full pyramid with per-level write + lineage manifest + metrics.

    Each level is written before the next coarser level is built from
    it (the reference builds overviews from the zoom+1 tiles). With
    ``resume=True``, tiles already in ``out_dir``'s manifest are
    skipped (anti-join against the broadcast finished-key set).
    """
    import ray.data

    from ..state.lineage import instrument, metrics_snapshot

    metrics: dict = {"levels": {}, "num_images": num_images, "zoom": zoom}
    t0 = time.time()
    frags = warp_fragments(num_images, zoom=zoom, resampling=resampling,
                           concurrency=concurrency, source_path=source_path)
    if resume:
        clean_orphans(out_dir)
        frags = resume_filter(frags, out_dir)
    frags = instrument(frags, "warp_fragments")
    tiles = compose_tiles(frags, salt=salt)
    tiles = instrument(tiles, f"compose_z{zoom}")
    stats = write_tiles(tiles, out_dir)
    metrics["levels"][zoom] = {**stats, "sec": round(time.time() - t0, 3)}

    from ..stages.tiling import _SinkFS

    sink = _SinkFS(out_dir)
    for z in range(zoom, min_zoom, -1):
        t0 = time.time()
        files = [f"{out_dir}/{name}" for name in sink.listdir("", ".parquet")
                 if name.startswith("part-") and name.endswith(f"-z{z}-{z}.parquet")]
        if not files:
            break
        level = ray.data.read_parquet(sorted(files))
        parent = build_overview_level(level)
        if resume:
            parent = resume_filter(parent, out_dir)
        parent = instrument(parent, f"overview_z{z - 1}")
        stats = write_tiles(parent, out_dir)
        metrics["levels"][z - 1] = {**stats, "sec": round(time.time() - t0, 3)}
        if stats["n_tiles"] <= 1:
            break
    metrics["n_tiles_total"] = sum(v["n_tiles"] for v in metrics["levels"].values())
    metrics["stage_metrics"] = metrics_snapshot()
    return metrics


def pyramid_query(sf_dir: str):
    """queries() wrapper: small fixed pyramid, returns per-zoom tile
    counts + checksum sums (deterministic; rows-only check)."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="gdal_ray_pyr_")
    try:
        m = tile_pyramid(96, out, zoom=15, min_zoom=11, concurrency=4)
        zs = sorted(m["levels"])
        return pa.table({
            "zoom": pa.array(zs, pa.int32()),
            "n_tiles": pa.array([m["levels"][z]["n_tiles"] for z in zs], pa.int64()),
        })
    finally:
        shutil.rmtree(out, ignore_errors=True)
