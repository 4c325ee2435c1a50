"""Serialized pipeline specs — the GDALG / `gdal raster pipeline`
analog (reference frmts/gdalg/gdalgdriver.cpp:210-222 re-executes a
saved pipeline on open; step chaining apps/gdalalg_abstract_pipeline.h
RunStep).

A spec is a JSON document: {"type": "gdal_ray_pipeline", "steps":
[{"op": name, ...params}, ...]}. ``build(spec)`` replays it into a
lazy ray.data.Dataset; ``save``/``load`` round-trip it through a
.gdalray.json file. Steps are registered in STEP_REGISTRY — the
user-extension hook (SURVEY.md §2.13): register a callable
(dataset, params) -> dataset under a name and it becomes a step.

Built-in steps cover the pipeline surface: read (parquet / image
corpus / tiff), where (swq attribute filter), select, rename, limit,
derive (pixel-function band math on tile rows), warp_tiles, compose,
sort, write_parquet.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

STEP_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    def deco(fn):
        STEP_REGISTRY[name] = fn
        return fn

    return deco


# ------------------------------------------------------------------ built-ins


@register_step("read_parquet")
def _read_parquet(ds, p):
    import ray.data

    return ray.data.read_parquet(p["path"], columns=p.get("columns"))


@register_step("read_images")
def _read_images(ds, p):
    from ..sources.images import corpus_dataset

    return corpus_dataset(int(p.get("n", 64)))


@register_step("read_tiff")
def _read_tiff(ds, p):
    from ..sources.tiff import read_tiff_dataset

    return read_tiff_dataset(p["paths"])


@register_step("where")
def _where(ds, p):
    from ..functions.swq import filter_where

    return filter_where(ds, p["expr"])


@register_step("select")
def _select(ds, p):
    cols = p["columns"]
    return ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow")


@register_step("rename")
def _rename(ds, p):
    mapping = p["mapping"]

    def f(t):
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


@register_step("limit")
def _limit(ds, p):
    return ds.limit(int(p["n"]))


@register_step("sort")
def _sort(ds, p):
    return ds.sort(p["key"], descending=bool(p.get("descending", False)))


@register_step("warp_tiles")
def _warp_tiles(ds, p):
    from ..stages.warp import WarpToTiles

    return ds.map_batches(
        WarpToTiles,
        fn_constructor_kwargs=dict(zoom=p.get("zoom"),
                                   resampling=p.get("resampling", "bilinear")),
        batch_format="pyarrow", batch_size=int(p.get("batch_size", 16)),
        concurrency=int(p.get("concurrency", 4)))


@register_step("compose")
def _compose(ds, p):
    from ..stages.tiling import compose_tiles

    return compose_tiles(ds, salt=p.get("salt"))


@register_step("write_parquet")
def _write_parquet(ds, p):
    ds.write_parquet(p["path"])
    return ds


# ------------------------------------------------------------------ engine


def build(spec: dict[str, Any]):
    """Replay a pipeline spec into a (lazy) Dataset."""
    if spec.get("type") != "gdal_ray_pipeline":
        raise ValueError("not a gdal_ray pipeline spec")
    ds = None
    for step in spec["steps"]:
        op = step["op"]
        fn = STEP_REGISTRY.get(op)
        if fn is None:
            raise NotImplementedError(f"pipeline step {op!r}")
        ds = fn(ds, step)
    return ds


def save(spec: dict[str, Any], path: str) -> None:
    if not path.endswith(".gdalray.json"):
        raise ValueError("pipeline specs use the .gdalray.json suffix")
    with open(path, "w") as f:
        json.dump(spec, f, indent=1)


def load(path: str):
    """Open a saved spec and replay it (the GDALG open-reexecutes
    contract)."""
    with open(path) as f:
        spec = json.load(f)
    return build(spec)
