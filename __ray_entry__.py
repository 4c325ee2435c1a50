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
    from gdal_ray.pipelines import raster, relational, spatial_sql, text_embed, vector_ops

    out: dict[str, Callable[[str], Any]] = {}
    out.update(relational.QUERIES)
    out.update(spatial_sql.QUERIES)
    out.update(text_embed.QUERIES)
    out.update(raster.QUERIES)
    out.update(vector_ops.QUERIES)

    from gdal_ray.stages.multimodal import audio_features_query, video_frames_query

    out["q_audio_features"] = audio_features_query
    out["q_video_frames"] = video_frames_query
    out["q_multidim"] = _q_multidim
    return out


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
        sums, ns = [], []
        for r in t.to_pylist():
            block = np.frombuffer(r["pixels"], np.float64)
            sums.append(float(block.sum()))
            ns.append(block.size)
        return pa.table({"ty": t["ty"], "tx": t["tx"],
                         "mean": pa.array(np.round(np.array(sums) / np.array(ns), 6))})

    return ds.map_batches(f, batch_format="pyarrow")


def oracle_sql() -> dict[str, str]:
    from gdal_ray.pipelines import raster, relational, spatial_sql, text_embed, vector_ops

    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(spatial_sql.ORACLE)
    out.update(text_embed.ORACLE)
    out.update(raster.ORACLE)
    out.update(vector_ops.ORACLE)
    return out
