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
    """Ordered so never-driver-recorded / this-round-changed operators
    come FIRST (the driver samples a prefix); the full surface is
    mirrored by scripts/check_correctness.py."""
    from gdal_ray.pipelines import raster, relational, spatial_sql, text_embed, vector_ops
    from gdal_ray.stages.multimodal import (audio_features_query,
                                            multimodal_real_query,
                                            video_frames_query)

    merged: dict[str, Callable[[str], Any]] = {}
    merged.update(relational.QUERIES)
    merged.update(spatial_sql.QUERIES)
    merged.update(text_embed.QUERIES)
    merged.update(raster.QUERIES)
    merged.update(vector_ops.QUERIES)
    from gdal_ray.pipelines.flagship import q_phash_neardup

    merged["q_phash_neardup"] = q_phash_neardup
    merged["q_audio_features"] = audio_features_query
    merged["q_multimodal_real"] = multimodal_real_query
    merged["q_video_frames"] = video_frames_query
    merged["q_multidim"] = _q_multidim

    # priority tiers (highest first) — round 5:
    # 4 = brand-new operators this round
    # 3 = never recorded by a driver gate (not a key in
    #     CORRECTNESS_r04.json)
    # 2 = output schema or oracle CHANGED this round (drift-pin
    #     ride-along columns + the independence-conversion mixed
    #     oracles + the rewritten TIN gridder + new q_jp2/q_dem rows)
    # 1 = rows-only (no oracle)
    # 0 = hash-green and untouched
    import json
    import os

    recorded: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for rnd in ("r01", "r02", "r03", "r04"):
        try:
            recorded |= set(json.load(open(
                os.path.join(here, f"CORRECTNESS_{rnd}.json"))))
        except Exception:
            pass
    from gdal_ray.pipelines.literal_oracles import ORACLE as _LIT
    from gdal_ray.pipelines.literal_oracles import PROVENANCE as _PROV

    oracled = set(_LIT) | set(computed_oracles())
    tier = {}
    for k in merged:
        if k not in recorded:
            tier[k] = 3
        elif k not in oracled:
            tier[k] = 1
        else:
            tier[k] = 0
    # round-5 changed oracles/outputs: every mixed-provenance entry
    # (independence conversion restructured its VALUES this round)
    # plus the queries whose output schema gained pin columns
    for k, v in _PROV.items():
        if v.startswith("mixed") and tier.get(k, 0) < 2:
            tier[k] = 2
    for k in ("q_crs_transform", "q_grid_linear", "q_jp2",
              "q_dem_goldens", "q_sql_spatial"):
        if tier.get(k, 0) < 2:
            tier[k] = 2
    for k in ("q_simplify_coverage", "q_phash_neardup",
              "q_gmlas_layer", "q_sozip"):
        tier[k] = 4                     # brand-new operators lead
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
