"""Per-stage throughput/row-count metrics (north-rule requirement:
"throughput/row-count metrics emitted per stage") and lineage helpers.

A tiny named Ray actor accumulates (stage -> rows, bytes, batches)
counters; ``instrument(ds, stage)`` wraps a Dataset with a
zero-copy pass-through ``map_batches`` that reports each batch. The
actor is the only shared mutable state in the engine (the Dataset API
can't express cross-task counters), which is exactly the carve-out the
design allows raw actors for.

Overhead: one actor call per batch (async, fire-and-forget) + no data
copy — safe to leave on in production pipelines.

The durable lineage complement lives in stages/tiling.write_tiles
(per-partition manifest.jsonl with tile keys + checksums).
"""

from __future__ import annotations

import pyarrow as pa

_ACTOR_NAME = "gdal_ray_stage_metrics"


def _get_collector():
    import ray

    @ray.remote(num_cpus=0)
    class StageMetricsActor:
        def __init__(self):
            self._m: dict[str, dict] = {}

        def add(self, stage: str, rows: int, nbytes: int) -> None:
            e = self._m.setdefault(
                stage, {"rows": 0, "bytes": 0, "batches": 0})
            e["rows"] += rows
            e["bytes"] += nbytes
            e["batches"] += 1

        def snapshot(self) -> dict:
            return {k: dict(v) for k, v in self._m.items()}

        def reset(self) -> None:
            self._m.clear()

    # session-scoped (not detached): counters die with the job, so a
    # snapshot never mixes a prior run's numbers
    return StageMetricsActor.options(
        name=_ACTOR_NAME, get_if_exists=True).remote()


def instrument(ds, stage: str):
    """Pass-through metrics tap after a stage (rows/bytes/batches)."""
    collector = _get_collector()

    def tap(t: pa.Table) -> pa.Table:
        collector.add.remote(stage, t.num_rows, t.nbytes)
        return t

    return ds.map_batches(tap, batch_format="pyarrow", zero_copy_batch=True)


def metrics_snapshot() -> dict:
    import ray

    return ray.get(_get_collector().snapshot.remote())


def metrics_reset() -> None:
    import ray

    ray.get(_get_collector().reset.remote())
