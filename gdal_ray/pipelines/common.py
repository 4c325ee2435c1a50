"""Shared Ray-Data pipeline helpers: pruned reads, scalable
pre-aggregation, top-k, and broadcast lookups.

Scale notes (the 100 TB contract):
- ``read_table`` always prunes columns at the parquet read.
- ``partial_groupby_agg`` implements the combiner pattern: per-batch
  pyarrow ``Table.group_by`` partials inside ``map_batches`` (the
  parallel, heavy part), then a final combine over the tiny partial
  table — no all-to-all shuffle. Requires group cardinality << rows
  (true for every aggregate query here); for high-cardinality keys
  use ``Dataset.groupby`` instead.
- ``topk`` is per-batch top-k then a final merge — no global sort.
- ``broadcast`` materializes a small table once (``ray.put`` under
  the hood via Ray's closure capture of the object ref).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def arrow_table(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a *small* table (dimension side of a
    broadcast join)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# agg spec: (out_name, in_col, kind) with kind in
# {sum, min, max, count, count_all, sumsq}
_PARTIAL_KIND = {
    "sum": "sum", "min": "min", "max": "max",
    "count": "count", "count_all": "count_all", "sumsq": "sum",
}


def _batch_partial(keys: Sequence[str], aggs):
    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for out, col, kind in aggs:
            if kind == "sumsq":
                cols[out] = pc.multiply(batch[col], batch[col])
            elif kind == "count_all":
                cols[out] = pa.array(np.ones(batch.num_rows, np.int64))
            else:
                cols[out] = batch[col]
        t = pa.table({**{k: batch[k] for k in keys}, **cols})
        specs = []
        for out, col, kind in aggs:
            op = {"sum": "sum", "sumsq": "sum", "min": "min", "max": "max",
                  "count": "count", "count_all": "sum"}[kind]
            specs.append((out, op))
        g = t.group_by(keys).aggregate(specs)
        return _fix_names(g, keys, aggs)

    return fn


def _fix_names(g: pa.Table, keys, aggs) -> pa.Table:
    # pyarrow names results "<col>_<op>"; map back to out names in order
    name_map = {}
    for out, _, kind in aggs:
        op = {"sum": "sum", "sumsq": "sum", "min": "min", "max": "max",
              "count": "count", "count_all": "sum"}[kind]
        name_map[f"{out}_{op}"] = out
    cols, names = [], []
    for n in g.column_names:
        cols.append(g[n])
        names.append(name_map.get(n, n))
    return pa.table(dict(zip(names, cols)))


def partial_groupby_agg(ds, keys: Sequence[str], aggs,
                        batch_size: int = 65536,
                        distributed_threshold: int = 2_000_000) -> pa.Table:
    """Combiner-style grouped aggregation.

    ``aggs``: list of (out_name, in_col, kind). Returns the combined
    partial table keyed by ``keys`` with columns named ``out_name``;
    counts/sums are still *mergeable partials* semantics-wise, so
    derived values (avg, stddev) are computed by the caller from the
    returned sums/counts.

    Scale guard: the partial volume is O(batches x groups-per-batch).
    When it exceeds ``distributed_threshold`` rows, the final combine
    runs as ONE MORE distributed round (a second map_batches partial
    pass over repartitioned partials) before the driver merge, so the
    driver only ever folds a bounded table. (At sandbox sizes the
    single driver fold is faster and is the default path.)"""
    partials = ds.map_batches(
        _batch_partial(keys, aggs), batch_format="pyarrow", batch_size=batch_size
    )
    mid_aggs = [(out, out, "min" if kind == "min" else
                 ("max" if kind == "max" else "sum"))
                for out, _, kind in aggs]
    # materialize so the size probe doesn't re-execute the heavy pass;
    # partials live in the (spillable) object store, not driver heap
    partials = partials.materialize()
    for _ in range(3):  # each round shrinks volume ~batch_size-fold
        cnt = partials.count()
        if cnt <= distributed_threshold:
            break
        partials = partials.repartition(
            max(8, cnt // batch_size)).map_batches(
            _batch_partial(keys, mid_aggs), batch_format="pyarrow",
            batch_size=batch_size).materialize()
    tables = [pa.Table.from_pandas(df) if not isinstance(df, pa.Table) else df
              for df in _collect_tables(partials)]
    merged = pa.concat_tables(tables, promote_options="default")
    specs = []
    for out, _, kind in aggs:
        op = "min" if kind == "min" else ("max" if kind == "max" else "sum")
        specs.append((out, op))
    g = merged.group_by(list(keys)).aggregate(specs)
    name_map = {}
    for out, _, kind in aggs:
        op = "min" if kind == "min" else ("max" if kind == "max" else "sum")
        name_map[f"{out}_{op}"] = out
    return pa.table({name_map.get(n, n): g[n] for n in g.column_names})


def _collect_tables(ds):
    """Iterate a Dataset's blocks as Arrow tables on the driver (the
    result here is always the small partial side)."""
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        yield b


def global_agg(ds, aggs, batch_size: int = 65536) -> dict:
    """Global (no-key) aggregation via the same combiner pattern."""
    marked = ds.map_batches(
        lambda t: t.append_column("__g__", pa.array(np.zeros(t.num_rows, np.int8))),
        batch_format="pyarrow", batch_size=batch_size,
    )
    out = partial_groupby_agg(marked, ["__g__"], aggs, batch_size)
    return {c: out[c][0].as_py() for c in out.column_names if c != "__g__"}


def topk(ds, key: str, k: int, descending: bool = True, batch_size: int = 65536) -> pa.Table:
    """Distributed top-k: per-batch k, then final merge — avoids the
    global sort shuffle of ``ds.sort().limit()``."""
    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(t, k, [(key, "descending" if descending else "ascending")])
        return t.take(idx)

    parts = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=batch_size)
    merged = pa.concat_tables(list(_collect_tables(parts)), promote_options="default")
    idx = pc.select_k_unstable(merged, k, [(key, "descending" if descending else "ascending")])
    return merged.take(idx)


# DuckDB's round() is half-away-from-zero; numpy/pyarrow default to
# banker's rounding — always use these helpers on oracle-compared cols.
def round_away(arr, ndigits: int = 2):
    """Round half away from zero via scale/floor/divide — bit-identical
    to DuckDB's round(DOUBLE, n) (pc.round's result can differ in the
    last ulp because it multiplies by 10^-n instead of dividing)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        v = arr.to_numpy(zero_copy_only=False)
    else:
        v = np.asarray(arr)
    return pa.array(round_away_np(v, ndigits))


def round_away_np(x, ndigits: int = 2):
    x = np.asarray(x, np.float64)
    s = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def round_away_scalar(x: float, ndigits: int = 2) -> float:
    return float(round_away_np(np.float64(x), ndigits))


def round_cols(t: pa.Table, spec: dict[str, int]) -> pa.Table:
    """Round float columns for oracle hash stability (both the Ray
    side and the SQL round identically — half away from zero)."""
    cols = {}
    for n in t.column_names:
        cols[n] = round_away(t[n], spec[n]) if n in spec else t[n]
    return pa.table(cols)


def filtered_map(fn):
    """Wrap an Arrow->Arrow function for map_batches."""
    return fn
