"""Exact distributed order statistics / quantiles.

The reference's SQL dialect has no quantile aggregate (swq stops at
AVG/MIN/MAX/COUNT/SUM/STDDEV); this is part of the §2.8 extension
surface. Algorithm: iterative histogram refinement — each round one
combiner pass (per-batch bucket counts merged driver-side) narrows
the value interval containing each requested rank by ~1024x; when an
interval holds few enough rows they are pulled exactly and selected.
O(log_1024(range/gap)) passes, each a streaming map_batches — no sort,
no全 materialization.

``quantile_cont`` interpolates like DuckDB/Postgres: pos = q*(n-1),
result = v[floor(pos)] + frac * (v[floor(pos)+1] - v[floor(pos)]).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _minmax_count(ds, col: str):
    from ..pipelines.common import global_agg

    r = global_agg(ds, [("n", col, "count_all"), ("lo", col, "min"),
                        ("hi", col, "max")])
    return int(r["n"]), float(r["lo"]), float(r["hi"])


def _bucket_counts(ds, col: str, lo: float, hi: float, nb: int) -> np.ndarray:
    width = (hi - lo) / nb

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        v = v[(v >= lo) & (v <= hi)]
        b = np.minimum(((v - lo) / width).astype(np.int64), nb - 1)
        return pa.table({"b": pa.array(b),
                         "one": pa.array(np.ones(len(b), np.int64))})

    from ..pipelines.common import partial_groupby_agg

    out = partial_groupby_agg(ds.map_batches(f, batch_format="pyarrow"),
                              ["b"], [("n", "one", "sum")])
    counts = np.zeros(nb, np.int64)
    counts[out["b"].to_numpy()] = out["n"].to_numpy()
    return counts


def order_statistics(ds, col: str, ranks: list[int], *, nb: int = 1024,
                     pull_threshold: int = 65536) -> dict[int, float]:
    """Exact 0-based order statistics of ``col`` for each rank.

    ``ds`` must be re-iterable (a lazy Dataset lineage): each
    refinement round re-executes the scan — the streaming trade
    (no materialization) the engine makes everywhere.
    """
    n, lo, hi = _minmax_count(ds, col)
    out: dict[int, float] = {}
    pending = {r: (lo, hi, 0) for r in sorted(set(ranks))}  # rank -> (lo, hi, below)
    while pending:
        # group ranks sharing an interval to reuse one pass
        (ilo, ihi, below) = next(iter(pending.values()))
        group = [r for r, v in pending.items() if v == (ilo, ihi, below)]
        if ilo == ihi:
            for r in group:
                out[r] = ilo
                del pending[r]
            continue
        # pull-and-finish when the interval is small
        in_cnt = _count_in(ds, col, ilo, ihi)
        if in_cnt <= pull_threshold:
            vals = _pull_in(ds, col, ilo, ihi)
            vals.sort()
            for r in group:
                out[r] = float(vals[r - below])
                del pending[r]
            continue
        counts = _bucket_counts(ds, col, ilo, ihi, nb)
        cum = np.concatenate([[0], np.cumsum(counts)])
        width = (ihi - ilo) / nb
        for r in group:
            k = int(np.searchsorted(cum, r - below, side="right")) - 1
            k = min(max(k, 0), nb - 1)
            new_lo = ilo + k * width
            new_hi = ilo + (k + 1) * width if k < nb - 1 else ihi
            pending[r] = (new_lo, new_hi, below + int(cum[k]))
    return out


def _count_in(ds, col: str, lo: float, hi: float) -> int:
    from ..pipelines.common import global_agg

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        m = (v >= lo) & (v <= hi)
        return pa.table({"x": pa.array(v[m])})

    filtered = ds.map_batches(f, batch_format="pyarrow")
    r = global_agg(filtered, [("n", "x", "count_all")])
    return int(r["n"] or 0)


def _pull_in(ds, col: str, lo: float, hi: float) -> np.ndarray:
    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        m = (v >= lo) & (v <= hi)
        return pa.table({"x": pa.array(v[m])})

    parts = ds.map_batches(f, batch_format="pyarrow")
    chunks = [b["x"].to_numpy() for b in
              parts.iter_batches(batch_size=None, batch_format="pyarrow")]
    return np.concatenate(chunks) if chunks else np.empty(0)


def quantile_cont(ds, col: str, qs: list[float]) -> dict[float, float]:
    """DuckDB/Postgres continuous quantiles, exactly."""
    n, _, _ = _minmax_count(ds, col)
    ranks = set()
    pos = {}
    for q in qs:
        p = q * (n - 1)
        k = int(np.floor(p))
        pos[q] = (k, p - k)
        ranks.add(k)
        if p - k > 0:
            ranks.add(min(k + 1, n - 1))
    stats = order_statistics(ds, col, sorted(ranks))
    out = {}
    for q, (k, frac) in pos.items():
        v0 = stats[k]
        v1 = stats.get(min(k + 1, n - 1), v0)
        out[q] = v0 + frac * (v1 - v0) if frac > 0 else v0
    return out
