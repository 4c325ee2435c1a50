"""Explicit partitioned hash join for two large Datasets.

Ray Data's built-in ``join`` is version-dependent; this is the
portable explicit form the engine controls end-to-end (documented
partitioning): tag each side, bucket rows by a *stable* hash of the
key (``pandas.util.hash_array`` — deterministic across processes,
unlike Python's salted ``hash``), shuffle once with
``groupby(bucket)``, and merge the two sides per bucket inside
``map_groups``.

Skew handling: ``num_buckets`` spreads hot keys only across their own
bucket; for a known hot key, raise ``num_buckets`` or pre-salt the
key upstream (SURVEY.md §7.3). The reference's only join is a
per-feature lookup (ogr_gensql.cpp:1497-1523) — this operator is the
scalable replacement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stable_bucket(values, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(values))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def hash_join(left, right, *, left_on: str, right_on: str,
              num_buckets: int = 32, how: str = "inner"):
    """Inner/left join of two Datasets on single key columns.

    Returns a Dataset with left columns + right columns (right key
    column dropped when names collide is NOT done — callers project).
    Integer dtypes are restored after the pandas merge (the
    union-with-nulls pad makes pandas float them).
    """
    lschema = left.schema()
    rschema = right.schema()
    lnames = list(lschema.names)
    rnames = [n for n in rschema.names if n not in lnames]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def tag(side: int, key: str, own: list[str], other: list[str], other_types):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for n in own:
                cols[n] = t[n]
            for n in other:
                cols[n] = pa.nulls(t.num_rows, other_types[n])
            cols["__bucket__"] = pa.array(_stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets))
            cols["__side__"] = pa.array(np.full(t.num_rows, side, np.int8))
            # fixed column order so both sides' schemas align for union
            ordered = {n: cols[n] for n in lnames + rnames + ["__bucket__", "__side__"]}
            return pa.table(ordered)

        return f

    lt = left.map_batches(tag(0, left_on, lnames, rnames, rtypes), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_on, [n for n in rschema.names if n in rnames or n == right_on],
                               [n for n in lnames if n != right_on], ltypes),
                           batch_format="pyarrow")

    int_cols = {n: str(t) for n, t in {**ltypes, **rtypes}.items()
                if pa.types.is_integer(t)}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lpart = g.loc[g["__side__"] == 0, lnames]
        rpart = g.loc[g["__side__"] == 1, [right_on] + [n for n in rnames if n != right_on]]
        out = lpart.merge(rpart, left_on=left_on, right_on=right_on, how=how)
        for n, t in int_cols.items():
            if n in out.columns:
                out[n] = out[n].astype("int64" if "64" in t else "int32", errors="ignore")
        return out

    return lt.union(rt).groupby("__bucket__").map_groups(merge, batch_format="pandas")
