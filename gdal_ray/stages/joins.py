"""Partitioned hash join for two large Datasets.

Primary path: Ray Data's native hash-shuffle ``Dataset.join``
(ray 2.46+), which hash-partitions both sides on the key across
``num_partitions`` aggregator actors — the distributed equivalent of
the reference's only join, the per-feature lookup join
(ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1497-1523).

Partitioning note (the 100 TB contract): ``num_partitions`` should
scale with data volume, not CPU count — each partition must fit in an
aggregator's heap. The default here is sized for the sandbox;
callers at scale pass ``num_partitions`` explicitly. Skewed keys
spread across partitions by key hash; for a single pathological hot
key, pre-salt the key upstream (SURVEY.md §7.3).

An explicit bucket-shuffle fallback (tag sides -> stable-hash bucket
-> groupby(bucket).map_groups merge) is kept for Ray versions without
native join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stable_bucket(values, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(values))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def hash_join(left, right, *, left_on: str, right_on: str,
              num_partitions: int | None = None, how: str = "inner"):
    """Join two Datasets on single key columns.

    Returns a Dataset with left columns + the right columns (the right
    key column is retained; callers project what they need).
    """
    import ray.data

    if num_partitions is None:
        # sandbox default: a few partitions per aggregator wave; at
        # real scale pass ~ (total_bytes / 512MB) explicitly.
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            cpus = 8
        num_partitions = max(4, cpus // 4)

    if hasattr(ray.data.Dataset, "join"):
        return left.join(right, how, num_partitions=num_partitions,
                         on=(left_on,), right_on=(right_on,))
    return _bucket_join(left, right, left_on=left_on, right_on=right_on,
                        num_buckets=num_partitions * 2, how=how)


def semi_anti_join(left, right, *, left_on: str, right_on: str,
                   anti: bool = False, num_partitions: int | None = None):
    """Shuffle-based semi/anti join — the fact-vs-fact form.

    Broadcast-key-set semi joins (pipelines/relational.q_join_broadcast
    style) are only valid when the right side is dimension-sized; when
    both sides are fact tables the key set itself is too large for the
    driver, so this hash-partitions BOTH sides on the key (native
    ``Dataset.join`` left_semi / left_anti) and never materializes
    either side in one process. The right side is pruned to its key
    column before the exchange."""
    import ray.data

    right_keys = right
    if right.schema() is not None and list(right.schema().names) != [right_on]:
        right_keys = right.select_columns([right_on])
    if num_partitions is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            cpus = 8
        num_partitions = max(4, cpus // 4)
    if hasattr(ray.data.Dataset, "join"):
        return left.join(right_keys, "left_anti" if anti else "left_semi",
                         num_partitions=num_partitions,
                         on=(left_on,), right_on=(right_on,))
    return _bucket_semi(left, right_keys, left_on=left_on, right_on=right_on,
                        anti=anti, num_buckets=num_partitions * 2)


def _bucket_semi(left, right_keys, *, left_on: str, right_on: str,
                 anti: bool, num_buckets: int):
    """Fallback semi/anti: co-partition by key hash, filter per bucket."""
    lnames = list(left.schema().names)

    def tag(key):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("__bucket__", pa.array(
                _stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)))

        return f

    lt = left.map_batches(tag(left_on), batch_format="pyarrow")
    rt = right_keys.map_batches(tag(right_on), batch_format="pyarrow")

    def tag_side(side):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("__side__", pa.array(
                np.full(t.num_rows, side, np.int8)))

        return f

    lt = lt.map_batches(tag_side(0), batch_format="pyarrow")
    rt = rt.map_batches(
        lambda t: pa.table({left_on: t[right_on],
                            **{n: pa.nulls(t.num_rows, left.schema().types[
                                lnames.index(n)]) for n in lnames if n != left_on},
                            "__bucket__": t["__bucket__"],
                            "__side__": pa.array(np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow")

    def filt(g: pd.DataFrame) -> pd.DataFrame:
        keys = set(g.loc[g["__side__"] == 1, left_on])
        lpart = g.loc[g["__side__"] == 0, lnames]
        isin = lpart[left_on].isin(keys)
        return lpart[~isin] if anti else lpart[isin]

    return lt.union(rt).groupby("__bucket__").map_groups(filt, batch_format="pandas")


def _bucket_join(left, right, *, left_on: str, right_on: str,
                 num_buckets: int = 32, how: str = "inner"):
    """Explicit bucket-shuffle join (fallback path)."""
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
            cols["__bucket__"] = pa.array(
                _stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets))
            cols["__side__"] = pa.array(np.full(t.num_rows, side, np.int8))
            ordered = {n: cols[n] for n in lnames + rnames + ["__bucket__", "__side__"]}
            return pa.table(ordered)

        return f

    lt = left.map_batches(tag(0, left_on, lnames, rnames, rtypes), batch_format="pyarrow")
    rt = right.map_batches(
        tag(1, right_on, [n for n in rschema.names if n in rnames or n == right_on],
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
