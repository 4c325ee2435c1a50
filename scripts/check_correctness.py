"""Local mirror of the driver's correctness gate.

Runs every queries() entry and its oracle_sql() twin side-by-side on
the same sf dir, compares row count, schema (column names), and a
value hash over rows sorted by all columns (columns sorted by name
first, like the driver). Usage:

    python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa


def to_arrow(res) -> pa.Table:
    import ray.data

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    if isinstance(res, ray.data.Dataset):
        tables = list(res.iter_batches(batch_size=None, batch_format="pyarrow"))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")
    raise TypeError(type(res))


def canon(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            h.update(s.astype(str).str.cat(sep="\x1f").encode())
        else:
            h.update(pd.util.hash_pandas_object(s, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_tab = to_arrow(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: ray error: {ex!r}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {ray_tab.num_rows} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            ora_tab = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {ex!r}")
            n_fail += 1
            continue
        rdf, odf = canon(ray_tab), canon(ora_tab)
        problems = []
        if ray_tab.num_rows != ora_tab.num_rows:
            problems.append(f"rows {ray_tab.num_rows} != {ora_tab.num_rows}")
        if list(rdf.columns) != list(odf.columns):
            problems.append(f"cols {list(rdf.columns)} != {list(odf.columns)}")
        if not problems:
            rh, oh = value_hash(rdf), value_hash(odf)
            if rh != oh:
                problems.append(f"hash {rh} != {oh}")
                # show first differing rows for debugging
                neq = (rdf.astype(str) != odf.astype(str)).any(axis=1)
                bad = rdf[neq].head(3)
                if len(bad):
                    print(f"  ray : {bad.to_dict('records')}")
                    print(f"  ora : {odf[neq].head(3).to_dict('records')}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {ray_tab.num_rows} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
