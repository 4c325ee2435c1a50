"""Probe rows-only queries for determinism: run each, print schema +
canonical value hash (mirror's algorithm). Run twice in fresh processes
and diff the output to find nondeterministic queries.

    python scripts/probe_rowsonly.py [sf_dir] > /tmp/probe1.txt
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.check_correctness import canon, to_arrow, value_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    for name in sorted(qs):
        if name in oracles or (only and name not in only):
            continue
        try:
            tab = to_arrow(qs[name](sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERROR\t{ex!r}")
            continue
        df = canon(tab)
        dtypes = ",".join(f"{c}:{df[c].dtype}" for c in df.columns)
        print(f"{name}\t{tab.num_rows}\t{value_hash(df)}\t{dtypes}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
