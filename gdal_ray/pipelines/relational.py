"""Relational query surface — the OGR SQL dialect re-expressed as Ray
Data pipelines (SURVEY.md §2.8-2.11).

Covers the swq operator set (reference ogr/swq_op_registrar.cpp:28-61:
comparison/arith/string ops, CAST, IN/BETWEEN/LIKE; aggregates
AVG/MIN/MAX/COUNT/SUM/STDDEV ogr/ogr_swq.h:67-75; DISTINCT
ogr_gensql.cpp:642; ORDER BY ogr_gensql.cpp:1862; LIMIT/OFFSET
swq_select.cpp:305; JOIN ogr_gensql.cpp:526; UNION ALL
swq_select.cpp:128) over the TPC-H-ish test tables.

Every query here has a DuckDB oracle in ORACLE (same column names,
same rounding); the driver compares row counts + schema + value
hashes. Float aggregates are rounded identically on both sides.

Scale idiom per query is noted in its docstring: combiner
pre-aggregation, broadcast hash lookup, per-batch top-k, or explicit
partitioned shuffle join (stages/joins.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import (arrow_table, global_agg, partial_groupby_agg, read_table,
                     round_away, round_away_np, round_away_scalar, round_cols, topk)

# --------------------------------------------------------------- scans/filters


def q_filter_select(sf_dir: str):
    """WHERE + projection, vectorized predicate inside map_batches
    (attribute-filter path, reference ogrlayer.cpp SetAttributeFilter)."""
    ds = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(t["l_quantity"], 45.0),
                    pc.less(t["l_discount"], 0.05))
        t = t.filter(m)
        return t.select(["l_orderkey", "l_quantity", "l_extendedprice"])

    return ds.map_batches(f, batch_format="pyarrow")


def q_cast_math(sf_dir: str):
    """Arithmetic + CAST (swq '+,-,*,/' and CAST evaluators)."""
    ds = read_table(sf_dir, "lineitem",
                    ["l_orderkey", "l_extendedprice", "l_discount", "l_tax", "l_quantity"])

    def f(t: pa.Table) -> pa.Table:
        revenue = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        charged = pc.multiply(revenue, pc.add(1.0, t["l_tax"]))
        qty_int = pc.cast(t["l_quantity"], pa.int64())
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue": round_away(revenue, 2),
            "charged": round_away(charged, 2),
            "qty_int": qty_int,
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_string_funcs(sf_dir: str):
    """CONCAT/SUBSTR/UPPER/LIKE (swq string ops)."""
    ds = read_table(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.match_like(t["c_mktsegment"], "%ING%")
        t = t.filter(m)
        label = pc.binary_join_element_wise(
            pc.utf8_upper(t["c_mktsegment"]), pc.utf8_slice_codeunits(t["c_name"], 0, 8), "/"
        )
        return pa.table({
            "c_custkey": t["c_custkey"],
            "label": label,
            "name_len": pc.cast(pc.utf8_length(t["c_name"]), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_in_between(sf_dir: str):
    """IN (...) + BETWEEN (swq IN/BETWEEN)."""
    ds = read_table(sf_dir, "part", ["p_partkey", "p_brand", "p_size", "p_retailprice"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t["p_brand"], value_set=pa.array(["Brand#1", "Brand#2", "Brand#3"])),
            pc.and_(pc.greater_equal(t["p_size"], 10), pc.less_equal(t["p_size"], 40)),
        )
        return t.filter(m)

    return ds.map_batches(f, batch_format="pyarrow")


def q_case_when(sf_dir: str):
    """CASE WHEN — the tabular analog of raster `reclassify`
    (reference frmts/vrt/vrtreclassifier.h:79 interval mapping),
    np.select over an interval table."""
    ds = read_table(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def f(t: pa.Table) -> pa.Table:
        size = t["p_size"].to_numpy()
        cls = np.select([size < 10, size < 25, size < 40], ["small", "medium", "large"], "xl")
        return pa.table({
            "p_partkey": t["p_partkey"],
            "size_class": pa.array(cls.astype(object), pa.string()),
            "p_retailprice": t["p_retailprice"],
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_swq_filter(sf_dir: str):
    """The OGR attribute-filter language end-to-end: the WHERE string
    is compiled by functions/swq.py (tokenizer -> AST -> pyarrow
    compute closures) and applied inside map_batches — the
    SetAttributeFilter path (reference ogr/swq_parser.y + swq_op_*)."""
    from ..functions.swq import filter_where

    ds = read_table(sf_dir, "orders",
                    ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"])
    where = ("o_totalprice BETWEEN 100000 AND 200000 AND "
             "o_orderpriority IN ('1-URGENT', '2-HIGH') AND "
             "NOT (o_custkey % 10 = 3)")
    return filter_where(ds, where)


# --------------------------------------------------------------- aggregates


def q_agg_global(sf_dir: str):
    """Global aggregates (no GROUP BY) via combiner partials."""
    ds = read_table(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    r = global_agg(ds, [
        ("n", "l_quantity", "count_all"),
        ("sum_qty", "l_quantity", "sum"),
        ("min_price", "l_extendedprice", "min"),
        ("max_price", "l_extendedprice", "max"),
        ("sum_price", "l_extendedprice", "sum"),
    ])
    return pa.table({
        "n": pa.array([r["n"]], pa.int64()),
        "sum_qty": pa.array([round_away_scalar(r["sum_qty"], 2)], pa.float64()),
        "min_price": pa.array([round_away_scalar(r["min_price"], 2)], pa.float64()),
        "max_price": pa.array([round_away_scalar(r["max_price"], 2)], pa.float64()),
        "avg_price": pa.array([round_away_scalar(r["sum_price"] / r["n"], 2)], pa.float64()),
    })


def q_groupby_agg(sf_dir: str):
    """TPC-H Q1 shape: GROUP BY two keys, SUM/AVG/COUNT — combiner
    partials inside map_batches then a tiny final merge (no full
    shuffle; cardinality 6)."""
    ds = read_table(sf_dir, "lineitem",
                    ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("revenue", rev)

    ds = ds.map_batches(add_rev, batch_format="pyarrow")
    out = partial_groupby_agg(ds, ["l_returnflag", "l_linestatus"], [
        ("sum_qty", "l_quantity", "sum"),
        ("sum_price", "l_extendedprice", "sum"),
        ("sum_rev", "revenue", "sum"),
        ("n", "l_quantity", "count_all"),
    ])
    avg_qty = pc.divide(out["sum_qty"], pc.cast(out["n"], pa.float64()))
    out = out.append_column("avg_qty", avg_qty)
    return round_cols(out, {"sum_qty": 2, "sum_price": 2, "sum_rev": 2, "avg_qty": 2})


def q_stddev(sf_dir: str):
    """STDDEV_SAMP/POP per group via sum/sumsq partials (Welford-style
    mergeable moments; reference swq aggregate evaluators)."""
    out = partial_groupby_agg(
        read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
        ["o_orderpriority"],
        [("n", "o_totalprice", "count_all"),
         ("s", "o_totalprice", "sum"),
         ("ss", "o_totalprice", "sumsq")],
    )
    n = out["n"].to_numpy().astype(np.float64)
    s = out["s"].to_numpy()
    ss = out["ss"].to_numpy()
    var_pop = np.maximum(ss / n - (s / n) ** 2, 0.0)
    var_samp = var_pop * n / np.maximum(n - 1, 1)
    return pa.table({
        "o_orderpriority": out["o_orderpriority"],
        "n": out["n"],
        "stddev_pop": pa.array(round_away_np(np.sqrt(var_pop), 2)),
        "stddev_samp": pa.array(round_away_np(np.sqrt(var_samp), 2)),
    })


def q_count_distinct(sf_dir: str):
    """COUNT(DISTINCT x) per group: per-batch distinct pairs feed the
    distributed partial-combine (partial_groupby_agg caps the driver
    fold and inserts extra distributed rounds past its threshold), so
    the distinct-pair table never concatenates on the driver
    (VERDICT r2 directive #6). The final per-flag count runs over the
    bounded deduped table."""
    ds = read_table(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    pairs = ds.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"], "l_partkey": t["l_partkey"]})
        .group_by(["l_returnflag", "l_partkey"]).aggregate([]),
        batch_format="pyarrow",
    )
    dedup = partial_groupby_agg(
        pairs, ["l_returnflag", "l_partkey"],
        [("n", "l_partkey", "count_all")])
    out = dedup.group_by("l_returnflag").aggregate([("l_partkey", "count")])
    return pa.table({"l_returnflag": out["l_returnflag"],
                     "n_parts": out["l_partkey_count"]})


def q_having(sf_dir: str):
    """GROUP BY + HAVING (post-aggregate filter)."""
    out = partial_groupby_agg(
        read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        ["o_custkey"],
        [("n_orders", "o_totalprice", "count_all"), ("total", "o_totalprice", "sum")],
    )
    m = pc.greater_equal(out["n_orders"], 3)
    return round_cols(out.filter(m), {"total": 2})


def q_date_extract(sf_dir: str):
    """Date-part extraction + grouped counts (swq date handling)."""
    ds = read_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "mo": pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
            "o_totalprice": t["o_totalprice"],
        })

    out = partial_groupby_agg(
        ds.map_batches(f, batch_format="pyarrow"),
        ["yr", "mo"],
        [("n", "o_totalprice", "count_all"), ("total", "o_totalprice", "sum")],
    )
    return round_cols(out, {"total": 2})


_EXEC_SQL = """
        SELECT l_returnflag, COUNT(*) AS n,
               round(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
               round(AVG(l_quantity), 2) AS avg_qty
        FROM lineitem WHERE l_quantity < 30 GROUP BY l_returnflag
    """


def q_sample_rows(sf_dir: str):
    """Row-level sampling: deterministic systematic sample (key mod N
    — the reproducible analog of the reference's bApproxOK decimated
    sampling, gcore/gdalrasterband.cpp ComputeStatistics; and of
    Dataset.random_sample for pipelines needing exact replay). Runs as
    a map_batches filter — no shuffle, no driver pass."""
    ds = read_table(sf_dir, "events", ["event_id", "value"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 31), 7)),
        batch_format="pyarrow")


_SQL_JOIN = """
        SELECT o_orderpriority, COUNT(*) AS n,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderpriority
    """

_SQL_HAVING = """
        SELECT o_orderpriority, COUNT(*) AS n,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY o_orderpriority HAVING n > 3000
    """


def q_sql_having(sf_dir: str):
    """ExecuteSQL HAVING (post-aggregation filter over output alias
    names, ogr/swq_select.cpp HAVING walk): same SQL verbatim in
    DuckDB."""
    from ..functions.sql_exec import execute

    return execute(_SQL_HAVING, sf_dir)


_SQL_UNION = """
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 2000.0
    """


def q_sql_join(sf_dir: str):
    """ExecuteSQL secondary-table JOIN: the SAME SQL string plans onto
    the partitioned hash-shuffle join (stages/joins.py) + combiner
    aggregation on the Ray side, and runs verbatim in DuckDB
    (reference JOIN walk: ogr_gensql.cpp:526-532,1497-1523)."""
    from ..functions.sql_exec import execute

    return execute(_SQL_JOIN, sf_dir)


def q_sql_union(sf_dir: str):
    """ExecuteSQL UNION ALL (swq_select.cpp:128): same SQL on both
    sides."""
    from ..functions.sql_exec import execute

    return execute(_SQL_UNION, sf_dir)


_SQL_LEFT_JOIN = """
        SELECT c_mktsegment, COUNT(*) AS n, COUNT(o_orderkey) AS n_orders,
               round(SUM(o_totalprice), 2) AS total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """

_SQL_COUNT_DISTINCT = """
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """


def q_sql_left_join(sf_dir: str):
    """ExecuteSQL LEFT OUTER JOIN (reference OGR SQL secondary-table
    LEFT JOIN, ogr_gensql.cpp:526-532): plans onto hash_join
    how=left_outer; COUNT(col) skips the nulls the outer join
    introduces. Same SQL verbatim in DuckDB."""
    from ..functions.sql_exec import execute

    return execute(_SQL_LEFT_JOIN, sf_dir)


_SQL_MULTI_JOIN = """
        SELECT n_name, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY n_name
    """


def q_sql_multi_join(sf_dir: str):
    """ExecuteSQL chained secondary-table joins: the planner walks the
    JOIN list left-deep — each ON resolves against the accumulated
    left side — like the reference's swq join array
    (ogr_gensql.cpp:526-532). Both hops plan onto the partitioned
    hash-shuffle join. Same SQL verbatim in DuckDB."""
    from ..functions.sql_exec import execute

    return execute(_SQL_MULTI_JOIN, sf_dir)


_SQL_SUBQUERY = """
        SELECT o_orderpriority, COUNT(*) AS n,
               round(SUM(o_totalprice), 2) AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_custkey NOT IN (SELECT o_custkey FROM orders
                                GROUP BY o_custkey HAVING COUNT(*) >= 12)
        GROUP BY o_orderpriority
    """


def q_sql_subquery(sf_dir: str):
    """ExecuteSQL IN / NOT IN (SELECT ...) subquery predicates: each
    top-level conjunct plans onto a broadcast key-set semi/anti filter
    (the fact-vs-fact form is stages/joins.semi_anti_join); the inner
    HAVING COUNT(*) rides the hidden-agg path. Beyond the reference's
    OGR SQL dialect (no subqueries there) — parity with the DuckDB
    oracle is the contract. Same SQL verbatim in DuckDB."""
    from ..functions.sql_exec import execute

    return execute(_SQL_SUBQUERY, sf_dir)


def q_sql_count_distinct(sf_dir: str):
    """ExecuteSQL COUNT(DISTINCT x): plans onto the distinct-pair
    combiner (per-batch distinct -> distributed partial combine ->
    bounded per-key count), joined back onto the other aggregates.
    Same SQL verbatim in DuckDB."""
    from ..functions.sql_exec import execute

    return execute(_SQL_COUNT_DISTINCT, sf_dir)


def q_sql_execute(sf_dir: str):
    """ExecuteSQL analog end-to-end: the SAME SQL string — including
    the round(SUM(...), 2) scalar-over-aggregate expressions — is
    planned by functions/sql_exec.py onto Dataset operators and run
    verbatim by DuckDB as the oracle."""
    from ..functions.sql_exec import execute

    return execute(_EXEC_SQL, sf_dir)


def q_quantiles(sf_dir: str):
    """Exact continuous quantiles (p25/p50/p75) of o_totalprice via
    distributed histogram refinement (stages/quantile.py) — no sort,
    no materialization; matches DuckDB quantile_cont bit-for-bit
    after rounding."""
    from ..stages.quantile import quantile_cont

    ds = read_table(sf_dir, "orders", ["o_totalprice"])
    r = quantile_cont(ds, "o_totalprice", [0.25, 0.5, 0.75])
    return pa.table({
        "p25": pa.array([round_away_scalar(r[0.25], 2)]),
        "p50": pa.array([round_away_scalar(r[0.5], 2)]),
        "p75": pa.array([round_away_scalar(r[0.75], 2)]),
    })


# --------------------------------------------------------------- distinct/sort/limit


def q_distinct(sf_dir: str):
    """SELECT DISTINCT (SWQM_DISTINCT_LIST): per-batch distinct then
    final distinct."""
    ds = read_table(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    parts = ds.map_batches(
        lambda t: t.group_by(["l_returnflag", "l_linestatus"]).aggregate([]),
        batch_format="pyarrow",
    )
    merged = pa.concat_tables(
        list(parts.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default",
    )
    return merged.group_by(["l_returnflag", "l_linestatus"]).aggregate([])


def q_orderby_limit(sf_dir: str):
    """ORDER BY ... LIMIT k — distributed top-k (per-batch select_k +
    merge), not a global sort (the reference materializes the whole
    FID array, ogr_gensql.cpp:1862 — this is the scalable form)."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])
    return topk(ds, "o_totalprice", 10, descending=True)


def q_sort_multikey(sf_dir: str):
    """Multi-key ORDER BY: distributed filter, then the native
    range-partitioned sort (sample -> boundaries -> shuffle ->
    per-partition sort) — `Dataset.sort`, the engine's ORDER BY for
    unbounded keys. The reference materializes the whole FID array in
    one process (ogr_gensql.cpp:1862); this streams."""
    ds = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    flt = ds.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 9000.0)), batch_format="pyarrow"
    )
    return flt.sort(["c_nationkey", "c_acctbal", "c_custkey"],
                    descending=[False, True, False])


def q_orderby_full(sf_dir: str):
    """Unbounded global ORDER BY over the full orders table — the
    range-partitioned distributed sort with no driver materialization
    (each output block is a sorted key range; block order is the total
    order)."""
    ds = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])


# --------------------------------------------------------------- joins / set ops


def q_join_broadcast(sf_dir: str):
    """customer x nation x region: dimension tables broadcast once,
    numpy take-lookup per batch (no shuffle; reference OGR JOIN is a
    per-feature lookup on the secondary table, ogr_gensql.cpp:1497)."""
    nation = arrow_table(sf_dir, "nation")
    region = arrow_table(sf_dir, "region")
    n_key = nation["n_nationkey"].to_numpy()
    n_name = nation["n_name"].to_numpy(zero_copy_only=False)
    n_region = nation["n_regionkey"].to_numpy()
    r_key = region["r_regionkey"].to_numpy()
    r_name = region["r_name"].to_numpy(zero_copy_only=False)
    n_lut = np.empty(n_key.max() + 1, np.int64); n_lut[n_key] = np.arange(len(n_key))
    r_lut = np.empty(r_key.max() + 1, np.int64); r_lut[r_key] = np.arange(len(r_key))

    ds = read_table(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def f(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy()
        ni = n_lut[nk]
        ri = r_lut[n_region[ni]]
        return pa.table({
            "c_custkey": t["c_custkey"],
            "nation": pa.array(n_name[ni], pa.string()),
            "region": pa.array(r_name[ri], pa.string()),
            "c_acctbal": t["c_acctbal"],
        })

    return ds.map_batches(f, batch_format="pyarrow")


def q_join_hash_large(sf_dir: str):
    """lineitem x orders on orderkey — partitioned hash join (both
    sides 'large'): explicit bucket-shuffle co-group
    (stages/joins.py), revenue per order priority."""
    from ..stages.joins import hash_join

    li = read_table(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey")

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return t.append_column("revenue", rev)

    out = partial_groupby_agg(
        joined.map_batches(add_rev, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("n", "revenue", "count_all"), ("revenue", "revenue", "sum")],
    )
    return round_cols(out, {"revenue": 2})


def q_semi_join(sf_dir: str):
    """Semi join (EXISTS): hash-shuffle left_semi — both sides stream
    through the partitioned exchange; neither table is read on the
    driver (the fact-vs-fact form; broadcast key sets are only for
    dimension-sized sides)."""
    from ..stages.joins import semi_anti_join

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
                       .select(["c_custkey"]),
            batch_format="pyarrow")
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return semi_anti_join(orders, cust, left_on="o_custkey", right_on="c_custkey")


def q_anti_join(sf_dir: str):
    """Anti join (NOT EXISTS): customers with no order above 300k.
    The >300k keys come from the orders FACT table, so the key side is
    filtered inside map_batches and hash-shuffled (left_anti) — never
    collected on the driver."""
    from ..stages.joins import semi_anti_join

    big = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0))
                       .select(["o_custkey"]),
            batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_name"])
    return semi_anti_join(cust, big, left_on="c_custkey", right_on="o_custkey",
                          anti=True)


def q_union_all(sf_dir: str):
    """UNION ALL (swq_select.cpp:128 / OGRUnionLayer / `gdal vector
    concat`): Dataset.union of two filtered scans."""
    ds1 = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)), batch_format="pyarrow")
    ds2 = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.less(t["o_totalprice"], 2000.0)), batch_format="pyarrow")
    return ds1.union(ds2)


# --------------------------------------------------------------- ORACLE SQL

ORACLE: dict[str, str] = {
    "q_filter_select": """
        SELECT l_orderkey, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45.0 AND l_discount < 0.05
    """,
    "q_swq_filter": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_totalprice BETWEEN 100000 AND 200000
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND NOT (o_custkey % 10 = 3)
    """,
    "q_cast_math": """
        SELECT l_orderkey,
               round(l_extendedprice * (1.0 - l_discount), 2) AS revenue,
               round((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax), 2) AS charged,
               CAST(l_quantity AS BIGINT) AS qty_int
        FROM lineitem
    """,
    "q_string_funcs": """
        SELECT c_custkey,
               upper(c_mktsegment) || '/' || substr(c_name, 1, 8) AS label,
               CAST(length(c_name) AS BIGINT) AS name_len
        FROM customer WHERE c_mktsegment LIKE '%ING%'
    """,
    "q_in_between": """
        SELECT p_partkey, p_brand, p_size, p_retailprice FROM part
        WHERE p_brand IN ('Brand#1','Brand#2','Brand#3') AND p_size BETWEEN 10 AND 40
    """,
    "q_case_when": """
        SELECT p_partkey,
               CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 25 THEN 'medium'
                    WHEN p_size < 40 THEN 'large' ELSE 'xl' END AS size_class,
               p_retailprice
        FROM part
    """,
    "q_agg_global": """
        SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price,
               round(sum(l_extendedprice) / count(*), 2) AS avg_price
        FROM lineitem
    """,
    "q_groupby_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_rev,
               count(*) AS n,
               round(sum(l_quantity) / count(*), 2) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_stddev": """
        SELECT o_orderpriority, count(*) AS n,
               round(sqrt(greatest(avg(o_totalprice * o_totalprice) - avg(o_totalprice) * avg(o_totalprice), 0)), 2) AS stddev_pop,
               round(sqrt(greatest(avg(o_totalprice * o_totalprice) - avg(o_totalprice) * avg(o_totalprice), 0) * count(*) / greatest(count(*) - 1, 1)), 2) AS stddev_samp
        FROM orders GROUP BY o_orderpriority
    """,
    "q_count_distinct": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_having": """
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3
    """,
    "q_date_extract": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2
    """,
    "q_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "q_sql_execute": """
        SELECT l_returnflag, COUNT(*) AS n,
               round(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
               round(AVG(l_quantity), 2) AS avg_qty
        FROM lineitem WHERE l_quantity < 30 GROUP BY l_returnflag
    """,
    "q_sample_rows": """
        SELECT event_id, value FROM events WHERE event_id % 32 = 7
    """,
    "q_sql_join": _SQL_JOIN,
    "q_sql_union": _SQL_UNION,
    "q_sql_having": _SQL_HAVING,
    "q_sql_left_join": _SQL_LEFT_JOIN,
    "q_sql_count_distinct": _SQL_COUNT_DISTINCT,
    "q_sql_multi_join": _SQL_MULTI_JOIN,
    "q_sql_subquery": _SQL_SUBQUERY,
    "q_quantiles": """
        SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
               round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
               round(quantile_cont(o_totalprice, 0.75), 2) AS p75
        FROM orders
    """,
    "q_orderby_limit": """
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC LIMIT 10
    """,
    "q_sort_multikey": """
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_acctbal > 9000.0
        ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    "q_orderby_full": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    "q_join_broadcast": """
        SELECT c_custkey, n_name AS nation, r_name AS region, c_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
    """,
    "q_join_hash_large": """
        SELECT o_orderpriority, count(*) AS n,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "q_semi_join": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders
                                WHERE o_totalprice > 300000.0)
    """,
    "q_union_all": """
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 2000.0
    """,
}

QUERIES = {
    name: fn
    for name, fn in list(globals().items())
    if name.startswith("q_") and callable(fn)
}
