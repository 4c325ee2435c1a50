"""ExecuteSQL-lite vs DuckDB on the real test tables."""

import duckdb
import pyarrow as pa
import pytest

from gdal_ray.functions.sql_exec import execute

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region nation customer orders lineitem events").split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got: pa.Table, want, sort_cols=None):
    g = got.to_pandas()
    w = want.df()
    assert list(g.columns) == list(w.columns)
    cols = sort_cols or list(g.columns)
    g = g.sort_values(cols).reset_index(drop=True)
    w = w.sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w)
    for c in g.columns:
        if g[c].dtype == object:
            assert g[c].tolist() == w[c].tolist()
        else:
            assert abs(g[c].astype(float) - w[c].astype(float)).max() < 1e-6


SQLS = [
    "SELECT n_name, n_regionkey FROM nation WHERE n_regionkey >= 2",
    "SELECT c_custkey, c_acctbal * 2 AS dbl FROM customer WHERE c_acctbal > 5000",
    "SELECT o_orderpriority, COUNT(*) AS n, SUM(o_totalprice) AS total "
    "FROM orders GROUP BY o_orderpriority",
    "SELECT COUNT(*) AS n, MIN(l_quantity) AS mn, MAX(l_quantity) AS mx, "
    "AVG(l_extendedprice) AS avg_p FROM lineitem",
    "SELECT l_returnflag, SUM(l_extendedprice * (1 - l_discount)) AS rev "
    "FROM lineitem WHERE l_quantity < 30 GROUP BY l_returnflag",
]


@pytest.mark.parametrize("sql", SQLS)
def test_execute_matches_duckdb(ray_session, con, sql):
    _cmp(execute(sql, SF), con.execute(sql))


def test_orderby_limit_topk(ray_session, con):
    sql = "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 7"
    got = execute(sql, SF)
    want = con.execute(sql).df()
    assert got.num_rows == 7
    assert got["o_totalprice"].to_pylist() == want["o_totalprice"].tolist()


def test_group_key_projection(ray_session, con):
    sql = ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
           "WHERE o_totalprice > 100000 GROUP BY o_orderpriority")
    _cmp(execute(sql, SF), con.execute(sql))


def test_rejects_unsupported():
    with pytest.raises(ValueError):
        execute("DELETE FROM orders", SF)
    with pytest.raises(ValueError):
        execute("SELECT o_custkey, COUNT(*) AS n FROM orders", SF)


def test_sql_join_planner(ray_session):
    sf_dir = SF
    """JOIN plans onto the hash-shuffle join; verified vs DuckDB."""
    import duckdb

    from gdal_ray.functions.sql_exec import execute

    sql = ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
           "JOIN customer ON o_custkey = c_custkey "
           "WHERE c_mktsegment = 'BUILDING' GROUP BY o_orderpriority")
    got = execute(sql, sf_dir).to_pandas().sort_values("o_orderpriority") \
        .reset_index(drop=True)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ref = con.sql(sql).df().sort_values("o_orderpriority").reset_index(drop=True)
    assert got["n"].tolist() == ref["n"].tolist()
    assert got["o_orderpriority"].tolist() == ref["o_orderpriority"].tolist()


def test_sql_union_all_planner(ray_session):
    sf_dir = SF
    import duckdb

    from gdal_ray.functions.sql_exec import execute

    sql = ("SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0 "
           "UNION ALL SELECT o_orderkey FROM orders WHERE o_totalprice < 2000.0")
    got = sorted(execute(sql, sf_dir)["o_orderkey"].to_pylist())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    ref = sorted(r[0] for r in con.sql(sql).fetchall())
    assert got == ref


def test_sql_orderby_non_selected_raises(ray_session):
    sf_dir = SF
    import pytest

    from gdal_ray.functions.sql_exec import execute

    with pytest.raises(ValueError, match="ORDER BY"):
        execute("SELECT o_orderkey FROM orders ORDER BY o_totalprice", sf_dir)


def test_sql_having_planner(ray_session):
    sf_dir = SF
    import duckdb

    from gdal_ray.functions.sql_exec import execute

    sql = ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
           "GROUP BY o_orderpriority HAVING n > 300")
    got = execute(sql, sf_dir).to_pandas().sort_values("o_orderpriority")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    ref = con.sql(sql).df().sort_values("o_orderpriority")
    assert got["n"].tolist() == ref["n"].tolist()


def test_sql_scalar_over_aggregates(ray_session):
    """Scalar expressions wrapping aggregates plan correctly:
    ROUND(SUM(x), 2), SUM(a)/COUNT(*), MAX-MIN."""
    import duckdb
    import numpy as np

    from gdal_ray.functions.sql_exec import execute

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for sql in [
        "SELECT o_orderpriority, ROUND(SUM(o_totalprice), 2) AS total, "
        "SUM(o_totalprice) / COUNT(*) AS avg2 FROM orders "
        "GROUP BY o_orderpriority",
        "SELECT MAX(l_quantity) - MIN(l_quantity) AS rng, COUNT(*) AS n "
        "FROM lineitem",
    ]:
        a = execute(sql, SF).to_pandas()
        b = con.sql(sql).df()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            if a[c].dtype.kind == "f":
                assert np.allclose(a[c], b[c]), (sql, c)
            else:
                assert (a[c] == b[c]).all(), (sql, c)


def test_sql_string_literal_masking(ray_session, con):
    """Clause keywords inside string literals must not steer the
    structural parse (ADVICE r2): a literal containing ' UNION ALL '
    or ORDER BY stays a comparison value."""
    sql = "SELECT c_custkey FROM customer WHERE c_mktsegment = ' UNION ALL '"
    got = execute(sql, SF)
    assert got.num_rows == 0
    sql2 = ("SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey LIMIT 5")
    _cmp(execute(sql2, SF), con.execute(sql2))


def test_sql_left_join_unmatched(ray_session, con):
    """LEFT OUTER JOIN keeps unmatched left rows; COUNT(col) skips the
    nulls while COUNT(*) keeps them."""
    sql = ("SELECT c_mktsegment, COUNT(*) AS n, COUNT(event_id) AS n_events "
           "FROM customer LEFT JOIN events ON c_custkey = user_id "
           "GROUP BY c_mktsegment")
    got = execute(sql, SF)
    _cmp(got, con.execute(sql))
    g = got.to_pandas()
    assert (g["n"] > g["n_events"]).any()  # most customers have no events
    # plain inner join drops those rows
    inner = execute(sql.replace("LEFT JOIN", "JOIN"), SF)
    assert inner.to_pandas()["n"].sum() < g["n"].sum()


def test_sql_count_distinct(ray_session, con):
    sql = ("SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, "
           "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_count_distinct_global(ray_session, con):
    sql = "SELECT COUNT(DISTINCT o_custkey) AS n_cust FROM orders"
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_multi_join_chain(ray_session, con):
    """Chained JOINs plan left-deep like the reference's swq join list
    (ogr_gensql.cpp:526-532): each ON resolves against the accumulated
    left side."""
    sql = ("SELECT n_name, COUNT(*) AS n, round(SUM(o_totalprice), 2) AS total "
           "FROM orders JOIN customer ON o_custkey = c_custkey "
           "JOIN nation ON c_nationkey = n_nationkey "
           "WHERE o_orderpriority = '1-URGENT' GROUP BY n_name")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_multi_join_mixed_left(ray_session, con):
    """INNER then LEFT OUTER in one chain."""
    sql = ("SELECT n_name, COUNT(*) AS n, COUNT(o_orderkey) AS n_orders "
           "FROM customer JOIN nation ON c_nationkey = n_nationkey "
           "LEFT JOIN orders ON c_custkey = o_custkey "
           "GROUP BY n_name")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_having_string_literal(ray_session, con):
    """HAVING text is sliced from the ORIGINAL sql, not the
    literal-masked copy: a string literal in HAVING survives."""
    sql = ("SELECT o_orderpriority, COUNT(*) AS n FROM orders "
           "GROUP BY o_orderpriority HAVING o_orderpriority = '1-URGENT'")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_in_subquery(ray_session, con):
    sql = ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
           "WHERE o_custkey IN (SELECT c_custkey FROM customer "
           "WHERE c_mktsegment = 'BUILDING') AND o_totalprice > 100000.0")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_not_in_subquery(ray_session, con):
    sql = ("SELECT c_custkey, c_name FROM customer "
           "WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders "
           "WHERE o_totalprice > 300000.0)")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_subquery_with_groupby_inside(ray_session, con):
    """The subquery's own GROUP BY/HAVING must not steer the outer
    structural parse (subquery masking)."""
    sql = ("SELECT o_orderkey, o_custkey FROM orders "
           "WHERE o_custkey IN (SELECT o_custkey FROM orders "
           "GROUP BY o_custkey HAVING COUNT(*) >= 8) "
           "ORDER BY o_orderkey LIMIT 20")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_subquery_plus_aggregate_outer(ray_session, con):
    sql = ("SELECT COUNT(*) AS n, round(SUM(o_totalprice), 2) AS total "
           "FROM orders WHERE o_custkey IN "
           "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)")
    _cmp(execute(sql, SF), con.execute(sql))


def test_sql_subquery_top_level_or_raises(ray_session):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        execute("SELECT o_orderkey FROM orders WHERE o_totalprice > 1.0 "
                "OR o_custkey IN (SELECT c_custkey FROM customer)", SF)


def test_sql_select_distinct(ray_session, con):
    sql = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
    _cmp(execute(sql, SF), con.execute(sql))
