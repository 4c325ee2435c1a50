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
