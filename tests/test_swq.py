"""OGR SQL attribute-filter compiler vs DuckDB on the same table."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.swq import compile_where, parse_where


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(9)
    n = 500
    return pa.table({
        "a": pa.array(rng.integers(-50, 50, n)),
        "b": pa.array(rng.uniform(-10, 10, n)),
        "name": pa.array([f"row{'x' if i % 3 else 'Y'}{i:03d}" for i in range(n)]),
        "cat": pa.array([None if i % 17 == 0 else ["red", "green", "blue"][i % 3]
                         for i in range(n)]),
        "props": pa.array([f'"k"=>"{i % 5}","z"=>"9"' for i in range(n)]),
    })


WHERES = [
    "a > 10",
    "a >= 10 AND b < 0",
    "a = 7 OR a = -7 OR b > 9.5",
    "NOT (a < 0)",
    "a <> 0 AND a != 1",
    "b BETWEEN -1 AND 1",
    "a NOT BETWEEN -10 AND 10",
    "a IN (1, 2, 3, 5, 8, 13)",
    "cat NOT IN ('red', 'blue')",
    "cat IS NULL",
    "cat IS NOT NULL AND cat = 'green'",
    "name LIKE 'rowx%'",
    "name LIKE '%00_'",
    "name NOT LIKE 'rowY%'",
    "a + 2 * 3 > 40",
    "(a + 2) * 3 > 40",
    "-a > 25",
    "a % 7 = 0 AND a > 0",
    "CAST(b AS INTEGER) = 3",
    "LENGTH(name) = 8",
    "UPPER(cat) = 'RED'",
    "SUBSTR(name, 4, 1) = 'Y'",
    "name || '!' LIKE '%3!'",
]


@pytest.mark.parametrize("where", WHERES)
def test_where_matches_duckdb(table, where):
    got = table.filter(compile_where(where)(table))
    con = duckdb.connect()
    con.register("t", table)
    # OGR CAST float->int truncates (C cast); DuckDB rounds — align
    sql = where.replace("CAST(b AS INTEGER)", "CAST(trunc(b) AS INTEGER)")
    want = con.execute(f"SELECT * FROM t WHERE {sql}").fetch_arrow_table()
    assert got.num_rows == want.num_rows, where
    if got.num_rows:
        assert sorted(got["name"].to_pylist()) == sorted(want["name"].to_pylist())


def test_hstore_get_value(table):
    fn = compile_where("HSTORE_GET_VALUE(props, 'k') = '3'")
    got = table.filter(fn(table))
    assert got.num_rows == sum(1 for i in range(500) if i % 5 == 3)


def test_ilike():
    t = pa.table({"s": pa.array(["Apple", "apple", "APPLE", "banana"])})
    fn = compile_where("s ILIKE 'apple'")
    assert t.filter(fn(t)).num_rows == 3


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_where("a >")
    with pytest.raises(ValueError):
        parse_where("a = 1 extra")
    with pytest.raises(ValueError):
        parse_where("a @ 1")


def test_filter_where_dataset(ray_session):
    import ray.data

    from gdal_ray.functions.swq import filter_where

    t = pa.table({"x": pa.array(range(100))})
    ds = ray.data.from_arrow(t)
    out = filter_where(ds, "x % 10 = 0 AND x BETWEEN 20 AND 80")
    rows = sorted(r["x"] for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
                  for r in b.to_pylist())
    assert rows == [20, 30, 40, 50, 60, 70, 80]


def test_like_escape_doubled_and_backslash():
    t = pa.table({"s": pa.array(["a!b", "a!!b", "ab", "a\\b", "axb"])})
    # doubled escape char = literal '!'
    fn = compile_where("s LIKE 'a!!b' ESCAPE '!'")
    assert t.filter(fn(t))["s"].to_pylist() == ["a!b"]
    # escaped wildcard = literal '_'
    t2 = pa.table({"s": pa.array(["a_b", "axb"])})
    fn2 = compile_where("s LIKE 'a!_b' ESCAPE '!'")
    assert t2.filter(fn2(t2))["s"].to_pylist() == ["a_b"]
    # literal backslash in pattern with a different escape char
    fn3 = compile_where("s LIKE 'a\\b' ESCAPE '!'")
    assert t.filter(fn3(t))["s"].to_pylist() == ["a\\b"]


def test_between_null_three_valued():
    t = pa.table({"x": pa.array([1, None, 5, 10], pa.int64())})
    fn = compile_where("x BETWEEN 2 AND 8")
    # NULL BETWEEN -> NULL -> row filtered out (not an error)
    assert t.filter(fn(t))["x"].to_pylist() == [5]
    fn2 = compile_where("NOT (x BETWEEN 2 AND 8)")
    # NOT NULL -> NULL -> excluded as well (SQL three-valued logic)
    assert t.filter(fn2(t))["x"].to_pylist() == [1, 10]
