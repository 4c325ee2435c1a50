"""ExecuteSQL analog: a mini OGR-SQL SELECT planner over Ray Data.

The reference parses SELECT with bison into an swq_select plan and
walks it per feature (reference ogr/swq_select.cpp, executor
ogr/ogrsf_frmts/generic/ogr_gensql.cpp). Here the same dialect subset
compiles onto Dataset operators:

    SELECT <expr [AS name]>[, ...] FROM <table>
        [[LEFT [OUTER]] JOIN <table2> ON <a> = <b>]
        [WHERE <swq expr>] [GROUP BY col[, ...]]
        [ORDER BY col [ASC|DESC][, ...]] [LIMIT n]
    <select> UNION ALL <select> [UNION ALL ...]
    aggregates: COUNT(*) / COUNT(x) / COUNT(DISTINCT x) / SUM / MIN /
    MAX / AVG, composable inside scalar expressions

- scalar expressions reuse the swq compiler (functions/swq.py);
- aggregates COUNT(*)/COUNT/SUM/MIN/MAX/AVG compile to the combiner
  partial-aggregation pattern (pipelines/common.partial_groupby_agg);
- JOIN plans onto the partitioned hash-shuffle join
  (stages/joins.hash_join — the distributed form of the reference's
  secondary-table lookup join, ogr_gensql.cpp:526-532,1497-1523);
- UNION ALL concatenates the member results (swq_select.cpp:128);
- WHERE runs inside map_batches; ORDER BY+LIMIT uses the distributed
  top-k; ORDER BY alone sorts the (bounded) result driver-side.

``execute(sql, sf_dir)`` returns a pyarrow Table.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .swq import _Parser, _eval, _tokenize

_AGGS = {"COUNT", "COUNT_ALL", "COUNT_DISTINCT", "SUM", "MIN", "MAX", "AVG"}

_CLAUSE = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<table>\w+)"
    r"(?P<joins>(?:\s+(?:LEFT\s+(?:OUTER\s+)?)?"
    r"JOIN\s+\w+\s+ON\s+[\w.]+\s*=\s*[\w.]+)*)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.*?))?"
    r"(?:\s+HAVING\s+(?P<having>.*?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.*?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
    re.I | re.S)

_UNION_ALL = re.compile(r"\s+UNION\s+ALL\s+", re.I)


def _mask_literals(sql: str) -> str:
    """Blank out the CONTENTS of single-quoted string literals
    (keeping the quotes and the length) so clause keywords inside a
    literal — WHERE name = ' UNION ALL ' — never steer the structural
    regexes. Offsets into the masked string map 1:1 onto the original,
    which is what gets sliced for the actual sub-parsers. '' escapes
    stay inside the literal (swq ESCAPE semantics)."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _split_union(sql: str) -> list[str]:
    """Split on top-level UNION ALL (not inside parentheses or string
    literals); returns slices of the ORIGINAL string."""
    masked = _mask_literals(sql)
    parts = []
    depth = 0
    start = 0
    i = 0
    while i < len(masked):
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = _UNION_ALL.match(masked, i)
            if m and i > start:
                parts.append(sql[start:i])
                start = m.end()
                i = m.end()
                continue
        i += 1
    parts.append(sql[start:])
    return parts


_SUBQ_OPEN = re.compile(r"\(\s*SELECT\b", re.I)


def _mask_subqueries(masked: str) -> str:
    """Blank the INSIDE of every parenthesized subquery (literals
    already masked) so the structural clause regex never splits on a
    subquery's own WHERE/GROUP BY/ORDER BY keywords. Parens survive;
    offsets map 1:1 onto the original."""
    out = list(masked)
    for m in _SUBQ_OPEN.finditer(masked):
        depth = 0
        i = m.start()
        while i < len(masked):
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        for k in range(m.start() + 1, min(i, len(masked))):
            out[k] = " "
    return "".join(out)


_AND = re.compile(r"\s+AND\s+", re.I)
_IN_SUBQ = re.compile(
    r"^\s*([\w.]+)\s+(NOT\s+)?IN\s*\(\s*(SELECT\b.*)\)\s*$", re.I | re.S)


def _split_conjuncts(where: str) -> list[str]:
    """Top-level AND conjuncts (outside parens/literals); raises on a
    top-level OR when a subquery is present (not plannable here)."""
    masked = _mask_literals(where)
    parts, starts = [], [0]
    depth = 0
    i = 0
    while i < len(masked):
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = _AND.match(masked, i)
            if m:
                parts.append(where[starts[-1]:i])
                starts.append(m.end())
                i = m.end()
                continue
        i += 1
    parts.append(where[starts[-1]:])
    return parts


def _extract_in_subqueries(where: str):
    """Split WHERE into (residual_where | None, [(col, anti, inner_sql)])
    — each ``col [NOT] IN (SELECT ...)`` top-level conjunct plans onto
    a broadcast key-set semi/anti filter."""
    if "(" not in where or not _SUBQ_OPEN.search(_mask_literals(where)):
        return where, []
    conjs = _split_conjuncts(where)
    plain, subs = [], []
    for c in conjs:
        masked_c = _mask_literals(c)
        if _SUBQ_OPEN.search(masked_c):
            m = _IN_SUBQ.match(c)
            if not m or re.search(r"\bOR\b", _mask_subqueries(masked_c), re.I):
                raise ValueError(
                    "unsupported: subquery predicate must be a top-level "
                    "`col [NOT] IN (SELECT ...)` conjunct")
            subs.append((m.group(1).split(".")[-1], bool(m.group(2)),
                         m.group(3)))
        else:
            plain.append(c)
    return (" AND ".join(p.strip() for p in plain) or None), subs


def _split_select(s: str) -> list[str]:
    masked = _mask_literals(s)
    out, depth, start = [], 0, 0
    for i, c in enumerate(masked):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(s[start:i].strip())
            start = i + 1
    out.append(s[start:].strip())
    return out


_COUNT_STAR = re.compile(r"COUNT\s*\(\s*\*\s*\)", re.I)
_COUNT_DISTINCT = re.compile(r"COUNT\s*\(\s*DISTINCT\s+", re.I)


def _extract_aggs(ast, aggs: list):
    """Replace aggregate calls anywhere in the expression tree with
    synthetic column refs ("col", "__aN"); collect (fn, arg_ast) into
    ``aggs``. Enables scalar expressions OVER aggregates —
    round(SUM(x), 2), SUM(a)/SUM(b), MAX(x)-MIN(x) — the swq HAVING/
    select post-evaluation shape (ogr/swq_select.cpp)."""
    if not isinstance(ast, tuple):
        return ast
    if ast[0] == "func" and ast[1] in _AGGS:
        args = ast[2]
        inner = args[0] if args else None
        aggs.append((ast[1], inner))
        return ("col", f"__a{len(aggs) - 1}")
    return tuple(
        [ast[0]]
        + [tuple(_extract_aggs(x, aggs) for x in part) if isinstance(part, list)
           else _extract_aggs(part, aggs)
           for part in ast[1:]]
    )


def _parse_item(item: str):
    m = re.match(r"^(.*?)\s+AS\s+(\w+)$", item, re.I | re.S)
    expr_s, alias = (m.group(1), m.group(2)) if m else (item, None)
    # COUNT(*) -> COUNT_ALL(), COUNT(DISTINCT x) -> COUNT_DISTINCT(x)
    # so the expression parser accepts them
    star = bool(_COUNT_STAR.search(expr_s))
    expr_norm = _COUNT_STAR.sub("COUNT_ALL()", expr_s)
    expr_norm = _COUNT_DISTINCT.sub("COUNT_DISTINCT(", expr_norm)
    ast = _Parser(_tokenize(expr_norm)).parse()
    aggs: list = []
    ast2 = _extract_aggs(ast, aggs)
    if aggs:
        default = (f"{aggs[0][0].lower()}_expr"
                   if not (star and len(aggs) == 1) else "count_star")
        return ("agg", aggs, ast2, alias or default)
    name = alias or (ast[1] if ast[0] == "col" else "expr")
    return ("scalar", None, ast, name)


def execute(sql: str, sf_dir):
    """Run a SELECT over one of the registered tables; returns
    pyarrow.Table. ``sf_dir`` is either a testdata directory or a
    {name: pyarrow.Table} dict of in-memory layers (the OGR VRT
    driver's SrcSQL path)."""
    from ..pipelines.common import partial_groupby_agg, topk

    def read_table(src, name):
        if isinstance(src, dict):
            import ray.data

            return ray.data.from_arrow(src[name.strip()])
        from ..pipelines.common import read_table as _rt

        return _rt(src, name)

    members = _split_union(sql)
    if len(members) > 1:
        tabs = [execute(p, sf_dir) for p in members]
        return pa.concat_tables(tabs, promote_options="default")

    # structural match runs on the literal- and subquery-masked
    # string; clause text is sliced from the ORIGINAL at the matched
    # spans so literals and subqueries survive intact
    m = _CLAUSE.match(_mask_subqueries(_mask_literals(sql)))
    if not m:
        raise ValueError("unsupported SQL shape")

    def grp(name: str) -> str | None:
        s_, e_ = m.span(name)
        return None if s_ == -1 else sql[s_:e_]

    select_s = grp("select")
    distinct = bool(re.match(r"\s*DISTINCT\b", select_s, re.I))
    if distinct:
        select_s = re.sub(r"\s*DISTINCT\b", "", select_s, count=1, flags=re.I)
    table = grp("table")
    if select_s.strip() == "*":
        # SELECT * — expand to every source column (swq_select.cpp
        # wildcard expansion)
        probe = read_table(sf_dir, table)
        select_s = ", ".join(
            f'"{c}"' if not c.isidentifier() else c
            for c in probe.schema().names)
    items = [_parse_item(s) for s in _split_select(select_s)]
    where = grp("where")
    having = grp("having")
    having_hidden = False
    if having and re.search(r"\b(COUNT|SUM|MIN|MAX|AVG)\s*\(", having, re.I):
        # aggregates directly in HAVING (HAVING COUNT(*) >= 8): ride
        # the same agg-extraction machinery as a hidden select item,
        # filter on it post-aggregation, then drop the column
        h = _parse_item(having)
        items.append(("agg", h[1], h[2], "__having__"))
        having_hidden = True
    group = [c.strip() for c in grp("group").split(",")] if grp("group") else []
    order = []
    if grp("order"):
        for part in grp("order").split(","):
            toks = part.split()
            order.append((toks[0],
                          len(toks) > 1 and toks[1].upper() == "DESC"))
    limit = int(grp("limit")) if grp("limit") else None

    # ORDER BY runs over the projected output; validate up front so a
    # non-selected column fails with a clear message, not a KeyError
    out_names = [it[3] for it in items]
    for c, _ in order:
        if c not in out_names:
            raise ValueError(
                f"unsupported: ORDER BY column {c!r} not in the SELECT list")

    ds = read_table(sf_dir, table)
    if grp("joins"):
        # chained secondary-table joins, planned left-deep like the
        # reference's swq join list (ogr_gensql.cpp:526-532 — each
        # JOIN's ON references the accumulated left side)
        from ..stages.joins import hash_join

        _JOIN = re.compile(
            r"(?P<jhow>LEFT\s+(?:OUTER\s+)?)?JOIN\s+(?P<jtable>\w+)"
            r"\s+ON\s+(?P<jleft>[\w.]+)\s*=\s*(?P<jright>[\w.]+)", re.I)
        for jm in _JOIN.finditer(grp("joins")):
            right = read_table(sf_dir, jm.group("jtable"))
            jl = jm.group("jleft").split(".")[-1]
            jr = jm.group("jright").split(".")[-1]
            lnames = set(ds.schema().names)
            if jl not in lnames:
                jl, jr = jr, jl
            if jl not in lnames or jr not in set(right.schema().names):
                raise ValueError(
                    f"JOIN keys {jm.group('jleft')}/{jm.group('jright')}"
                    " not found")
            how = "left_outer" if jm.group("jhow") else "inner"
            ds = hash_join(ds, right, left_on=jl, right_on=jr, how=how)
    if where:
        from .swq import compile_where

        where, subs = _extract_in_subqueries(where)
        for col, anti, inner_sql in subs:
            # col [NOT] IN (SELECT ...): run the subquery, broadcast
            # its (bounded, distinct-key) first column into a per-batch
            # is_in filter — the broadcast-key-set semi/anti join
            # (fact-vs-fact pipelines use stages/joins.semi_anti_join).
            # SQL 3-valued logic: NOT IN against a set containing NULL
            # matches nothing; IN ignores the NULLs.
            inner = execute(inner_sql, sf_dir)
            keys = inner.column(0)
            had_null = keys.null_count > 0
            keys = pc.drop_null(keys).combine_chunks()

            def _subq_filter(t: pa.Table, col=col, keys=keys, anti=anti,
                             had_null=had_null) -> pa.Table:
                if anti and had_null:
                    return t.slice(0, 0)
                hit = pc.is_in(t[col], value_set=keys)
                if anti:
                    hit = pc.and_kleene(pc.invert(hit),
                                        pc.is_valid(t[col]))
                return t.filter(hit)

            ds = ds.map_batches(_subq_filter, batch_format="pyarrow")
        if where:
            wf = compile_where(where)
            ds = ds.map_batches(lambda t: t.filter(wf(t)),
                                batch_format="pyarrow")

    has_agg = any(k == "agg" for k, *_ in items)
    if has_agg:
        # compute aggregate argument columns + group keys per batch;
        # each item's aggregate calls were rewritten to __aN column
        # refs (local N), globalized here to __gI_N
        scalar_cols = [(i, it) for i, it in enumerate(items) if it[0] == "scalar"]
        for i, it in scalar_cols:
            if it[3] not in group:
                raise ValueError(f"non-aggregated column {it[3]!r} not in GROUP BY")

        def prep(t: pa.Table) -> pa.Table:
            cols = {g: t[g] for g in group}
            for i, (kind, aggs, _ast, _name) in enumerate(items):
                if kind != "agg":
                    continue
                for j, (fn, arg) in enumerate(aggs):
                    if fn == "COUNT_DISTINCT":
                        continue  # separate distinct-pair sub-pipeline
                    if fn == "COUNT_ALL":
                        cols[f"__g{i}_{j}"] = pa.array(
                            np.ones(t.num_rows, np.int64))
                    else:
                        v = _eval(arg, t)
                        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                            v = pa.array([v] * t.num_rows)
                        cols[f"__g{i}_{j}"] = v
            if not group:
                cols["__g__"] = pa.array(np.zeros(t.num_rows, np.int8))
            return pa.table(cols)

        keys = group or ["__g__"]
        specs = []
        dist_aggs = []  # (column name, arg ast)
        for i, (kind, aggs, _ast, _name) in enumerate(items):
            if kind != "agg":
                continue
            for j, (fn, arg) in enumerate(aggs):
                c = f"__g{i}_{j}"
                if fn == "COUNT_DISTINCT":
                    dist_aggs.append((c, arg))
                elif fn in ("COUNT_ALL", "COUNT"):
                    specs.append((c, c,
                                  "count_all" if fn == "COUNT_ALL" else "count"))
                elif fn == "AVG":
                    specs.append((f"{c}_s", c, "sum"))
                    specs.append((f"{c}_n", c, "count"))
                else:
                    specs.append((c, c, fn.lower()))
        if not specs:
            # keys must still materialize when every agg is DISTINCT
            specs.append(("__cnt__", keys[0], "count_all"))
        part = partial_groupby_agg(
            ds.map_batches(prep, batch_format="pyarrow"), keys, specs)
        for cname, arg in dist_aggs:
            # COUNT(DISTINCT x): per-batch distinct (keys, x) pairs ->
            # distributed partial combine -> per-key count of the
            # bounded deduped table (q_count_distinct's shape); joined
            # back onto the aggregate table by group key
            def dprep(t: pa.Table, arg=arg) -> pa.Table:
                cols = {g: t[g] for g in group}
                v = _eval(arg, t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    v = pa.array([v] * t.num_rows)
                cols["__dv"] = v
                if not group:
                    cols["__g__"] = pa.array(np.zeros(t.num_rows, np.int8))
                tt = pa.table(cols)
                tt = tt.filter(pc.is_valid(tt["__dv"]))  # SQL skips NULLs
                return tt.group_by(tt.column_names).aggregate([])

            dd = partial_groupby_agg(
                ds.map_batches(dprep, batch_format="pyarrow"),
                keys + ["__dv"], [("__n", "__dv", "count_all")])
            cnt = dd.group_by(keys).aggregate([("__dv", "count")])
            cnt = cnt.rename_columns(
                [cname if c == "__dv_count" else c for c in cnt.column_names])
            part = part.join(cnt, keys=keys, join_type="left outer")
            ci = part.schema.get_field_index(cname)
            part = part.set_column(
                ci, cname, pc.fill_null(part[cname], pa.scalar(0, pa.int64())))
        out_cols = {}
        for kind, aggs, ast, name in items:
            if kind == "scalar":
                out_cols[name] = part[name]
        for i, (kind, aggs, ast, name) in enumerate(items):
            if kind != "agg":
                continue
            # environment table mapping the item's local __aN refs to
            # the merged aggregate columns
            env = {}
            for j, (fn, _arg) in enumerate(aggs):
                c = f"__g{i}_{j}"
                if fn == "AVG":
                    env[f"__a{j}"] = pc.divide(
                        pc.cast(part[f"{c}_s"], pa.float64()),
                        pc.cast(part[f"{c}_n"], pa.float64()))
                else:
                    env[f"__a{j}"] = part[c]
            env_t = pa.table(env) if env else part
            v = _eval(ast, env_t)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * part.num_rows)
            out_cols[name] = v
        result = pa.table(out_cols)
        if having_hidden:
            keep = result["__having__"]
            result = result.drop_columns(["__having__"]).filter(keep)
        elif having:
            # HAVING over the aggregated output columns' alias names
            # (reference swq HAVING runs post-aggregation,
            # ogr/swq_select.cpp): reuse the swq compiler
            from .swq import compile_where

            hf = compile_where(having)
            result = result.filter(hf(result))
    else:
        def project(t: pa.Table) -> pa.Table:
            cols = {}
            for kind, fn, ast, name in items:
                v = _eval(ast, t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    v = pa.array([v] * t.num_rows)
                cols[name] = v
            return pa.table(cols)

        if distinct:
            # SELECT DISTINCT: per-batch dedupe cuts what leaves each
            # task; the global dedupe folds the bounded distinct rows
            orig_project = project

            def project(t: pa.Table, _p=orig_project) -> pa.Table:
                o = _p(t)
                return o.group_by(o.column_names).aggregate([])

        proj = ds.map_batches(project, batch_format="pyarrow")
        if not distinct and order and limit is not None and len(order) == 1:
            return topk(proj, order[0][0], limit, descending=order[0][1])
        if order and not distinct:
            # distributed range sort; iter_batches preserves the order
            # so the driver only concatenates (the fold to a pyarrow
            # Table is the API contract, not a compute step)
            proj = proj.sort([c for c, _ in order],
                             descending=[d for _, d in order])
            order = []
        tabs = list(proj.iter_batches(batch_size=None, batch_format="pyarrow"))
        result = pa.concat_tables(tabs, promote_options="default") if tabs \
            else pa.table({})
        if distinct and result.num_rows:
            result = result.group_by(result.column_names).aggregate([])

    if order and result.num_rows:
        idx = pc.sort_indices(
            result, sort_keys=[(c, "descending" if d else "ascending")
                               for c, d in order])
        result = result.take(idx)
    if limit is not None:
        result = result.slice(0, limit)
    return result
