"""OGR SQL attribute-filter compiler: WHERE-expression string ->
vectorized pyarrow.compute evaluator.

Re-implements the swq expression language the reference parses with
bison (reference ogr/swq_parser.y, operator registry
ogr/swq_op_registrar.cpp:28-61, evaluators ogr/swq_op_general.cpp):
logical OR/AND/NOT; comparisons =, <>, !=, <, >, <=, >=; [NOT] LIKE /
ILIKE (with ESCAPE), [NOT] IN (...), [NOT] BETWEEN a AND b, IS [NOT]
NULL; arithmetic + - * / %; string CONCAT/||, SUBSTR (1-based, like
the reference), UPPER, LOWER, LENGTH, HSTORE_GET_VALUE; CAST(x AS
integer|bigint|float|numeric|character|date|time|timestamp).

Usage:
    fn = compile_where("l_quantity > 45 AND name LIKE 'A%'")
    mask = fn(batch)            # pyarrow BooleanArray
    ds.map_batches(lambda t: t.filter(compile_where(s)(t)))

The compiled form is a closure tree over pyarrow.compute kernels —
one pass, no Python per row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9.]*)"
    r"|(?P<op><>|!=|>=|<=|\|\||[=<>+\-*/%(),])"
    r")")

_KEYWORDS = {"AND", "OR", "NOT", "IN", "LIKE", "ILIKE", "BETWEEN", "IS",
             "NULL", "CAST", "AS", "ESCAPE", "TRUE", "FALSE"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"swq: bad token at {s[pos:pos + 20]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "name":
            nm = m.group("name")
            out.append(("kw", nm.upper()) if nm.upper() in _KEYWORDS
                       else ("name", nm))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", ""))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise ValueError(f"swq: expected {val or kind}, got {t}")
        return t

    def accept(self, kind, val):
        if self.peek() == (kind, val):
            self.next()
            return True
        return False

    # expr := or
    def parse(self):
        node = self.or_expr()
        if self.peek()[0] != "end":
            raise ValueError(f"swq: trailing tokens {self.peek()}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.accept("kw", "OR"):
            rhs = self.and_expr()
            node = ("or", node, rhs)
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.accept("kw", "AND"):
            rhs = self.not_expr()
            node = ("and", node, rhs)
        return node

    def not_expr(self):
        if self.accept("kw", "NOT"):
            return ("not", self.not_expr())
        return self.cmp_expr()

    def cmp_expr(self):
        lhs = self.add_expr()
        t = self.peek()
        negate = False
        if t == ("kw", "NOT"):
            self.next()
            negate = True
            t = self.peek()
        if t[0] == "op" and t[1] in ("=", "<>", "!=", "<", ">", "<=", ">="):
            self.next()
            node = ("cmp", t[1], lhs, self.add_expr())
        elif t == ("kw", "LIKE") or t == ("kw", "ILIKE"):
            self.next()
            pat = self.add_expr()
            esc = None
            if self.accept("kw", "ESCAPE"):
                esc = self.add_expr()
            node = ("like", t[1] == "ILIKE", lhs, pat, esc)
        elif t == ("kw", "IN"):
            self.next()
            self.expect("op", "(")
            items = [self.add_expr()]
            while self.accept("op", ","):
                items.append(self.add_expr())
            self.expect("op", ")")
            node = ("in", lhs, items)
        elif t == ("kw", "BETWEEN"):
            self.next()
            lo = self.add_expr()
            self.expect("kw", "AND")
            hi = self.add_expr()
            node = ("between", lhs, lo, hi)
        elif t == ("kw", "IS"):
            self.next()
            isnot = self.accept("kw", "NOT")
            self.expect("kw", "NULL")
            node = ("isnull", lhs)
            if isnot:
                node = ("not", node)
        else:
            if negate:
                raise ValueError("swq: dangling NOT")
            return lhs
        return ("not", node) if negate else node

    def add_expr(self):
        node = self.mul_expr()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("+", "-"):
                self.next()
                node = ("arith", t[1], node, self.mul_expr())
            elif t == ("op", "||"):
                self.next()
                node = ("func", "CONCAT", [node, self.mul_expr()])
            else:
                return node

    def mul_expr(self):
        node = self.unary()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("*", "/", "%"):
                self.next()
                node = ("arith", t[1], node, self.unary())
            else:
                return node

    def unary(self):
        if self.accept("op", "-"):
            return ("neg", self.unary())
        return self.primary()

    def primary(self):
        t = self.next()
        if t[0] == "num":
            return ("lit", float(t[1]) if "." in t[1] else int(t[1]))
        if t[0] == "str":
            return ("lit", t[1])
        if t == ("kw", "NULL"):
            return ("lit", None)
        if t == ("kw", "TRUE"):
            return ("lit", True)
        if t == ("kw", "FALSE"):
            return ("lit", False)
        if t == ("kw", "CAST"):
            self.expect("op", "(")
            val = self.or_expr()
            self.expect("kw", "AS")
            ty = self.expect("name")[1].upper()
            # swallow optional (n) length
            if self.accept("op", "("):
                self.expect("num")
                self.expect("op", ")")
            self.expect("op", ")")
            return ("cast", ty, val)
        if t[0] == "op" and t[1] == "(":
            node = self.or_expr()
            self.expect("op", ")")
            return node
        if t[0] == "name":
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if not self.accept("op", ")"):
                    args.append(self.or_expr())
                    while self.accept("op", ","):
                        args.append(self.or_expr())
                    self.expect("op", ")")
                return ("func", t[1].upper(), args)
            return ("col", t[1])
        raise ValueError(f"swq: unexpected {t}")


_CAST_TYPES = {
    "INTEGER": pa.int32(), "INT": pa.int32(), "BIGINT": pa.int64(),
    "SMALLINT": pa.int16(), "FLOAT": pa.float64(), "DOUBLE": pa.float64(),
    "NUMERIC": pa.float64(), "REAL": pa.float64(),
    "CHARACTER": pa.string(), "TEXT": pa.string(), "VARCHAR": pa.string(),
    "DATE": pa.date32(), "TIME": pa.time64("us"),
    "TIMESTAMP": pa.timestamp("us"),
}


def _eval(node, t: pa.Table):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        return t[node[1]]
    if kind == "or":
        return pc.or_kleene(_eval(node[1], t), _eval(node[2], t))
    if kind == "and":
        return pc.and_kleene(_eval(node[1], t), _eval(node[2], t))
    if kind == "not":
        return pc.invert(_eval(node[1], t))
    if kind == "neg":
        return pc.negate(_eval(node[1], t))
    if kind == "cmp":
        op = {"=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
              "<": pc.less, ">": pc.greater, "<=": pc.less_equal,
              ">=": pc.greater_equal}[node[1]]
        return op(_eval(node[2], t), _eval(node[3], t))
    if kind == "like":
        _, icase, lhs, pat, esc = node
        pattern = _eval(pat, t)
        if not isinstance(pattern, str):
            raise ValueError("swq: LIKE pattern must be a literal")
        kw = {"ignore_case": icase}
        if esc is not None:
            # translate ESCAPE char to pyarrow's backslash convention,
            # char by char: the escape char makes the NEXT char literal
            # (incl. a doubled escape char meaning the char itself)
            e = _eval(esc, t)
            out = []
            i = 0
            while i < len(pattern):
                c = pattern[i]
                if c == e and i + 1 < len(pattern):
                    nxt = pattern[i + 1]
                    out.append("\\" + nxt if nxt in "%_\\" else nxt)
                    i += 2
                elif c == "\\":
                    out.append("\\\\")
                    i += 1
                else:
                    out.append(c)
                    i += 1
            pattern = "".join(out)
        return pc.match_like(_eval(lhs, t), pattern, **kw)
    if kind == "in":
        vals = [_eval(x, t) for x in node[2]]
        v = _eval(node[1], t)
        hit = pc.is_in(v, value_set=pa.array(vals))
        # SQL three-valued logic: NULL IN (...) is NULL (so NOT IN
        # excludes NULL rows too); pc.is_in alone would say false
        return pc.if_else(pc.is_null(v), pa.scalar(None, pa.bool_()), hit)
    if kind == "between":
        v = _eval(node[1], t)
        # and_kleene: NULL BETWEEN follows SQL three-valued logic like
        # the AND/OR operators above
        return pc.and_kleene(pc.greater_equal(v, _eval(node[2], t)),
                             pc.less_equal(v, _eval(node[3], t)))
    if kind == "isnull":
        return pc.is_null(_eval(node[1], t))
    if kind == "arith":
        op = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
              "/": pc.divide, "%": lambda a, b: _mod(a, b)}[node[1]]
        return op(_eval(node[2], t), _eval(node[3], t))
    if kind == "cast":
        ty = _CAST_TYPES.get(node[1])
        if ty is None:
            raise NotImplementedError(f"swq: CAST AS {node[1]}")
        v = _eval(node[2], t)
        if pa.types.is_integer(ty) and hasattr(v, "type") \
                and pa.types.is_floating(v.type):
            # OGR CAST float->int is a C static_cast: truncate toward 0
            # (reference ogr/swq_op_general.cpp SWQCastEvaluator)
            v = pc.trunc(v)
            return pc.cast(v, ty, safe=False)
        return pc.cast(v, ty)
    if kind == "func":
        return _call(node[1], [_eval(a, t) for a in node[2]])
    raise NotImplementedError(kind)


def _mod(a, b):
    # C modulo (sign of dividend), like swq '%'
    aa = pc.cast(a, pa.float64()) if not isinstance(a, (int, float)) else a
    an = np.asarray(aa if isinstance(aa, np.ndarray) else
                    (aa.to_numpy() if hasattr(aa, "to_numpy") else aa), np.float64)
    bn = np.asarray(b.to_numpy() if hasattr(b, "to_numpy") else b, np.float64)
    return pa.array(np.fmod(an, bn))


CUSTOM_FUNCS: dict[str, "callable"] = {}


def register_function(name: str, fn) -> None:
    """User-extension hook: register a custom scalar function usable
    in WHERE expressions (the SWQ_CUSTOM_FUNC analog, reference
    ogr/ogr_swq.h:78). ``fn(*args)`` receives evaluated pyarrow
    arrays / python scalars and returns an array or scalar."""
    CUSTOM_FUNCS[name.upper()] = fn


def _call(name: str, args):
    if name in CUSTOM_FUNCS:
        return CUSTOM_FUNCS[name](*args)
    if name == "CONCAT":
        parts = [a if isinstance(a, str) else pc.cast(a, pa.string()) for a in args]
        arrays = [p for p in parts if not isinstance(p, str)]
        n = len(arrays[0]) if arrays else 1
        cols = [pa.array([p] * n) if isinstance(p, str) else p for p in parts]
        return pc.binary_join_element_wise(*cols, "")
    if name == "SUBSTR":
        s, start = args[0], int(args[1])
        # OGR SUBSTR is 1-based; negative start counts from the end
        off = start - 1 if start > 0 else start
        if len(args) > 2:
            return pc.utf8_slice_codeunits(s, off, off + int(args[2]))
        return pc.utf8_slice_codeunits(s, off)
    if name == "UPPER":
        return pc.utf8_upper(args[0])
    if name == "LOWER":
        return pc.utf8_lower(args[0])
    if name == "LENGTH":
        return pc.cast(pc.utf8_length(args[0]), pa.int64())
    if name == "HSTORE_GET_VALUE":
        # 'a=>1,b=>2' hstore lookup (swq_op_general.cpp evaluator)
        key = args[1]
        pat = re.compile(r'"?([^",=>]+)"?\s*=>\s*"?([^",]*)"?')

        def get(v):
            if v is None:
                return None
            for m in pat.finditer(v):
                if m.group(1).strip() == key:
                    return m.group(2).strip()
            return None

        return pa.array([get(v) for v in args[0].to_pylist()], pa.string())
    if name == "ROUND":
        # half-away-from-zero, matching OGR SQL / DuckDB round()
        v = args[0]
        nd = int(args[1]) if len(args) > 1 else 0
        arr = v.to_numpy(zero_copy_only=False) if hasattr(v, "to_numpy") \
            else np.asarray(v, np.float64)
        s = 10.0 ** nd
        return pa.array(np.sign(arr) * np.floor(np.abs(arr) * s + 0.5) / s)
    if name == "ABS":
        return pc.abs(args[0])
    if name == "SQRT":
        return pc.sqrt(args[0])
    # the SQLite-dialect spatial functions self-register on first use
    # (Ray workers import this module fresh, so a driver-side
    # register_function call would not be visible here)
    if not _SPATIAL_LOADED:
        _SPATIAL_LOADED.append(True)
        from . import sql_spatial  # noqa: F401  (registers ST_*)

        if name in CUSTOM_FUNCS:
            return CUSTOM_FUNCS[name](*args)
    raise NotImplementedError(f"swq function {name}")


_SPATIAL_LOADED: list[bool] = []


def parse_where(s: str):
    return _Parser(_tokenize(s)).parse()


def compile_where(s: str):
    """WHERE string -> callable(pa.Table) -> BooleanArray."""
    ast = parse_where(s)

    def fn(t: pa.Table):
        out = _eval(ast, t)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return out

    return fn


def filter_where(ds, where: str):
    """Dataset attribute filter (OGRLayer.SetAttributeFilter analog)."""
    fn = compile_where(where)
    return ds.map_batches(lambda t: t.filter(fn(t)), batch_format="pyarrow")
