"""Expected-result builders for the pinned-oracle queries (VERDICT
round-3 directive #1).

Each builder returns its query's expected result as a pandas
DataFrame WITHOUT running the engine.  Allowed sources, in order of
strength:

1. Reference-autotest expectation constants — the (case, expected)
   tables hoisted to module level in the query/test modules, each a
   transcription of the reference's own published assertions
   (autotest/**.py file:line cited at the constant).
2. The corpus synthesis manifest (`sources/images.py`
   `corpus_manifest`) — per-image ground truth recorded from the raw
   synthesized pixels BEFORE any codec touches them, so decoder
   roundtrip pins are independent of every decode path.
3. Independent recomputation — DuckDB SQL or plain numpy/pandas
   written against the documented semantics, sharing no code with the
   engine kernels.

`scripts/gen_literal_oracles.py` builds each literal-VALUES oracle
from the builder's frame and runs the engine query once only to
ASSERT agreement — the engine output is never the source of the
pinned values for queries listed here.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

BUILDERS: dict[str, Callable[[str], pd.DataFrame]] = {}


def builder(name: str):
    def deco(fn):
        BUILDERS[name] = fn
        return fn

    return deco


def cev(pairs) -> pd.DataFrame:
    """(case, expected) pairs -> the (case, expected, value) frame the
    conformance sweeps emit (value must equal expected by query
    construction; both columns come from the reference constant)."""
    return pd.DataFrame(
        {"case": [c for c, _ in pairs],
         "expected": [int(e) for _, e in pairs],
         "value": [int(e) for _, e in pairs]})


def cv(pairs) -> pd.DataFrame:
    """(case, expected) pairs -> a (case, value) frame."""
    return pd.DataFrame({"case": [c for c, _ in pairs],
                         "value": [int(e) for _, e in pairs]})


def cce(pairs) -> pd.DataFrame:
    """(case, expected) pairs -> a (case, checksum, expected) frame."""
    return pd.DataFrame(
        {"case": [c for c, _ in pairs],
         "checksum": [int(e) for _, e in pairs],
         "expected": [int(e) for _, e in pairs]})


# ------------------------------------------------------------------
# mechanical extraction of reference-transcribed literals from query
# sources: add("case", <computed>, EXPECTED_LITERAL) calls and
# literal [(path, expected), ...] fixture tables.  This reads SOURCE
# TEXT — the engine never runs — so the extracted pairs are exactly
# the constants the query author transcribed from the reference's
# autotest assertions (cited in each query's docstring).

def _literal(node):
    import ast

    try:
        return ast.literal_eval(node)
    except (ValueError, TypeError):
        return None


def extract_add_pairs(fn, case_arg: int = 0, expected_arg: int = -1):
    """All add(<case>, ..., <expected>) calls inside fn's source whose
    case and expected args are literals -> [(case, expected)]."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    pairs = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "add"):
            args = node.args
            c = _literal(args[case_arg])
            e = _literal(args[expected_arg])
            if c is not None and e is not None:
                pairs.append((str(c), int(e)))
    return pairs


def extract_case_table(fn, name: str = "cases"):
    """The literal list assigned to `<name> = [...]` inside fn."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == name):
            val = _literal(node.value)
            if val is not None:
                return val
            # allow f-string paths: evaluate each tuple element that
            # is a plain literal, join f-strings textually
            if isinstance(node.value, (ast.List, ast.Tuple)):
                out = []
                for elt in node.value.elts:
                    item = _literal(elt)
                    out.append(item)
                return out
    return None


def extract_tuple_pairs(fn, var: str, case_idx: int = 0,
                        exp_idx: int = -1):
    """(case, expected) pairs from a literal `var = [(...), ...]`
    table inside fn, tolerating f-string path elements (only the
    case and expected elements must be literals)."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == var
                and isinstance(node.value, (ast.List, ast.Tuple))):
            pairs = []
            for elt in node.value.elts:
                if not isinstance(elt, (ast.Tuple, ast.List)):
                    continue
                c = _literal(elt.elts[case_idx])
                e = _literal(elt.elts[exp_idx])
                if c is None or e is None:
                    raise ValueError(
                        f"non-literal case/expected in {var}")
                pairs.append((str(c), int(e)))
            return pairs
    raise ValueError(f"no literal table {var} in {fn.__name__}")


# ------------------------------------------------------------------
# wave 1: conformance sweeps whose expected literals sit inline in
# the query source (each a transcription of the reference autotest
# assertion cited in the query docstring).

def _raster():
    from gdal_ray.pipelines import raster

    return raster


@builder("q_fits")
def _q_fits(sf):
    return cev(extract_add_pairs(_raster().q_fits))


@builder("q_s100")
def _q_s100(sf):
    return cev(extract_add_pairs(_raster().q_s100))


@builder("q_grib2")
def _q_grib2(sf):
    r = _raster()
    pairs = (extract_tuple_pairs(r.q_grib2, "cs_cases")
             + extract_tuple_pairs(r.q_grib2, "gt_cases"))
    return cev(pairs)


@builder("q_hdf5")
def _q_hdf5(sf):
    return cce(extract_tuple_pairs(_raster().q_hdf5, "cases"))


@builder("q_hfa")
def _q_hfa(sf):
    # autotest/gcore/hfa_read.py init_list + gdrivers/hfa.py
    pairs = [("byte.img", 4672), ("int16.img", 4672),
             ("uint16.img", 4672), ("int32.img", 4672),
             ("uint32.img", 4672), ("float32.img", 4672),
             ("float64.img", 4672), ("utmsmall.img", 50054),
             ("2bit_compressed.img", 11918),
             ("int.img", 6691), ("float.img", 23529)]
    return cce(pairs)


@builder("q_srp_nwt")
def _q_srp_nwt(sf):
    pairs = extract_add_pairs(_raster().q_srp_nwt)
    # dynamic loops in the query (same literals, loop-generated cases):
    # USRP PCB variants (gdrivers/srp.py) and Northwood GRD bands
    # (gdrivers/northwood.py)
    for pcb in (0, 4, 8):
        pairs += [(f"srp:pcb{pcb}", 24576), (f"srp:pcb{pcb}:gt0", 500000)]
    pairs += [("grd:r", 28093), ("grd:g", 33690), ("grd:b", 20365),
              ("grd:z", 25856)]
    return cev(pairs)


@builder("q_simple_formats")
def _q_simple_formats(sf):
    pairs = extract_add_pairs(_raster().q_simple_formats)
    # tga loop literals (gdrivers/tga.py ref_test_suite goldens)
    for name, ics in [("cbw8.tga", [43089]), ("ccm8.tga", [38151]),
                      ("utc16.tga", [64747, 64839, 64796]),
                      ("utc32.tga", [9797, 9952, 9848, 0]),
                      ("stefan_full_rgba.tga",
                       [12603, 58561, 36064, 10807]),
                      ("TEST24rle.tga", [39607, 6458, 44534])]:
        for b, e in enumerate(ics):
            pairs.append((f"tga:{name}:{b + 1}", e))
    return cev(pairs)
