"""Property test: the dictionary-domain Kleene evaluator must agree with
a direct row-by-row SQL three-valued-logic interpreter on random data and
random predicate trees.

The engine path (engine/encoded_filter.row_mask) evaluates each leaf once
per dictionary entry and gathers through integer codes; the reference
here evaluates every row independently with an explicit {T, F, U}
interpreter written from the SQL semantics — a genuinely different code
path, so agreement pins the whole rewrite (dictionary build, sentinel
handling, Kleene arithmetic, mixed-type literal coercion) at once.
Mirrors the existing property coverage of the stats compiler
(tests/test_predicate.py) one layer down, per SURVEY.md §5.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_extra_spark.engine.encoded_filter import row_mask
from parquet_extra_spark.engine.predicate import (
    And,
    Cmp,
    IsIn,
    IsNull,
    Not,
    NotNull,
    Or,
    Prefix,
    Rlike,
    Substr,
)

T, F, U = "T", "F", "U"

_INT_VALS = st.one_of(st.integers(-5, 5), st.none())
_STR_VALS = st.one_of(st.sampled_from(["", "a", "ab", "b", "ba", "zz"]), st.none())

_CMP_OPS = ["gt", "ge", "lt", "le", "eq", "ne"]
_PY_OPS = {
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
}


def _leaves(int_lits, str_lits):
    cmp_i = st.builds(
        Cmp, st.sampled_from(_CMP_OPS), st.just("i"), st.sampled_from(int_lits)
    )
    cmp_s = st.builds(
        Cmp, st.sampled_from(_CMP_OPS), st.just("s"), st.sampled_from(str_lits)
    )
    isin_i = st.builds(
        IsIn,
        st.just("i"),
        st.lists(
            st.one_of(st.sampled_from(int_lits), st.none()), max_size=3
        ).map(tuple),
    )
    prefix = st.builds(Prefix, st.just("s"), st.sampled_from(["a", "b", "ab"]))
    substr = st.builds(
        Substr,
        st.sampled_from(["contains", "endswith"]),
        st.just("s"),
        st.sampled_from(["a", "b", "ab", "z"]),
    )
    rlike = st.builds(
        Rlike,
        st.just("s"),
        st.sampled_from(["a", "^a", "b$", "^a.$", "a+b", "^$", "^(a|z)b"]),
    )
    nulls = st.one_of(
        st.builds(IsNull, st.sampled_from(["i", "s"])),
        st.builds(NotNull, st.sampled_from(["i", "s"])),
    )
    return st.one_of(cmp_i, cmp_s, isin_i, prefix, substr, rlike, nulls)


def _preds():
    return st.recursive(
        _leaves(int_lits=[-3, 0, 2, 5], str_lits=["", "a", "ab", "c"]),
        lambda kids: st.one_of(
            st.builds(And, kids, kids),
            st.builds(Or, kids, kids),
            st.builds(Not, kids),
        ),
        max_leaves=6,
    )


def _eval3(pred, row: dict) -> str:
    """Direct SQL 3VL interpreter over one row (NULL operand -> U)."""
    if isinstance(pred, And):
        a, b = _eval3(pred.left, row), _eval3(pred.right, row)
        if a == F or b == F:
            return F
        if a == U or b == U:
            return U
        return T
    if isinstance(pred, Or):
        a, b = _eval3(pred.left, row), _eval3(pred.right, row)
        if a == T or b == T:
            return T
        if a == U or b == U:
            return U
        return F
    if isinstance(pred, Not):
        a = _eval3(pred.child, row)
        return {T: F, F: T, U: U}[a]
    x = row[pred.column]
    if isinstance(pred, IsNull):
        return T if x is None else F
    if isinstance(pred, NotNull):
        return F if x is None else T
    if x is None:
        return U
    if isinstance(pred, Cmp):
        return T if _PY_OPS[pred.op](x, pred.value) else F
    if isinstance(pred, Prefix):
        return T if x.startswith(pred.value) else F
    if isinstance(pred, Substr):
        hit = pred.value in x if pred.op == "contains" else x.endswith(pred.value)
        return T if hit else F
    if isinstance(pred, Rlike):
        import re

        return T if re.search(pred.pattern, x) else F
    if isinstance(pred, IsIn):
        non_null = [v for v in pred.values if v is not None]
        if x in non_null:
            return T
        return U if len(non_null) < len(pred.values) else F
    raise TypeError(pred)


def _env_from_rows(ivals, svals):
    """Build (codes with null sentinel, dictionary, dtype) per column the
    same way the aggregates' fallback lane does — but independently, with
    plain pyarrow calls."""
    env = {}
    for name, vals, pa_t, dtype in (
        ("i", ivals, pa.int64(), "bigint"),
        ("s", svals, pa.string(), "string"),
    ):
        arr = pa.array(vals, type=pa_t)
        enc = arr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        codes = np.where(
            arr.is_null().to_numpy(zero_copy_only=False),
            len(enc.dictionary),
            codes,
        ).astype(np.int64)
        env[name] = (codes, enc.dictionary, dtype)
    return env


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(st.tuples(_INT_VALS, _STR_VALS), min_size=1, max_size=30),
    pred=_preds(),
)
def test_row_mask_matches_three_valued_interpreter(rows, pred):
    ivals = [r[0] for r in rows]
    svals = [r[1] for r in rows]
    env = _env_from_rows(ivals, svals)
    got = list(row_mask(pred, env))
    want = [
        _eval3(pred, {"i": i, "s": s}) == T for i, s in zip(ivals, svals)
    ]
    assert got == want, (pred, rows)
