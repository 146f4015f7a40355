"""Predicate evaluation in the dictionary domain — filter-over-compressed.

``filter_decode_pred`` (engine/predicate.py) realizes the reference's
dual predicate contract (parquet-avro Predicate.scala:10,19-27: coarse
storage-level skip + exact row recheck) by decoding surviving chunks and
rechecking on materialized values. For the encoded AGGREGATES
(engine/encoded_agg.py) that materialization is exactly what the module
exists to avoid — so the exact half must also run without materializing
values. This module does that with the classic dictionary-predicate
rewrite of column stores (Abadi et al., SIGMOD'06 §5.2, public
literature): evaluate each predicate leaf ONCE per dictionary entry
(|dictionary| comparisons, thousands of times smaller than the rows),
then gather the per-row verdict through the chunk's integer codes —
``verdict_table[codes]`` — a single vectorized numpy take.

SQL three-valued logic is kept exact. Verdicts are int8 with

    FALSE = 0,  UNKNOWN = 1,  TRUE = 2

so Kleene composition is pure arithmetic: ``AND = np.minimum``,
``OR = np.maximum``, ``NOT = 2 - x``. That preserves the semantics the
row-level recheck (predicate.to_spark) has: ``NOT (x > 5)`` over a NULL
``x`` is NULL — the row is excluded from a WHERE — which a naive
boolean-with-null-as-false evaluation would wrongly include. Each
column's verdict table carries one trailing sentinel slot for the null
code (engine/encoded_agg._codes_and_dict stores nulls as code
``len(dictionary)``), holding UNKNOWN for comparisons, TRUE/FALSE for
IS NULL / IS NOT NULL.

Literal coercion mirrors the Spark recheck's implicit casts: int
literals compare against integer dictionaries in int64, float literals
promote numeric/decimal dictionaries to float64, and anything outside
the fast lanes falls back to exact Python-object comparison — over the
DICTIONARY only, never per row, so the no-per-row-Python mandate holds
(Python's numeric tower makes int/float/Decimal comparisons and set
membership exact across types).
"""

from __future__ import annotations

import operator
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import typemap
from .predicate import (
    And,
    Cmp,
    IsIn,
    IsNull,
    Not,
    NotNull,
    Or,
    Pred,
    Prefix,
    Rlike,
    Substr,
)

K_FALSE, K_UNKNOWN, K_TRUE = 0, 1, 2

_PC_CMP = {
    "gt": pc.greater,
    "ge": pc.greater_equal,
    "lt": pc.less,
    "le": pc.less_equal,
    "eq": pc.equal,
    "ne": pc.not_equal,
}
_PY_CMP = {
    "gt": operator.gt,
    "ge": operator.ge,
    "lt": operator.lt,
    "le": operator.le,
    "eq": operator.eq,
    "ne": operator.ne,
}

_NUMERIC = typemap.INT_DTYPES | typemap.FLOAT_DTYPES


def _is_plain_int(v) -> bool:
    return isinstance(v, (int, np.integer)) and not isinstance(v, (bool, np.bool_))


def _is_plain_num(v) -> bool:
    return _is_plain_int(v) or isinstance(v, (float, np.floating))


def _dict_cmp(op: str, dict_arr: pa.Array, dtype: str, v) -> np.ndarray:
    """Boolean per dictionary entry for ``entry <op> v``. Fast Arrow lanes
    for the common (dtype, literal) pairings; exact Python-object
    comparison otherwise — still dictionary-scale."""
    if dtype in typemap.INT_DTYPES and _is_plain_int(v):
        a, s = dict_arr.cast(pa.int64()), pa.scalar(int(v), pa.int64())
    elif dtype in _NUMERIC and _is_plain_num(v):
        # int/float column vs float literal: promote to float64 —
        # Catalyst's common type (the same precision loss Spark has)
        a, s = dict_arr.cast(pa.float64()), pa.scalar(float(v), pa.float64())
    elif typemap.is_decimal(dtype) and isinstance(v, (float, np.floating)):
        # decimal column vs FLOAT literal: Catalyst promotes both to
        # double; decimal vs INT literal stays exact (decimal common
        # type) and must take the object path below
        a, s = dict_arr.cast(pa.float64()), pa.scalar(float(v), pa.float64())
    elif dtype == "string" and isinstance(v, str):
        a, s = dict_arr, pa.scalar(v, pa.string())
    elif dtype == "boolean" and isinstance(v, (bool, np.bool_)):
        a, s = dict_arr.cast(pa.int8()), pa.scalar(int(v), pa.int8())
    else:
        fn = _PY_CMP[op]
        return np.fromiter(
            (bool(fn(x, v)) for x in dict_arr.to_pylist()),
            dtype=bool,
            count=len(dict_arr),
        )
    return (
        _PC_CMP[op](a, s).to_numpy(zero_copy_only=False).astype(bool, copy=False)
    )


def leaf_verdicts(pred: Pred, dict_arr: pa.Array, dtype: str) -> np.ndarray:
    """int8 Kleene verdict per dictionary entry, plus ONE trailing slot
    for the null sentinel code (index len(dict_arr))."""
    n = len(dict_arr)
    out = np.empty(n + 1, dtype=np.int8)
    if isinstance(pred, IsNull):
        out[:n] = K_FALSE
        out[n] = K_TRUE
        return out
    if isinstance(pred, NotNull):
        out[:n] = K_TRUE
        out[n] = K_FALSE
        return out
    out[n] = K_UNKNOWN  # a NULL operand makes every comparison UNKNOWN
    if isinstance(pred, Cmp):
        b = _dict_cmp(pred.op, dict_arr, dtype, pred.value)
        out[:n] = np.where(b, K_TRUE, K_FALSE)
        return out
    if isinstance(pred, Prefix):
        if dtype != "string":
            raise TypeError(
                f"P.startswith over non-string column ({dtype}) — the"
                " row-level recheck (Column.startswith) rejects it too"
            )
        b = (
            pc.starts_with(dict_arr, pattern=pred.value)
            .to_numpy(zero_copy_only=False)
            .astype(bool, copy=False)
        )
        out[:n] = np.where(b, K_TRUE, K_FALSE)
        return out
    if isinstance(pred, Substr):
        if dtype != "string":
            raise TypeError(
                f"P.{pred.op} over non-string column ({dtype}) — the"
                " row-level recheck rejects it too"
            )
        fn = pc.match_substring if pred.op == "contains" else pc.ends_with
        b = (
            fn(dict_arr, pattern=pred.value)
            .to_numpy(zero_copy_only=False)
            .astype(bool, copy=False)
        )
        out[:n] = np.where(b, K_TRUE, K_FALSE)
        return out
    if isinstance(pred, Rlike):
        if dtype != "string":
            raise TypeError(
                f"P.rlike over non-string column ({dtype}) — the"
                " row-level recheck (Column.rlike) rejects it too"
            )
        # one unanchored search per DICTIONARY entry (Python re — the
        # portable-subset contract is on the Rlike dataclass), gathered
        # through the codes like every other leaf; |dictionary| regex
        # evaluations, never |rows|
        rx = re.compile(pred.pattern)
        vals = dict_arr.to_pylist()
        for i, x in enumerate(vals):
            out[i] = K_TRUE if rx.search(x) else K_FALSE
        return out
    if isinstance(pred, IsIn):
        # Python-set membership over the dictionary: the numeric tower
        # hashes int/float/Decimal of equal value identically, so the set
        # is exact across mixed numeric literals. x IN (..., NULL) is
        # UNKNOWN (not FALSE) when x matches no non-null element.
        non_null = {v for v in pred.values if v is not None}
        has_null_item = any(v is None for v in pred.values)
        miss = K_UNKNOWN if has_null_item else K_FALSE
        vals = dict_arr.to_pylist()
        for i, x in enumerate(vals):
            out[i] = K_TRUE if x in non_null else miss
        return out
    raise TypeError(f"not a leaf predicate: {pred!r}")


def row_verdict(
    pred: Pred, env: dict[str, tuple[np.ndarray, pa.Array, str]]
) -> np.ndarray:
    """int8 Kleene verdict per ROW of the chunk. ``env`` maps each
    referenced column to (codes with null sentinel == len(dict),
    dictionary array, dtype) — encoded_agg._codes_and_dict's shape."""
    if isinstance(pred, And):
        return np.minimum(row_verdict(pred.left, env), row_verdict(pred.right, env))
    if isinstance(pred, Or):
        return np.maximum(row_verdict(pred.left, env), row_verdict(pred.right, env))
    if isinstance(pred, Not):
        return (2 - row_verdict(pred.child, env)).astype(np.int8)
    codes, dict_arr, dtype = env[pred.column]
    return leaf_verdicts(pred, dict_arr, dtype)[codes]


def row_mask(
    pred: Pred, env: dict[str, tuple[np.ndarray, pa.Array, str]]
) -> np.ndarray:
    """Boolean keep-mask per row: WHERE keeps exactly the TRUE rows
    (UNKNOWN excluded, SQL semantics)."""
    return row_verdict(pred, env) == K_TRUE
