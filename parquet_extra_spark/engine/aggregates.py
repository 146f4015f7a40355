"""Metadata-only aggregates: count / null_count / min / max answered
from chunk statistics WITHOUT decoding any payload.

This is the chunk-table analogue of parquet-mr's footer-statistics
aggregate pushdown (the machinery the reference inherits for its column
statistics; its scanner derives the same per-field facts by scanning
data, ExampleScanner.java:23-89 — here they are already persisted per
chunk, so the scan is over metadata rows only). At 100 TB a
``SELECT min(x), max(x), count(*)`` becomes an aggregation over
~table_bytes/chunk_bytes tiny metadata rows instead of a full decode —
the chunk table is the only input, and Catalyst pushes the column-name
filter into its scan.

Exactness contract (mirrors engine/stats.py storage rules):

* ``n_values`` / ``null_count`` — always exact (stored per chunk).
* numeric / decimal / date / timestamp / boolean min & max — exact,
  UNLESS a chunk stored a NULL bound while holding non-null values
  (floats with NaN/inf bounds are stored unbounded; stats.py:94-95).
* string min — stored possibly truncated to a 64-char prefix: the
  global minimum is exact iff the winning stored minimum is shorter
  than the truncation bound (a truncated stored min is only a lower
  bound of its chunk's true min).
* string max — never stored truncated (a max that would need truncation
  is stored NULL = unbounded), so the global max is exact iff no
  non-all-null chunk stored a NULL max.

``exact_min`` / ``exact_max`` report this per column; a consumer needing
exactness where the flag is false falls back to ``decode`` + a real
aggregate over just that column's chunks (still a single-column decode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..codecs import typemap
from .decoder import discover_schema
from .stats import _STR_TRUNC


def _class_flags(dtype: Column):
    is_int = dtype.isin([*typemap.INT_DTYPES]) | (dtype == "boolean")
    is_float = dtype.isin([*typemap.FLOAT_DTYPES])
    is_dec = dtype.startswith("decimal")
    return is_int, is_float, is_dec


def metadata_profile(
    chunks: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """One row per column, computed purely from chunk metadata:
    (column, dtype, n_chunks, n_values, null_count, min_val, max_val,
    exact_min, exact_max). min_val/max_val are the stored canonical
    strings (str() of the value; booleans "0"/"1"); ``dtype`` tells the
    consumer how to cast them back.

    The global min/max are selected with min_by/max_by over a TYPED
    ordering key per dtype class (bigint for ints, double for floats,
    decimal(38,18) for decimals, lexical for strings/dates/timestamps —
    canonical ISO strings order chronologically), so "9" < "10" style
    lexical traps cannot corrupt numeric results while the reported
    value stays the exact stored string.
    """
    if columns is not None:
        known = {c for c, _, _ in discover_schema(chunks)}
        unknown = [c for c in columns if c not in known]
        if unknown:
            raise ValueError(f"unknown columns: {unknown}")
        chunks = chunks.filter(F.col("column").isin(columns))

    dt = F.col("dtype")
    is_int, is_float, is_dec = _class_flags(dt)
    mn, mx = F.col("min_val"), F.col("max_val")

    def typed_pick(agg_by, value, flag, cast_to):
        return agg_by(value, F.when(flag, value.cast(cast_to)))

    # a NULL bound on a chunk that HAS non-null values means "unbounded"
    # (NaN/inf floats, truncated string max) — it poisons the global
    # bound; a NULL bound on an all-null chunk is vacuous
    has_values = F.col("null_count") < F.col("n_values")
    unbounded_min = F.sum(
        F.when(mn.isNull() & has_values, 1).otherwise(0)
    ) == 0
    unbounded_max = F.sum(
        F.when(mx.isNull() & has_values, 1).otherwise(0)
    ) == 0

    out = (
        chunks.groupBy("column", "dtype")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_values").cast("long").alias("n_values"),
            F.sum("null_count").cast("long").alias("null_count"),
            F.coalesce(
                typed_pick(F.min_by, mn, is_int, "bigint"),
                typed_pick(F.min_by, mn, is_float, "double"),
                typed_pick(F.min_by, mn, is_dec, "decimal(38,18)"),
                F.min(F.when(~(is_int | is_float | is_dec), mn)),
            ).alias("min_val"),
            F.coalesce(
                typed_pick(F.max_by, mx, is_int, "bigint"),
                typed_pick(F.max_by, mx, is_float, "double"),
                typed_pick(F.max_by, mx, is_dec, "decimal(38,18)"),
                F.max(F.when(~(is_int | is_float | is_dec), mx)),
            ).alias("max_val"),
            unbounded_min.alias("__mn_bounded"),
            unbounded_max.alias("__mx_bounded"),
        )
        .select(
            "column",
            "dtype",
            "n_chunks",
            "n_values",
            "null_count",
            "min_val",
            "max_val",
            (
                F.col("__mn_bounded")
                & ~(
                    dt.isin([*typemap.STRLIKE_DTYPES])
                    # NULL min (all-null column) is exact; coalesce keeps
                    # length(NULL) from poisoning the flag
                    & F.coalesce(F.length("min_val") >= _STR_TRUNC, F.lit(False))
                )
            ).alias("exact_min"),
            F.col("__mx_bounded").alias("exact_max"),
        )
    )
    return out
