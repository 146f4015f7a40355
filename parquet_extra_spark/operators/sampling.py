"""Deterministic, engine-portable sampling and split assignment.

A training-data pipeline needs train/val/test membership that is
(a) stable across reprocessing runs, (b) independent of partitioning
and row order, and (c) auditable by an external engine.  Spark's
``df.sample``/``randomSplit`` give none of these (seeded per-partition
RNG).  Here membership is a pure function of a row's id:

    bucket(id) = int(md5(id <US> salt)[:15 hex]) mod 10_000

which is bit-identical in ANSI SQL
(``('0x' || substr(md5(id || chr(31) || salt), 1, 15))::BIGINT % 10000``
in DuckDB) — the same md5 lane used by the dedup sketches
(operators/dedup.py).  100-TB notes: map-only Catalyst expressions,
no shuffle, whole-stage codegen; a split column written at ingest is a
dictionary-friendly low-cardinality string the chunk encoder stores in
~2 bits/row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "hash_sample",
    "stratified_hash_sample",
    "weighted_hash_sample",
]

_BUCKETS = 10_000
_SEP = "\x1f"  # unit separator: cannot appear in numeric ids


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from an id column.

    ``conv(substr(md5(s),1,15),16,10)`` is at most 2^60-1, so the mod
    and all arithmetic stay in exact int64 range on both engines.

    A NULL id buckets to NULL (``F.concat`` is NULL-propagating, exactly
    like the SQL oracle's ``id || chr(31) || salt``), so every
    ``bucket < bound`` sampling predicate drops NULL-id rows on BOTH
    engines; in ``hash_split`` a NULL id falls through to the terminal
    label on both engines.  Ids should be non-null in practice.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    s = F.concat(c.cast("string"), F.lit(_SEP), F.lit(salt))
    return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % _BUCKETS)


def oracle_bucket_sql(id_expr: str, salt: str = "") -> str:
    """The DuckDB expression computing the same bucket — for oracles."""
    return (
        f"(('0x' || substr(md5(cast({id_expr} as varchar) || chr(31) || "
        f"'{salt}'), 1, 15))::BIGINT % {_BUCKETS})"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by hashed id.

    ``weights`` maps label -> fraction (must sum to 1 within 1e-9);
    labels fill bucket ranges in dict insertion order, so
    ``{"train": .9, "val": .05, "test": .05}`` puts buckets [0,9000)
    in train, [9000,9500) in val, [9500,10000) in test.  Rows sharing
    an id always share a split — across runs, engines, and clusters.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    b = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, frac in labels[:-1]:
        acc += frac
        bound = int(round(acc * _BUCKETS))
        branch = F.when(b < bound, F.lit(label))
        expr = branch if expr is None else expr.when(b < bound, F.lit(label))
    last = F.lit(labels[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by hashed id.

    Samples are NESTED across fractions (a 1% sample is a subset of the
    10% sample with the same salt) — the property that makes scaling
    curves and progressive data ablations consistent.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    bound = int(round(fraction * _BUCKETS))
    return df.where(hash_bucket(id_col, salt) < bound)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight: Column | str,
    *,
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability = its weight in [0,1] — e.g. the
    quality-weighted mixing a pretraining pipeline uses (keep high-
    quality documents more often), but DETERMINISTIC: the same row keeps
    or drops identically across runs, partitionings, and engines, and
    raising a row's weight can only ever ADD it (bucket is fixed, the
    threshold moves) — monotone ablations come for free.

    ``weight`` is a column/expression producing values clamped into
    [0, 1]; the row keeps iff bucket(id) < round(weight * 10000).
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    bound = F.round(
        F.greatest(F.lit(0.0), F.least(w.cast("double"), F.lit(1.0)))
        * _BUCKETS
    )
    return df.where(hash_bucket(id_col, salt) < bound)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the "rebalance sources /
    languages in a training mix" operator.

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default``.  Membership stays a pure function of (id, salt):
    map-only, no shuffle, nested across fractions per stratum, and a
    row keeps its fate when fractions for OTHER strata change.
    """
    for v, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0,1], got {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0,1], got {default}")
    bounds = {v: int(round(f * _BUCKETS)) for v, f in fractions.items()}
    return bucket_bound_filter(
        df, id_col, strata_col, bounds,
        default_bound=int(round(default * _BUCKETS)), salt=salt,
    )


def bucket_bound_filter(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    bounds: dict[str, int],
    *,
    default_bound: int = 0,
    salt: str = "",
) -> DataFrame:
    """Shared membership application for every per-stratum sampler:
    keep a row iff ``hash_bucket(id) < bounds[stratum]`` (integer bucket
    bounds in [0, 10000]; unlisted/NULL strata get ``default_bound``).
    Callers own the bound DERIVATION — int(round(f*B)) for the sampling
    family, floor for the mixing family's SQL-oracle parity — so the
    when-chain and NULL semantics live in exactly one place."""
    b = hash_bucket(id_col, salt)
    bound = F.lit(default_bound)
    for v, k in bounds.items():
        bound = F.when(F.col(strata_col) == F.lit(v), F.lit(k)).otherwise(bound)
    return df.where(b < bound)
