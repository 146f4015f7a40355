"""Round-trip verification — the engine's core correctness oracle.

The reference's central test property is write→read→equality
(ParquetExampleTest.scala:51-55 roundTrip, :178-180 primitives); the
north_rule sharpens it to per-row sha256 equality of content.

Comparison is an order-insensitive **multiset equality**: every row gets
a sha256 fingerprint over a canonical string form of its columns; the two
sides match iff every fingerprint occurs the same number of times in
both. This needs no key assumption (real tables have duplicate business
keys) and is exactly as strong as row-level equality up to ordering.
Everything is JVM-side (sha2 / groupBy / join) — no Python in the
comparison path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _row_fingerprint(df: DataFrame, cols: list[str]):
    """sha256 over a canonical string form of the given columns."""
    parts = [
        F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("\x00<null>")) for c in cols
    ]
    return F.sha2(F.concat_ws("\x1f", *parts), 256)


def verify_roundtrip(
    src: DataFrame,
    decoded: DataFrame,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """-> one-row DataFrame (n_src, n_decoded, n_matched, n_mismatched).

    Multiset comparison over (key_cols + value_cols); both default to all
    columns present on both sides. A perfect round trip has
    n_src == n_decoded == n_matched and n_mismatched == 0.
    """
    cols = list(key_cols or []) + list(
        value_cols
        if value_cols is not None
        else [c for c in src.columns if c in decoded.columns and c not in (key_cols or [])]
    )
    s = (
        src.select(_row_fingerprint(src, cols).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_s"))
    )
    d = (
        decoded.select(_row_fingerprint(decoded, cols).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_d"))
    )
    j = s.join(d, "fp", "full_outer").select(
        F.coalesce("n_s", F.lit(0)).alias("n_s"),
        F.coalesce("n_d", F.lit(0)).alias("n_d"),
    )
    return j.agg(
        F.sum("n_s").alias("n_src"),
        F.sum("n_d").alias("n_decoded"),
        F.sum(F.least("n_s", "n_d")).alias("n_matched"),
        F.sum(F.abs(F.col("n_s") - F.col("n_d"))).alias("n_mismatched"),
    )


def roundtrip_ok(
    src: DataFrame,
    decoded: DataFrame,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
) -> bool:
    row = verify_roundtrip(src, decoded, key_cols, value_cols).collect()[0]
    return (
        row["n_src"] == row["n_decoded"]
        and row["n_matched"] == row["n_src"]
        and (row["n_mismatched"] or 0) == 0
    )
