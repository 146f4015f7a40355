"""Schema/statistics inference by scanning data — O21.

The reference infers a schema by one pass over all examples, tracking
per-field type consistency and occurrence counts, then classifying each
field required/optional/repeated from (min_count, max_count)
(parquet-tensorflow ExampleScanner.java:23-89, decision at :77-87,
tested ExampleScannerTest.scala:40-108).

Spark-natively this is a single aggregation pass (JVM-side, one shuffle-
free partial-agg + one exchange) producing one row per column — the same
facts the codec auto-selector uses, exposed as a queryable operator. All
expressions are ANSI-SQL-expressible so the DuckDB oracle can verify
them (driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, n_distinct,
    min_val, max_val, avg_len) — the inference scan's facts, exactly
    count-distinct so the oracle can reproduce them."""
    cols = columns or [c for c, t in df.dtypes if not t.startswith("array")]
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            F.avg(F.length(F.col(c).cast("string"))).alias(f"__len_{c}"),
        ]
    row = df.agg(*aggs)
    # unpivot to long form with one select per column, unioned — the plan
    # stays one aggregation + constant-folding projections
    parts = []
    for c in cols:
        parts.append(
            row.select(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
                F.round(F.col(f"__len_{c}"), 4).cast("double").alias("avg_len"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def infer_repetition(df: DataFrame) -> DataFrame:
    """Classify each column required/optional/repeated from data — the
    ExampleScanner.java:77-87 rule mapped to DataFrames:
    array column -> repeated; null_count == 0 -> required; else optional."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        for c in df.columns
    ]
    row = df.agg(*aggs)
    parts = []
    for c, t in df.dtypes:
        rep = (
            F.when(F.lit(t.startswith("array")), F.lit("repeated"))
            .when(F.col(f"__nulls_{c}") == 0, F.lit("required"))
            .otherwise(F.lit("optional"))
        )
        parts.append(
            row.select(
                F.lit(c).alias("column"),
                F.lit(t).alias("dtype"),
                rep.alias("repetition"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
