"""Projection over encoded data — a *filter on the chunk table*.

Reference semantics O19/O20 (parquet-tensorflow
ExampleReadSupport.java:33-53 by-schema, :76-90 by-field-list with
fail-fast on unknown names). On the chunk table, column pruning is
literally `WHERE column IN (...)` — the payloads of unrequested columns
are never decoded (only their stats rows were ever scanned), which is
the columnar projection trick the whole chunk layout exists for.

For plain DataFrames, projection is `df.select(...)` and Catalyst's
ColumnPruning/SchemaPruning already push it into the Parquet scan
(reference Projection.scala:29-84 is built into Spark) — helpers here
exist for API parity and for the chunk-table path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decoder import discover_schema


def project_chunks(chunks: DataFrame, columns: list[str]) -> DataFrame:
    """Chunk rows restricted to the requested columns; unknown names raise
    (ExampleReadSupport.java:88 contract, tested ParquetExampleTest.scala:328-338)."""
    known = {c for c, _, _ in discover_schema(chunks)}
    unknown = [c for c in columns if c not in known]
    if unknown:
        raise ValueError(f"projection references unknown columns: {unknown}")
    return chunks.filter(F.col("column").isin(list(columns)))


def project(df: DataFrame, *fields: str) -> DataFrame:
    """Runtime projection by field names incl. dotted nested paths
    (Projection.scala:29-51, dotted-path handling :58-72). Unknown names
    raise AnalysisException from the analyzer — same fail-fast contract."""
    return df.select(*[F.col(f).alias(f.replace(".", "_")) if "." in f else F.col(f) for f in fields])
