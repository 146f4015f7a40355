"""Iceberg source adapter.

The north_rule's corpus lives in Iceberg tables ("over Iceberg tables of
source-code repositories"). On a cluster with the Iceberg Spark runtime
on the classpath, `read_corpus` resolves a catalog table (`spark.table`)
— Iceberg's DataSourceV2 gives Spark the same pushdown/pruning surface
the engine relies on for parquet, plus snapshot time travel, which we
expose for reproducible encode runs (encode exactly the snapshot a
manifest was built from).

This sandbox has no Iceberg runtime, so the adapter degrades to plain
parquet directories transparently; everything downstream (encode,
checkpoint, resume) is source-agnostic DataFrame-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def iceberg_available(spark: SparkSession) -> bool:
    """True if the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:
        return False


def read_corpus(
    spark: SparkSession,
    table_or_path: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Load the source-code corpus from an Iceberg table (catalog name
    like `lake.code.files`) or a parquet path (fallback).

    snapshot_id / as_of_timestamp_ms pin an Iceberg snapshot so a resumed
    encode run reads exactly the data its manifest describes — the
    table-format analogue of the chunk manifest's run_id lineage.
    """
    if "/" not in table_or_path and iceberg_available(spark):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
        df = reader.format("iceberg").load(table_or_path)
    else:
        if snapshot_id is not None or as_of_timestamp_ms is not None:
            raise ValueError(
                "snapshot pinning requires an Iceberg table (no Iceberg "
                "runtime on this classpath, or a plain path was given)"
            )
        df = spark.read.parquet(table_or_path)
    if columns:
        df = df.select(*columns)  # pushed into the scan by Catalyst
    return df
