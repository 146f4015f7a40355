"""Structured-streaming columnar encode.

The batch engine composes with Structured Streaming through
``foreachBatch``: each micro-batch runs the exact batch ``encode_to``
(checkpointed, manifest-committed), so streaming ingestion inherits the
same exactly-once resume semantics — the manifest is the commit point for
work units, and Spark's streaming checkpoint is the commit point for
source offsets. A replayed micro-batch (after a crash between the two
commits) re-encodes only units the manifest doesn't already have.

The reference has no streaming surface (its distributed path is Hadoop MR
formats, ExampleParquetInputFormat.java:10-31); this is the Spark-native
extension mandated by the continuous-ingest reality of a 10^12-file
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..engine.checkpoint import encode_to


def stream_from_directory(
    spark: SparkSession, in_dir: str, schema: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over a landing directory (the standard pattern
    for continuously arriving corpus shards)."""
    reader = spark.readStream.schema(schema)
    return reader.parquet(in_dir) if fmt == "parquet" else reader.format(fmt).load(in_dir)


def encode_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    **encode_kwargs,
) -> StreamingQuery:
    """Start (and with trigger_once=True, run to completion) a streaming
    encode into ``out_dir``. Each micro-batch is its own DATASET
    (dataset_id = batch id), so lineage records which micro-batch
    produced each unit AND a later batch whose rows hash into units an
    earlier batch already committed is encoded normally instead of being
    skipped by the resume anti-join (unit identity is per-dataset; see
    encode_to). A replayed batch — crash between the manifest commit and
    Spark's offset commit — resumes its own dataset exactly: committed
    units skip, incomplete units re-encode under a fresh physical run_id
    so any orphan chunk files from the crashed attempt stay invisible."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_to(batch_df, out_dir, dataset_id=f"stream{batch_id:08d}", **encode_kwargs)

    writer = (
        stream_df.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
