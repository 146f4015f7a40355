"""Streaming read of a checkpoint directory via the chunktable data
source: the manifest frontier is the offset, so each committed ingest
run is consumed exactly once across micro-batches and restarts."""

import os

import pytest

import parquet_extra_spark as pes
from parquet_extra_spark.sources import ChunkTableDataSource


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"g{i % 3}", f"v{i}") for i in range(lo, hi)],
        "k bigint, g string, v string",
    )


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ChunkTableDataSource)
    return spark


def _run_stream(spark, src_dir, ckpt, sink_dir):
    """Run the stream to completion into a file sink (the memory sink
    cannot recover from a checkpoint); return ALL keys accumulated."""
    q = (
        spark.readStream.format("chunktable")
        .load(src_dir)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(r["k"] for r in spark.read.parquet(sink_dir).select("k").collect())


def test_stream_consumes_each_run_exactly_once(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "enc")
    ckpt = str(tmp_path / "sckpt")
    sink = str(tmp_path / "sink")
    kw = dict(partition_cols=["g"], chunk_rows=64, n_buckets=2, n_salts=1)
    pes.encode_to(_mk(spark, 0, 50), out, dataset_id="b0", **kw)
    pes.encode_to(_mk(spark, 50, 90), out, dataset_id="b1", **kw)

    assert _run_stream(spark, out, ckpt, sink) == list(range(90))

    # new ingest run after the stream's frontier: a restart from the same
    # streaming checkpoint appends ONLY the new run (no re-reads)
    pes.encode_to(_mk(spark, 90, 120), out, dataset_id="b2", **kw)
    assert _run_stream(spark, out, ckpt, sink) == list(range(120))

    # no further commits -> nothing new, nothing duplicated
    assert _run_stream(spark, out, ckpt, sink) == list(range(120))


def test_stream_requires_checkpoint_layout(registered, spark, tmp_path):
    flat = str(tmp_path / "flat")
    pes.encode(_mk(spark, 0, 10), chunk_rows=8, n_buckets=1, n_salts=1).write.parquet(flat)
    q = (
        registered.readStream.format("chunktable")
        .load(flat)
        .writeStream.format("memory")
        .queryName("sink_flat")
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        exc = q.exception()
    except Exception as e:  # surfaced directly by some Spark versions
        exc = e
    assert exc is not None and (
        "checkpoint layout" in str(exc) or "manifest" in str(exc)
    )
