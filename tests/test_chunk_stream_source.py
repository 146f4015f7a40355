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


def test_stream_starts_before_first_commit(registered, spark, tmp_path):
    """A stream on a FRESH checkpoint dir (no manifest yet) idles at the
    empty offset instead of failing, then consumes the first commit."""
    out = str(tmp_path / "fresh")
    os.makedirs(out)
    ckpt, sink = str(tmp_path / "c2"), str(tmp_path / "sink2")
    q = (
        registered.readStream.format("chunktable")
        .schema("k bigint, g string, v string")
        .load(out)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    pes.encode_to(
        _mk(spark, 0, 20), out, partition_cols=["g"], chunk_rows=16,
        n_buckets=2, n_salts=1,
    )
    assert _run_stream(spark, out, ckpt, sink) == list(range(20))


def test_stream_offsets_are_order_independent(registered, spark, tmp_path):
    """A run whose manifest row becomes visible with a committed_at BELOW
    the already-consumed maximum (concurrent writer / clock skew) must
    still be consumed exactly once: offsets are the SET of committed
    run_ids, not a wall-clock frontier."""
    import pyarrow.parquet as pq

    spark_ = registered
    out = str(tmp_path / "enc")
    ckpt, sink = str(tmp_path / "c3"), str(tmp_path / "sink3")
    kw = dict(partition_cols=["g"], chunk_rows=64, n_buckets=2, n_salts=1)
    pes.encode_to(_mk(spark_, 0, 30), out, dataset_id="b0", **kw)
    assert _run_stream(spark_, out, ckpt, sink) == list(range(30))

    # commit a second run, then BACKDATE its committed_at to 0.0 — under a
    # frontier offset this run would be skipped forever
    before = set(os.listdir(os.path.join(out, "manifest")))
    pes.encode_to(_mk(spark_, 30, 50), out, dataset_id="b1", **kw)
    new_files = [
        f
        for f in set(os.listdir(os.path.join(out, "manifest"))) - before
        if f.endswith(".parquet")
    ]
    for f in new_files:
        p = os.path.join(out, "manifest", f)
        t = pq.read_table(p)
        idx = t.schema.get_field_index("committed_at")
        import pyarrow as pa

        t = t.set_column(
            idx, "committed_at", pa.array([0.0] * t.num_rows, pa.float64())
        )
        pq.write_table(t, p)
    assert _run_stream(spark_, out, ckpt, sink) == list(range(50))


def _backdate_runs(out, files, t=0.0):
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in files:
        p = os.path.join(out, "manifest", f)
        tbl = pq.read_table(p)
        idx = tbl.schema.get_field_index("committed_at")
        tbl = tbl.set_column(
            idx, "committed_at", pa.array([t] * tbl.num_rows, pa.float64())
        )
        pq.write_table(tbl, p)


def test_stream_offset_slack_compaction(registered, spark, tmp_path):
    """.option("offset_compact_slack", s): the offset compacts to
    {frontier, runs-newer-than-frontier} — bounded state — while runs
    within the slack window stay exactly-once. A run surfacing with
    committed_at already below the frontier is skipped (the documented
    watermark trade); a strict pure-set checkpoint still consumes it."""
    from parquet_extra_spark.engine.schema import from_struct
    from parquet_extra_spark.sources.chunk_datasource import (
        ChunkTableStreamReader,
    )

    out = str(tmp_path / "enc")
    kw = dict(partition_cols=["g"], chunk_rows=64, n_buckets=2, n_salts=1)
    mdir = os.path.join(out, "manifest")
    pes.encode_to(_mk(spark, 0, 30), out, dataset_id="b0", **kw)
    pes.encode_to(_mk(spark, 30, 50), out, dataset_id="b1", **kw)
    after_two = set(os.listdir(mdir))
    pes.encode_to(_mk(spark, 50, 60), out, dataset_id="b2", **kw)
    third_files = [
        f
        for f in set(os.listdir(mdir)) - after_two
        if f.endswith(".parquet")
    ]
    cols = from_struct(_mk(spark, 0, 1).schema)

    r = ChunkTableStreamReader(out, cols, offset_slack=3600.0)
    times = r._runs_times()
    by_time = [rid for rid, _ in sorted(times.items(), key=lambda kv: kv[1])]
    first_two, third_id = by_time[:2], by_time[2]
    # a checkpointed compacted offset from when only b0+b1 were consumed
    off_a = {"frontier": max(times.values()) - 3600.0, "runs": sorted(first_two)}
    # first batch from scratch consumes everything
    files = [p.path for p in r.partitions(r.initialOffset(), r.latestOffset())]
    assert files and all(os.path.isfile(f) for f in files)

    # b2's manifest row is backdated BELOW the frontier (late-visible,
    # stalled writer): under slack it counts as implicitly consumed —
    # skipped, the documented watermark bound — and the offset stays
    # bounded (only runs newer than the frontier are listed)
    _backdate_runs(out, third_files, t=0.0)
    off_b = r.latestOffset()
    assert "frontier" in off_b and sorted(off_b["runs"]) == sorted(first_two)
    assert r.partitions(off_a, off_b) == []

    # a STRICT pure-set checkpoint (the default form) still consumes the
    # backdated run exactly once — order independence is only traded
    # where the user opted into slack compaction
    strict = ChunkTableStreamReader(out, cols)
    off_strict = {"runs": sorted(first_two)}
    new = [p.path for p in strict.partitions(off_strict, strict.latestOffset())]
    assert new and all(f"run_id={third_id}" in f for f in new)

    # invalid slack rejected
    with pytest.raises(ValueError):
        ChunkTableStreamReader(out, cols, offset_slack=0.0)
