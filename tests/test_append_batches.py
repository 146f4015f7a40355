"""Regression: appending a SECOND batch into a checkpoint directory must
not lose rows that hash into work units an earlier batch committed.

Before dataset_id existed, encode_to's resume anti-join treated any
committed (part_key, salt) unit as "done", so a later batch's rows
landing in the same units were silently dropped — a data-loss bug for
any multi-batch streaming ingest. Unit identity is now
(dataset_id, part_key, salt)."""

import parquet_extra_spark as pes
from parquet_extra_spark.streaming.encode_stream import (
    encode_stream,
    stream_from_directory,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"grp{i % 3}", f"v{i}") for i in range(lo, hi)],
        "k bigint, g string, v string",
    )


def test_second_batch_same_units_not_dropped(spark, tmp_path):
    out = str(tmp_path / "enc")
    kw = dict(partition_cols=["g"], chunk_rows=64, n_buckets=2, n_salts=1)
    # both batches share the same 3 g-groups -> identical (part_key, salt)
    # unit keys by construction
    pes.encode_to(_mk(spark, 0, 60), out, dataset_id="batch0", **kw)
    pes.encode_to(_mk(spark, 60, 120), out, dataset_id="batch1", **kw)
    got = sorted(
        r["k"] for r in pes.decode(pes.read_chunks(spark, out)).select("k").collect()
    )
    assert got == list(range(120))


def test_same_dataset_replay_still_resumes(spark, tmp_path):
    """The original contract is unchanged within one dataset: re-running
    the same dataset_id skips committed units (no duplicates)."""
    out = str(tmp_path / "enc")
    kw = dict(partition_cols=["g"], chunk_rows=64, n_buckets=2, n_salts=1)
    df = _mk(spark, 0, 60)
    pes.encode_to(df, out, dataset_id="batch0", **kw)
    before = pes.read_chunks(spark, out).count()
    pes.encode_to(df, out, dataset_id="batch0", **kw)  # replay
    assert pes.read_chunks(spark, out).count() == before
    got = sorted(
        r["k"] for r in pes.decode(pes.read_chunks(spark, out)).select("k").collect()
    )
    assert got == list(range(60))


def test_streaming_two_microbatches_keep_all_rows(spark, tmp_path):
    """encode_stream over a landing dir that receives a second shard after
    the first pass: the second micro-batch's rows survive even though they
    hash into units micro-batch 0 committed."""
    in_dir = str(tmp_path / "landing")
    out = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, g string, v string"
    kw = dict(partition_cols=["g"], chunk_rows=64, n_buckets=2, n_salts=1)

    _mk(spark, 0, 60).write.mode("overwrite").parquet(in_dir)
    q = encode_stream(stream_from_directory(spark, in_dir, schema), out, ckpt, **kw)
    q.awaitTermination(120)

    _mk(spark, 60, 120).write.mode("append").parquet(in_dir)
    q2 = encode_stream(stream_from_directory(spark, in_dir, schema), out, ckpt, **kw)
    q2.awaitTermination(120)

    got = sorted(
        r["k"] for r in pes.decode(pes.read_chunks(spark, out)).select("k").collect()
    )
    assert got == list(range(120))
