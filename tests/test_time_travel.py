"""Snapshot (as_of) and incremental (after) reads over the checkpoint
manifest: the append-only committed_at column is a consistent ingest
frontier, so time travel and exactly-once incremental consumption are
metadata-only filters."""

import parquet_extra_spark as pes
from pyspark.sql import functions as F


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "k bigint, v string"
    )


def test_as_of_and_after_reads(spark, tmp_path):
    out = str(tmp_path / "enc")
    kw = dict(partition_cols=["v"], chunk_rows=64, n_buckets=2, n_salts=1)
    pes.encode_to(_mk(spark, 0, 100), out, dataset_id="b1", **kw)
    t1 = (
        pes.load_manifest(spark, out)
        .agg(F.max("committed_at").alias("t"))
        .collect()[0]["t"]
    )
    pes.encode_to(_mk(spark, 100, 150), out, dataset_id="b2", **kw)

    full = pes.read_chunks(spark, out)
    snap = pes.read_chunks(spark, out, as_of=t1)
    inc = pes.read_chunks(spark, out, after=t1)

    def ks(chunks):
        return sorted(r["k"] for r in pes.decode(chunks).select("k").collect())

    assert ks(full) == list(range(150))
    assert ks(snap) == list(range(100))      # time travel: batch 2 invisible
    assert ks(inc) == list(range(100, 150))  # incremental: batch 1 consumed
    # decode_checkpoint passes the filters through
    assert (
        sorted(
            r["k"]
            for r in pes.decode_checkpoint(spark, out, as_of=t1).select("k").collect()
        )
        == list(range(100))
    )


def test_after_frontier_is_exactly_once(spark, tmp_path):
    """A consumer that remembers max(committed_at) sees every unit exactly
    once across successive incremental reads."""
    out = str(tmp_path / "enc")
    kw = dict(chunk_rows=64, n_buckets=1, n_salts=1)
    frontier = 0.0
    seen: list[int] = []
    for lo, hi in [(0, 40), (40, 90), (90, 130)]:
        pes.encode_to(_mk(spark, lo, hi), out, dataset_id=f"b{lo}", **kw)
        batch = pes.read_chunks(spark, out, after=frontier)
        seen += [r["k"] for r in pes.decode(batch).select("k").collect()]
        frontier = (
            pes.load_manifest(spark, out)
            .agg(F.max("committed_at").alias("t"))
            .collect()[0]["t"]
        )
    assert sorted(seen) == list(range(130))


def test_incremental_encoded_rollup(spark, tmp_path):
    """Compute-over-compressed composes with incremental reads: a
    consumer maintains a running GROUP BY by applying group_sum_encoded
    to each after=frontier increment — new runs aggregate from their
    dictionary codes, already-consumed runs are never re-read, and no
    batch ever decodes the value column's rows."""
    from pyspark.sql import functions as F

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i, f"g{i % 3}", i * 10) for i in range(lo, hi)],
            "k bigint, g string, v bigint",
        )

    out = str(tmp_path / "enc")
    kw = dict(chunk_rows=32, n_buckets=1, n_salts=1)
    frontier = 0.0
    rollup: dict = {}
    for lo, hi in [(0, 50), (50, 80), (80, 130)]:
        pes.encode_to(mk(lo, hi), out, dataset_id=f"b{lo}", **kw)
        inc = pes.read_chunks(spark, out, after=frontier)
        for r in pes.group_sum_encoded(inc, "g", "v").collect():
            rollup[r["key"]] = rollup.get(r["key"], 0) + r["s"]
        frontier = (
            pes.load_manifest(spark, out)
            .agg(F.max("committed_at").alias("t"))
            .collect()[0]["t"]
        )
    want = {
        r["g"]: r["s"]
        for r in mk(0, 130).groupBy("g").agg(F.sum("v").alias("s")).collect()
    }
    assert rollup == want
