"""unit_sort=True: the opt-in ingest sort that makes range pushdown
selective on unordered input.

By default encode() cuts chunks in arrival order and only sorts values
columnar INSIDE each chunk (RLE), so on shuffled input every chunk of a
unit spans the unit's full value range and range pruning keeps
everything. unit_sort=True adds one JVM sortWithinPartitions on
(bucket, salt, *keys) so consecutive chunks of a unit tile the key
space with disjoint [min,max] ranges — the layout the reference's
predicate pushdown presumes parquet-mr's sorted row groups provide
(Predicate.scala:47-183 over parquet column statistics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes


@pytest.fixture(scope="module")
def shuffled(spark):
    # values deliberately de-correlated from row order
    return (
        spark.range(4000)
        .select(
            F.col("id").alias("row"),
            F.pmod(F.col("id") * F.lit(2654435761), F.lit(4000)).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
    )


def _ranges_by_unit(chunks, column):
    rows = (
        chunks.filter(F.col("column") == column)
        .select("part_key", "salt", "seq", "min_val", "max_val")
        .collect()
    )
    by_unit: dict = {}
    for r in rows:
        by_unit.setdefault((r["part_key"], r["salt"]), []).append(
            (int(r["min_val"]), int(r["max_val"]))
        )
    return by_unit


def test_unit_sort_tiles_ranges_disjointly(spark, shuffled):
    chunks = pes.encode(
        shuffled, sort_cols=["k"], chunk_rows=256,
        n_buckets=2, n_salts=2, num_partitions=4, unit_sort=True,
    ).cache()
    by_unit = _ranges_by_unit(chunks, "k")
    assert sum(len(v) for v in by_unit.values()) > 8  # multiple chunks/unit
    for ranges in by_unit.values():
        ranges.sort()
        for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
            assert hi_prev <= lo_next, "unit chunks must tile disjointly"
    # range pushdown now skips most chunks
    st = pes.pushdown_stats(chunks, "k", 0, 99)
    assert st["chunks_skipped"] > st["chunks_kept"]
    # and the decode is still exactly right
    out = pes.filter_decode(chunks, "k", lower=0, upper=99)
    expect = shuffled.filter(F.col("k") <= 99)
    assert pes.roundtrip_ok(expect, out)
    chunks.unpersist()


def test_default_streaming_mode_documents_the_tradeoff(spark, shuffled):
    """Without unit_sort, shuffled input yields full-range chunks: stats
    stay CORRECT (decode exact) but range pruning is unselective — the
    documented throughput-vs-pruning tradeoff."""
    chunks = pes.encode(
        shuffled, sort_cols=["k"], chunk_rows=256,
        n_buckets=2, n_salts=2, num_partitions=4,
    ).cache()
    st = pes.pushdown_stats(chunks, "k", 0, 99)
    assert st["chunks_skipped"] == 0  # arrival-order chunks span the range
    out = pes.filter_decode(chunks, "k", lower=0, upper=99)
    expect = shuffled.filter(F.col("k") <= 99)
    assert pes.roundtrip_ok(expect, out)  # correctness is unaffected
    chunks.unpersist()


def test_unit_sort_roundtrip_unchanged(spark, shuffled):
    chunks = pes.encode(
        shuffled, sort_cols=["k"], chunk_rows=256,
        n_buckets=2, n_salts=2, num_partitions=4, unit_sort=True,
    )
    assert pes.roundtrip_ok(shuffled, pes.decode(chunks))
