"""compact_chunks: metadata-decided partial rewrite of undersized chunks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_compaction_merges_small_chunks_exactly(spark, docs):
    # fragment: tiny chunks across several units
    frag = pes.encode(docs, chunk_rows=16, n_buckets=4, n_salts=2,
                      num_partitions=8).cache()
    before = pes.compaction_stats(frag, target_rows=2048)
    assert before["chunks_small"] == before["chunks_total"] > 10

    out = pes.compact_chunks(frag, target_rows=2048, n_buckets=1,
                             n_salts=1, num_partitions=1).cache()
    after = pes.compaction_stats(out, target_rows=2048)
    assert after["chunks_total"] < before["chunks_total"] / 4
    assert after["rows_total"] == before["rows_total"]
    # the data is untouched
    assert pes.roundtrip_ok(docs, pes.decode(out))
    frag.unpersist(); out.unpersist()


def test_big_chunks_pass_through_byte_identical(spark, docs):
    # mixed table: one unit fragmented, sizes differ per unit
    big = pes.encode(docs, chunk_rows=2048, n_buckets=1, n_salts=1,
                     num_partitions=1).cache()
    small = pes.encode(docs.limit(40), chunk_rows=8, n_buckets=1, n_salts=1,
                       num_partitions=1, uid_namespace="tail").cache()
    union = big.unionByName(small)
    # threshold 256: the 500-row chunks pass through, the 8-row tail is
    # rewritten
    out = pes.compact_chunks(union, target_rows=512, n_buckets=1,
                             n_salts=1, num_partitions=1).cache()
    # the big chunks' rows survive byte-identical (same chunk ids, shas)
    kept = out.join(big.select("chunk_id"), "chunk_id", "left_semi")
    assert sorted(r["sha256"] for r in kept.select("sha256").collect()) == \
        sorted(r["sha256"] for r in big.select("sha256").collect())
    # and decode returns source + tail rows exactly
    expect = docs.unionByName(docs.limit(40))
    assert pes.roundtrip_ok(expect, pes.decode(out))
    big.unpersist(); small.unpersist(); out.unpersist()


def test_nothing_to_compact_is_identity(spark, docs):
    chunks = pes.encode(docs, chunk_rows=64, n_buckets=1, n_salts=1,
                        num_partitions=1).cache()
    out = pes.compact_chunks(chunks, target_rows=64, small_frac=0.5)
    # every chunk is >= 32 rows -> all pass through
    assert out.count() == chunks.count()
    assert pes.roundtrip_ok(docs, pes.decode(out))
    chunks.unpersist()
