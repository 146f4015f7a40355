"""Opt-in per-chunk Bloom digests (encode(bloom_cols=...)): point-lookup
pruning on high-cardinality columns, where the capped exact membership
digest cannot exist. The parquet-mr optional-per-column-bloom analogue
for the reference's eq predicates (Predicate.scala:31-38)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark.engine import stats as stats_mod


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def even(spark, docs):
    # even ids only: every odd id is ABSENT but lies inside the table's
    # doc_id range, so range stats alone can never skip a point lookup
    return docs.filter(F.col("doc_id") % 2 == 0).cache()


@pytest.fixture(scope="module")
def bloom_chunks(spark, even):
    # sorted by n_chars => each chunk's doc_id [min,max] spans ~the whole
    # key space; chunk_rows > _MEMBER_MAX so the exact digest is absent
    # and pruning can only come from the bloom
    ch = pes.encode(
        even, sort_cols=["n_chars"], chunk_rows=128, n_buckets=1,
        n_salts=1, num_partitions=1, bloom_cols=["doc_id"],
    ).cache()
    ch.count()
    return ch


def test_bloom_built_only_past_member_cap(spark, bloom_chunks):
    rows = bloom_chunks.filter(F.col("column") == "doc_id").select(
        "distinct_est", "member_hashes", "member_bloom"
    ).collect()
    assert rows
    for r in rows:
        if r["distinct_est"] > stats_mod._MEMBER_MAX:
            assert r["member_hashes"] is None
            assert len(r["member_bloom"]) == stats_mod._BLOOM_WORDS
    # at least one chunk is genuinely past the cap (the scenario under test)
    assert any(r["distinct_est"] > stats_mod._MEMBER_MAX for r in rows)
    # other columns carry no bloom (opt-in is per column)
    other = bloom_chunks.filter(F.col("column") == "text")
    assert other.filter(F.col("member_bloom").isNotNull()).count() == 0


def test_bloom_skips_absent_point_lookup(spark, bloom_chunks):
    # doc_id 3 is odd -> absent, but inside every chunk's [min,max]
    stats = pes.pushdown_stats_pred(bloom_chunks, pes.P.eq("doc_id", 3))
    assert stats["chunks_total"] > 0
    assert stats["chunks_kept"] == 0  # bloom proves absence; range could not
    assert pes.filter_decode_pred(bloom_chunks, pes.P.eq("doc_id", 3)).count() == 0


def test_bloom_point_lookup_exact(spark, even, bloom_chunks):
    res = pes.filter_decode_pred(bloom_chunks, pes.P.eq("doc_id", 42))
    assert pes.roundtrip_ok(even.filter(F.col("doc_id") == 42), res)
    stats = pes.pushdown_stats_pred(bloom_chunks, pes.P.eq("doc_id", 42))
    assert stats["chunks_kept"] >= 1


def test_bloom_isin_pushdown(spark, even, bloom_chunks):
    res = pes.filter_decode_isin(bloom_chunks, "doc_id", [3, 5, 42])
    assert pes.roundtrip_ok(even.filter(F.col("doc_id").isin([3, 5, 42])), res)
    kept = (
        pes.chunk_isin_filter(bloom_chunks, "doc_id", [3, 5])
        .select("chunk_id").distinct().count()
    )
    assert kept == 0  # both absent -> every chunk provably skippable


def test_bloom_strengthens_ne_negation(spark, bloom_chunks):
    # possible(NOT(ne v)) = NOT certain(ne v); the bloom proving v absent
    # makes ne CERTAIN on null-free chunks, so the negation prunes all
    stats = pes.pushdown_stats_pred(bloom_chunks, ~pes.P.ne("doc_id", 3))
    assert stats["chunks_kept"] == 0
    assert pes.filter_decode_pred(bloom_chunks, ~pes.P.ne("doc_id", 3)).count() == 0


def test_no_bloom_without_optin(spark, even):
    plain = pes.encode(even, sort_cols=["n_chars"], chunk_rows=128,
                       n_buckets=1, n_salts=1, num_partitions=1)
    assert plain.filter(F.col("member_bloom").isNotNull()).count() == 0
    # absent point lookup: the chunk whose [min,max] straddles 3 cannot
    # be skipped by range stats alone (the bloom-enabled table skips all)
    stats = pes.pushdown_stats_pred(plain, pes.P.eq("doc_id", 3))
    assert stats["chunks_kept"] >= 1
    # ...but the exact recheck still yields the right (empty) answer
    assert pes.filter_decode_pred(plain, pes.P.eq("doc_id", 3)).count() == 0


def test_bloom_on_string_key(spark, docs):
    keyed = docs.withColumn("key", F.concat(F.lit("k"), F.col("doc_id"))).cache()
    ch = pes.encode(keyed, sort_cols=["n_chars"], chunk_rows=128, n_buckets=1,
                    n_salts=1, num_partitions=1, bloom_cols=["key"])
    present = pes.filter_decode_pred(ch, pes.P.eq("key", "k7"))
    assert pes.roundtrip_ok(keyed.filter(F.col("key") == "k7"), present)
    stats = pes.pushdown_stats_pred(ch, pes.P.eq("key", "zz-missing"))
    assert stats["chunks_kept"] == 0
    keyed.unpersist()


def test_wide_strings_never_get_a_bloom(spark):
    # wide string columns route through the SAMPLED stats path whose
    # dictionary may miss values — a bloom built from it would have
    # false negatives and unsoundly skip chunks, so the encoder must
    # decline even when asked (chunk must exceed _DICT_SAMPLE_ROWS rows
    # and _WIDE_STR_BYTES avg width to take that path)
    wide = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x" * 150), F.col("id").cast("string")).alias("txt"),
    )
    ch = pes.encode(wide, chunk_rows=4096, n_buckets=1, n_salts=1,
                    num_partitions=1, bloom_cols=["txt"])
    assert (
        ch.filter((F.col("column") == "txt") & F.col("member_bloom").isNotNull())
        .count() == 0
    )
    # and the point lookup stays CORRECT (recheck path, no pruning)
    res = pes.filter_decode_pred(ch, pes.P.eq("txt", "x" * 150 + "2999"))
    assert res.count() == 1


def test_unknown_bloom_column_raises(spark, docs):
    with pytest.raises(ValueError, match="bloom"):
        pes.encode(docs, bloom_cols=["nope"])


def test_roundtrip_with_bloom(spark, even, bloom_chunks):
    assert pes.roundtrip_ok(even, pes.decode(bloom_chunks))


def test_bloom_never_false_negative_property():
    """Soundness invariant, no Spark needed: for ANY value set, every
    member's probed bits are set in the built digest (false negatives
    are impossible by construction — the property the skip relies on)."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    W = stats_mod._BLOOM_BITS_PER_WORD

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1))
    def check(vals):
        words = stats_mod._bloom_digest(pa.array(vals, pa.int64()), "bigint")
        for v in vals:
            h = stats_mod.member_hash_for(v, "bigint")
            for p in stats_mod.bloom_positions(h):
                assert words[p // W] >> (p % W) & 1, (v, p)

    check()


def test_legacy_chunk_table_without_bloom_column(spark, bloom_chunks):
    legacy = bloom_chunks.drop("member_bloom", "member_hashes")
    # no digest columns -> only range pruning remains; the straddling
    # chunk is kept (sound), and the exact recheck stays correct
    stats = pes.pushdown_stats_pred(legacy, pes.P.eq("doc_id", 3))
    assert stats["chunks_kept"] >= 1
    assert pes.filter_decode_pred(legacy, pes.P.eq("doc_id", 3)).count() == 0
