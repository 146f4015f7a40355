"""Dictionary-membership digest pruning — the chunk-table analogue of
parquet-mr's dictionary filter that the reference's eq predicates inherit
(parquet-avro Predicate.scala:31-38): a chunk whose [min,max] straddles a
literal is still skipped when its small exact dictionary provably lacks
the value."""

import pyarrow as pa
import pytest
from pyspark.sql import Row, functions as F

import parquet_extra_spark as pes
from parquet_extra_spark.engine import stats as S
from parquet_extra_spark.engine.predicate import P, prune_chunks
from parquet_extra_spark.engine.pushdown import chunk_isin_filter


# ---------- unit level: digest construction + literal canonicalization


def test_digest_present_for_small_dict():
    st = S.compute_stats(pa.array(["aa", "zz", "aa"]), "string")
    assert st.members is not None and len(st.members) == 2
    assert S.member_hash_for("aa", "string") in st.members
    assert S.member_hash_for("en", "string") not in st.members


def test_digest_absent_above_cap():
    vals = [f"v{i:04d}" for i in range(S._MEMBER_MAX + 1)]
    assert S.compute_stats(pa.array(vals), "string").members is None


def test_digest_int_and_bool():
    st = S.compute_stats(pa.array([1, 5, 5], type=pa.int64()), "bigint")
    assert S.member_hash_for(5, "bigint") in st.members
    assert S.member_hash_for(2, "bigint") not in st.members
    stb = S.compute_stats(pa.array([True, True]), "boolean")
    assert S.member_hash_for(True, "boolean") in stb.members
    assert S.member_hash_for(False, "boolean") not in stb.members


def test_member_hash_type_mismatch_is_none():
    # a float literal against an int column must NOT digest-prune: the
    # row recheck decides 2.0 == 2, so the digest has to stand down
    assert S.member_hash_for(2.0, "bigint") is None
    assert S.member_hash_for(True, "bigint") is None  # bool is not an int here
    assert S.member_hash_for(1, "boolean") is None
    assert S.member_hash_for(3, "string") is None
    assert S.member_hash_for("x", "double") is None  # dtype outside contract


# ---------- engine level: pruning + exactness


@pytest.fixture(scope="module")
def digest_chunks(spark):
    # lang per group: g0 -> {aa, zz} (range straddles "en", digest lacks
    # it), g1 -> {en, fr}. Every chunk's dict is tiny -> digest present.
    rows = [
        Row(k=i, lang=(["aa", "zz"] if i < 500 else ["en", "fr"])[i % 2],
            g=f"g{i // 500}")
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows)
    c = pes.encode(df, partition_cols=["g"], sort_cols=["k"], chunk_rows=128,
                   n_buckets=2, n_salts=1, num_partitions=2).cache()
    c.count()
    return df, c


def _kept(chunks):
    return chunks.select("chunk_id").distinct().count()


def test_digest_skips_range_straddling_chunks(digest_chunks):
    df, chunks = digest_chunks
    total = _kept(chunks)
    # min/max alone keeps every g0 chunk ([aa..zz] contains "en");
    # the digest proves "en" absent from g0's dictionaries
    kept = _kept(prune_chunks(chunks, P.eq("lang", "en")))
    assert kept < total // 2 + 2  # only g1's chunks survive
    got = pes.filter_decode_pred(chunks, P.eq("lang", "en"), colocated=True)
    want = df.filter(F.col("lang") == "en")
    assert pes.roundtrip_ok(want, got.select(*want.columns))


def test_digest_isin_filter_skips(digest_chunks):
    df, chunks = digest_chunks
    total = _kept(chunks)
    kept = _kept(chunk_isin_filter(chunks, "lang", ["en"]))
    assert kept < total // 2 + 2
    # and a value no chunk holds prunes everything despite wide ranges
    assert _kept(chunk_isin_filter(chunks, "lang", ["mm"])) == 0


def test_digest_ne_not_soundness(digest_chunks):
    # certain(ne) strengthening feeds possible(NOT ne) = NOT certain(ne):
    # results must still match the plain filter exactly
    df, chunks = digest_chunks
    for pred, cond in [
        (P.ne("lang", "en"), F.col("lang") != "en"),
        (~P.ne("lang", "en"), ~(F.col("lang") != "en")),
        (~P.eq("lang", "aa"), ~(F.col("lang") == "aa")),
    ]:
        got = pes.filter_decode_pred(chunks, pred, colocated=True)
        want = df.filter(cond)
        assert pes.roundtrip_ok(want, got.select(*want.columns)), str(pred)


def test_legacy_chunk_table_without_digest(digest_chunks):
    # chunk tables persisted before the digest column read back without
    # it: must behave as "no digest" (kept), not error
    df, chunks = digest_chunks
    legacy = chunks.drop("member_hashes")
    got = pes.filter_decode_pred(legacy, P.eq("lang", "en"))
    want = df.filter(F.col("lang") == "en")
    assert pes.roundtrip_ok(want, got.select(*want.columns))
