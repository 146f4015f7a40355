"""Compute-over-compressed aggregates: grouped counts/sums from codec
structures must equal the same aggregates over the source DataFrame
(golden-construction equality, the reference's PredicateTest.scala
pattern applied to aggregation)."""

import os

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark.engine.encoded_agg import (
    group_stats_encoded,
    group_sum_encoded,
    value_counts_encoded,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def doc_chunks(docs):
    return pes.encode(
        docs, partition_cols=["lang"], sort_cols=["doc_id"], chunk_rows=256,
        n_buckets=4, n_salts=2,
    ).cache()


def _as_map(rows, key="value"):
    return {r[key]: r[1] for r in rows}


def test_value_counts_matches_groupby(docs, doc_chunks):
    got = _as_map(value_counts_encoded(doc_chunks, "lang").collect())
    want = _as_map(docs.groupBy(F.col("lang").alias("value")).count().collect())
    assert got == want


def test_value_counts_int_column(docs, doc_chunks):
    got = _as_map(value_counts_encoded(doc_chunks, "n_chars").collect())
    want = _as_map(docs.groupBy(F.col("n_chars").alias("value")).count().collect())
    assert got == want


def test_value_counts_counts_nulls_as_group(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "k string"
    )
    chunks = pes.encode(df, chunk_rows=2, n_buckets=1, n_salts=1)
    got = _as_map(value_counts_encoded(chunks, "k").collect())
    assert got == {"a": 2, None: 2, "b": 1}


def test_value_counts_unknown_column(doc_chunks):
    with pytest.raises(ValueError):
        value_counts_encoded(doc_chunks, "nope")


def test_group_sum_matches_groupby(docs, doc_chunks):
    got = _as_map(group_sum_encoded(doc_chunks, "lang", "n_chars").collect(), "key")
    want = _as_map(
        docs.groupBy(F.col("lang").alias("key"))
        .agg(F.sum("n_chars").alias("s"))
        .collect(),
        "key",
    )
    assert got == want


def test_group_sum_null_semantics(spark):
    """Null values are ignored by SUM; a group whose values are all null
    sums to NULL; null keys form their own group."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None), (None, 5), (None, None)],
        "k string, v bigint",
    )
    chunks = pes.encode(df, chunk_rows=2, n_buckets=1, n_salts=1)
    got = _as_map(group_sum_encoded(chunks, "k", "v").collect(), "key")
    assert got == {"a": 1, "b": None, None: 5}


def test_group_stats_matches_groupby(docs, doc_chunks):
    got = {
        r["key"]: (r["n_rows"], r["n_vals"], r["s"], r["mn"], r["mx"])
        for r in group_stats_encoded(doc_chunks, "lang", "n_chars").collect()
    }
    want = {
        r["key"]: (r["n_rows"], r["n_vals"], r["s"], r["mn"], r["mx"])
        for r in docs.groupBy(F.col("lang").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("n_chars").alias("n_vals"),
            F.sum("n_chars").alias("s"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_group_stats_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", None), ("a", 1), ("b", None), (None, 5)],
        "k string, v bigint",
    )
    chunks = pes.encode(df, chunk_rows=2, n_buckets=1, n_salts=1)
    got = {
        r["key"]: (r["n_rows"], r["n_vals"], r["s"], r["mn"], r["mx"])
        for r in group_stats_encoded(chunks, "k", "v").collect()
    }
    assert got == {
        "a": (3, 2, 4, 1, 3),
        "b": (1, 0, None, None, None),
        None: (1, 1, 5, 5, 5),
    }


def test_group_sum_rejects_non_int(doc_chunks):
    with pytest.raises(TypeError):
        group_sum_encoded(doc_chunks, "lang", "text")


def test_value_counts_works_on_every_codec(spark):
    """Force each applicable codec and check the counts are codec-blind."""
    rows = [(i % 7,) for i in range(1000)]
    df = spark.createDataFrame(rows, "v bigint")
    want = {i: len([r for r in rows if r[0] == i]) for i in range(7)}
    for codec in ("dict", "rle", "for", "delta", "raw"):
        chunks = pes.encode(df, chunk_rows=128, n_buckets=1, n_salts=1, codec=codec)
        got = _as_map(value_counts_encoded(chunks, "v").collect())
        assert got == want, codec
