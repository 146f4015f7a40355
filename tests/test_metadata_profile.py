"""metadata_profile: aggregates answered from chunk stats only — the
chunk-table analogue of parquet footer-statistics aggregate pushdown."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F, types as T

import parquet_extra_spark as pes


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def chunks(docs):
    c = pes.encode(docs, chunk_rows=64, n_buckets=2, n_salts=2).cache()
    c.count()
    return c


def test_counts_and_numeric_bounds_exact(docs, chunks):
    prof = {r["column"]: r for r in pes.metadata_profile(chunks).collect()}
    truth = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("id_mn"), F.max("doc_id").alias("id_mx"),
        F.min("n_chars").alias("nc_mn"), F.max("n_chars").alias("nc_mx"),
        F.min("lang").alias("lg_mn"), F.max("lang").alias("lg_mx"),
    ).collect()[0]
    for col in docs.columns:
        assert prof[col]["n_values"] == truth["n"]
        assert prof[col]["null_count"] == 0
        assert prof[col]["n_chunks"] > 1
    assert int(prof["doc_id"]["min_val"]) == truth["id_mn"]
    assert int(prof["doc_id"]["max_val"]) == truth["id_mx"]
    assert prof["doc_id"]["exact_min"] and prof["doc_id"]["exact_max"]
    assert int(prof["n_chars"]["min_val"]) == truth["nc_mn"]
    assert int(prof["n_chars"]["max_val"]) == truth["nc_mx"]
    assert prof["lang"]["min_val"] == truth["lg_mn"]
    assert prof["lang"]["max_val"] == truth["lg_mx"]
    assert prof["lang"]["exact_min"] and prof["lang"]["exact_max"]


def test_typed_ordering_not_lexical(spark):
    """"9" > "10" lexically — numeric bounds must use typed ordering."""
    df = spark.createDataFrame(
        [Row(k=i) for i in [9, 10, 100, 2]], T.StructType([T.StructField("k", T.LongType())])
    )
    # one row per chunk so the global min/max aggregates across chunks
    chunks = pes.encode(df, chunk_rows=1, n_buckets=1, n_salts=1, num_partitions=1)
    r = pes.metadata_profile(chunks, columns=["k"]).collect()[0]
    assert int(r["min_val"]) == 2 and int(r["max_val"]) == 100


def test_truncated_string_min_flagged_inexact(spark):
    long_a = "a" * 80
    df = spark.createDataFrame([Row(s=long_a + "x"), Row(s="zz")])
    chunks = pes.encode(df, chunk_rows=16, n_buckets=1, n_salts=1, num_partitions=1)
    r = pes.metadata_profile(chunks, columns=["s"]).collect()[0]
    # min stored as the 64-char prefix: a lower bound, flagged inexact
    assert r["min_val"] == "a" * 64
    assert not r["exact_min"]
    # max "zz" needed no truncation: exact
    assert r["max_val"] == "zz" and r["exact_max"]


def test_nan_float_bounds_flagged_inexact(spark):
    df = spark.createDataFrame(
        [Row(x=1.5), Row(x=float("nan")), Row(x=9.25)],
        T.StructType([T.StructField("x", T.DoubleType())]),
    )
    chunks = pes.encode(df, chunk_rows=16, n_buckets=1, n_salts=1, num_partitions=1)
    r = pes.metadata_profile(chunks, columns=["x"]).collect()[0]
    # Spark's total order puts NaN above every double: the chunk's true
    # max is NaN -> stored unbounded -> inexact; the finite min is sound
    assert float(r["min_val"]) == 1.5 and r["exact_min"]
    assert r["max_val"] is None and not r["exact_max"]
    assert r["n_values"] == 3 and r["null_count"] == 0  # counts stay exact


def test_all_null_column(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=2, b=None)],
        T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]),
    )
    chunks = pes.encode(df, chunk_rows=16, n_buckets=1, n_salts=1, num_partitions=1)
    r = pes.metadata_profile(chunks, columns=["b"]).collect()[0]
    # SQL min/max of an all-null column is NULL — and that IS exact
    assert r["min_val"] is None and r["max_val"] is None
    assert r["exact_min"] and r["exact_max"]
    assert r["null_count"] == 2 and r["n_values"] == 2


def test_decimal_bounds(spark):
    df = spark.createDataFrame(
        [Row(d=Decimal("10.25")), Row(d=Decimal("2.50")), Row(d=Decimal("100.00"))],
        T.StructType([T.StructField("d", T.DecimalType(10, 2))]),
    )
    chunks = pes.encode(df, chunk_rows=1, n_buckets=1, n_salts=1, num_partitions=1)
    r = pes.metadata_profile(chunks, columns=["d"]).collect()[0]
    assert Decimal(r["min_val"]) == Decimal("2.50")
    assert Decimal(r["max_val"]) == Decimal("100.00")


def test_unknown_column_raises(chunks):
    with pytest.raises(ValueError, match="unknown"):
        pes.metadata_profile(chunks, columns=["nope"])
