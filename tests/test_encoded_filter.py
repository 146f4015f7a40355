"""Filter-over-compressed + the round-4 encoded operator family.

The dual predicate contract (parquet-avro Predicate.scala:10,19-27 —
coarse storage skip, exact recheck) applied INSIDE the encoded
aggregates: the recheck runs in the dictionary domain
(engine/encoded_filter), so filtered GROUP BYs still never materialize
values per row. Golden-construction equality against the same query on
the source DataFrame, plus poisoned-payload behavioral proofs that
stats-pruned chunks are never decoded, plus Kleene-logic unit tests
(NULL semantics under NOT are the classic trap)."""

import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark import P
from parquet_extra_spark.engine.encoded_agg import (
    distinct_encoded,
    group_count_distinct_encoded,
    group_stats_encoded,
    group_sum_encoded,
    value_counts_encoded,
)
from parquet_extra_spark.engine.encoded_filter import (
    K_FALSE,
    K_TRUE,
    K_UNKNOWN,
    leaf_verdicts,
    row_mask,
    row_verdict,
)
from parquet_extra_spark.engine.topk import topk_encoded


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def doc_chunks(docs):
    return pes.encode(
        docs, partition_cols=["lang"], sort_cols=["doc_id"], chunk_rows=256,
        n_buckets=4, n_salts=2,
    ).cache()


# ---------------------------------------------------------------- Kleene unit


def test_leaf_verdicts_cmp_int():
    d = pa.array([1, 5, 9], type=pa.int64())
    v = leaf_verdicts(P.gt("x", 4), d, "bigint")
    assert list(v) == [K_FALSE, K_TRUE, K_TRUE, K_UNKNOWN]  # last = null slot


def test_leaf_verdicts_string_and_prefix():
    d = pa.array(["apple", "banana", "apricot"])
    assert list(leaf_verdicts(P.eq("s", "banana"), d, "string")) == [
        K_FALSE, K_TRUE, K_FALSE, K_UNKNOWN,
    ]
    assert list(leaf_verdicts(P.startswith("s", "ap"), d, "string")) == [
        K_TRUE, K_FALSE, K_TRUE, K_UNKNOWN,
    ]


def test_leaf_verdicts_null_tests_are_two_valued():
    d = pa.array([1, 2], type=pa.int64())
    assert list(leaf_verdicts(P.is_null("x"), d, "bigint")) == [
        K_FALSE, K_FALSE, K_TRUE,
    ]
    assert list(leaf_verdicts(P.not_null("x"), d, "bigint")) == [
        K_TRUE, K_TRUE, K_FALSE,
    ]


def test_leaf_verdicts_isin_with_null_item_is_unknown_not_false():
    # SQL: x IN (1, NULL) is TRUE on match, UNKNOWN (not FALSE) otherwise
    d = pa.array([1, 2], type=pa.int64())
    v = leaf_verdicts(P.isin("x", [1, None]), d, "bigint")
    assert list(v) == [K_TRUE, K_UNKNOWN, K_UNKNOWN]
    # and NOT(x IN (1, NULL)) must keep the non-match EXCLUDED (unknown)
    env = {"x": (np.array([0, 1, 2]), d, "bigint")}
    assert list(row_mask(~P.isin("x", [1, None]), env)) == [False, False, False]


def test_leaf_verdicts_mixed_numeric_literal():
    d = pa.array([1, 2, 3], type=pa.int64())
    assert list(leaf_verdicts(P.gt("x", 1.5), d, "bigint"))[:3] == [
        K_FALSE, K_TRUE, K_TRUE,
    ]


def test_decimal_vs_int_literal_is_exact_beyond_float53():
    # decimal column vs INT literal: Catalyst's common type is decimal
    # (exact); a float64 shortcut would conflate 2^53 and 2^53+1
    import decimal

    big = decimal.Decimal(9007199254740993)  # 2^53 + 1
    d = pa.array([big, big - 1], type=pa.decimal128(18, 0))
    # in float64 both entries collapse to 2^53 and would BOTH match both
    # literals; exact comparison distinguishes them
    assert list(leaf_verdicts(P.eq("x", 9007199254740992), d, "decimal(18,0)")) == [
        K_FALSE, K_TRUE, K_UNKNOWN,
    ]
    assert list(leaf_verdicts(P.eq("x", 9007199254740993), d, "decimal(18,0)")) == [
        K_TRUE, K_FALSE, K_UNKNOWN,
    ]


def test_not_over_null_is_excluded():
    # rows: x = 1, 9, NULL. WHERE NOT (x > 5) keeps only x=1:
    # NOT(NULL > 5) = NOT(UNKNOWN) = UNKNOWN -> excluded.
    d = pa.array([1, 9], type=pa.int64())
    env = {"x": (np.array([0, 1, 2]), d, "bigint")}
    assert list(row_mask(~P.gt("x", 5), env)) == [True, False, False]
    # De Morgan sanity in Kleene: verdicts of NOT(a AND b) == OR(NOT a, NOT b)
    a, b = P.gt("x", 0), P.lt("x", 5)
    v1 = row_verdict(~(a & b), env)
    v2 = row_verdict(~a | ~b, env)
    assert list(v1) == list(v2)


# ------------------------------------------------------- filtered aggregates


def test_group_sum_encoded_where(docs, doc_chunks):
    w = P.ge("n_chars", 100) & ~P.eq("source", "web")
    got = sorted(
        group_sum_encoded(doc_chunks, "lang", "n_chars", where=w).collect()
    )
    want = sorted(
        docs.filter((F.col("n_chars") >= 100) & (F.col("source") != "web"))
        .groupBy(F.col("lang").alias("key"))
        .agg(F.sum("n_chars").alias("s"))
        .collect()
    )
    assert got == want


def test_group_stats_encoded_where_with_nulls(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10), ("a", 2, None), ("a", 11, 30), ("b", 3, None),
            ("b", 12, 50), ("c", 4, 60), (None, 13, 70), ("c", None, 80),
        ],
        "k string, f bigint, v bigint",
    )
    chunks = pes.encode(df, chunk_rows=3, n_buckets=1, n_salts=1)
    w = P.le("f", 10)  # NULL f rows excluded (UNKNOWN)
    got = sorted(
        group_stats_encoded(chunks, "k", "v", where=w).collect(),
        key=lambda r: (r["key"] is None, r["key"]),
    )
    want = sorted(
        df.filter(F.col("f") <= 10)
        .groupBy(F.col("k").alias("key"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_vals"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect(),
        key=lambda r: (r["key"] is None, r["key"]),
    )
    assert got == want
    # fully-filtered groups must NOT emit: the NULL key group (its only
    # row has f=13) exists unfiltered but vanishes under the WHERE
    assert {r["key"] for r in got} == {"a", "b", "c"}
    assert None in {
        r["key"] for r in group_stats_encoded(chunks, "k", "v").collect()
    }


def test_value_counts_encoded_where_null_group(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("a", 30), (None, 40), ("b", 5)],
        "k string, f bigint",
    )
    chunks = pes.encode(df, chunk_rows=2, n_buckets=1, n_salts=1)
    got = {
        r["value"]: r["cnt"]
        for r in value_counts_encoded(chunks, "k", where=P.lt("f", 10)).collect()
    }
    assert got == {"a": 1, None: 1, "b": 1}


def test_filtered_agg_skips_pruned_payloads(spark, tmp_path):
    """Behavioral pruning proof: poison the payloads of chunks whose stats
    exclude them from the WHERE; the filtered aggregate must still answer
    (it never decodes them), and a full decode must fail."""
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 2).alias("v"),
    )
    chunks = pes.encode(df, sort_cols=["k"], chunk_rows=100, n_buckets=1, n_salts=1)
    # poison the k rows of pruned-out chunks, and their v rows too (v = 2k,
    # so a chunk whose k stays below 900 has v max below 1800) — g's stats
    # can't identify low chunks, so its rows stay intact
    poisoned = chunks.withColumn(
        "payload",
        F.when(
            (F.col("column") == "k") & (F.col("max_val").cast("long") < 900),
            F.lit(b"\xde\xad"),
        )
        .when(
            (F.col("column") == "v") & (F.col("max_val").cast("long") < 1800),
            F.lit(b"\xde\xad"),
        )
        .otherwise(F.col("payload")),
    ).cache()
    got = sorted(
        group_sum_encoded(poisoned, "g", "v", where=P.ge("k", 900)).collect()
    )
    want = sorted(
        df.filter(F.col("k") >= 900)
        .groupBy(F.col("g").alias("key"))
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    assert got == want
    with pytest.raises(Exception):
        pes.decode(poisoned).collect()


# ----------------------------------------------------- distinct / n-distinct


def test_distinct_encoded(docs, doc_chunks):
    got = sorted(r["value"] for r in distinct_encoded(doc_chunks, "lang").collect())
    want = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    assert got == want


def test_distinct_encoded_nulls_and_fallback_codec(spark):
    # a float column with nulls: high-entropy floats dodge dict/RLE, so
    # the per-chunk unique fallback runs; nulls must surface as one row
    df = spark.createDataFrame(
        [(float(x) * 1.7,) if x % 5 else (None,) for x in range(200)],
        "x double",
    )
    chunks = pes.encode(df, chunk_rows=50, n_buckets=1, n_salts=1)
    got = sorted(
        (r["value"] for r in distinct_encoded(chunks, "x").collect()),
        key=lambda v: (v is not None, v),
    )
    want = sorted(
        (r["x"] for r in df.distinct().collect()),
        key=lambda v: (v is not None, v),
    )
    assert got == want


def test_distinct_encoded_where(docs, doc_chunks):
    w = P.eq("source", "news")
    got = sorted(
        r["value"] for r in distinct_encoded(doc_chunks, "lang", where=w).collect()
    )
    want = sorted(
        r["lang"]
        for r in docs.filter(F.col("source") == "news")
        .select("lang")
        .distinct()
        .collect()
    )
    assert got == want


def test_group_count_distinct_encoded(docs, doc_chunks):
    got = sorted(
        group_count_distinct_encoded(doc_chunks, "lang", "source").collect()
    )
    want = sorted(
        docs.groupBy(F.col("lang").alias("key"))
        .agg(F.count_distinct("source").alias("nd"))
        .collect()
    )
    assert got == want


def test_group_count_distinct_all_null_group_reports_zero(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", None), ("b", None), (None, "x")],
        "k string, v string",
    )
    chunks = pes.encode(df, chunk_rows=2, n_buckets=1, n_salts=1)
    got = {
        r["key"]: r["nd"]
        for r in group_count_distinct_encoded(chunks, "k", "v").collect()
    }
    assert got == {"a": 2, "b": 0, None: 1}


def test_group_count_distinct_multi_key(docs, doc_chunks):
    got = sorted(
        group_count_distinct_encoded(
            doc_chunks, ["lang", "source"], "n_chars"
        ).collect()
    )
    want = sorted(
        docs.groupBy("lang", "source")
        .agg(F.count_distinct("n_chars").alias("nd"))
        .collect()
    )
    assert got == want


# ------------------------------------------------------------------- top-k


def test_topk_encoded_desc(docs, doc_chunks):
    got = topk_encoded(
        doc_chunks, ["n_chars", "doc_id"], 25, columns=["doc_id", "n_chars"]
    ).collect()
    want = (
        docs.filter(F.col("n_chars").isNotNull())
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(25)
        .select("doc_id", "n_chars")
        .collect()
    )
    assert sorted(got) == sorted(want)


def test_topk_encoded_asc(docs, doc_chunks):
    got = topk_encoded(
        doc_chunks, ["n_chars", "doc_id"], 10,
        columns=["doc_id", "n_chars"], ascending=True,
    ).collect()
    want = (
        docs.filter(F.col("n_chars").isNotNull())
        .orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "n_chars")
        .collect()
    )
    assert sorted(got) == sorted(want)


def test_topk_prunes_chunks_behaviorally(spark):
    """Clustered ordering column: chunks below the threshold are poisoned;
    top-k must never decode them."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    chunks = pes.encode(df, sort_cols=["v"], chunk_rows=100, n_buckets=1, n_salts=1)
    poisoned = chunks.withColumn(
        "payload",
        F.when(
            (F.col("column") == "v") & (F.col("max_val").cast("long") < 2400),
            F.lit(b"\xde\xad"),
        )
        .when(
            (F.col("column") == "k") & (F.col("max_val").cast("long") < 800),
            F.lit(b"\xde\xad"),
        )
        .otherwise(F.col("payload")),
    ).cache()
    got = topk_encoded(poisoned, ["v", "k"], 50, columns=["k", "v"]).collect()
    want = (
        df.orderBy(F.col("v").desc(), F.col("k").asc())
        .limit(50)
        .select("k", "v")
        .collect()
    )
    assert sorted(got) == sorted(want)


def test_topk_fewer_nonnull_than_k(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None)], "k bigint, v bigint"
    )
    chunks = pes.encode(df, chunk_rows=2, n_buckets=1, n_salts=1)
    got = topk_encoded(chunks, ["v", "k"], 10, columns=["k", "v"]).collect()
    # null ordering keys never appear: 2 rows, not 4
    assert sorted((r["k"], r["v"]) for r in got) == [(1, 10), (3, 30)]


def test_topk_validates(doc_chunks):
    with pytest.raises(ValueError):
        topk_encoded(doc_chunks, ["nope"], 5)
    with pytest.raises(ValueError):
        topk_encoded(doc_chunks, ["n_chars"], 0)


def test_topk_encoded_where(docs, doc_chunks):
    w = P.eq("lang", "en") & P.lt("n_chars", 400)
    got = topk_encoded(
        doc_chunks, ["n_chars", "doc_id"], 30,
        columns=["doc_id", "n_chars"], where=w,
    ).collect()
    want = (
        docs.filter(
            (F.col("lang") == "en")
            & (F.col("n_chars") < 400)
            & F.col("n_chars").isNotNull()
        )
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(30)
        .select("doc_id", "n_chars")
        .collect()
    )
    assert sorted(got) == sorted(want)


def test_topk_where_seed_thinner_than_k(spark):
    """The seed covers k rows by RAW non-null counts, but the WHERE can
    leave < k qualifying seed rows — the threshold must then be dropped,
    not taken from a too-short prefix (which would over-prune)."""
    # sorted by v: the top chunk is all g=0; filter g=1 qualifies few
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("v"),
    )
    chunks = pes.encode(df, sort_cols=["v"], unit_sort=True, chunk_rows=10,
                        n_buckets=1, n_salts=1)
    got = topk_encoded(
        chunks, ["v", "k"], 40, columns=["k", "v"], where=P.eq("g", 1)
    ).collect()
    want = (
        df.filter(F.col("g") == 1)
        .orderBy(F.col("v").desc(), F.col("k").asc())
        .limit(40)
        .select("k", "v")
        .collect()
    )
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------- quantiles


def test_quantiles_encoded_matches_order_statistics(docs, doc_chunks):
    from parquet_extra_spark.engine.encoded_agg import quantiles_encoded

    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {
        r["q"]: r["value"]
        for r in quantiles_encoded(doc_chunks, "n_chars", qs).collect()
    }
    vals = sorted(
        r["n_chars"] for r in docs.filter(F.col("n_chars").isNotNull()).collect()
    )
    import math

    n = len(vals)
    for q in qs:
        want = vals[max(1, math.ceil(q * n)) - 1]
        assert got[q] == want, (q, got[q], want)


def test_quantiles_encoded_where_and_nulls(spark):
    from parquet_extra_spark.engine.encoded_agg import quantiles_encoded

    df = spark.createDataFrame(
        [(i, i * 10 if i % 4 else None) for i in range(1, 41)],
        "g bigint, x bigint",
    )
    chunks = pes.encode(df, chunk_rows=8, n_buckets=1, n_salts=1)
    got = {
        r["q"]: r["value"]
        for r in quantiles_encoded(
            chunks, "x", [0.5], where=P.le("g", 20)
        ).collect()
    }
    vals = sorted(
        r["x"]
        for r in df.filter((F.col("g") <= 20) & F.col("x").isNotNull()).collect()
    )
    import math

    assert got[0.5] == vals[max(1, math.ceil(0.5 * len(vals))) - 1]


def test_quantiles_distributed_path_matches_window_path(spark):
    """High-cardinality lane: range-partitioned rank location must agree
    with the single-window lane (and with direct order statistics) —
    including via the auto gate on the distinct_est metadata sum."""
    from parquet_extra_spark.engine.encoded_agg import quantiles_encoded
    import math

    df = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 997).alias("v")
    )
    chunks = pes.encode(df, chunk_rows=256, n_buckets=2, n_salts=1).cache()
    qs = [0.0, 0.1, 0.5, 0.75, 0.99, 1.0]
    vals = sorted(r["v"] for r in df.collect())
    n = len(vals)
    want = {q: vals[max(1, math.ceil(q * n)) - 1] for q in qs}
    for kwargs in (
        {"distributed": False},
        {"distributed": True},
        {"max_window_values": 10},  # auto gate -> distributed
    ):
        got = {
            r["q"]: r["value"]
            for r in quantiles_encoded(chunks, "v", qs, **kwargs).collect()
        }
        assert got == want, kwargs
    # filtered + empty result through the distributed lane
    got = quantiles_encoded(
        chunks, "v", [0.5], where=P.lt("k", -1), distributed=True
    ).collect()
    assert len(got) == 1 and got[0]["value"] is None


def test_quantiles_encoded_validates(doc_chunks):
    from parquet_extra_spark.engine.encoded_agg import quantiles_encoded

    with pytest.raises(ValueError):
        quantiles_encoded(doc_chunks, "n_chars", [])
    with pytest.raises(ValueError):
        quantiles_encoded(doc_chunks, "n_chars", [1.5])
