"""Join-over-compressed (engine/encoded_join): the invisible-join contract.

Golden-construction equality against Spark's own join on the source
DataFrame (inner/semi/anti, with and without a pushed WHERE), the PK-dim
validation and broadcast bound, a poisoned-payload behavioral proof that
key-pruned chunks never decode, and a plan assertion that the colocated
fact side never shuffles payload bytes."""

import pytest
from pyspark.sql import functions as F

import parquet_extra_spark as pes
from parquet_extra_spark import P
from parquet_extra_spark.engine.encoded_join import join_encoded


@pytest.fixture(scope="module")
def fact(spark):
    # orders-shaped fact: key with repeats + some null keys
    return (
        spark.range(2000)
        .select(
            F.col("id").alias("rid"),
            F.when(F.col("id") % 19 != 0, F.col("id") % 150).alias("k"),
            (F.col("id") * 3 % 997).alias("v"),
            F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("tag"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def fact_chunks(fact):
    return pes.encode(
        fact, partition_cols=["tag"], sort_cols=["rid"], chunk_rows=128,
        n_buckets=2, n_salts=1,
    ).cache()


@pytest.fixture(scope="module")
def dim(spark):
    # PK dim covering part of the key domain, plus a null key row (must
    # match nothing) and payload columns
    return (
        spark.range(90)
        .select(
            F.when(F.col("id") != 89, F.col("id")).alias("dk"),
            F.concat(F.lit("name-"), F.col("id").cast("string")).alias("dname"),
            (F.col("id") * 10).alias("dval"),
        )
        .cache()
    )


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_inner_matches_spark_join(fact, fact_chunks, dim):
    got = join_encoded(
        fact_chunks, ("k", "dk"), dim, columns=["rid", "k", "v"], colocated=True
    )
    want = fact.join(dim, fact.k == dim.dk).select(
        "rid", "k", "v", "dname", "dval"
    )
    cols = ["rid", "k", "v", "dname", "dval"]
    assert _rows(got, cols) == _rows(want, cols)


def test_inner_with_where_masks_in_dictionary_domain(fact, fact_chunks, dim):
    got = join_encoded(
        fact_chunks, ("k", "dk"), dim, columns=["rid", "v"],
        dim_columns=["dname"], where=P.ge("v", 500) & ~P.eq("tag", "s3"),
    )
    want = (
        fact.filter((F.col("v") >= 500) & (F.col("tag") != "s3"))
        .join(dim, fact.k == dim.dk)
        .select("rid", "v", "dname")
    )
    cols = ["rid", "v", "dname"]
    assert _rows(got, cols) == _rows(want, cols)


def test_semi_and_anti_match_spark(fact, fact_chunks, dim):
    semi = join_encoded(fact_chunks, ("k", "dk"), dim, columns=["rid", "k"], how="semi")
    want_semi = fact.join(dim, fact.k == dim.dk, "left_semi").select("rid", "k")
    assert _rows(semi, ["rid", "k"]) == _rows(want_semi, ["rid", "k"])

    anti = join_encoded(fact_chunks, ("k", "dk"), dim, columns=["rid", "k"], how="anti")
    want_anti = fact.join(dim, fact.k == dim.dk, "left_anti").select("rid", "k")
    got_anti = _rows(anti, ["rid", "k"])
    assert got_anti == _rows(want_anti, ["rid", "k"])
    # anti keeps null-key fact rows (SQL NOT EXISTS / Spark left_anti)
    assert any(k is None for _, k in got_anti)


def test_left_join_matches_spark(fact, fact_chunks, dim):
    got = join_encoded(
        fact_chunks, ("k", "dk"), dim, columns=["rid", "k", "v"], how="left"
    )
    want = fact.join(dim, fact.k == dim.dk, "left").select(
        "rid", "k", "v", "dname", "dval"
    )
    cols = ["rid", "k", "v", "dname", "dval"]
    got_rows = _rows(got, cols)
    assert got_rows == _rows(want, cols)
    # misses (incl. null-key rows) survive with NULL dim columns
    assert any(r[3] is None and r[4] is None for r in got_rows)

    # left + where: fact rows filter first, misses still null-filled
    gotw = join_encoded(
        fact_chunks, ("k", "dk"), dim, columns=["rid", "v"], how="left",
        where=P.lt("v", 100),
    )
    wantw = (
        fact.filter(F.col("v") < 100)
        .join(dim, fact.k == dim.dk, "left")
        .select("rid", "v", "dname", "dval")
    )
    assert _rows(gotw, ["rid", "v", "dname", "dval"]) == _rows(
        wantw, ["rid", "v", "dname", "dval"]
    )


def test_empty_dim(spark, fact, fact_chunks, dim):
    empty = dim.filter(F.lit(False))
    assert join_encoded(fact_chunks, ("k", "dk"), empty, columns=["rid"]).count() == 0
    assert (
        join_encoded(fact_chunks, ("k", "dk"), empty, columns=["rid"], how="anti").count()
        == fact.count()
    )
    # empty dim + left: every fact row, all dim columns NULL
    el = join_encoded(fact_chunks, ("k", "dk"), empty, columns=["rid"], how="left")
    assert el.count() == fact.count()
    assert el.filter(F.col("dname").isNotNull()).count() == 0


def test_duplicate_dim_keys_raise(spark, fact_chunks, dim):
    dup = dim.union(dim.limit(1))
    with pytest.raises(ValueError, match="not unique"):
        join_encoded(fact_chunks, ("k", "dk"), dup, columns=["rid"])


def test_validation_errors(fact_chunks, dim):
    with pytest.raises(ValueError, match="how"):
        join_encoded(fact_chunks, ("k", "dk"), dim, columns=["rid"], how="outer")
    with pytest.raises(ValueError, match="collision"):
        join_encoded(
            fact_chunks, ("k", "dk"), dim.withColumnRenamed("dname", "v"),
            columns=["rid", "v"],
        )
    with pytest.raises(ValueError, match="dim_columns"):
        join_encoded(
            fact_chunks, ("k", "dk"), dim, columns=["rid"], how="semi",
            dim_columns=["dname"],
        )
    with pytest.raises(ValueError, match="unknown"):
        join_encoded(fact_chunks, ("k", "dk"), dim, columns=["rid", "nope"])
    with pytest.raises(ValueError, match="max_dim_rows"):
        join_encoded(fact_chunks, ("k", "dk"), dim, columns=["rid"], max_dim_rows=10)


def test_join_skips_key_pruned_payloads(spark):
    """Chunks whose key stats miss the whole dim key set are never decoded:
    poison their payloads; the join must still answer, a full decode must
    fail."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    chunks = pes.encode(df, sort_cols=["k"], chunk_rows=100, n_buckets=1, n_salts=1)
    dim = spark.range(900, 960).select(
        F.col("id").alias("dk"), F.lit("x").alias("dname")
    )
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
        map(tuple, join_encoded(poisoned, ("k", "dk"), dim, columns=["k", "v"]).collect())
    )
    want = sorted(
        map(
            tuple,
            df.join(dim, df.k == dim.dk).select("k", "v", "dname").collect(),
        )
    )
    assert got == want and len(got) == 60
    with pytest.raises(Exception):
        pes.decode(poisoned).collect()


def test_colocated_join_no_payload_exchange(fact_chunks, dim):
    """colocated=True: nothing below the fact-side kernel may shuffle —
    the plan prints root-first, so the subtree after MapInArrow (stopping
    at the cached encode pipeline's InMemoryTableScan) must be
    exchange-free."""
    out = join_encoded(
        fact_chunks, ("k", "dk"), dim, columns=["rid", "v"], colocated=True
    )
    s = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in s, s
    below = s.split("MapInArrow", 1)[1].split("InMemoryTableScan", 1)[0]
    assert "Exchange hashpartitioning" not in below, below
