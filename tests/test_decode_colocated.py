"""Co-location-preserving decode (no payload shuffle) + structural
chunk-id collision detection + decimal engine round trip + by-schema
decode validation (ExampleParquetReader.java:41-45 withSchema)."""

from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F, types as T

import parquet_extra_spark as pes
from parquet_extra_spark.engine.decoder import ChunkDecodeError, check_colocated


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def chunks(docs):
    c = pes.encode(
        docs, partition_cols=["lang"], sort_cols=["doc_id"], chunk_rows=64,
        n_buckets=4, n_salts=2, num_partitions=8,
    ).cache()
    c.count()
    return c


def test_colocated_equals_shuffled(docs, chunks):
    schema_cols = pes.schema_from_struct(docs.schema)
    a = pes.decode(chunks, schema_cols=schema_cols, colocated=True)
    b = pes.decode(chunks, schema_cols=schema_cols, colocated=False)
    assert pes.roundtrip_ok(a, b)
    assert pes.roundtrip_ok(docs, a)


def test_colocated_no_exchange_in_plan(docs, chunks):
    schema_cols = pes.schema_from_struct(docs.schema)
    def above_cache(df):
        # the cached encode subtree legitimately contains its clustering
        # Exchange; what matters is the decode stage ABOVE the cache scan
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.split("InMemoryRelation")[0]

    plan = above_cache(pes.decode(chunks, schema_cols=schema_cols, colocated=True))
    assert "Exchange" not in plan, plan
    plan_shuffled = above_cache(
        pes.decode(chunks, schema_cols=schema_cols, colocated=False)
    )
    assert "Exchange" in plan_shuffled


def test_colocated_after_pruning(docs, chunks):
    """Broadcast semi-join pruning + column filter preserve co-location."""
    schema_cols = pes.schema_from_struct(docs.schema)
    out = pes.filter_decode(
        chunks, "n_chars", lower=100, upper=400,
        schema_cols=schema_cols, colocated=True,
    )
    want = docs.filter((F.col("n_chars") >= 100) & (F.col("n_chars") <= 400))
    assert pes.roundtrip_ok(want, out)


def test_check_colocated(spark, docs, chunks):
    assert check_colocated(chunks) is True
    scattered = chunks.repartition(8)  # round-robin: chunks split across partitions
    assert check_colocated(scattered) is False


def test_structural_collision_disjoint_columns(spark, docs):
    """Two colliding chunks with DISJOINT column sets and equal row counts
    must fail fast (the structural check, not the per-column duplicate
    check)."""
    left = pes.encode(
        docs.select("doc_id", "lang"), chunk_rows=64, n_buckets=2, n_salts=1,
        num_partitions=2,
    )
    right = pes.encode(
        docs.select("text", "source"), chunk_rows=64, n_buckets=2, n_salts=1,
        num_partitions=2,
    )
    # same (part_key, salt, seq) and no namespace -> same chunk_id, but the
    # source identity check still trips because column sets are disjoint
    # while the merged group spans two encodes. Force detection via seq
    # collision: rename right's part identity to differ in salt only.
    merged = left.unionByName(right)
    with pytest.raises(Exception, match="collision|missing columns"):
        pes.decode(merged).collect()


def test_namespaced_union_decodes(spark, docs):
    a = pes.encode(docs.limit(100), chunk_rows=64, n_buckets=2, n_salts=1,
                   num_partitions=2, uid_namespace="a")
    b = pes.encode(docs.limit(100), chunk_rows=64, n_buckets=2, n_salts=1,
                   num_partitions=2, uid_namespace="b")
    out = pes.decode(a.unionByName(b))
    assert out.count() == 200


def test_decimal_roundtrip_engine(spark):
    rows = [
        Row(k=i, d=Decimal(f"{i}.{i % 100:02d}"))
        for i in range(500)
    ] + [Row(k=500, d=None)]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("d", T.DecimalType(12, 2)),
    ])
    df = spark.createDataFrame(rows, schema)
    chunks = pes.encode(df, chunk_rows=128, n_buckets=2, n_salts=1, num_partitions=2)
    dec = pes.decode(chunks, schema_cols=pes.schema_from_struct(df.schema),
                     colocated=True)
    assert dec.schema["d"].dataType == T.DecimalType(12, 2)
    assert pes.roundtrip_ok(df, dec)


def test_decimal_pushdown_exact(spark):
    rows = [Row(k=i, d=Decimal(f"{i}.25")) for i in range(1000)]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("d", T.DecimalType(10, 2)),
    ])
    df = spark.createDataFrame(rows, schema)
    chunks = pes.encode(df, sort_cols=["k"], chunk_rows=100, n_buckets=1,
                        n_salts=1, num_partitions=1).cache()
    out = pes.filter_decode(chunks, "d", lower=Decimal("10.25"),
                            upper=Decimal("12.25"), colocated=True)
    assert sorted(r["k"] for r in out.collect()) == [10, 11, 12]
    st = pes.pushdown_stats(chunks, "d", Decimal("10.25"), Decimal("12.25"))
    assert st["chunks_skipped"] > 0


def test_expected_schema_validation(docs, chunks):
    ok = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
    ])
    pes.decode(chunks, columns=["doc_id"], expected_schema=ok,
               schema_cols=pes.schema_from_struct(docs.schema))
    bad_type = T.StructType([T.StructField("doc_id", T.IntegerType())])
    with pytest.raises(ChunkDecodeError, match="type mismatch"):
        pes.decode(chunks, expected_schema=bad_type,
                   schema_cols=pes.schema_from_struct(docs.schema))
    # Nullable absent column = schema evolution: reads as all-null
    # (ParquetExampleTest.scala:300-318 r6/r7 succeed) ...
    missing = T.StructType([T.StructField("nope", T.StringType())])
    out = pes.decode(chunks, columns=["doc_id", "nope"],
                     expected_schema=missing,
                     schema_cols=pes.schema_from_struct(docs.schema))
    assert out.where(F.col("nope").isNotNull()).count() == 0
    assert out.count() == docs.count()
    # ... but a REQUIRED (non-nullable) absent column still fails (r5).
    required = T.StructType([T.StructField("nope", T.StringType(), False)])
    with pytest.raises(ChunkDecodeError, match="not present"):
        pes.decode(chunks, expected_schema=required,
                   schema_cols=pes.schema_from_struct(docs.schema))


def test_null_filter_unknown_column_raises(chunks):
    with pytest.raises(ValueError, match="unknown"):
        pes.chunk_null_filter(chunks, "no_such_col", want_null=True)


def test_required_field_write_enforcement(spark):
    """A null in a required (nullable=False) column aborts the encode at
    write time — the reference's checkSize contract (Schema.java:95-128,
    ParquetExampleTest.scala:300-305)."""
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), False),
    ])
    good = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")],
                                 "k long, v string")
    assert pes.encode(good, chunk_rows=8, n_buckets=1, n_salts=1,
                      num_partitions=1, expected_schema=schema).count() > 0
    bad = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v=None)],
                                "k long, v string")
    with pytest.raises(Exception, match="required column 'v'"):
        pes.encode(bad, chunk_rows=8, n_buckets=1, n_salts=1,
                   num_partitions=1, expected_schema=schema).count()
    # declared-type mismatch fails at the driver, before any job runs
    wrong = T.StructType([T.StructField("k", T.IntegerType(), False)])
    with pytest.raises(TypeError, match="type mismatch"):
        pes.encode(good, expected_schema=wrong)
    with pytest.raises(ValueError, match="not in DataFrame"):
        pes.encode(good, expected_schema=T.StructType(
            [T.StructField("nope", T.LongType(), True)]))


def test_decode_checkpoint_auto_colocation(spark, docs, tmp_path):
    """Checkpoint write -> decode_checkpoint picks the no-shuffle path when
    the file layout preserves chunk contiguity, and stays correct either
    way."""
    out = str(tmp_path / "enc")
    pes.encode_to(docs, out, partition_cols=["lang"], chunk_rows=64,
                  n_buckets=4, n_salts=2, num_partitions=8)
    dec = pes.decode_checkpoint(spark, out)
    assert pes.roundtrip_ok(docs, dec)
    # explicit override still works
    dec2 = pes.decode_checkpoint(spark, out, colocated=False)
    assert pes.roundtrip_ok(docs, dec2)
    # projection through the checkpoint path
    proj = pes.decode_checkpoint(spark, out, columns=["doc_id", "lang"])
    assert sorted(proj.columns) == ["doc_id", "lang"]
    assert proj.count() == docs.count()
