"""Schema-evolution semantics over the chunk table — the engine analogue
of the reference's evolution matrix (ParquetExampleTest.scala:263-326):
reading old data with a projection onto surviving columns succeeds, a
new column demanded of old data fails at decode with context (:300-305),
and a type change is rejected at schema discovery (:320-325)."""

import pytest

import parquet_extra_spark as pes


@pytest.fixture(scope="module")
def v1_v2_chunks(spark):
    v1 = spark.createDataFrame([(i, f"a{i}") for i in range(100)], "id bigint, a string")
    v2 = spark.createDataFrame(
        [(i, f"a{i}", i * 2) for i in range(100, 200)], "id bigint, a string, c bigint"
    )
    kw = dict(chunk_rows=64, n_buckets=2, n_salts=1, num_partitions=2)
    return (
        pes.encode(v1, uid_namespace="v1", **kw),
        pes.encode(v2, uid_namespace="v2", **kw),
    )


def test_projection_onto_common_columns_succeeds(spark, v1_v2_chunks):
    """New optional column ignored when not requested — old and new data
    decode together through the shared columns (widening tolerated,
    :294-297 analogue)."""
    c1, c2 = v1_v2_chunks
    mixed = c1.unionByName(c2)
    out = pes.decode(mixed, columns=["id", "a"])
    assert out.count() == 200
    assert out.columns == ["id", "a"]


def test_new_column_on_old_data_fails_with_context(spark, v1_v2_chunks):
    """Demanding the new column of chunks written without it fails at
    decode with the missing-column context (:300-305 analogue)."""
    c1, c2 = v1_v2_chunks
    mixed = c1.unionByName(c2)
    with pytest.raises(Exception, match="missing columns.*'c'"):
        pes.decode(mixed, columns=["id", "c"]).collect()


def test_new_optional_column_reads_as_null(spark, v1_v2_chunks):
    """Widened-schema read: a NULLABLE column absent from old chunks
    materializes as null (ParquetExampleTest.scala:300-318 — the new
    optional field reads as absent on old files, r6/r7)."""
    from pyspark.sql import types as T

    c1, c2 = v1_v2_chunks
    mixed = c1.unionByName(c2)
    widened = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("a", T.StringType(), True),
        T.StructField("c", T.LongType(), True),
    ])
    out = pes.decode(mixed, expected_schema=widened).collect()
    assert len(out) == 200
    by_id = {r["id"]: r for r in out}
    assert by_id[5]["c"] is None and by_id[5]["a"] == "a5"
    assert by_id[150]["c"] == 300


def test_new_optional_column_projection_keeps_old_rows(spark, v1_v2_chunks):
    """Selecting ONLY the new column must still yield one (null) row per
    old-data row — old chunks contribute via their anchor rows instead of
    vanishing from the projection."""
    from pyspark.sql import types as T

    c1, c2 = v1_v2_chunks
    mixed = c1.unionByName(c2)
    widened = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("c", T.LongType(), True),
    ])
    out = pes.decode(mixed, columns=["id", "c"], expected_schema=widened)
    rows = out.collect()
    assert len(rows) == 200
    assert sum(1 for r in rows if r["c"] is None) == 100
    only_c = pes.decode(mixed, columns=["c"], expected_schema=widened)
    assert only_c.count() == 200


def test_new_required_column_still_fails(spark, v1_v2_chunks):
    """A new NON-nullable column demanded of old data keeps failing — the
    reference's r5 case (required field missing from old files)."""
    from pyspark.sql import types as T

    c1, c2 = v1_v2_chunks
    mixed = c1.unionByName(c2)
    widened = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("a", T.StringType(), True),
        T.StructField("c", T.LongType(), False),
    ])
    with pytest.raises(Exception, match="missing columns.*'c'"):
        pes.decode(mixed, expected_schema=widened).collect()


def test_expected_column_never_written_and_required_fails_fast(spark, v1_v2_chunks):
    """A column in NO chunk at all: nullable reads as all-null, required
    fails at validation (driver-side, before any decode)."""
    from pyspark.sql import types as T

    c1, _ = v1_v2_chunks
    nullable = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("brand_new", T.StringType(), True),
    ])
    out = pes.decode(c1, expected_schema=nullable, columns=["id", "brand_new"])
    rows = out.collect()
    assert len(rows) == 100 and all(r["brand_new"] is None for r in rows)
    strict = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("brand_new", T.StringType(), False),
    ])
    with pytest.raises(pes.ChunkDecodeError, match="not present in chunk table"):
        pes.decode(c1, expected_schema=strict)


def test_unioned_tables_without_namespace_fail_fast(spark):
    """Colliding chunk ids from two independent encode() calls must fail
    loudly at decode, never silently merge chunks."""
    kw = dict(chunk_rows=64, n_buckets=2, n_salts=1, num_partitions=2)
    a = pes.encode(spark.createDataFrame([(i, "x") for i in range(50)], "id bigint, v string"), **kw)
    b = pes.encode(spark.createDataFrame([(i, "y") for i in range(50, 100)], "id bigint, v string"), **kw)
    with pytest.raises(Exception, match="duplicate chunk-table rows"):
        pes.decode(a.unionByName(b)).collect()


def test_type_change_rejected_at_discovery(spark):
    """The same column name with a different dtype across chunks is an
    inconsistent schema (:320-325 analogue) — rejected before any decode."""
    kw = dict(chunk_rows=64, n_buckets=2, n_salts=1, num_partitions=2)
    s1 = pes.encode(spark.createDataFrame([(1, "x")], "id bigint, v string"), **kw)
    s2 = pes.encode(spark.createDataFrame([(2, 7)], "id bigint, v bigint"), **kw)
    with pytest.raises(pes.ChunkDecodeError, match="inconsistent schema"):
        pes.decode(s1.unionByName(s2)).collect()
