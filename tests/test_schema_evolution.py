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
