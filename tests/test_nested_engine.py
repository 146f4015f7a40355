"""Nested data in the engine chunk path — Dremel-style shredding
(engine/nested.py) exercised on the reference's User-record shape
(parquet-schema schema.avsc:12-46: accounts array<Account>, address
struct, nested geo struct) with the reference's projection semantics
(Projection.scala:53-107 RECORD/UNION/ARRAY traversal, O3-O5)."""

import pytest
from pyspark.sql import Row, functions as F, types as T

import parquet_extra_spark as pes
from parquet_extra_spark.engine import nested as N

USER_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("email", T.StringType()),
    T.StructField("accounts", T.ArrayType(T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.IntegerType()),
    ]))),
    T.StructField("address", T.StructType([
        T.StructField("street1", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("zip", T.StringType()),
        T.StructField("geo", T.StructType([
            T.StructField("lat", T.DoubleType()),
            T.StructField("lon", T.DoubleType()),
        ])),
    ])),
    T.StructField("tags", T.ArrayType(T.StringType())),
])


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        Row(id=1, email="a@x.com",
            accounts=[Row(id=10, type="chk", name="main", amount=100),
                      Row(id=11, type="sav", name=None, amount=200)],
            address=Row(street1="1 Main", city="Springfield", zip="11111",
                        geo=Row(lat=1.5, lon=2.5)),
            tags=["x", "y"]),
        Row(id=2, email="b@x.com", accounts=[],
            address=Row(street1="2 Elm", city=None, zip="22222", geo=None),
            tags=[]),
        Row(id=3, email="c@x.com", accounts=None, address=None, tags=None),
        Row(id=4, email="d@x.com",
            accounts=[None, Row(id=12, type="chk", name="x", amount=1)],
            address=Row(street1=None, city="S", zip="44444",
                        geo=Row(lat=None, lon=0.0)),
            tags=["z", None]),
    ]
    return spark.createDataFrame(rows, USER_SCHEMA)


@pytest.fixture(scope="module")
def chunks(users):
    c = N.encode_nested(users, chunk_rows=16, n_buckets=2, n_salts=1,
                        num_partitions=2).cache()
    c.count()
    return c


def _json(df):
    return sorted(df.toJSON().collect())


def test_shred_unshred_identity(users):
    flat = N.shred(users)
    # every leaf is a flat engine-supported dtype
    for f in flat.schema.fields:
        assert not isinstance(f.dataType, (T.StructType, T.MapType))
    assert _json(N.unshred(flat, USER_SCHEMA)) == _json(users)


def test_shred_schema_matches_shred(users):
    flat = N.shred(users)
    cols = N.shred_schema(USER_SCHEMA)
    assert [c for c, _, _ in cols] == flat.columns
    assert [d for _, _, d in cols] == [
        f.dataType.simpleString() for f in flat.schema.fields
    ]


def test_engine_nested_roundtrip(users, chunks):
    out = N.decode_nested(chunks, USER_SCHEMA, colocated=True)
    assert _json(out) == _json(users)


def test_null_distinctions_survive(users, chunks):
    """null struct vs struct-of-nulls, null array vs empty array, null
    element vs element-with-null-field — all preserved (O4 union
    semantics, Projection.scala:75-84)."""
    out = {r["id"]: r for r in N.decode_nested(chunks, USER_SCHEMA).collect()}
    assert out[3]["address"] is None and out[3]["accounts"] is None
    assert out[2]["accounts"] == [] and out[2]["address"]["city"] is None
    assert out[4]["accounts"][0] is None
    assert out[4]["address"]["geo"]["lat"] is None
    assert out[2]["address"]["geo"] is None
    assert out[4]["tags"] == ["z", None] and out[2]["tags"] == []


def test_leaf_projection_struct_path(users, chunks):
    got = N.decode_nested(chunks, USER_SCHEMA, paths=["id", "address.zip"],
                          colocated=True)
    assert sorted(got.columns) == ["address.zip", "id"]
    want = {(1, "11111"), (2, "22222"), (3, None), (4, "44444")}
    assert {(r["id"], r["address.zip"]) for r in got.collect()} == want


def test_leaf_projection_decodes_only_needed_chunks(users, chunks):
    """Pruning reaches the chunk table: only the requested leaf's chunk
    rows are read past stats (the columnar-projection trick through
    nesting)."""
    needed = N.leaves_for(USER_SCHEMA, "address.zip")
    assert needed == ["address.zip"]
    deep = set(N.leaves_for(USER_SCHEMA, "address"))
    assert "address#def" in deep and "address.geo#def" in deep


def test_array_field_projection(users, chunks):
    got = N.decode_nested(chunks, USER_SCHEMA, paths=["id", "accounts.amount"],
                          colocated=True)
    vals = {r["id"]: r["accounts.amount"] for r in got.collect()}
    assert vals[1] == [100, 200]
    assert vals[2] == []
    assert vals[3] is None
    assert vals[4] == [None, 1]


def test_subtree_projection_rebuilds_nested(users, chunks):
    got = N.decode_nested(chunks, USER_SCHEMA, paths=["id", "accounts"],
                          colocated=True)
    vals = {r["id"]: r["accounts"] for r in got.collect()}
    assert vals[1][0]["type"] == "chk" and vals[1][1]["name"] is None
    assert vals[4][0] is None and vals[4][1]["amount"] == 1


def test_unknown_path_fails_fast(chunks):
    with pytest.raises(ValueError, match="unknown field path"):
        N.decode_nested(chunks, USER_SCHEMA, paths=["address.nope"])


def test_unsupported_shapes_rejected(spark):
    bad = T.StructType([T.StructField(
        "m", T.ArrayType(T.ArrayType(T.LongType())))])
    with pytest.raises(TypeError):
        N.shred_plan(bad)


def test_dotted_user_columns_encode(spark):
    """Arbitrary user column names containing dots survive encode/decode
    (the resolution-safe rename inside encode)."""
    df = spark.range(100).select(
        F.col("id").alias("a.b"), (F.col("id") * 2).alias("c d"),
    )
    chunks = pes.encode(df, chunk_rows=32, n_buckets=2, n_salts=1,
                        num_partitions=2)
    out = pes.decode(chunks, schema_cols=pes.schema_from_struct(df.schema),
                     colocated=True)
    assert sorted(out.columns) == ["a.b", "c d"]
    assert pes.roundtrip_ok(df, out)


def test_map_columns_roundtrip(spark):
    """Map columns shred to parallel key/value arrays and round-trip
    through the engine, preserving null map vs empty map."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        T.StructField("nested", T.StructType([
            T.StructField("inner", T.MapType(T.StringType(), T.StringType())),
        ])),
    ])
    rows = [
        Row(k=1, m={"a": 1, "b": 2}, nested=Row(inner={"x": "y"})),
        Row(k=2, m={}, nested=Row(inner=None)),
        Row(k=3, m=None, nested=None),
    ]
    df = spark.createDataFrame(rows, schema)
    flat = N.shred(df)
    assert "m#keys" in flat.columns and "nested.inner#vals" in flat.columns
    chunks = N.encode_nested(df, chunk_rows=8, n_buckets=2, n_salts=1,
                             num_partitions=2)
    out = {r["k"]: r for r in N.decode_nested(chunks, schema, colocated=True).collect()}
    assert out[1]["m"] == {"a": 1, "b": 2}
    assert out[1]["nested"]["inner"] == {"x": "y"}
    assert out[2]["m"] == {} and out[2]["nested"]["inner"] is None
    assert out[3]["m"] is None and out[3]["nested"] is None
    # map leaf projection
    proj = N.decode_nested(chunks, schema, paths=["k", "m"], colocated=True)
    assert {r["k"]: r["m"] for r in proj.collect()}[1] == {"a": 1, "b": 2}


def test_map_in_array_rejected(spark):
    bad = T.StructType([T.StructField(
        "a", T.ArrayType(T.MapType(T.StringType(), T.LongType())))])
    with pytest.raises(TypeError):
        N.shred_plan(bad)


def test_predicate_pushdown_on_nested_leaves(users, chunks):
    """Predicate trees work on shredded leaf columns (dotted names): the
    chunk-stats skip + exact recheck composes with nesting — EP2 over the
    User shape."""
    pred = pes.P.eq("address.zip", "11111") | pes.P.is_null("address.zip")
    out = pes.filter_decode_pred(
        chunks, pred, columns=["id", "address.zip"], colocated=True
    )
    got = {(r["id"], r["address.zip"]) for r in out.collect()}
    assert got == {(1, "11111"), (3, None)}


def test_filter_decode_nested_with_paths(users, chunks):
    """filter_decode_nested: dotted-path predicate -> leaf rewrite ->
    prune -> decode -> exact recheck -> nested projection, one call
    (Projection.scala + Predicate.scala composed over nested records)."""
    out = pes.filter_decode_nested(
        chunks, USER_SCHEMA, pes.P.eq("address.zip", "11111"),
        paths=["id", "address.geo"], colocated=True,
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["id"] == 1
    assert rows[0]["address.geo"]["lat"] == 1.5


def test_filter_decode_nested_full_shape(users, chunks):
    """paths=None reassembles the full nested row for matching rows."""
    out = pes.filter_decode_nested(
        chunks, USER_SCHEMA, pes.P.not_null("address.city") & pes.P.gt("id", 1),
        colocated=True,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {4}
    assert rows[4]["address"]["zip"] == "44444"


def test_filter_decode_nested_prunes_chunks(users, chunks):
    """The dotted-path predicate actually skips chunks via stats (the
    pushdown is real, not just a post-filter)."""
    from parquet_extra_spark.engine.nested import _rewrite_pred_paths

    leaf_pred = _rewrite_pred_paths(pes.P.eq("id", -999), USER_SCHEMA)
    stats = pes.pushdown_stats_pred(chunks, leaf_pred, N.shred_schema(USER_SCHEMA))
    assert stats["chunks_kept"] == 0 and stats["chunks_total"] > 0


def test_filter_decode_nested_rejects_array_paths(users, chunks):
    """Per-element predicates through arrays are rejected loudly, and
    container paths are rejected as non-scalar."""
    with pytest.raises(ValueError, match="array"):
        pes.filter_decode_nested(
            chunks, USER_SCHEMA, pes.P.gt("accounts.amount", 50)
        )
    with pytest.raises(ValueError, match="container"):
        pes.filter_decode_nested(chunks, USER_SCHEMA, pes.P.not_null("address"))
    with pytest.raises(ValueError, match="unknown field path"):
        pes.filter_decode_nested(chunks, USER_SCHEMA, pes.P.eq("address.nope", 1))
