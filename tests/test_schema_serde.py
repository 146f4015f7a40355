"""Schema serde + validation tests (O22/O23/O24 — SchemaTest.scala:24-59,
Schema.java:208-213)."""

import pytest
from pyspark.sql import types as T

from parquet_extra_spark.engine import schema as S


def test_struct_json_roundtrip():
    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("tags", T.ArrayType(T.LongType())),
        ]
    )
    cols = S.from_struct(struct)
    assert cols == [
        ("id", 0, "bigint"),
        ("text", 1, "string"),
        ("score", 2, "double"),
        ("tags", 3, "array<bigint>"),
    ]
    # internal -> json -> internal (Jackson round-trip analogue)
    assert S.from_json(S.to_json(cols)) == cols
    # internal -> struct: names+types preserved, nullability normalized
    back = S.to_struct(cols)
    assert [f.name for f in back.fields] == ["id", "text", "score", "tags"]
    assert [f.dataType.simpleString() for f in back.fields] == [
        "bigint", "string", "double", "array<bigint>",
    ]


def test_duplicate_names_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        S.validate_columns(["a", "b", "a"])
    with pytest.raises(ValueError, match="duplicate"):
        S.from_json('[{"column":"a","col_idx":0,"dtype":"string"},'
                    '{"column":"a","col_idx":1,"dtype":"string"}]')


def test_unsupported_type_rejected():
    with pytest.raises(TypeError, match="unsupported"):
        S.from_struct(T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))]))
    with pytest.raises(TypeError, match="unsupported"):
        S.from_json('[{"column":"x","col_idx":0,"dtype":"map<string,int>"}]')
