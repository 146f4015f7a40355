"""Schema serde & validation — O22/O23/O24.

The reference round-trips its schema internal⇄Parquet (Schema.java:242-257)
and internal⇄JSON via Jackson (Schema.java:261-273, tested
SchemaTest.scala:57-59), and rejects duplicate field names at build time
(Schema.java:208-213). Here the internal form is the chunk-table triple
list [(column, col_idx, dtype)]; JSON is the manifest interchange format;
Spark StructType is the "Parquet" side.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from ..codecs import typemap

SchemaCols = list[tuple[str, int, str]]


def validate_columns(columns: list[str]) -> None:
    """Duplicate-name rejection (Schema.java:209 contract)."""
    seen = set()
    dups = [c for c in columns if c in seen or seen.add(c)]
    if dups:
        raise ValueError(f"duplicate column names: {sorted(set(dups))}")


def from_struct(schema: T.StructType) -> SchemaCols:
    cols = []
    for i, f in enumerate(schema.fields):
        dt = f.dataType.simpleString()
        if not typemap.is_supported(dt):
            raise TypeError(f"column {f.name!r}: unsupported type {dt}")
        cols.append((f.name, i, dt))
    validate_columns([c for c, _, _ in cols])
    return cols


_DTYPE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
    "array<bigint>": T.ArrayType(T.LongType()),
    "array<int>": T.ArrayType(T.IntegerType()),
    "array<float>": T.ArrayType(T.FloatType()),
    "array<double>": T.ArrayType(T.DoubleType()),
    "array<string>": T.ArrayType(T.StringType()),
    "array<boolean>": T.ArrayType(T.BooleanType()),
}


def _dtype_to_spark(d: str) -> T.DataType:
    t = _DTYPE_TO_SPARK.get(d)
    if t is not None:
        return t
    p = typemap.decimal_params(d)
    if p is not None:
        return T.DecimalType(*p)
    raise TypeError(f"unsupported dtype {d}")


def to_struct(cols: SchemaCols) -> T.StructType:
    ordered = sorted(cols, key=lambda t: t[1])
    return T.StructType(
        [T.StructField(c, _dtype_to_spark(d), True) for c, _, d in ordered]
    )


def to_json(cols: SchemaCols) -> str:
    return json.dumps(
        [{"column": c, "col_idx": i, "dtype": d} for c, i, d in sorted(cols, key=lambda t: t[1])]
    )


def from_json(s: str) -> SchemaCols:
    rows = json.loads(s)
    cols = [(r["column"], int(r["col_idx"]), r["dtype"]) for r in rows]
    validate_columns([c for c, _, _ in cols])
    for c, _, d in cols:
        if not typemap.is_supported(d):
            raise TypeError(f"column {c!r}: unsupported type {d}")
    return cols
