"""Arrow <-> Spark type mapping + value (de)serialization helpers.

Mirrors the reference's lossless schema conversion layer
(parquet-tensorflow Schema.java:242-257 toParquet/fromParquet, including
the int64 logical annotation at :155-169): every supported Spark type has
a stable `dtype` string stored per chunk-column row, so the chunk table
is self-describing exactly like a Parquet footer
(ExampleParquetReader.java:65-71 getSchema reads schema from footer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# dtype string (Spark simpleString) -> arrow type
SPARK_TO_ARROW = {
    "string": pa.string(),
    "bigint": pa.int64(),
    "int": pa.int32(),
    "smallint": pa.int16(),
    "tinyint": pa.int8(),
    "double": pa.float64(),
    "float": pa.float32(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
    "timestamp": pa.timestamp("us", tz="UTC"),
    "timestamp_ntz": pa.timestamp("us"),
    "date": pa.date32(),
    "array<bigint>": pa.list_(pa.int64()),
    "array<float>": pa.list_(pa.float32()),
    "array<double>": pa.list_(pa.float64()),
}

INT_DTYPES = {"bigint", "int", "smallint", "tinyint"}
# dtypes whose values travel through codecs as int64 (frame-of-reference path)
INTLIKE_DTYPES = INT_DTYPES | {"timestamp", "timestamp_ntz", "date", "boolean"}
FLOAT_DTYPES = {"double", "float"}
STRLIKE_DTYPES = {"string", "binary"}


def arrow_to_dtype(t: pa.DataType) -> str:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp" if t.tz is not None else "timestamp_ntz"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t):
        if pa.types.is_int64(t.value_type):
            return "array<bigint>"
        if pa.types.is_float32(t.value_type):
            return "array<float>"
        if pa.types.is_float64(t.value_type):
            return "array<double>"
    raise TypeError(f"unsupported column type for encoding: {t}")


def to_int64_values(arr: pa.Array, dtype: str) -> tuple[np.ndarray, np.ndarray]:
    """Int-like arrow array -> (int64 values with nulls as 0, null mask)."""
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    if dtype in ("timestamp", "timestamp_ntz"):
        arr = arr.cast(SPARK_TO_ARROW[dtype])
    filled = arr.cast(pa.int64()).fill_null(0)
    return filled.to_numpy(zero_copy_only=False).astype(np.int64), mask


def from_int64_values(vals: np.ndarray, mask: np.ndarray, dtype: str) -> pa.Array:
    base = pa.array(vals.astype(np.int64), type=pa.int64(), mask=mask)
    return base.cast(SPARK_TO_ARROW[dtype])


def str_buffers(arr: pa.Array) -> tuple[np.ndarray, bytes, np.ndarray]:
    """String/binary arrow array -> (lengths uint64, concatenated data, null mask).

    Null slots contribute zero-length; the mask restores them on decode.
    """
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    is_bin = pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
    target = pa.binary() if is_bin else pa.string()
    arr = arr.cast(target).fill_null(b"" if is_bin else "")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = arr.buffers()[2]
    data = data_buf.to_pybytes()[offsets[0] : offsets[-1]] if data_buf is not None else b""
    lengths = np.diff(offsets).astype(np.uint64)
    return lengths, data, mask


def str_from_buffers(lengths: np.ndarray, data: bytes, mask: np.ndarray, dtype: str) -> pa.Array:
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths.astype(np.int64), out=offsets[1:])
    t = pa.binary() if dtype == "binary" else pa.string()
    validity = None
    null_count = int(mask.sum())
    if null_count:
        validity = pa.py_buffer(np.packbits(~mask, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        t,
        n,
        [validity, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data)],
        null_count=null_count,
    )
