"""Byte-stream-split codec for float/double columns.

The Spark-native analogue of Parquet's BYTE_STREAM_SPLIT encoding (the
option parquet-mr exposes per float column next to the plain/dictionary
encodings the reference inherits, ExampleParquetOutputFormat.java:7-14
writer configuration): the i-th byte of every IEEE-754 value is grouped
into stream i, so the low-entropy sign/exponent bytes compress together
instead of being interleaved with high-entropy mantissa bytes. The split
itself never shrinks data — the win comes from the framing layer's zstd
pass over the transposed bytes (typically 5-20% under raw+zstd on
embedding-like floats, where plain zstd finds almost nothing).

Bit-exact by construction: the transpose moves raw bit patterns, so NaN
payloads, -0.0, and ±inf survive the round trip unchanged (null slots
are normalized to 0.0 and restored from the mask, same as the raw codec).

Sections: [meta, null bitmap, byte-transposed values]
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap


def _np_type(dtype: str) -> str:
    if dtype == "double":
        return "<f8"
    if dtype == "float":
        return "<f4"
    raise TypeError(f"bss codec supports float/double, got {dtype}")


def encode(arr: pa.Array, dtype: str) -> bytes:
    np_t = _np_type(dtype)
    n = len(arr)
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    vals = arr.fill_null(0.0).to_numpy(zero_copy_only=False).astype(np_t)
    width = vals.dtype.itemsize
    # one vectorized transpose: value-major bytes -> stream-major bytes
    streams = np.ascontiguousarray(vals.view(np.uint8).reshape(n, width).T)
    meta = {"n": n, "null_count": int(mask.sum())}
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            streams.tobytes(),
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    np_t = _np_type(dtype)
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n = meta["n"]
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    width = np.dtype(np_t).itemsize
    streams = np.frombuffer(secs[2], dtype=np.uint8).reshape(width, n)
    vals = np.ascontiguousarray(streams.T).view(np_t).reshape(n)
    return pa.array(vals, type=typemap.spark_to_arrow(dtype), mask=mask)
