"""Dictionary codec: distinct values + bit-packed codes.

Target: low-cardinality columns (lang, repo, event_type). The decision to
use it comes from the stats pass (engine/stats.py), mirroring how the
reference's scanner derives schema facts from one pass over the data
(parquet-tensorflow ExampleScanner.java:23-89).

Payload sections:
  0: meta JSON {n, dict_n, width, null_count}
  1: null bitmap (packed, empty if no nulls)
  2: bit-packed codes (width bits each)
  3: dictionary payload (type-dependent, see _values helpers)
  4: dictionary payload part 2 (string data; empty for numerics)
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap


def _dv_dtype(dtype: str) -> str:
    """Dictionary-values lane: boolean/timestamp/decimal normalize to int64
    codes-of-int64 (decimals as unscaled ints, typemap.decimal_to_unscaled)."""
    if dtype in ("boolean", "timestamp", "timestamp_ntz") or typemap.is_decimal(dtype):
        return "bigint"
    return dtype


def _encode_dict_values(dict_arr: pa.Array, dtype: str) -> tuple[bytes, bytes]:
    """Serialize the (null-free) dictionary values -> (section_a, section_b)."""
    if dtype in typemap.STRLIKE_DTYPES:
        lengths, data, _ = typemap.str_buffers(dict_arr)
        width = packing.bit_width(int(lengths.max()) if len(lengths) else 0)
        head = width.to_bytes(1, "little") + packing.pack_uints(lengths, width)
        return head, data
    if typemap.is_intlike(dtype):
        vals, _ = typemap.to_int64_values(dict_arr, dtype)
        return vals.astype("<i8").tobytes(), b""
    if dtype in typemap.FLOAT_DTYPES:
        np_t = "<f8" if dtype == "double" else "<f4"
        return dict_arr.to_numpy(zero_copy_only=False).astype(np_t).tobytes(), b""
    raise TypeError(f"dict codec: unsupported dtype {dtype}")


def _decode_dict_values(sec_a: bytes, sec_b: bytes, dict_n: int, dtype: str) -> pa.Array:
    if dtype in typemap.STRLIKE_DTYPES:
        width = sec_a[0]
        lengths = packing.unpack_uints(sec_a[1:], dict_n, width)
        return typemap.str_from_buffers(lengths, sec_b, np.zeros(dict_n, dtype=bool), dtype)
    if typemap.is_intlike(dtype):
        vals = np.frombuffer(sec_a, dtype="<i8")
        return typemap.from_int64_values(vals.copy(), np.zeros(dict_n, dtype=bool), dtype)
    if dtype in typemap.FLOAT_DTYPES:
        np_t = "<f8" if dtype == "double" else "<f4"
        return pa.array(np.frombuffer(sec_a, dtype=np_t), type=typemap.spark_to_arrow(dtype))
    raise TypeError(f"dict codec: unsupported dtype {dtype}")


def dict_encode_codes(arr: pa.Array, dtype: str) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Shared helper: -> (codes uint64 with nulls as 0, null mask, dictionary array)."""
    if dtype in ("timestamp", "timestamp_ntz"):
        arr = arr.cast(typemap.spark_to_arrow(dtype))
    if dtype == "boolean":
        arr = arr.cast(pa.int8())
    if typemap.is_decimal(dtype):
        arr = typemap.decimal_to_unscaled(arr, dtype)
    enc = arr.dictionary_encode()
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    codes = (
        enc.indices.fill_null(0).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    dict_arr = enc.dictionary
    if dtype in ("boolean", "timestamp", "timestamp_ntz"):
        dict_arr = dict_arr.cast(pa.int64())
    return codes, mask, dict_arr


def _dict_as_typed(dict_arr: pa.Array, dtype: str) -> pa.Array:
    if dtype in ("boolean", "timestamp", "timestamp_ntz"):
        return dict_arr  # kept as int64; converted back on take
    return dict_arr


def encode(arr: pa.Array, dtype: str) -> bytes:
    n = len(arr)
    codes, mask, dict_arr = dict_encode_codes(arr, dtype)
    dict_n = len(dict_arr)
    width = packing.bit_width(max(dict_n - 1, 0))
    dv_dtype = _dv_dtype(dtype)
    sec_a, sec_b = _encode_dict_values(_dict_as_typed(dict_arr, dtype), dv_dtype)
    meta = {"n": n, "dict_n": dict_n, "width": width, "null_count": int(mask.sum())}
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(codes, width),
            sec_a,
            sec_b,
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n, dict_n, width = meta["n"], meta["dict_n"], meta["width"]
    mask = (
        packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    )
    codes = packing.unpack_uints(secs[2], n, width).astype(np.int64)
    dv_dtype = _dv_dtype(dtype)
    dict_arr = _decode_dict_values(secs[3], secs[4], dict_n, dv_dtype)
    if dict_n == 0:
        # all-null chunk
        return pa.nulls(n, type=typemap.spark_to_arrow(dtype))
    idx = pa.array(codes, type=pa.int64(), mask=mask)
    out = dict_arr.take(idx)
    if dtype == "boolean":
        return out.cast(pa.bool_())
    if dtype in ("timestamp", "timestamp_ntz"):
        return out.cast(typemap.spark_to_arrow(dtype))
    if typemap.is_decimal(dtype):
        return typemap.unscaled_to_decimal(out, dtype)
    return out
