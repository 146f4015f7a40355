"""Raw codec: values stored as-is, zstd-compressed by the framing layer.

The fallback when no lightweight codec wins (high-entropy content such as
hex digests). Framing's per-section zstd keeps this at parity with the
reference Parquet(zstd) size bound (BASELINE.json north_rule).

Strings/binary sections: [meta, null bitmap, packed lengths, data bytes]
Int-like sections:       [meta, null bitmap, int64 LE bytes]
Floats:                  [meta, null bitmap, f8/f4 LE bytes]
Booleans:                [meta, null bitmap, packed bit values]
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap


def encode(arr: pa.Array, dtype: str) -> bytes:
    n = len(arr)
    if dtype in typemap.STRLIKE_DTYPES:
        lengths, data, mask = typemap.str_buffers(arr)
        lwidth = packing.bit_width(int(lengths.max()) if n else 0)
        meta = {"n": n, "null_count": int(mask.sum()), "lwidth": lwidth}
        secs = [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(lengths, lwidth),
            data,
        ]
    elif dtype == "boolean":
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        vals = arr.fill_null(False).to_numpy(zero_copy_only=False).astype(np.uint8)
        meta = {"n": n, "null_count": int(mask.sum())}
        secs = [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            np.packbits(vals, bitorder="little").tobytes(),
        ]
    elif typemap.is_intlike(dtype):
        vals, mask = typemap.to_int64_values(arr, dtype)
        meta = {"n": n, "null_count": int(mask.sum())}
        secs = [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            vals.astype("<i8").tobytes(),
        ]
    elif dtype in typemap.FLOAT_DTYPES:
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        np_t = "<f8" if dtype == "double" else "<f4"
        vals = arr.fill_null(0.0).to_numpy(zero_copy_only=False).astype(np_t)
        meta = {"n": n, "null_count": int(mask.sum())}
        secs = [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            vals.tobytes(),
        ]
    else:
        raise TypeError(f"raw codec: unsupported dtype {dtype}")
    return framing.pack_sections(secs)


def decode(payload: bytes, dtype: str) -> pa.Array:
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n = meta["n"]
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    if dtype in typemap.STRLIKE_DTYPES:
        lengths = packing.unpack_uints(secs[2], n, meta["lwidth"])
        return typemap.str_from_buffers(lengths, secs[3], mask, dtype)
    if dtype == "boolean":
        vals = np.unpackbits(
            np.frombuffer(secs[2], dtype=np.uint8), count=n, bitorder="little"
        ).astype(bool)
        return pa.array(vals, type=pa.bool_(), mask=mask)
    if typemap.is_intlike(dtype):
        vals = np.frombuffer(secs[2], dtype="<i8").copy()
        return typemap.from_int64_values(vals, mask, dtype)
    if dtype in typemap.FLOAT_DTYPES:
        np_t = "<f8" if dtype == "double" else "<f4"
        vals = np.frombuffer(secs[2], dtype=np_t)
        return pa.array(vals, type=typemap.spark_to_arrow(dtype), mask=mask)
    raise TypeError(f"raw codec: unsupported dtype {dtype}")
