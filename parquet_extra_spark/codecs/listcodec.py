"""List codec for array<primitive> columns (repeated fields).

Preserves the reference's repetition semantics exactly — null list vs
empty list are distinct, mirroring required/optional/repeated enforcement
in parquet-tensorflow (Schema.java:95-128 checkSize, tested
ParquetExampleTest.scala:182-195). Flat values are delegated to the
frame-of-reference codec (ints) or raw(+zstd) (floats, e.g. embedding
vectors).

Sections: [meta, null bitmap, packed list lengths, sub-encoded flat values]
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import forpack, framing, packing, raw

_FLAT = {
    "array<bigint>": ("bigint", pa.int64(), forpack),
    "array<int>": ("int", pa.int32(), forpack),
    "array<float>": ("float", pa.float32(), raw),
    "array<double>": ("double", pa.float64(), raw),
    "array<string>": ("string", pa.string(), raw),
    "array<boolean>": ("boolean", pa.bool_(), raw),
}


def encode(arr: pa.Array, dtype: str) -> bytes:
    if dtype not in _FLAT:
        raise TypeError(f"list codec supports {list(_FLAT)}, got {dtype}")
    flat_dtype, elem_t, sub = _FLAT[dtype]
    n = len(arr)
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    arr = arr.cast(pa.list_(elem_t))
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    lengths = np.diff(offsets).astype(np.uint64)
    lengths = np.where(mask, 0, lengths)  # null lists carry no values
    flat = arr.flatten()  # drops null-list slots
    lwidth = packing.bit_width(int(lengths.max()) if n else 0)
    vals_payload = sub.encode(flat, flat_dtype)
    meta = {"n": n, "null_count": int(mask.sum()), "lwidth": lwidth, "n_flat": len(flat)}
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(lengths, lwidth),
            vals_payload,
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    flat_dtype, elem_t, sub = _FLAT[dtype]
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n = meta["n"]
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    lengths = packing.unpack_uints(secs[2], n, meta["lwidth"]).astype(np.int64)
    flat = sub.decode(secs[3], flat_dtype)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    validity = None
    null_count = int(mask.sum())
    if null_count:
        validity = pa.py_buffer(np.packbits(~mask, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.list_(elem_t),
        n,
        [validity, pa.py_buffer(offsets.astype(np.int32).tobytes())],
        null_count=null_count,
        children=[flat],
    )
