"""List codec for array<primitive> columns (repeated fields).

Preserves the reference's repetition semantics exactly — null list vs
empty list are distinct, mirroring required/optional/repeated enforcement
in parquet-tensorflow (Schema.java:95-128 checkSize, tested
ParquetExampleTest.scala:182-195). Flat values are delegated to the
frame-of-reference codec (ints), byte-stream-split vs raw decided by a
size trial (floats, e.g. embedding vectors), or raw(+zstd) otherwise;
the winning flat codec is recorded in the payload meta (``vcodec``), so
old payloads without the field decode through the historical default.

Sections: [meta, null bitmap, packed list lengths, sub-encoded flat values]
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import bss, forpack, framing, packing, raw

# dtype -> (flat dtype, arrow element type, default flat codec NAME);
# the default doubles as the decode fallback for payloads written before
# vcodec existed
_FLAT = {
    "array<bigint>": ("bigint", pa.int64(), "for"),
    "array<int>": ("int", pa.int32(), "for"),
    "array<float>": ("float", pa.float32(), "raw"),
    "array<double>": ("double", pa.float64(), "raw"),
    "array<string>": ("string", pa.string(), "raw"),
    "array<boolean>": ("boolean", pa.bool_(), "raw"),
}

_SUBS = {"for": forpack, "raw": raw, "bss": bss}

# full both-ways trial below this flat size; above it, trial on a
# contiguous prefix and encode only the winner full-size (same locality
# argument as engine/stats.choose_and_encode's prefix sampling)
_TRIAL_FULL_BYTES = 1 << 20
_TRIAL_SAMPLE_VALUES = 16384


def _encode_flat(flat: pa.Array, flat_dtype: str) -> tuple[str, bytes]:
    """Flat-values payload with a per-chunk raw-vs-bss size trial for
    floats (the parquet BYTE_STREAM_SPLIT decision, made from data
    instead of schema flags); other element types use the static map."""
    default = _FLAT[f"array<{flat_dtype}>"][2]
    if flat_dtype not in ("float", "double") or len(flat) == 0:
        return default, _SUBS[default].encode(flat, flat_dtype)
    width = 8 if flat_dtype == "double" else 4
    if len(flat) * width <= _TRIAL_FULL_BYTES:
        raw_p = raw.encode(flat, flat_dtype)
        bss_p = bss.encode(flat, flat_dtype)
        return ("bss", bss_p) if len(bss_p) < len(raw_p) else ("raw", raw_p)
    sample = flat.slice(0, _TRIAL_SAMPLE_VALUES)
    winner = (
        "bss"
        if len(bss.encode(sample, flat_dtype)) < len(raw.encode(sample, flat_dtype))
        else "raw"
    )
    return winner, _SUBS[winner].encode(flat, flat_dtype)


def encode(arr: pa.Array, dtype: str) -> bytes:
    if dtype not in _FLAT:
        raise TypeError(f"list codec supports {list(_FLAT)}, got {dtype}")
    flat_dtype, elem_t, _ = _FLAT[dtype]
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
    vcodec, vals_payload = _encode_flat(flat, flat_dtype)
    meta = {
        "n": n,
        "null_count": int(mask.sum()),
        "lwidth": lwidth,
        "n_flat": len(flat),
        "vcodec": vcodec,
    }
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(lengths, lwidth),
            vals_payload,
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    flat_dtype, elem_t, default_vcodec = _FLAT[dtype]
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n = meta["n"]
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    lengths = packing.unpack_uints(secs[2], n, meta["lwidth"]).astype(np.int64)
    flat = _SUBS[meta.get("vcodec", default_vcodec)].decode(secs[3], flat_dtype)
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
