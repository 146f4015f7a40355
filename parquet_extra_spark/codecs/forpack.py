"""Frame-of-reference + bit-packing codec for int-like columns.

Target: derived/sequential integers (doc_id, n_chars, orderkeys, dict
codes, timestamps-as-micros). values -> (value - min) deltas in wrapping
uint64 arithmetic -> width-minimal bit-pack.

Payload sections:
  0: meta {n, min (string, may exceed JSON float precision), width, null_count}
  1: null bitmap
  2: bit-packed deltas
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap


def encode(arr: pa.Array, dtype: str) -> bytes:
    if not typemap.is_intlike(dtype):
        raise TypeError(f"for codec requires int-like dtype, got {dtype}")
    n = len(arr)
    vals, mask = typemap.to_int64_values(arr, dtype)
    valid = vals[~mask]
    min_v = int(valid.min()) if len(valid) else 0
    u = vals.view(np.uint64) - np.uint64(min_v & 0xFFFFFFFFFFFFFFFF)
    u = u.copy()
    u[mask] = 0
    max_delta = int(u.max()) if n else 0
    width = packing.bit_width(max_delta)
    meta = {"n": n, "min": str(min_v), "width": width, "null_count": int(mask.sum())}
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(u, width),
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n, width, min_v = meta["n"], meta["width"], int(meta["min"])
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    u = packing.unpack_uints(secs[2], n, width)
    vals = (u + np.uint64(min_v & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    return typemap.from_int64_values(vals, mask, dtype)
