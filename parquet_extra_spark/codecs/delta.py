"""Delta codec for int-like columns: zigzag(diff) + bit-packing.

Target: sorted or near-sorted sequences — event timestamps, sequential
ids, cumulative counters — where consecutive differences are tiny even
when the value range is huge (frame-of-reference can't help there).
Complements FOR in the trial-candidate set; the trial picks whichever
actually packs smaller on the chunk.

Sections: [meta {n, first, width, null_count}, null bitmap,
           bit-packed zigzag deltas (n-1 values)]
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap


def encode(arr: pa.Array, dtype: str) -> bytes:
    if not typemap.is_intlike(dtype):
        raise TypeError(f"delta codec requires int-like dtype, got {dtype}")
    n = len(arr)
    vals, mask = typemap.to_int64_values(arr, dtype)
    if n:
        # wrapping uint64 subtraction: differences of extreme int64 values
        # stay well-defined (two's complement), and the wrapping cumsum on
        # decode reconstructs exactly
        u = vals.view(np.uint64)
        diffs = (u[1:] - u[:-1]).view(np.int64)
        zz = packing.zigzag_encode(diffs)
        width = packing.bit_width(int(zz.max()) if len(zz) else 0)
        first = int(vals[0])
    else:
        zz = np.empty(0, dtype=np.uint64)
        width, first = 1, 0
    meta = {"n": n, "first": str(first), "width": width, "null_count": int(mask.sum())}
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_mask(mask) if mask.any() else b"",
            packing.pack_uints(zz, width),
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n, width = meta["n"], meta["width"]
    mask = packing.unpack_mask(secs[1], n) if meta["null_count"] else np.zeros(n, dtype=bool)
    if n == 0:
        return typemap.from_int64_values(np.empty(0, dtype=np.int64), mask, dtype)
    zz = packing.unpack_uints(secs[2], n - 1, width)
    diffs = packing.zigzag_decode(zz)
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = np.uint64(int(meta["first"]) & 0xFFFFFFFFFFFFFFFF)
    np.cumsum(diffs.view(np.uint64), out=vals[1:])
    vals[1:] += vals[0]
    return typemap.from_int64_values(vals.view(np.int64), mask, dtype)
