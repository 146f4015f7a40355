"""Run-length codec over dictionary codes.

Target: sorted / runny columns (commit with 50-row runs, path prefixes,
l_returnflag after sort). Encode pipeline:
  values -> dictionary codes (nulls get sentinel code dict_n)
         -> runs (starts via vectorized change detection)
         -> bit-packed (run_values, run_lengths) + serialized dictionary.

Engine sorts within partitions before encoding (sortWithinPartitions) so
naturally-keyed data forms runs — the Spark-native analogue of the
reference writing records in schema order per row group
(ExampleWriteSupport.java:47-56), but organized for compression.

Payload sections:
  0: meta {n, dict_n, n_runs, vwidth, lwidth, has_null}
  1: bit-packed run values (codes; sentinel dict_n == null run)
  2: bit-packed run lengths
  3,4: dictionary payload (same format as dictionary codec)
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from . import framing, packing, typemap
from .dictionary import (
    _decode_dict_values,
    _dict_as_typed,
    _dv_dtype,
    _encode_dict_values,
    dict_encode_codes,
)


def encode(arr: pa.Array, dtype: str) -> bytes:
    n = len(arr)
    codes, mask, dict_arr = dict_encode_codes(arr, dtype)
    dict_n = len(dict_arr)
    codes = codes.copy()
    codes[mask] = dict_n  # null sentinel
    starts = packing.run_starts(codes)
    n_runs = len(starts)
    run_vals = codes[starts] if n_runs else np.empty(0, dtype=np.uint64)
    if n_runs:
        ends = np.concatenate([starts[1:], [n]])
        run_lens = (ends - starts).astype(np.uint64)
    else:
        run_lens = np.empty(0, dtype=np.uint64)
    vwidth = packing.bit_width(dict_n)  # sentinel included in range
    lwidth = packing.bit_width(int(run_lens.max()) if n_runs else 0)
    dv_dtype = _dv_dtype(dtype)
    sec_a, sec_b = _encode_dict_values(_dict_as_typed(dict_arr, dtype), dv_dtype)
    meta = {
        "n": n,
        "dict_n": dict_n,
        "n_runs": n_runs,
        "vwidth": vwidth,
        "lwidth": lwidth,
    }
    return framing.pack_sections(
        [
            json.dumps(meta).encode(),
            packing.pack_uints(run_vals, vwidth),
            packing.pack_uints(run_lens, lwidth),
            sec_a,
            sec_b,
        ]
    )


def decode(payload: bytes, dtype: str) -> pa.Array:
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    n, dict_n, n_runs = meta["n"], meta["dict_n"], meta["n_runs"]
    run_vals = packing.unpack_uints(secs[1], n_runs, meta["vwidth"]).astype(np.int64)
    run_lens = packing.unpack_uints(secs[2], n_runs, meta["lwidth"]).astype(np.int64)
    codes = np.repeat(run_vals, run_lens)
    assert len(codes) == n, f"rle decode length mismatch: {len(codes)} != {n}"
    mask = codes == dict_n
    if dict_n == 0:
        return pa.nulls(n, type=typemap.spark_to_arrow(dtype))
    dv_dtype = _dv_dtype(dtype)
    dict_arr = _decode_dict_values(secs[3], secs[4], dict_n, dv_dtype)
    codes = np.where(mask, 0, codes)
    idx = pa.array(codes, type=pa.int64(), mask=mask)
    out = dict_arr.take(idx)
    if dtype == "boolean":
        return out.cast(pa.bool_())
    if dtype in ("timestamp", "timestamp_ntz"):
        return out.cast(typemap.spark_to_arrow(dtype))
    if typemap.is_decimal(dtype):
        return typemap.unscaled_to_decimal(out, dtype)
    return out
