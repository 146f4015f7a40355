"""Codec registry: name -> (encode, decode) over Arrow arrays.

Codec inventory mandated by BASELINE.json north_rule: dictionary, RLE,
FSST, bit-packing, frame-of-reference, plus the raw(+zstd) fallback and a
list codec for repeated fields. Selection is statistics-driven per
(partition, column, chunk) — see engine/stats.py, the analogue of the
reference's data-scanning schema inference (ExampleScanner.java:23-89).
"""

from __future__ import annotations

import pyarrow as pa

from . import bss, delta, dictionary, forpack, fsst, listcodec, raw, rle

CODECS = {
    "dict": dictionary,
    "rle": rle,
    "for": forpack,
    "delta": delta,
    "fsst": fsst,
    "raw": raw,
    "bss": bss,
    "list": listcodec,
}


def encode_array(arr: pa.Array, dtype: str, codec: str) -> bytes:
    return CODECS[codec].encode(arr, dtype)


def decode_array(payload: bytes, dtype: str, codec: str) -> pa.Array:
    return CODECS[codec].decode(payload, dtype)
