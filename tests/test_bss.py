"""Byte-stream-split codec: bit-exact round trips + size wins.

Same strategy as the other codec tests (SURVEY.md §5): round-trip as the
core oracle (ParquetExampleTest.scala:51-55) plus the property the codec
exists for — smaller-than-raw payloads on embedding-like floats.
"""

import math
import struct

import numpy as np
import pyarrow as pa
import pytest

from parquet_extra_spark.codecs import bss, decode_array, encode_array, raw
from parquet_extra_spark.codecs.listcodec import decode as list_decode
from parquet_extra_spark.codecs.listcodec import encode as list_encode


def _bits(v: float, double: bool) -> int:
    fmt = "<d" if double else "<f"
    ifmt = "<Q" if double else "<I"
    return struct.unpack(ifmt, struct.pack(fmt, v))[0]


@pytest.mark.parametrize("dtype", ["float", "double"])
def test_bss_roundtrip_with_nulls(dtype):
    t = pa.float64() if dtype == "double" else pa.float32()
    arr = pa.array([1.5, None, -2.25, 0.0, None, 3.0e8], type=t)
    out = decode_array(encode_array(arr, dtype, "bss"), dtype, "bss")
    assert out.to_pylist() == arr.to_pylist()


@pytest.mark.parametrize("dtype", ["float", "double"])
def test_bss_bit_exact_specials(dtype):
    """NaN (incl. a non-default payload), ±inf, and -0.0 survive bit-for-bit
    — the codec transposes raw bit patterns, it never goes through
    float parsing."""
    double = dtype == "double"
    t = pa.float64() if double else pa.float32()
    np_t = np.float64 if double else np.float32
    payload_nan = struct.unpack("<d", struct.pack("<Q", 0x7FF8000000000BAD))[0]
    vals = np.array(
        [math.nan, payload_nan, math.inf, -math.inf, -0.0, 1.0], dtype=np_t
    )
    arr = pa.array(vals, type=t)
    out = decode_array(encode_array(arr, dtype, "bss"), dtype, "bss")
    got = out.to_numpy(zero_copy_only=False).astype(np_t)
    assert [_bits(float(v), double) for v in got] == [
        _bits(float(v), double) for v in vals
    ]
    assert math.copysign(1.0, float(got[4])) == -1.0  # -0.0 kept


def test_bss_empty():
    arr = pa.array([], type=pa.float32())
    out = decode_array(encode_array(arr, "float", "bss"), "float", "bss")
    assert len(out) == 0


def _embedding_like(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 0.08).astype(np.float32)


def test_bss_beats_raw_on_embedding_floats():
    """The reason the codec exists: on unit-scale random floats plain zstd
    finds almost nothing, while grouped sign/exponent bytes compress."""
    arr = pa.array(_embedding_like(50000), type=pa.float32())
    bss_len = len(encode_array(arr, "float", "bss"))
    raw_len = len(encode_array(arr, "float", "raw"))
    assert bss_len < raw_len * 0.95


def test_bss_rejects_non_float():
    with pytest.raises(TypeError):
        bss.encode(pa.array([1, 2], type=pa.int64()), "bigint")


def test_list_codec_picks_bss_for_embeddings_and_roundtrips():
    vecs = _embedding_like(4000).reshape(500, 8)
    arr = pa.array([list(map(float, v)) for v in vecs], type=pa.list_(pa.float32()))
    payload = list_encode(arr, "array<float>")
    import json

    from parquet_extra_spark.codecs import framing

    meta = json.loads(framing.unpack_sections(payload)[0])
    assert meta["vcodec"] == "bss"
    out = list_decode(payload, "array<float>")
    assert out.to_pylist() == arr.to_pylist()
    # and the trial actually paid off vs forcing raw flat values
    flat = arr.flatten()
    assert len(payload) < len(raw.encode(flat, "float")) + 64


def test_list_codec_vcodec_fallback_for_legacy_payloads():
    """Payloads written before vcodec existed decode through the static
    default map."""
    import json

    from parquet_extra_spark.codecs import framing

    arr = pa.array([[1.0, 2.0], None, [0.5]], type=pa.list_(pa.float32()))
    payload = list_encode(arr, "array<float>")
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    vcodec = meta.pop("vcodec")
    if vcodec != "raw":
        # re-encode flat values with the legacy default so the stripped
        # meta stays consistent with the payload bytes
        from parquet_extra_spark.codecs import raw as rawmod

        secs[3] = rawmod.encode(arr.cast(pa.list_(pa.float32())).flatten(), "float")
    secs[0] = json.dumps(meta).encode()
    legacy = framing.pack_sections(secs)
    out = list_decode(legacy, "array<float>")
    assert out.to_pylist() == arr.to_pylist()


def test_scalar_float_selection_can_choose_bss():
    """Statistics-driven selection (engine/stats) includes bss in the float
    candidate set and the trial picks it on embedding-like data."""
    from parquet_extra_spark.engine import stats as stats_mod

    arr = pa.array(_embedding_like(3000), type=pa.float32())
    st = stats_mod.compute_stats(arr, "float")
    codec, payload = stats_mod.choose_and_encode(arr, "float", st)
    assert codec == "bss"
    out = decode_array(payload, "float", "bss")
    got = out.to_numpy(zero_copy_only=False)
    assert np.array_equal(
        got.view(np.uint32), arr.to_numpy(zero_copy_only=False).view(np.uint32)
    )
