"""Property-based codec tests (hypothesis): arbitrary optional values must
round-trip bit-identically through every applicable codec — the reference's
round-trip oracle (ParquetExampleTest.scala:51-55) generalized from fixed
fixtures to generated inputs."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from parquet_extra_spark.codecs import decode_array, encode_array

_settings = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

opt_text = st.lists(
    st.none() | st.text(min_size=0, max_size=60), min_size=0, max_size=120
)
opt_binary = st.lists(
    st.none() | st.binary(min_size=0, max_size=60), min_size=0, max_size=120
)
opt_int = st.lists(
    st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=0,
    max_size=120,
)
opt_double = st.lists(
    st.none()
    | st.floats(allow_nan=False, width=64),
    min_size=0,
    max_size=120,
)
opt_bool = st.lists(st.none() | st.booleans(), min_size=0, max_size=120)
opt_list = st.lists(
    st.none()
    | st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=10),
    min_size=0,
    max_size=60,
)


def rt(values, patype, dtype, codecs):
    arr = pa.array(values, type=patype)
    for codec in codecs:
        out = decode_array(encode_array(arr, dtype, codec), dtype, codec)
        assert out.to_pylist() == arr.to_pylist(), (codec, dtype)


@_settings
@given(opt_text)
def test_string_property(values):
    rt(values, pa.string(), "string", ["dict", "rle", "raw", "fsst"])


@_settings
@given(opt_binary)
def test_binary_property(values):
    rt(values, pa.binary(), "binary", ["dict", "raw", "fsst"])


@_settings
@given(opt_int)
def test_bigint_property(values):
    rt(values, pa.int64(), "bigint", ["dict", "rle", "raw", "for", "delta"])


@_settings
@given(opt_double)
def test_double_property(values):
    rt(values, pa.float64(), "double", ["dict", "rle", "raw", "bss"])


@_settings
@given(opt_bool)
def test_boolean_property(values):
    rt(values, pa.bool_(), "boolean", ["dict", "rle", "raw"])


@_settings
@given(opt_list)
def test_list_property(values):
    rt(values, pa.list_(pa.int64()), "array<bigint>", ["list"])


@_settings
@given(opt_text)
def test_auto_selection_always_roundtrips(values):
    """Whatever codec the selector picks must round-trip."""
    from parquet_extra_spark.engine import stats as S

    arr = pa.array(values, type=pa.string())
    stt = S.compute_stats(arr, "string")
    codec, payload = S.choose_and_encode(arr, "string", stt)
    out = decode_array(payload, "string", codec)
    assert out.to_pylist() == arr.to_pylist(), codec


opt_decimal = st.lists(
    st.none()
    | st.decimals(
        min_value="-9999999999.99", max_value="9999999999.99", places=2,
        allow_nan=False, allow_infinity=False,
    ),
    min_size=0,
    max_size=120,
)
opt_str_list = st.lists(
    st.none() | st.lists(st.none() | st.text(max_size=12), max_size=8),
    min_size=0,
    max_size=60,
)
opt_bool_list = st.lists(
    st.none() | st.lists(st.none() | st.booleans(), max_size=8),
    min_size=0,
    max_size=60,
)
opt_int32_list = st.lists(
    st.none()
    | st.lists(st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=8),
    min_size=0,
    max_size=60,
)


@_settings
@given(opt_decimal)
def test_decimal_property(values):
    rt(values, pa.decimal128(12, 2), "decimal(12,2)",
       ["dict", "rle", "raw", "for", "delta"])


@_settings
@given(opt_str_list)
def test_array_string_property(values):
    rt(values, pa.list_(pa.string()), "array<string>", ["list"])


@_settings
@given(opt_bool_list)
def test_array_boolean_property(values):
    rt(values, pa.list_(pa.bool_()), "array<boolean>", ["list"])


@_settings
@given(opt_int32_list)
def test_array_int_property(values):
    rt(values, pa.list_(pa.int32()), "array<int>", ["list"])
