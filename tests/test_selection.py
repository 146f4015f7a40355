"""Codec auto-selection decision-table tests (FIXTURES.md F4, mirroring
the reference's scanner property tests ExampleScannerTest.scala:40-108)."""

import hashlib

import numpy as np
import pyarrow as pa

from parquet_extra_spark.engine import stats as S


def pick(arr, dtype):
    return S.select_codec(arr, dtype, S.compute_stats(arr, dtype))


def test_constant_column_dict():
    assert pick(pa.array(["same"] * 5000), "string") in ("dict", "rle")


def test_low_cardinality_dict():
    vals = [f"v{i % 20}" for i in range(50000)]
    # shuffle deterministically so runs don't dominate
    rng = np.random.RandomState(7)
    idx = rng.permutation(len(vals))
    arr = pa.array([vals[i] for i in idx])
    assert pick(arr, "string") == "dict"


def test_sorted_runs_beats_plain_dict():
    """Sorted runs: selection is size-optimal among candidates. rle and
    raw+zstd trade places depending on zstd's interplay with run layout;
    plain dict must never win here."""
    from parquet_extra_spark.codecs import encode_array

    arr = pa.array(sorted([f"commit{i // 40:05d}" for i in range(50000)]))
    sel = pick(arr, "string")
    assert sel in ("rle", "raw")
    sizes = {c: len(encode_array(arr, "string", c)) for c in ("dict", "rle", "raw")}
    assert sizes[sel] == min(sizes.values())


def test_small_ints_for():
    rng = np.random.RandomState(7)
    arr = pa.array(rng.randint(1000, 1256, size=50000).astype(np.int64), type=pa.int64())
    assert pick(arr, "bigint") == "for"


def test_repetitive_text_fsst():
    arr = pa.array(
        [
            f"import os\nimport sys\n\nclass Handler{hashlib.md5(str(i).encode()).hexdigest()[:6]}:\n"
            f"    def process(self, request):\n        return self.backend.execute(request)\n"
            for i in range(5000)
        ]
    )
    assert pick(arr, "string") == "fsst"


def test_high_entropy_raw():
    arr = pa.array([hashlib.sha512(str(i).encode()).hexdigest() for i in range(5000)])
    assert pick(arr, "string") == "raw"


def test_sample_agrees_with_full_chunk():
    """Prefix-monotonicity analogue: selection on a sample prefix agrees
    with selection on the full chunk for the crafted shapes."""
    rng = np.random.RandomState(11)
    shapes = {
        "dict": pa.array([f"value_{x}" for x in rng.randint(0, 20, size=40000)]),
        "raw": pa.array([hashlib.sha512(str(i).encode()).hexdigest() for i in range(4000)]),
    }
    for expected, arr in shapes.items():
        full = pick(arr, "string")
        half = pick(arr.slice(0, len(arr) // 2), "string")
        assert full == half == expected


def test_array_always_list():
    arr = pa.array([[1, 2]] * 100, type=pa.list_(pa.int64()))
    assert pick(arr, "array<bigint>") == "list"
