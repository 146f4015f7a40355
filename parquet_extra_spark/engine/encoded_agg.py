"""Aggregation pushed into the encoded layout — compute over compressed.

``metadata_profile`` (engine/aggregates.py) answers count/min/max from
chunk stats alone. This module goes one layer deeper: grouped counts and
grouped sums computed from the *codec structures themselves* — dictionary
codes and RLE runs — without materializing the column's values:

* a dict-encoded chunk yields per-value counts from one ``np.bincount``
  over its (bit-unpacked) codes; the values decoded are the DICTIONARY
  (``distinct`` entries), never the ``n_values`` rows;
* an RLE chunk is even cheaper: run lengths summed per run value — the
  count arrives without touching per-row data at all;
* any other codec falls back to a full single-column decode + vectorized
  ``value_counts`` (still no per-row Python).

The classic C-Store/column-store "operate directly on compressed data"
argument (Abadi et al., SIGMOD'06 — public literature), realized
Spark-first: the per-chunk kernel emits tiny partial-aggregate rows and
Catalyst finishes with an ordinary groupBy, so the shuffle carries
(distinct-value, count) pairs instead of the column. At 100 TB a
``GROUP BY lang`` over a dict/RLE-encoded column reads payload bytes
proportional to the dictionaries, and the shuffle is ~n_chunks×distinct
rows — both thousands of times smaller than the data.

Reference anchor: the same statistics the reference's scanner derives by
scanning raw data (ExampleScanner.java:23-89) are derived here from the
encoded form directly.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from ..codecs import decode_array, framing, packing, typemap
from ..codecs.dictionary import _decode_dict_values, _dv_dtype
from .decoder import discover_schema


def _column_dtype(chunks: DataFrame, column: str) -> str:
    for c, _, d in discover_schema(chunks):
        if c == column:
            return d
    raise ValueError(f"unknown column: {column!r}")


def _typed_dict(dict_arr: pa.Array, dtype: str) -> pa.Array:
    """Dictionary values in the storage lane (int64 for ts/bool/decimal)
    -> the column's real Arrow type (same conversions as dictionary.decode)."""
    if dtype == "boolean":
        return dict_arr.cast(pa.bool_())
    if dtype in ("timestamp", "timestamp_ntz"):
        return dict_arr.cast(typemap.spark_to_arrow(dtype))
    if typemap.is_decimal(dtype):
        return typemap.unscaled_to_decimal(dict_arr, dtype)
    return dict_arr


def _codes_and_dict(
    payload: bytes, dtype: str, codec: str, n_values: int
) -> tuple[np.ndarray, pa.Array, int]:
    """-> (codes int64 with null sentinel == len(dict), typed dictionary,
    null_count). For dict/rle this reads codec structures only; for any
    other codec it decodes the column once and dictionary-encodes it."""
    if codec == "dict":
        secs = framing.unpack_sections(payload)
        meta = json.loads(secs[0])
        n, dict_n, width = meta["n"], meta["dict_n"], meta["width"]
        codes = packing.unpack_uints(secs[2], n, width).astype(np.int64)
        if meta["null_count"]:
            mask = packing.unpack_mask(secs[1], n)
            codes[mask] = dict_n
        dict_arr = _decode_dict_values(secs[3], secs[4], dict_n, _dv_dtype(dtype))
        return codes, _typed_dict(dict_arr, dtype), meta["null_count"]
    if codec == "rle":
        secs = framing.unpack_sections(payload)
        meta = json.loads(secs[0])
        dict_n, n_runs = meta["dict_n"], meta["n_runs"]
        run_vals = packing.unpack_uints(secs[1], n_runs, meta["vwidth"]).astype(np.int64)
        run_lens = packing.unpack_uints(secs[2], n_runs, meta["lwidth"]).astype(np.int64)
        codes = np.repeat(run_vals, run_lens)  # sentinel dict_n == null
        dict_arr = _decode_dict_values(secs[3], secs[4], dict_n, _dv_dtype(dtype))
        null_count = int(run_lens[run_vals == dict_n].sum())
        return codes, _typed_dict(dict_arr, dtype), null_count
    arr = decode_array(payload, dtype, codec)
    enc = arr.dictionary_encode()
    dict_arr = enc.dictionary
    mask = arr.is_null().to_numpy(zero_copy_only=False)
    codes = enc.indices.fill_null(0).cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
    codes[mask] = len(dict_arr)
    return codes, dict_arr, int(mask.sum())


def _rle_value_counts(payload: bytes, dtype: str) -> tuple[pa.Array, np.ndarray, int]:
    """RLE fast path: counts from run lengths alone — codes are never
    expanded to row scale."""
    secs = framing.unpack_sections(payload)
    meta = json.loads(secs[0])
    dict_n, n_runs = meta["dict_n"], meta["n_runs"]
    run_vals = packing.unpack_uints(secs[1], n_runs, meta["vwidth"]).astype(np.int64)
    run_lens = packing.unpack_uints(secs[2], n_runs, meta["lwidth"]).astype(np.int64)
    counts = np.bincount(run_vals, weights=run_lens, minlength=dict_n + 1).astype(np.int64)
    dict_arr = _decode_dict_values(secs[3], secs[4], dict_n, _dv_dtype(dtype))
    return _typed_dict(dict_arr, dtype), counts[:dict_n], int(counts[dict_n])


def value_counts_encoded(chunks: DataFrame, column: str) -> DataFrame:
    """``SELECT value, count(*) GROUP BY value`` over one encoded column,
    computed from codec structures (see module docstring). Output columns:
    (value:<column dtype>, cnt:bigint); a null group appears when the
    column has nulls — exactly SQL GROUP BY semantics."""
    dtype = _column_dtype(chunks, column)
    out_t = typemap.spark_to_arrow(dtype)
    work = chunks.filter(F.col("column") == column).select(
        "codec", "payload", "n_values"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for i in range(batch.num_rows):
                codec = batch.column("codec")[i].as_py()
                payload = batch.column("payload")[i].as_py()
                n_values = batch.column("n_values")[i].as_py()
                if codec == "rle":
                    dict_arr, counts, null_count = _rle_value_counts(payload, dtype)
                else:
                    codes, dict_arr, null_count = _codes_and_dict(
                        payload, dtype, codec, n_values
                    )
                    counts = np.bincount(codes, minlength=len(dict_arr) + 1).astype(
                        np.int64
                    )[: len(dict_arr)]
                values = dict_arr.cast(out_t)
                cnts = pa.array(counts, type=pa.int64())
                if null_count:
                    values = pa.concat_arrays([values, pa.nulls(1, type=out_t)])
                    cnts = pa.concat_arrays(
                        [cnts, pa.array([null_count], type=pa.int64())]
                    )
                if len(values):
                    yield pa.RecordBatch.from_arrays([values, cnts], ["value", "cnt"])

    partials = work.mapInArrow(fn, schema=f"value {dtype}, cnt bigint")
    return partials.groupBy("value").agg(F.sum("cnt").alias("cnt"))


def group_stats_encoded(chunks: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """Grouped count/sum/min/max in one encoded-side pass:
    ``SELECT key, count(*), count(val), sum(val), min(val), max(val)
    GROUP BY key`` with the key read as dictionary codes (module
    docstring). Value column must be int-like (exact int64 lanes).
    Output: (key, n_rows, n_vals, s, mn, mx) — s/mn/mx NULL for groups
    whose values are all null, SQL semantics."""
    key_dtype = _column_dtype(chunks, key_col)
    val_dtype = _column_dtype(chunks, val_col)
    if val_dtype not in typemap.INT_DTYPES:
        # plain ints only: timestamps/dates would need unit-aware casts
        # of the min/max back from the int64 lane
        raise TypeError(
            f"group_stats_encoded needs an integer value column, got {val_dtype}"
        )
    out_t = typemap.spark_to_arrow(key_dtype)
    spark = chunks.sparkSession
    work = (
        chunks.filter(F.col("column").isin([key_col, val_col]))
        .select("chunk_id", "column", "codec", "payload", "n_values")
        .repartition(spark.sparkContext.defaultParallelism, "chunk_id")
        .sortWithinPartitions("chunk_id", "column")
    )
    I64 = np.iinfo(np.int64)

    def emit(group: dict) -> pa.RecordBatch:
        missing = [c for c in (key_col, val_col) if c not in group]
        if missing:
            raise ValueError(
                f"chunk is missing column rows for {missing} —"
                " group_stats_encoded needs both columns in the chunk table"
            )
        k_codec, k_payload, k_n = group[key_col]
        v_codec, v_payload, _ = group[val_col]
        codes, dict_arr, _ = _codes_and_dict(k_payload, key_dtype, k_codec, k_n)
        varr = decode_array(v_payload, val_dtype, v_codec)
        vals, vmask = typemap.to_int64_values(varr, val_dtype)
        m = len(dict_arr) + 1  # + null-key group
        sums = np.zeros(m, dtype=np.int64)
        np.add.at(sums, codes, np.where(vmask, 0, vals))
        nn = np.bincount(codes[~vmask], minlength=m).astype(np.int64)
        n_rows = np.bincount(codes, minlength=m).astype(np.int64)
        mins = np.full(m, I64.max, dtype=np.int64)
        maxs = np.full(m, I64.min, dtype=np.int64)
        nn_codes = codes[~vmask]
        np.minimum.at(mins, nn_codes, vals[~vmask])
        np.maximum.at(maxs, nn_codes, vals[~vmask])
        keys = pa.concat_arrays([dict_arr.cast(out_t), pa.nulls(1, type=out_t)])
        keep = n_rows > 0
        idx = pa.array(np.flatnonzero(keep), type=pa.int64())
        has = nn[keep] > 0
        return pa.RecordBatch.from_arrays(
            [
                keys.take(idx),
                pa.array(n_rows[keep], type=pa.int64()),
                pa.array(nn[keep], type=pa.int64()),
                pa.array(sums[keep], type=pa.int64()),
                pa.array(mins[keep], type=pa.int64(), mask=~has),
                pa.array(maxs[keep], type=pa.int64(), mask=~has),
            ],
            ["key", "n_rows", "nn", "s", "mn", "mx"],
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: dict = {}
        cur = None
        for batch in batches:
            for i in range(batch.num_rows):
                cid = batch.column("chunk_id")[i].as_py()
                if cid != cur and pending:
                    yield emit(pending)
                    pending = {}
                cur = cid
                pending[batch.column("column")[i].as_py()] = (
                    batch.column("codec")[i].as_py(),
                    batch.column("payload")[i].as_py(),
                    batch.column("n_values")[i].as_py(),
                )
        if pending:
            yield emit(pending)

    partials = work.mapInArrow(
        fn,
        schema=(
            f"key {key_dtype}, n_rows bigint, nn bigint, s bigint,"
            " mn bigint, mx bigint"
        ),
    )
    val_spark = val_dtype
    return partials.groupBy("key").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("nn").alias("n_vals"),
        F.when(F.sum("nn") > 0, F.sum("s")).otherwise(F.lit(None)).alias("s"),
        F.min("mn").cast(val_spark).alias("mn"),
        F.max("mx").cast(val_spark).alias("mx"),
    )


def group_sum_encoded(chunks: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """``SELECT key, sum(val) GROUP BY key`` with the key side read from
    codec structures: per chunk, the key's dictionary codes weight one
    ``np.bincount`` over the value column — the key's values materialize
    only at dictionary scale. Value column must be int-like (exact int64
    arithmetic; matches SQL SUM which ignores null values, and yields a
    NULL sum for groups whose values are all null). Output columns:
    (key:<key dtype>, s:bigint)."""
    key_dtype = _column_dtype(chunks, key_col)
    val_dtype = _column_dtype(chunks, val_col)
    if not typemap.is_intlike(val_dtype) or val_dtype == "boolean" or typemap.is_decimal(val_dtype):
        raise TypeError(
            f"group_sum_encoded needs an int-like value column, got {val_dtype}"
        )
    out_t = typemap.spark_to_arrow(key_dtype)
    spark = chunks.sparkSession
    work = (
        chunks.filter(F.col("column").isin([key_col, val_col]))
        .select("chunk_id", "column", "codec", "payload", "n_values")
        .repartition(spark.sparkContext.defaultParallelism, "chunk_id")
        .sortWithinPartitions("chunk_id", "column")
    )

    def emit(group: dict) -> pa.RecordBatch | None:
        if key_col not in group or val_col not in group:
            missing = [c for c in (key_col, val_col) if c not in group]
            raise ValueError(
                f"chunk is missing column rows for {missing} — group_sum_encoded"
                " needs both columns encoded in the same chunk table"
            )
        k_codec, k_payload, k_n = group[key_col]
        v_codec, v_payload, _ = group[val_col]
        codes, dict_arr, _ = _codes_and_dict(k_payload, key_dtype, k_codec, k_n)
        varr = decode_array(v_payload, val_dtype, v_codec)
        vals, vmask = typemap.to_int64_values(varr, val_dtype)
        m = len(dict_arr) + 1  # + null-key group
        # int64-exact: bincount(weights=) goes through float64 — sum per
        # group via np.add.at on an int64 accumulator instead
        sums = np.zeros(m, dtype=np.int64)
        np.add.at(sums, codes, np.where(vmask, 0, vals))
        nn = np.bincount(codes[~vmask], minlength=m).astype(np.int64)
        keys = pa.concat_arrays([dict_arr.cast(out_t), pa.nulls(1, type=out_t)])
        keep = (nn > 0) | (
            np.bincount(codes, minlength=m)[:m] > 0
        )  # groups present in this chunk
        idx = pa.array(np.flatnonzero(keep), type=pa.int64())
        return pa.RecordBatch.from_arrays(
            [
                keys.take(idx),
                pa.array(sums[keep], type=pa.int64()),
                pa.array(nn[keep], type=pa.int64()),
            ],
            ["key", "s", "nn"],
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: dict = {}
        cur = None
        for batch in batches:
            for i in range(batch.num_rows):
                cid = batch.column("chunk_id")[i].as_py()
                if cid != cur and pending:
                    out = emit(pending)
                    if out is not None:
                        yield out
                    pending = {}
                cur = cid
                pending[batch.column("column")[i].as_py()] = (
                    batch.column("codec")[i].as_py(),
                    batch.column("payload")[i].as_py(),
                    batch.column("n_values")[i].as_py(),
                )
        if pending:
            out = emit(pending)
            if out is not None:
                yield out

    partials = work.mapInArrow(fn, schema=f"key {key_dtype}, s bigint, nn bigint")
    return partials.groupBy("key").agg(
        F.when(F.sum("nn") > 0, F.sum("s")).otherwise(F.lit(None)).alias("s")
    )
