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


def _pair_work(
    chunks: DataFrame, cols: list[str], colocated: bool
) -> DataFrame:
    """The chunk rows of ``cols``, arranged so each chunk's group is
    contiguous inside one partition.

    ``colocated=True`` — **no shuffle** (mirrors decode's contract,
    engine/decoder.py): encode() output and narrow transformations of it
    keep every chunk's rows in one partition, so an in-partition sort
    suffices and the ONLY exchange in the whole aggregate carries
    (value, partial) pairs. At 100 TB that is the difference between
    shuffling the compressed table and shuffling kilobytes of partials.
    ``colocated=False`` (default) repartitions on chunk_id first — always
    safe for arbitrary chunk tables (unions, file reads of unknown
    layout); ``decoder.check_colocated`` can verify file-backed tables
    metadata-only before opting in."""
    work = chunks.filter(F.col("column").isin(list(cols))).select(
        "chunk_id", "column", "codec", "payload", "n_values"
    )
    if not colocated:
        spark = chunks.sparkSession
        work = work.repartition(spark.sparkContext.defaultParallelism, "chunk_id")
    return work.sortWithinPartitions("chunk_id", "column")


def _pair_stream(batches: Iterator[pa.RecordBatch], emit) -> Iterator[pa.RecordBatch]:
    """Group contiguous (chunk_id) rows and hand {column: (codec, payload,
    n_values)} dicts to ``emit``."""
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


def _norm_keys(op: str, key_cols, val_col: str) -> tuple[list[str], bool]:
    """-> (key column list, single-key flag). Single-key keeps the legacy
    output column name ``key``; multi-key outputs the real column names."""
    single = isinstance(key_cols, str)
    keys = [key_cols] if single else list(key_cols)
    if not keys:
        raise ValueError(f"{op} needs at least one key column")
    if len(set(keys)) != len(keys):
        raise ValueError(f"{op}: duplicate key columns {keys}")
    if val_col in keys:
        raise ValueError(f"{op}: value column {val_col!r} cannot also be a key")
    return keys, single


def _key_codes(
    group: dict, key_cols: list[str], key_dtypes: dict[str, str]
) -> tuple[np.ndarray, int, list[pa.Array]]:
    """-> (compact group codes per row, group count m, one key Array of
    length m per key column). Each key column's dictionary codes come from
    the codec structures (_codes_and_dict, null sentinel = len(dict));
    the composite key is compacted with np.unique over the STACKED code
    columns — no cross-key stride arithmetic, so any key count and any
    per-key cardinality fits without overflow. Every returned group is
    present in the chunk (dense), and a null key value decodes to a null
    element exactly as SQL GROUP BY groups nulls."""
    per, dicts = [], []
    for c in key_cols:
        codec, payload, n = group[c]
        codes, dict_arr, _ = _codes_and_dict(payload, key_dtypes[c], codec, n)
        per.append(codes)
        dicts.append(dict_arr)
    stacked = np.stack(per, axis=1)
    uniq, inv = np.unique(stacked, axis=0, return_inverse=True)
    outs = []
    for k, c in enumerate(key_cols):
        out_t = typemap.spark_to_arrow(key_dtypes[c])
        full = pa.concat_arrays(
            [dicts[k].cast(out_t), pa.nulls(1, type=out_t)]
        )  # index len(dict) == the null sentinel
        outs.append(full.take(pa.array(uniq[:, k], type=pa.int64())))
    return inv.astype(np.int64).ravel(), len(uniq), outs


def _val_lane(op: str, val_dtype: str) -> tuple[str, str]:
    """-> (lane, SQL type of the SUM) for a value column. Three lanes:

    * int    — exact int64 accumulation (SUM(int) -> bigint);
    * float  — float64 accumulation (SUM(float/double) -> double, the
               SQL standard promotion);
    * decimal— exact arbitrary-precision accumulation of the int64
               unscaled lane (object-dtype adds: chunk-local sums of
               decimal(18) values overflow int64), SUM -> decimal(38,s).

    timestamps/dates/booleans are rejected exactly as SQL SUM rejects
    them (metadata_agg serves their min/max)."""
    if val_dtype in typemap.INT_DTYPES:
        return "int", "bigint"
    if val_dtype in typemap.FLOAT_DTYPES:
        return "float", "double"
    if typemap.is_decimal(val_dtype):
        _, s = typemap.decimal_params(val_dtype)
        return "decimal", f"decimal(38,{s})"
    raise TypeError(
        f"{op} needs an int, float, or decimal value column, got {val_dtype}"
        " (SQL SUM rejects timestamps/dates/booleans; use metadata_agg for"
        " their min/max)"
    )


def _extract_vals(varr: pa.Array, val_dtype: str, lane: str):
    """-> (vals ndarray with nulls zeroed, null mask). int/decimal lanes
    are exact int64; float lane is float64."""
    if lane == "int":
        return typemap.to_int64_values(varr, val_dtype)
    if lane == "float":
        mask = varr.is_null().to_numpy(zero_copy_only=False)
        vals = (
            varr.cast(pa.float64()).fill_null(0.0).to_numpy(zero_copy_only=False)
        )
        return vals, mask
    ints = typemap.decimal_to_unscaled(varr, val_dtype)
    mask = ints.is_null().to_numpy(zero_copy_only=False)
    return ints.fill_null(0).to_numpy(zero_copy_only=False), mask


def _group_sums(codes, vals, vmask, m: int, lane: str) -> np.ndarray:
    """Per-group sums over dictionary codes (nulls contribute 0)."""
    contrib = np.where(vmask, 0, vals)
    if lane == "decimal":
        # exact beyond int64: astype(object) yields Python ints, whose
        # addition is arbitrary-precision (no per-row Python in the hot
        # paths — this lane only runs for decimal value columns)
        sums = np.zeros(m, dtype=object)
        np.add.at(sums, codes, contrib.astype(object))
        return sums
    sums = np.zeros(m, dtype=np.float64 if lane == "float" else np.int64)
    np.add.at(sums, codes, contrib)
    return sums


def _sum_arrow(sums, keep, lane: str, sum_sql: str) -> pa.Array:
    if lane == "decimal":
        import decimal as _dec

        _, s = typemap.decimal_params(sum_sql)
        return pa.array(
            [_dec.Decimal(int(v)).scaleb(-s) for v in sums[keep]],
            type=pa.decimal128(38, s),
        )
    t = pa.float64() if lane == "float" else pa.int64()
    return pa.array(sums[keep], type=t)


def _minmax_arrays(
    codes, vals, vmask, m: int, lane: str, val_dtype: str
) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """-> (mins, maxs, has) typed in the value column's own type. Float
    NaN follows Spark's ordering (NaN greater than everything): MAX is
    NaN when any value in the group is NaN; MIN is NaN only when every
    non-null value is."""
    val_t = typemap.spark_to_arrow(val_dtype)
    nn_codes = codes[~vmask]
    nn_vals = vals[~vmask]
    has = np.zeros(m, dtype=bool)
    np.logical_or.at(has, nn_codes, True)
    if lane == "float":
        mins = np.full(m, np.inf)
        maxs = np.full(m, -np.inf)
        np.fmin.at(mins, nn_codes, nn_vals)  # fmin/fmax skip NaN
        np.fmax.at(maxs, nn_codes, nn_vals)
        nan_in = np.zeros(m, dtype=bool)
        np.logical_or.at(nan_in, nn_codes, np.isnan(nn_vals))
        maxs[nan_in] = np.nan  # Spark: NaN is the largest value
        # a group is all-NaN only when NO non-NaN value was seen — testing
        # mins == inf would misread a group whose true minimum IS +inf
        non_nan_seen = np.zeros(m, dtype=bool)
        np.logical_or.at(non_nan_seen, nn_codes, ~np.isnan(nn_vals))
        all_nan = has & ~non_nan_seen
        mins[all_nan] = np.nan
        mk = lambda a: pa.array(a, type=pa.float64(), mask=~has).cast(val_t)
        return mk(mins), mk(maxs), has
    I64 = np.iinfo(np.int64)
    mins = np.full(m, I64.max, dtype=np.int64)
    maxs = np.full(m, I64.min, dtype=np.int64)
    np.minimum.at(mins, nn_codes, nn_vals)
    np.maximum.at(maxs, nn_codes, nn_vals)
    ints = lambda a: pa.array(a, type=pa.int64(), mask=~has)
    if lane == "decimal":
        return (
            typemap.unscaled_to_decimal(ints(mins), val_dtype),
            typemap.unscaled_to_decimal(ints(maxs), val_dtype),
            has,
        )
    return ints(mins).cast(val_t), ints(maxs).cast(val_t), has


def group_stats_encoded(
    chunks: DataFrame,
    key_col: "str | list[str]",
    val_col: str,
    colocated: bool = False,
) -> DataFrame:
    """Grouped count/sum/min/max in one encoded-side pass:
    ``SELECT keys, count(*), count(val), sum(val), min(val), max(val)
    GROUP BY keys`` with every key read as dictionary codes (module
    docstring); multiple key columns compose via np.unique over the
    stacked per-key codes (_key_codes) — composite keys still never
    materialize per row. Value column may be int (exact int64),
    float/double (float64, SUM -> double), or decimal(p<=18,s) (exact,
    SUM -> decimal(38,s)). Output: (key | the named key columns, n_rows,
    n_vals, s, mn, mx) — s/mn/mx NULL for groups whose values are all
    null, SQL semantics. ``colocated=True`` skips the chunk_id
    repartition (see _pair_work)."""
    keys, single = _norm_keys("group_stats_encoded", key_col, val_col)
    key_dtypes = {c: _column_dtype(chunks, c) for c in keys}
    val_dtype = _column_dtype(chunks, val_col)
    lane, sum_sql = _val_lane("group_stats_encoded", val_dtype)
    out_names = ["key"] if single else keys
    work = _pair_work(chunks, keys + [val_col], colocated)

    def emit(group: dict) -> pa.RecordBatch:
        missing = [c for c in keys + [val_col] if c not in group]
        if missing:
            raise ValueError(
                f"chunk is missing column rows for {missing} —"
                " group_stats_encoded needs every key and the value column"
                " in the chunk table"
            )
        v_codec, v_payload, _ = group[val_col]
        codes, m, key_arrs = _key_codes(group, keys, key_dtypes)
        varr = decode_array(v_payload, val_dtype, v_codec)
        vals, vmask = _extract_vals(varr, val_dtype, lane)
        sums = _group_sums(codes, vals, vmask, m, lane)
        nn = np.bincount(codes[~vmask], minlength=m).astype(np.int64)
        n_rows = np.bincount(codes, minlength=m).astype(np.int64)
        mins, maxs, _ = _minmax_arrays(codes, vals, vmask, m, lane, val_dtype)
        keep = np.ones(m, dtype=bool)  # _key_codes groups are dense
        return pa.RecordBatch.from_arrays(
            [
                *key_arrs,
                pa.array(n_rows, type=pa.int64()),
                pa.array(nn, type=pa.int64()),
                _sum_arrow(sums, keep, lane, sum_sql),
                mins,
                maxs,
            ],
            [*out_names, "__pe_nr", "__pe_nn", "__pe_s", "__pe_mn", "__pe_mx"],
        )

    key_schema = ", ".join(
        f"`{n}` {key_dtypes[c]}" for n, c in zip(out_names, keys)
    )
    partials = work.mapInArrow(
        lambda batches: _pair_stream(batches, emit),
        schema=(
            f"{key_schema}, __pe_nr bigint, __pe_nn bigint, __pe_s {sum_sql},"
            f" __pe_mn {val_dtype}, __pe_mx {val_dtype}"
        ),
    )
    return partials.groupBy(*[F.col(f"`{n}`") for n in out_names]).agg(
        F.sum("__pe_nr").alias("n_rows"),
        F.sum("__pe_nn").alias("n_vals"),
        F.when(F.sum("__pe_nn") > 0, F.sum("__pe_s"))
        .otherwise(F.lit(None))
        .cast(sum_sql)
        .alias("s"),
        F.min("__pe_mn").alias("mn"),
        F.max("__pe_mx").alias("mx"),
    )


def group_sum_encoded(
    chunks: DataFrame,
    key_col: "str | list[str]",
    val_col: str,
    colocated: bool = False,
) -> DataFrame:
    """``SELECT keys, sum(val) GROUP BY keys`` with the key side read from
    codec structures: per chunk, the keys' dictionary codes drive one
    scatter-add over the value column — key values materialize only at
    dictionary scale, and multi-key composites compact via np.unique over
    stacked codes (_key_codes), never per row. Value lanes as
    group_stats_encoded: int (exact, -> bigint), float/double (-> double),
    decimal(p<=18,s) (exact, -> decimal(38,s)); SQL SUM semantics (nulls
    ignored, all-null group -> NULL). Output columns: (key | the named
    key columns, s). ``colocated=True`` skips the chunk_id repartition
    (see _pair_work)."""
    keys, single = _norm_keys("group_sum_encoded", key_col, val_col)
    key_dtypes = {c: _column_dtype(chunks, c) for c in keys}
    val_dtype = _column_dtype(chunks, val_col)
    lane, sum_sql = _val_lane("group_sum_encoded", val_dtype)
    out_names = ["key"] if single else keys
    work = _pair_work(chunks, keys + [val_col], colocated)

    def emit(group: dict) -> pa.RecordBatch | None:
        missing = [c for c in keys + [val_col] if c not in group]
        if missing:
            raise ValueError(
                f"chunk is missing column rows for {missing} — group_sum_encoded"
                " needs every key and the value column in the chunk table"
            )
        v_codec, v_payload, _ = group[val_col]
        codes, m, key_arrs = _key_codes(group, keys, key_dtypes)
        varr = decode_array(v_payload, val_dtype, v_codec)
        vals, vmask = _extract_vals(varr, val_dtype, lane)
        sums = _group_sums(codes, vals, vmask, m, lane)
        nn = np.bincount(codes[~vmask], minlength=m).astype(np.int64)
        keep = np.ones(m, dtype=bool)  # _key_codes groups are dense
        return pa.RecordBatch.from_arrays(
            [
                *key_arrs,
                _sum_arrow(sums, keep, lane, sum_sql),
                pa.array(nn, type=pa.int64()),
            ],
            [*out_names, "__pe_s", "__pe_nn"],
        )

    key_schema = ", ".join(
        f"`{n}` {key_dtypes[c]}" for n, c in zip(out_names, keys)
    )
    partials = work.mapInArrow(
        lambda batches: _pair_stream(batches, emit),
        schema=f"{key_schema}, __pe_s {sum_sql}, __pe_nn bigint",
    )
    return partials.groupBy(*[F.col(f"`{n}`") for n in out_names]).agg(
        F.when(F.sum("__pe_nn") > 0, F.sum("__pe_s"))
        .otherwise(F.lit(None))
        .cast(sum_sql)
        .alias("s")
    )
