"""Distributed columnar decode: chunk-table DataFrame -> original DataFrame.

Analogue of the reference's record materialization (parquet-tensorflow
ExampleConverter.java:13-59: per-column converters buffer values, end()
stitches them into a record), but batched: all column-chunk rows of a
chunk_id are co-located by a shuffle on chunk_id, assembled into one
Arrow RecordBatch per chunk inside mapInArrow, and streamed out. No
pandas in the hot path (avoids pandas' nullable-int pitfalls), no
collect — except the tiny schema-discovery pass, which reads only the
(column, col_idx, dtype) triples: the analogue of reading a Parquet
footer (ExampleParquetReader.java:65-71).

Projection on encoded data is a *filter on the chunk table*
(column ∈ requested) — reference semantics O19/O20
(ExampleReadSupport.java:33-53, 76-90), including the fail-fast on
unknown fields (:88, IllegalStateException).

Decode failures are wrapped with (part_key, chunk_id, column) context —
the analogue of ExampleConverter.java:48-52's ParquetDecodingException.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F, types as T

from ..codecs import decode_array, typemap


class ChunkDecodeError(RuntimeError):
    pass


def discover_schema(chunks: DataFrame) -> list[tuple[str, int, str]]:
    """-> [(column, col_idx, dtype)] in original column order (footer read)."""
    rows = (
        chunks.select("column", "col_idx", "dtype").distinct().collect()
    )
    seen: dict[str, tuple[int, str]] = {}
    for r in rows:
        if r["column"] in seen and seen[r["column"]] != (r["col_idx"], r["dtype"]):
            raise ChunkDecodeError(
                f"inconsistent schema for column {r['column']!r} across chunks"
            )
        seen[r["column"]] = (r["col_idx"], r["dtype"])
    return sorted(((c, i, d) for c, (i, d) in seen.items()), key=lambda t: t[1])


def _spark_schema(cols: list[tuple[str, int, str]]) -> T.StructType:
    from .schema import to_struct

    return to_struct(cols)


def _make_decode_fn(cols: list[tuple[str, int, str]]):
    names = [c for c, _, _ in cols]
    dtypes = {c: d for c, _, d in cols}
    arrow_schema = pa.schema([(c, typemap.SPARK_TO_ARROW[dtypes[c]]) for c in names])

    def decode_group(rows: dict) -> pa.RecordBatch:
        by_col = {}
        for col, codec, payload, n_values, pk, cid in zip(
            rows["column"], rows["codec"], rows["payload"], rows["n_values"],
            rows["part_key"], rows["chunk_id"],
        ):
            try:
                arr = decode_array(payload, dtypes[col], codec)
            except Exception as e:  # noqa: BLE001 — re-raise with chunk context (O28)
                raise ChunkDecodeError(
                    f"decode failed: part_key={pk!r} chunk_id={cid} column={col!r} codec={codec}: {e}"
                ) from e
            if col in by_col:
                raise ChunkDecodeError(
                    f"duplicate chunk-table rows: part_key={pk!r} chunk_id={cid}"
                    f" column={col!r} — chunk_id collision (unioned chunk tables"
                    " from independent encode() calls need distinct"
                    " uid_namespace values)"
                )
            if len(arr) != n_values:
                raise ChunkDecodeError(
                    f"length mismatch: part_key={pk!r} chunk_id={cid} column={col!r}: "
                    f"{len(arr)} != {n_values}"
                )
            by_col[col] = arr
        missing = [c for c in names if c not in by_col]
        if missing:
            raise ChunkDecodeError(
                f"chunk {rows['chunk_id'][0]} missing columns {missing} "
                f"(decode of data written without them — incompatible schema)"
            )
        lens = {len(by_col[c]) for c in names}
        if len(lens) > 1:
            raise ChunkDecodeError(f"column length skew in chunk {rows['chunk_id'][0]}: {lens}")
        return pa.RecordBatch.from_arrays([by_col[c] for c in names], schema=arrow_schema)

    def decode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pending: dict = {}
        cur_cid = None

        def drain():
            nonlocal pending
            if pending:
                out = decode_group(pending)
                pending = {}
                return out
            return None

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            cids = tbl.column("chunk_id").to_pylist()
            for i, cid in enumerate(cids):
                if cid != cur_cid:
                    out = drain()
                    if out is not None:
                        yield out
                    cur_cid = cid
                for key in ("column", "codec", "payload", "n_values", "part_key", "chunk_id"):
                    pending.setdefault(key, []).append(tbl.column(key)[i].as_py())
        out = drain()
        if out is not None:
            yield out

    return decode_fn


def decode(
    chunks: DataFrame,
    columns: list[str] | None = None,
    num_partitions: int | None = None,
    schema_cols: list[tuple[str, int, str]] | None = None,
) -> DataFrame:
    """Decode the chunk table back into a data DataFrame.

    columns: optional projection — only these columns are decoded (the
    chunk rows of other columns are never read past their stats: the
    columnar-projection trick). Unknown names raise, matching the
    reference's invalid-projection contract (ExampleReadSupport.java:88).
    """
    spark = chunks.sparkSession
    if schema_cols is None:
        schema_cols = discover_schema(chunks)
    if not schema_cols:
        raise ChunkDecodeError(
            "empty chunk table and no schema_cols given — cannot derive output schema"
        )
    known = {c for c, _, _ in schema_cols}
    if columns is not None:
        unknown = [c for c in columns if c not in known]
        if unknown:
            raise ValueError(f"projection references unknown columns: {unknown}")
        schema_cols = [t for t in schema_cols if t[0] in set(columns)]
        chunks = chunks.filter(F.col("column").isin(list(columns)))

    n_part = num_partitions or spark.sparkContext.defaultParallelism
    work = (
        chunks.repartition(n_part, "chunk_id")
        .sortWithinPartitions("chunk_id", "col_idx")
    )
    fn = _make_decode_fn(schema_cols)
    return work.mapInArrow(fn, schema=_spark_schema(schema_cols))
