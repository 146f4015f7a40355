"""Chunk compaction: merge undersized chunks into full-size ones.

Streaming ingest (micro-batches), skewed partition tails, and
fragmented small encodes all leave chunks far below the target row
count. Tiny chunks hurt at scale three ways: per-chunk metadata and
decode fixed costs stop amortizing, codec efficiency collapses (dict /
zstd / FSST tables amortize over too few values), and the chunk table
itself bloats. The reference stack inherits the same maintenance story
from its storage layer (parquet-mr row-group sizing; compaction is the
standard remedy in every LSM/lakehouse layout).

``compact_chunks`` is the partial-rewrite form that survives 100 TB:
the small/big split is decided on chunk METADATA only (an AQE-decided
semi/anti join on chunk_id), only the undersized chunks' payloads are
decoded and re-encoded, and untouched chunks pass through byte-identical.
Compacting a 100 TB table whose tail is 1% fragmented therefore costs
~1 TB of work, not a full rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decoder import decode, discover_schema
from .encoder import DEFAULT_CHUNK_ROWS, encode


def compact_chunks(
    chunks: DataFrame,
    schema_cols: list[tuple[str, int, str]] | None = None,
    target_rows: int = DEFAULT_CHUNK_ROWS,
    small_frac: float = 0.5,
    uid_namespace: str = "compact",
    **encode_kwargs,
) -> DataFrame:
    """Return a chunk table equivalent to ``chunks`` (same rows decode
    out) in which every chunk smaller than ``small_frac * target_rows``
    has been merged into ~``target_rows``-sized chunks.

    Chunks at or above the threshold are passed through UNCHANGED
    (byte-identical rows — no decode, no re-encode). ``uid_namespace``
    must differ from the namespace the small chunks were encoded under
    (default "compact" differs from encode's default "") so re-encoded
    chunk ids cannot collide with kept ones; the decoder's structural
    identity check fails fast if they do.

    ``encode_kwargs`` (partition_cols / sort_cols / n_buckets / ...)
    shape the re-encoded layout — including the opt-in digests: pass the
    SAME ``bloom_cols``/``trigram_cols`` the table was encoded with, or
    the re-encoded chunks silently lose their point-lookup/substring
    pruning lanes (untouched chunks keep theirs). Note the output unions two encodes, so
    ``decode(..., colocated=True)`` no longer holds for the union as a
    whole — use the default shuffled decode, or compact per-partition
    upstream when co-location must be preserved.
    """
    if schema_cols is None:
        schema_cols = discover_schema(chunks)

    # chunk size from metadata only: every column row of a chunk carries
    # the same n_values (anchor rows of schema evolution carry it too)
    sizes = chunks.groupBy("chunk_id").agg(F.max("n_values").alias("__n"))
    small_ids = sizes.filter(
        F.col("__n") < int(target_rows * small_frac)
    ).select("chunk_id")

    small = chunks.join(small_ids, "chunk_id", "left_semi")
    big = chunks.join(small_ids, "chunk_id", "left_anti")

    rows = decode(small, schema_cols=schema_cols)
    reenc = encode(
        rows,
        chunk_rows=target_rows,
        uid_namespace=uid_namespace,
        **encode_kwargs,
    )
    return big.unionByName(reenc)


def compaction_stats(chunks: DataFrame, target_rows: int = DEFAULT_CHUNK_ROWS,
                     small_frac: float = 0.5) -> dict:
    """Metadata-only report of what compact_chunks would touch."""
    sizes = chunks.groupBy("chunk_id").agg(F.max("n_values").alias("n"))
    row = sizes.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(F.col("n") < int(target_rows * small_frac), 1).otherwise(0)
        ).alias("small"),
        F.sum(
            F.when(F.col("n") < int(target_rows * small_frac), F.col("n")).otherwise(0)
        ).alias("small_rows"),
        F.sum("n").alias("rows"),
    ).collect()[0]
    return {
        "chunks_total": row["total"],
        "chunks_small": row["small"],
        "rows_total": row["rows"],
        "rows_to_rewrite": row["small_rows"],
    }
