"""Streaming dedup + watermarked ingest statistics.

Continuous-ingest companions to ``encode_stream``: documents arriving on
a stream are deduplicated before encoding (exact duplicates by content
fingerprint, bounded state via watermark) and rolled up into windowed
ingest-rate aggregates for monitoring. Both are pure built-in Structured
Streaming operators — state is managed by Spark's HDFS/RocksDB state
store, so the same code runs on a 1000-executor cluster; watermarks
bound state size regardless of stream length.

The reference has no streaming surface (its distributed path is Hadoop
MR formats); these extend the engine for the continuous-ingest reality
of a 10^12-file corpus, following the north_rule's "streaming ingest"
companion role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-dedup a document stream by content fingerprint.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state for a
    fingerprint is dropped once the watermark passes it — bounded state
    on an unbounded stream (a plain dropDuplicates would grow state
    forever at corpus scale). Late re-arrivals older than the watermark
    may re-admit a duplicate; that is the documented streaming-dedup
    trade-off, and the batch ``exact_dedup`` pass downstream is the
    exact backstop.
    """
    fp = F.sha2(F.col(f"`{text_col}`"), 256).alias("__fp")
    return (
        stream_df.withColumn("__fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def ingest_stats_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed ingest rollup: (window, key) -> rows/bytes.

    The streaming analogue of the engine's codec-metrics table: emits one
    row per closed window per key with arrival counts and payload bytes
    (of ``text_col``) and approximate distinct ids (of ``id_col``),
    suitable for append-mode sinks (watermark closes windows, so results
    are final when emitted)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(f"`{key_col}`"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length(F.col(f"`{text_col}`"))).alias("n_bytes"),
            F.approx_count_distinct(F.col(f"`{id_col}`")).alias("n_distinct_ids"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col(f"`{key_col}`"),
            "n_docs",
            "n_bytes",
            "n_distinct_ids",
        )
    )
