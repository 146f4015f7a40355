"""parquet_extra_spark — a PySpark-native per-column lightweight-compression
engine with the query/data-processing capabilities of nevillelyh/parquet-extra,
re-expressed Spark-first (see SURVEY.md).

Core API:
    encode(df, partition_cols=..., sort_cols=...)   -> chunk-table DataFrame
    decode(chunks, columns=...)                     -> data DataFrame
    verify_roundtrip(src, decoded, key_cols)        -> correctness report
    column_profile(df) / infer_repetition(df)       -> per-column stats (O21)
"""

from .engine.encoder import encode, encode_plan, recommend_salts, ChunkEncodeError
from .engine.decoder import decode, discover_schema, check_colocated, ChunkDecodeError
from .engine.verify import verify_roundtrip, roundtrip_ok
from .engine.projection import project, project_chunks
from .engine.pushdown import (
    chunk_range_filter,
    chunk_isin_filter,
    chunk_null_filter,
    filter_decode,
    filter_decode_isin,
    filter_decode_null,
    pushdown_stats,
)
from .engine.aggregates import metadata_profile
from .engine.encoded_agg import (
    distinct_encoded,
    group_agg_encoded,
    pivot_encoded,
    group_agg_sets_encoded,
    group_count_distinct_encoded,
    group_minmax_encoded,
    group_quantiles_encoded,
    group_stats_encoded,
    group_topk_encoded,
    group_sum_encoded,
    time_rollup_encoded,
    quantiles_encoded,
    value_counts_encoded,
)
from .engine.topk import topk_encoded
from .engine.continuous import ContinuousAggregate
from .engine.encoded_join import join_encoded
from .engine.compact import compact_chunks, compaction_stats
from .engine.maintain import delete_stats, delete_where, merge_rows
from .engine.zorder import zorder_encode, zorder_key
from .engine.predicate import (
    P,
    Pred,
    filter_decode_pred,
    prune_chunks,
    pushdown_stats_pred,
)
from .engine.checkpoint import (
    encode_to,
    read_chunks,
    decode_checkpoint,
    load_manifest,
    metrics,
    vacuum_checkpoint,
)
from .engine.nested import (
    shred,
    unshred,
    shred_schema,
    encode_nested,
    decode_nested,
    filter_decode_nested,
    project_nested,
)
from .functions.inference import column_profile, infer_repetition
from .engine.schema import (
    from_json as schema_from_json,
    to_json as schema_to_json,
    from_struct as schema_from_struct,
    to_struct as schema_to_struct,
    validate_columns,
)
from .plans import explain_summary, pushed_filters, read_schema

__all__ = [
    "encode",
    "encode_plan",
    "compact_chunks",
    "compaction_stats",
    "delete_where",
    "delete_stats",
    "merge_rows",
    "zorder_encode",
    "zorder_key",
    "recommend_salts",
    "decode",
    "discover_schema",
    "check_colocated",
    "ChunkDecodeError",
    "ChunkEncodeError",
    "verify_roundtrip",
    "roundtrip_ok",
    "project",
    "project_chunks",
    "chunk_range_filter",
    "chunk_isin_filter",
    "chunk_null_filter",
    "filter_decode",
    "filter_decode_isin",
    "filter_decode_null",
    "pushdown_stats",
    "value_counts_encoded",
    "group_sum_encoded",
    "group_stats_encoded",
    "group_minmax_encoded",
    "group_topk_encoded",
    "group_agg_encoded",
    "pivot_encoded",
    "group_agg_sets_encoded",
    "time_rollup_encoded",
    "distinct_encoded",
    "group_count_distinct_encoded",
    "group_quantiles_encoded",
    "quantiles_encoded",
    "topk_encoded",
    "ContinuousAggregate",
    "join_encoded",
    "P",
    "Pred",
    "filter_decode_pred",
    "prune_chunks",
    "pushdown_stats_pred",
    "encode_to",
    "read_chunks",
    "decode_checkpoint",
    "load_manifest",
    "metrics",
    "vacuum_checkpoint",
    "shred",
    "unshred",
    "shred_schema",
    "encode_nested",
    "decode_nested",
    "filter_decode_nested",
    "project_nested",
    "column_profile",
    "infer_repetition",
    "schema_from_json",
    "schema_to_json",
    "schema_from_struct",
    "schema_to_struct",
    "validate_columns",
    "explain_summary",
    "pushed_filters",
    "read_schema",
]
