from .encode_stream import encode_stream, stream_from_directory
from .dedup_stream import dedup_stream, ingest_stats_stream
from .stateful import running_totals_stream
from .sessions import session_rollup_stream, session_ids_stream
from .temporal_stream import asof_enrich_stream

__all__ = [
    "encode_stream",
    "stream_from_directory",
    "dedup_stream",
    "ingest_stats_stream",
    "running_totals_stream",
    "session_rollup_stream",
    "session_ids_stream",
    "asof_enrich_stream",
]
