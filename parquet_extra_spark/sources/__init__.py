from .chunk_datasource import ChunkTableDataSource
from .corpus import code_corpus
from .iceberg import iceberg_available, read_corpus

__all__ = [
    "ChunkTableDataSource",
    "code_corpus",
    "iceberg_available",
    "read_corpus",
]
