from .corpus import code_corpus
from .iceberg import iceberg_available, read_corpus

__all__ = ["code_corpus", "iceberg_available", "read_corpus"]
