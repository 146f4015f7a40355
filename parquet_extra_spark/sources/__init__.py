from .corpus import code_corpus

__all__ = ["code_corpus"]
