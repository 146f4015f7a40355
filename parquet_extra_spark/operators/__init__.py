from .dedup import (
    exact_dedup,
    exact_dup_stats,
    minhash_signatures,
    minhash_lsh_dedup,
    lsh_bucket_stats,
    simhash,
    simhash_dedup,
    ngram_jaccard_exact,
    ngram_jaccard_pairs,
)
from .similarity import (
    brute_force_topk,
    cosine_pairs_exact,
    ivf_assign,
    ivf_topk,
    cosine_pairs_lsh,
    embedding_near_dups,
)
from .textstats import (
    token_counts,
    quality_scores,
    lang_id,
    doc_fingerprints,
    rolling_fingerprints,
)

__all__ = [
    "exact_dedup",
    "exact_dup_stats",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "lsh_bucket_stats",
    "simhash",
    "simhash_dedup",
    "ngram_jaccard_exact",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "ivf_assign",
    "ivf_topk",
    "cosine_pairs_exact",
    "cosine_pairs_lsh",
    "embedding_near_dups",
    "token_counts",
    "quality_scores",
    "lang_id",
    "doc_fingerprints",
    "rolling_fingerprints",
]
