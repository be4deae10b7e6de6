from .text import lang_id, quality_scores, text_fingerprint, token_counts
from .dedup import (
    dedup_exact,
    embedding_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .similarity import cosine_topk_bruteforce, ivf_topk, lsh_topk

__all__ = [
    "lang_id",
    "quality_scores",
    "text_fingerprint",
    "token_counts",
    "dedup_exact",
    "embedding_near_dups",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "cosine_topk_bruteforce",
    "ivf_topk",
    "lsh_topk",
]
