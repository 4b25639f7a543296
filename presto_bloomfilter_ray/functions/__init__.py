from .dedup import (
    add_content_hash,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    ngram_jaccard,
    simhash64,
    simhash_candidates,
)
from .similarity import IVFIndex, topk_cosine
from .text import LangId, add_text_stats, fingerprint64, quality_score, token_count
