"""LLM training-data-pipeline operators (north-star extensions beyond the
reference surface — SURVEY.md §7 step 8).

All deterministic and cross-engine reproducible: hashing is md5-derived
(DuckDB oracles reproduce it exactly), embedding math is fixed-point
(nano-unit bigints) so sums are order-independent and exact.
"""

from lakeforge.llm.text import text_stats, tokens_col
from lakeforge.llm.dedup import (
    MINHASH_P,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles_col,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from lakeforge.llm.similarity import cosine_topk, nano_embedding, rp_lsh_buckets

__all__ = [
    "tokens_col",
    "text_stats",
    "exact_dedup",
    "shingles_col",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "MINHASH_P",
    "nano_embedding",
    "cosine_topk",
    "rp_lsh_buckets",
]
