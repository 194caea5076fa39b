"""LLM-data-pipeline extension operators (SURVEY.md §2.J north-star).

Beyond the reference's own surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search (brute-force
and IVF-partitioned cosine top-k), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal binary columns.

Everything except the multimodal decode stub is pure Catalyst — built-in
expressions over long-format tables — so predicate pushdown, partial
aggregation, and AQE apply end to end at 100 TB.
"""

from sparkwrangle.ext.hashing import h60, minhash_coeffs
from sparkwrangle.ext.text import add_text_stats, language_id, tokenize
from sparkwrangle.ext.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    lsh_verified_pairs,
    mapside_minhash_sigs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_hash_array,
    simhash,
)
from sparkwrangle.ext.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    ivf_trained_topk,
    collect_codebooks,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_encode_mapside,
    pq_rerank_topk,
)

__all__ = [
    "h60",
    "minhash_coeffs",
    "add_text_stats",
    "language_id",
    "tokenize",
    "exact_dup_groups",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "lsh_verified_pairs",
    "mapside_minhash_sigs",
    "shingle_hash_array",
    "cosine_topk",
    "ivf_cosine_topk",
    "ivf_trained_topk",
    "pq_adc_topk",
    "pq_codebooks",
    "pq_encode",
    "pq_encode_mapside",
    "pq_rerank_topk",
    "collect_codebooks",
]
