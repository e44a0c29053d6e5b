"""Large-scale training-data pipeline operators (beyond-reference surface).

These are first-class engine components per the north star
(/root/repo/BASELINE.json): deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force +
IVF/LSH scale paths), text analysis (language ID, quality scoring, token
counting, fingerprinting) and multimodal binary-column plumbing.

Design notes for 100TB:
- all hashing is expression-level (md5 in whole-stage codegen), no Python
  in the hot path;
- MinHash/LSH turns O(n^2) similarity into a band-bucket shuffle whose
  fan-in is the bucket size;
- brute-force cosine exists as the correctness baseline; the scale paths
  (IVF partition pruning, LSH bucketing) restrict the candidate set
  before any distance math.
"""

from .text import with_words, text_stats, language_id, token_counts, char_fingerprint
from .dedup import (
    exact_dedup_groups,
    with_shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    near_duplicate_pairs,
    simhash_sql,
)
from .similarity import brute_force_topk, ivf_topk_within_label, lsh_ann_topk
from .pq import pq_encode, pq_topk_adc, pq_train

__all__ = [
    "with_words",
    "text_stats",
    "language_id",
    "token_counts",
    "char_fingerprint",
    "exact_dedup_groups",
    "with_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "near_duplicate_pairs",
    "simhash_sql",
    "brute_force_topk",
    "ivf_topk_within_label",
    "lsh_ann_topk",
    "pq_train",
    "pq_encode",
    "pq_topk_adc",
]
