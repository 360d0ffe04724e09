"""Large-scale training-data pipeline operators (beyond the reference).

Dedup (exact / Jaccard / MinHash-LSH / SimHash), similarity search,
text analysis, and multimodal column plumbing — each a pure DataFrame
function designed for 100 TB scale (no driver-side loops, broadcast
where small, banded joins instead of all-pairs where big).
"""

from tsp_spark.pipeline.bpe import bpe_encode, bpe_train
from tsp_spark.pipeline.dedup import exact_dedup, jaccard_pairs, minhash_lsh_pairs
from tsp_spark.pipeline.curation import (
    score_quality,
    train_quality_classifier,
    train_quality_scorer,
)
from tsp_spark.pipeline.text import (
    token_stats,
    quality_scores,
    language_id,
    fingerprint,
    simhash,
    c4_clean,
    c4_full_clean,
    gopher_filter,
    gopher_repetition_signals,
)
from tsp_spark.pipeline.similarity import cosine_topk, label_centroids

__all__ = [
    "exact_dedup",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "token_stats",
    "quality_scores",
    "bpe_encode",
    "bpe_train",
    "language_id",
    "fingerprint",
    "simhash",
    "cosine_topk",
    "label_centroids",
    "c4_clean",
    "c4_full_clean",
    "gopher_filter",
    "gopher_repetition_signals",
    "score_quality",
    "train_quality_classifier",
    "train_quality_scorer",
]
