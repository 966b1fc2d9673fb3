"""Training-data pipeline operators over document corpora.

Spark-first implementations of the operations a 100 TB training-data
pipeline needs around the fulltext engine: deduplication (exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup),
embedding similarity search (brute-force cosine top-k,
random-hyperplane LSH, IVF-Flat coarse quantization), text analysis
(quality scoring, language ID, token counting, fingerprinting), and
multimodal binary-column plumbing.
"""

from lucene_spark.pipeline.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash_pairs,
    tokens_df,
)
from lucene_spark.pipeline.similarity import (
    brute_cosine_topk,
    embedding_near_dup,
    ivf_cosine_topk,
    lsh_cosine_topk,
    train_centroids,
)
from lucene_spark.pipeline.textstats import fingerprints, language_id, quality_metrics, token_counts

__all__ = [
    "exact_duplicates",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "shingles",
    "simhash_pairs",
    "tokens_df",
    "brute_cosine_topk",
    "embedding_near_dup",
    "ivf_cosine_topk",
    "lsh_cosine_topk",
    "train_centroids",
    "fingerprints",
    "language_id",
    "quality_metrics",
    "token_counts",
]
