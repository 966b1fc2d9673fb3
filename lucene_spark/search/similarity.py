"""BM25 scoring with Lucene's exact float32 expression shapes.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java
- idf:    (float) Math.log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))   (:104-106)
- avgdl:  (float) (sumTotalTermFreq / (double) docCount)                      (:109-111)
- cache:  cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))      (:205-208)
- score:  weight - weight / (1f + freq * normInverse), all float32            (:250-251)
- weight: boost * idf (float32 multiply)                                      (:236-238)

Monotonicity (and therefore rank identity) depends on doing these in
float32 with exactly these shapes — NOT in algebraically-equivalent
float64 forms — so every op below is np.float32.

Collection statistics are GLOBAL across segments
(IndexSearcher.collectionStatistics sums all leaves, IndexSearcher.java:947-962).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_spark.codec.smallfloat import NORM_LENGTH_TABLE

K1 = np.float32(1.2)  # BM25Similarity.java:99-101 defaults
B = np.float32(0.75)

# float32 view of BM25Similarity's LENGTH_TABLE (int lengths as floats)
_LENGTH_TABLE_F32 = NORM_LENGTH_TABLE.astype(np.float32)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """float64 log, cast to float32 (BM25Similarity.java:104-106)."""
    return np.float32(np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avgdl: np.float32, k1: np.float32 = K1, b: np.float32 = B) -> np.ndarray:
    """256-entry float32 cache: 1 / (k1 * ((1-b) + b * len/avgdl))."""
    one = np.float32(1.0)
    return (one / (k1 * ((one - b) + b * _LENGTH_TABLE_F32 / np.float32(avgdl)))).astype(np.float32)


def score_freqs(weight: np.float32, freqs: np.ndarray, norm_bytes: np.ndarray, cache: np.ndarray) -> np.ndarray:
    """Vectorized BM25Scorer.score(freq, norm) (BM25Similarity.java:250-251)."""
    norm_inverse = cache[np.asarray(norm_bytes, dtype=np.int64)]
    f = np.asarray(freqs, dtype=np.float32)
    w = np.float32(weight)
    return (w - w / (np.float32(1.0) + f * norm_inverse)).astype(np.float32)


@dataclass(frozen=True)
class BM25Stats:
    """Global collection stats captured at weight-creation time
    (IndexSearcher.java:947-962; TermQuery.createWeight)."""

    doc_count: int
    sum_total_term_freq: int

    @property
    def avgdl(self) -> np.float32:
        return avg_field_length(self.sum_total_term_freq, self.doc_count)

    def cache(self) -> np.ndarray:
        return norm_inverse_cache(self.avgdl)

    def term_weight(self, doc_freq: int, boost: float = 1.0) -> np.float32:
        return np.float32(np.float32(boost) * idf(doc_freq, self.doc_count))

    def synonym_weight(self, doc_freqs: list[int], boost: float = 1.0) -> np.float32:
        """SynonymQuery: idfs summed in double then cast
        (BM25Similarity.java:185-194, SynonymQuery.java:196-212)."""
        total = float(np.sum([float(idf(df, self.doc_count)) for df in doc_freqs]))
        return np.float32(np.float32(boost) * np.float32(total))
