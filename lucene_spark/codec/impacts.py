"""Competitive impacts — block-max metadata for dynamic pruning.

Port of the *semantics* of Lucene's CompetitiveImpactAccumulator
(lucene/core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java:30,71-118):
for each 128-doc posting block, retain the Pareto frontier of
(freq, norm) pairs — a pair is competitive iff no other pair in the
block has ``freq >= f`` and ``norm <= n`` (shorter doc + higher freq
dominates). At query time the block's max possible BM25 score is
``max(score(freq, norm) for (freq, norm) in impacts)`` (MaxScoreCache).
"""

from __future__ import annotations

import numpy as np


def competitive_impacts(tfs: np.ndarray, norms: np.ndarray) -> list[tuple[int, int]]:
    """Pareto frontier of (freq, norm_byte) for one block.

    ``norms`` are the unsigned norm bytes (0..255) of the block's docs;
    comparison is on the decoded length ordering, which equals unsigned
    byte ordering because intToByte4 is monotone.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    if len(tfs) == 0:
        return []
    # max freq per distinct norm
    order = np.lexsort((-tfs, norms))
    n_sorted, f_sorted = norms[order], tfs[order]
    first = np.ones(len(n_sorted), dtype=bool)
    first[1:] = n_sorted[1:] != n_sorted[:-1]
    uniq_norms, uniq_freqs = n_sorted[first], f_sorted[first]
    # ascending norm: keep only strictly increasing freq
    keep_freq = np.maximum.accumulate(uniq_freqs)
    keep = np.ones(len(uniq_norms), dtype=bool)
    keep[1:] = uniq_freqs[1:] > keep_freq[:-1]
    return [(int(f), int(n)) for f, n in zip(uniq_freqs[keep], uniq_norms[keep])]


def competitive_impacts_flat(
    tfs: np.ndarray, norms: np.ndarray, block_size: int = 128
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pareto frontiers for ALL 128-blocks of a posting list at once —
    the vectorized form of ``competitive_impacts`` mapped over blocks
    (one lexsort over the whole list instead of a Python call per
    block; the pack stage runs this once per chunk row).

    Returns ``(block_ids, freqs, norm_bytes)`` flat arrays, ordered by
    (block, norm ascending) — identical content to looping
    ``competitive_impacts`` per block.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = len(tfs)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    # per-block sort by (norm asc, tf desc) as ONE batched np.sort over
    # a composite uint64 key (norm<<40 | ~tf) — blocks are contiguous,
    # so the sort is row-wise on a (n_blocks, block_size) reshape; pad
    # the tail block with +inf keys that sort last and are dropped.
    TFM = np.uint64((1 << 40) - 1)
    comp = (norms.astype(np.uint64) << np.uint64(40)) | (TFM - tfs.astype(np.uint64))
    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    if pad:
        comp = np.concatenate([comp, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))])
    comp = np.sort(comp.reshape(n_blocks, block_size), axis=1).ravel()
    valid = comp != np.uint64(0xFFFFFFFFFFFFFFFF)
    b = np.repeat(np.arange(n_blocks, dtype=np.int64), block_size)[valid]
    comp = comp[valid]
    nm = (comp >> np.uint64(40)).astype(np.int64)
    tf = (TFM - (comp & TFM)).astype(np.int64)
    # max freq per distinct (block, norm): first row of each group
    first = np.ones(n, dtype=bool)
    first[1:] = (b[1:] != b[:-1]) | (nm[1:] != nm[:-1])
    b, nm, tf = b[first], nm[first], tf[first]
    # within each block (norm ascending) keep rows whose freq exceeds
    # the running max — segmented cummax via a per-block offset large
    # enough that a new block always resets the global running max
    off = int(tf.max()) + 1
    x = b * off + tf
    run = np.maximum.accumulate(x)
    keep = np.ones(len(x), dtype=bool)
    keep[1:] = x[1:] > run[:-1]
    return b[keep], tf[keep], nm[keep]


def block_impacts(doc_tfs: np.ndarray, doc_norms: np.ndarray, block_size: int = 128) -> list[list[tuple[int, int]]]:
    """Impacts per 128-block over a full posting list (incl. the tail block)."""
    n = len(doc_tfs)
    out = []
    for lo in range(0, n, block_size):
        out.append(competitive_impacts(doc_tfs[lo : lo + block_size], doc_norms[lo : lo + block_size]))
    return out
