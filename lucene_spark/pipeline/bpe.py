"""BPE tokenizer training and encoding over the corpus.

Byte-pair-encoding subword induction (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the algorithm
behind GPT-2/RoBERTa-style tokenizers): start from characters, then
repeatedly merge the most frequent adjacent symbol pair.

Spark disposition (how real tokenizer training scales): the corpus-
sized step is WORD COUNTING — one map-side-combined shuffle keyed by
word; 100 TB of text compacts to a word-frequency relation bounded by
the VOCABULARY (tens of millions of rows), optionally truncated to the
``max_words`` most frequent (the standard practice — HuggingFace
tokenizers train from an in-memory word-count table the same way).
The merge loop then runs driver-side over that compacted table with
INCREMENTAL pair-count maintenance: each merge touches only the words
containing the merged pair (inverted pair→words index + lazy heap), so
per-merge cost tracks the pair's support, not the vocabulary — 30k+
merges over a multi-million-word vocabulary stay tractable, and all of
it is independent of corpus size. Encoding (`apply_bpe`) goes back to
the cluster as an
Arrow-batched pandas UDF with a per-executor token cache — the only
Python stage, amortized across each token's repetitions.

Determinism: ties in pair frequency break lexicographically on the
pair, so the merge sequence is a pure function of the word counts (no
RNG, no ordering sensitivity) — retries and different cluster sizes
produce the identical tokenizer.
"""

from __future__ import annotations

import heapq

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (Sennrich et al. §3.2)


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the analyzer token stream — the one
    corpus-sized aggregation (map-side combined)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _merge_loop(word_freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table — the
    INCREMENTAL trainer: pair counts are maintained by delta updates
    (each merge rewrites ONLY the words that contain the merged pair,
    found through an inverted pair→word-ids index) and the argmax is a
    lazy-invalidation min-heap keyed (-freq, pair). Per-merge work is
    O(Σ|touched word|) instead of O(Σ|every word|), which is what makes
    GPT-2-scale settings (30-50k merges × ~10M-word vocab) feasible;
    the observable merge sequence is IDENTICAL to the from-definition
    full rescan (same counts, same lexicographic tie-break — pytest
    asserts equality against the brute loop).

    Index staleness is handled lazily: a heap entry whose count moved
    re-inserts at the live count; a word id under a pair whose
    occurrence was consumed by an earlier merge no-ops at rewrite time;
    a pair whose count was driven to zero can legitimately REAPPEAR
    later (a subsequent merge can recreate the same symbol string) and
    accumulates again from zero."""
    seqs: list[list] = [[list(w) + [EOW], f] for w, f in word_freqs if w]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for idx, (sym, f) in enumerate(seqs):
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            s = pair_words.get(p)
            if s is None:
                s = pair_words[p] = set()
            s.add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        c = pair_counts.get(best, 0)
        if c <= 0:
            continue  # fully consumed; dead heap entry
        if -negc != c:
            heapq.heappush(heap, (-c, best))  # stale: re-enter at live count
            continue
        merges.append(best)
        a0, b0 = best
        joined = a0 + b0
        grew: set[tuple[str, str]] = set()
        for idx in pair_words.pop(best, ()):
            sym, f = seqs[idx]
            res: list[str] = []
            i, n = 0, len(sym)
            changed = False
            while i < n:
                if i + 1 < n and sym[i] == a0 and sym[i + 1] == b0:
                    res.append(joined)
                    i += 2
                    changed = True
                else:
                    res.append(sym[i])
                    i += 1
            if not changed:
                continue  # stale index entry: occurrence already merged away
            for p in zip(sym, sym[1:]):
                pair_counts[p] = pair_counts.get(p, 0) - f
            for p in zip(res, res[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                grew.add(p)
                s = pair_words.get(p)
                if s is None:
                    s = pair_words[p] = set()
                s.add(idx)
            seqs[idx][0] = res
        for p in grew:
            c2 = pair_counts.get(p, 0)
            if c2 > 0:
                heapq.heappush(heap, (-c2, p))
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. ``max_words``
    bounds the driver-side table to the most frequent words (freq
    desc, word asc — deterministic truncation); None keeps the full
    vocabulary (fine up to tens of millions of distinct words — the
    table is vocabulary-sized, not corpus-sized)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    wf = word_frequencies(df, text_col)
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    rows = [(r["word"], int(r["freq"])) for r in wf.collect()]
    rows.sort(key=lambda t: (-t[1], t[0]))  # deterministic iteration order
    return _merge_loop(rows, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with learned merges (greedy lowest-rank-first —
    the canonical BPE apply)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, pieces array<string>, n_pieces) — the corpus encoded
    with the learned tokenizer. Arrow-batched pandas UDF with a
    per-executor word→pieces cache (each distinct token encodes once
    per batch stream)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # closure-level cache: serialized once, lives for the WORKER
    # PROCESS lifetime — a cache inside the UDF body would rebuild per
    # Arrow batch, re-running the greedy merge loop for every distinct
    # token seen in earlier batches
    cache: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def _encode(tokens: pd.Series) -> pd.Series:
        def enc(toks):
            out = []
            for t in toks:
                got = cache.get(t)
                if got is None:
                    got = cache[t] = encode_word(t, ranks)
                out.extend(got)
            return out

        return tokens.apply(enc)

    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    out = df.select(id_col, _encode(toks).alias("pieces"))
    return out.select(id_col, "pieces", F.size("pieces").cast("long").alias("n_pieces"))
