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
The merge loop then runs driver-side over that compacted table: each
of the ``n_merges`` iterations is O(distinct words), independent of
corpus size. Encoding (`apply_bpe`) goes back to the cluster as an
Arrow-batched pandas UDF with a per-executor token cache — the only
Python stage, amortized across each token's repetitions.

Determinism: ties in pair frequency break lexicographically on the
pair, so the merge sequence is a pure function of the word counts (no
RNG, no ordering sensitivity) — retries and different cluster sizes
produce the identical tokenizer.
"""

from __future__ import annotations

from collections import Counter

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
    """Classic BPE merge loop over a word-frequency table."""
    seqs: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (EOW,), f) for w, f in word_freqs if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, f in seqs:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max by freq, ties broken lexicographically on the pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        out = []
        for sym, f in seqs:
            res, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    res.append(joined)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            out.append((tuple(res), f))
        seqs = out
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
