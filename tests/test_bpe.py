"""BPE tokenizer training/encoding vs from-definition brute force
(Sennrich et al. 2016 algorithm 1)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from lucene_spark.pipeline.bpe import EOW, apply_bpe, encode_word, train_bpe

TEXTS = [
    "lower lowest low lowering",
    "newer newest new newly",
    "wider widest wide widely lower",
    "low low low lower newer newer",
]


def _brute_merges(texts, n):
    words = Counter()
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            words[w] += 1
    seqs = {w: tuple(w) + (EOW,) for w in words}
    merges = []
    for _ in range(n):
        pairs = Counter()
        for w, f in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in seqs:
            s, res, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    res.append(s[i] + s[i + 1])
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            seqs[w] = tuple(res)
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


class TestBPE:
    def test_merge_sequence_matches_brute(self, spark, docs):
        got = train_bpe(docs, 12)
        want = _brute_merges(TEXTS, 12)
        assert got == want and len(got) == 12

    def test_max_words_truncation_deterministic(self, spark, docs):
        a = train_bpe(docs, 6, max_words=5)
        b = train_bpe(docs, 6, max_words=5)
        assert a == b and len(a) == 6

    def test_encode_round_trip(self, spark, docs):
        merges = train_bpe(docs, 10)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        for w in ["lower", "newest", "unseenword"]:
            pieces = encode_word(w, ranks)
            assert "".join(pieces).replace(EOW, "") == w

    def test_apply_bpe_matches_per_word_encode(self, spark, docs):
        merges = train_bpe(docs, 10)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        got = {r.doc_id: (list(r.pieces), r.n_pieces) for r in apply_bpe(docs, merges).collect()}
        for i, t in enumerate(TEXTS):
            want = []
            for w in re.findall("[a-z0-9]+", t.lower()):
                want.extend(encode_word(w, ranks))
            assert got[i] == (want, len(want)), i

    def test_more_merges_fewer_pieces(self, spark, docs):
        few = apply_bpe(docs, train_bpe(docs, 2)).agg({"n_pieces": "sum"}).collect()[0][0]
        many = apply_bpe(docs, train_bpe(docs, 20)).agg({"n_pieces": "sum"}).collect()[0][0]
        assert many < few

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            train_bpe(docs, 0)


class TestIncrementalTrainer:
    """The incremental merge loop (pair-delta updates + lazy heap) must
    be observationally identical to the full-rescan definition, and
    must scale to GPT-2-like settings where the rescan is infeasible."""

    def test_incremental_equals_full_rescan_randomized(self):
        import random

        from lucene_spark.pipeline.bpe import _merge_loop

        rng = random.Random(17)
        for trial in range(30):
            words = {}
            for _ in range(rng.randint(5, 60)):
                w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
                words[w] = rng.randint(1, 9)
            wf = sorted(words.items(), key=lambda t: (-t[1], t[0]))
            n = rng.randint(1, 40)
            got = _merge_loop(wf, n)
            # from-definition rescan (independent of the product loop)
            seqs = {w: tuple(w) + (EOW,) for w, _ in wf}
            want = []
            for _ in range(n):
                pairs = Counter()
                for w, f in wf:
                    s = seqs[w]
                    for a, b in zip(s, s[1:]):
                        pairs[(a, b)] += f
                if not pairs:
                    break
                best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                want.append(best)
                for w in seqs:
                    s, res, i = seqs[w], [], 0
                    while i < len(s):
                        if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                            res.append(s[i] + s[i + 1])
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    seqs[w] = tuple(res)
            assert got == want, trial

    def test_pair_reappearance_after_consumption(self):
        # ("a","bc") can be consumed, then RECREATED when a later merge
        # builds the symbol "bc" elsewhere — counts must restart from
        # zero, not from a stale negative
        from lucene_spark.pipeline.bpe import _merge_loop

        wf = [("abc", 10), ("xbc", 7), ("abcabc", 3)]
        got = _merge_loop(wf, 8)
        seqs = {w: tuple(w) + (EOW,) for w, _ in wf}
        want = []
        for _ in range(8):
            pairs = Counter()
            for w, f in wf:
                s = seqs[w]
                for a, b in zip(s, s[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            want.append(best)
            for w in seqs:
                s, res, i = seqs[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                        res.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                seqs[w] = tuple(res)
        assert got == want

    def test_30k_merges_over_1m_word_vocab(self):
        # GPT-2-scale trainer settings: 30k merges x 1M distinct words.
        # The full-rescan loop is O(merges x vocab) and does not finish;
        # the incremental loop must complete in minutes on one core.
        import itertools
        import random
        import time

        from lucene_spark.pipeline.bpe import _merge_loop

        rng = random.Random(23)
        alpha = "abcdefghijklmnopqrstuvwxyz"
        words = []
        # 1M distinct words, Zipf-ish frequencies, natural-ish shapes:
        # short high-frequency heads + a long tail of rarer long words
        for i, combo in enumerate(itertools.islice(
            itertools.product(alpha, repeat=5), 1_000_000
        )):
            w = "".join(combo) + alpha[i % 26] * rng.randint(0, 3)
            words.append((w, 1 + 10_000_000 // (i + 1)))
        t0 = time.time()
        merges = _merge_loop(words, 30_000)
        dt = time.time() - t0
        assert len(merges) == 30_000
        assert dt < 600, f"incremental trainer took {dt:.0f}s"
