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
