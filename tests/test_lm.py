"""Bigram-LM perplexity (CCNet-style quality signal) vs from-definition
python brute force."""

from __future__ import annotations

import math
import re

import pytest

from lucene_spark.pipeline.lm import BOS, perplexity, train_bigram_lm


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _counts(texts):
    c12, c1, vocab = {}, {}, set()
    for text in texts:
        toks = _toks(text)
        prev = [BOS] + toks[:-1]
        for p, c in zip(prev, toks):
            c12[(p, c)] = c12.get((p, c), 0) + 1
            c1[p] = c1.get(p, 0) + 1
            vocab.add(c)
    return c12, c1, len(vocab)


def _brute_ppl(text, c12, c1, V, k=1.0):
    toks = _toks(text)
    if not toks:
        return 0, None
    prev = [BOS] + toks[:-1]
    lps = [
        math.log((c12.get((p, c), 0) + k) / (c1.get(p, 0) + k * V))
        for p, c in zip(prev, toks)
    ]
    return len(toks), math.exp(-sum(lps) / len(lps))


TEXTS = [
    "the table scans the table",
    "a fast merge joins a slow merge",
    "the table the table the table",
    "zz qq xx",  # rare bigrams -> high self-perplexity
    "",  # token-less
    "the fast table scans a slow merge",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


class TestPerplexity:
    def test_self_perplexity_matches_brute(self, spark, docs):
        got = {r.doc_id: (r.n_tokens, r.ppl) for r in perplexity(docs).collect()}
        c12, c1, V = _counts(TEXTS)
        for i, t in enumerate(TEXTS):
            n, want = _brute_ppl(t, c12, c1, V)
            assert got[i][0] == n, i
            if want is None:
                assert got[i][1] is None
            else:
                assert got[i][1] == pytest.approx(want, rel=1e-12), i

    def test_external_lm(self, spark, docs):
        """Score one corpus under an LM trained on another (the CCNet
        shape: clean reference LM, noisy target corpus). Unseen
        contexts/targets smooth via add-k."""
        train = docs.filter("doc_id <= 2")
        lm = train_bigram_lm(train)
        got = {r.doc_id: r.ppl for r in perplexity(docs, lm=lm).collect()}
        c12, c1, V = _counts(TEXTS[:3])
        for i, t in enumerate(TEXTS):
            _, want = _brute_ppl(t, c12, c1, V)
            if want is None:
                assert got[i] is None
            else:
                assert got[i] == pytest.approx(want, rel=1e-12), i
        # the garbage doc must look much worse than in-domain text
        assert got[3] > 2 * got[0]

    def test_repetitive_text_scores_lower_self_ppl(self, spark, docs):
        got = {r.doc_id: r.ppl for r in perplexity(docs).collect()}
        assert got[2] < got[5]  # pure repetition is very "predictable"

    def test_k_validation(self, docs):
        with pytest.raises(ValueError):
            perplexity(docs, k=0.0)

    def test_plan_stays_jvm(self, spark, docs):
        """No Python in the plan: scoring is splits/joins/aggregates."""
        plan = perplexity(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
