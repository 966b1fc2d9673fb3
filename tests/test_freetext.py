"""FreeTextSuggester (n-gram LM completion with stupid backoff) vs
from-definition python brute force.

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/FreeTextSuggester.java (ALPHA=0.4 :124, lookup :433-700).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from lucene_spark.search.suggest import build_freetext_model, free_text_suggest

TEXTS = [
    "the table scans the table fast",
    "the table merges the index",
    "a fast table and a fast merge",
    "fast tables fast tracks",
    "the tiger",
]

ALPHA = 0.4


def _toks(s):
    return re.findall("[a-z0-9]+", s.lower())


def _model(texts, grams):
    cnt = Counter()
    for t in texts:
        toks = _toks(t)
        for o in range(1, grams + 1):
            for i in range(len(toks) - o + 1):
                cnt[(o, " ".join(toks[i : i + o - 1]), toks[i + o - 1])] += 1
    return cnt


def _brute(texts, key, num, grams=2):
    cnt = _model(texts, grams)
    tot = sum(c for (o, _, _), c in cnt.items() if o == 1)
    low = key.lower()
    toks = _toks(low)
    ended = re.search("[a-z0-9]$", low) is None
    prefix = "" if ended else toks[-1]
    ctx_tokens = toks if ended else toks[:-1]
    results, seen = [], set()
    backoff = 1.0
    for g in range(grams - 1, -1, -1):
        if len(ctx_tokens) < g:
            continue
        if g == 0 and prefix == "" and key:
            continue
        ctx = " ".join(ctx_tokens[-g:]) if g else ""
        if g == 0:
            cc = tot
        else:
            ct = ctx_tokens[-g:]
            cc = cnt.get((g, " ".join(ct[:-1]), ct[-1]), 0)
        for (o, c, last), n in cnt.items():
            if o != g + 1 or c != ctx or not last.startswith(prefix):
                continue
            if last in seen or not cc:
                continue
            seen.add(last)
            sug = (ctx + " " + last).strip()
            results.append((sug, backoff * n / cc))
        backoff *= ALPHA
    results.sort(key=lambda r: (-r[1], r[0]))
    return results[:num]


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    return build_freetext_model(df, grams=2).cache()


def _got(model, key, num=10, **kw):
    return [
        (r.suggestion, pytest.approx(r.score, rel=1e-12))
        for r in free_text_suggest(model, key, num=num, **kw).collect()
    ]


class TestFreeText:
    def test_model_counts(self, spark, model):
        got = {(r.order, r.ctx, r.last): r.cnt for r in model.collect()}
        assert got == dict(_model(TEXTS, 2))

    def test_partial_token_backoff_and_dedup(self, spark, model):
        # "the ta" -> bigram completions of (the, ta*) at backoff 1.0,
        # unigram ta* not already seen at 0.4
        want = _brute(TEXTS, "the ta", 10)
        got = _got(model, "the ta")
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gs, gv), (_, wv) in zip(got, want):
            assert gv == wv, gs

    def test_trailing_space_upgrades_context(self, spark, model):
        # "the " -> ONLY bigram continuations of 'the'; no unigrams
        want = _brute(TEXTS, "the ", 10)
        got = _got(model, "the ")
        assert got and [g[0] for g in got] == [w[0] for w in want]
        assert all(" " in s for s, _ in got)

    def test_single_partial_token_unigram_only(self, spark, model):
        # no context tokens: the bigram level is skipped WITHOUT
        # consuming a backoff step, so unigrams score at backoff 1.0
        want = _brute(TEXTS, "fa", 10)
        got = _got(model, "fa")
        assert got == [(w[0], pytest.approx(w[1], rel=1e-12)) for w in want]
        assert got[0][0] == "fast"

    def test_unseen_context_backs_off(self, spark, model):
        # 'tiger ta' : bigram context 'tiger' has no ta* continuation;
        # unigram level supplies them at 0.4
        want = _brute(TEXTS, "tiger ta", 10)
        got = _got(model, "tiger ta")
        assert [g[0] for g in got] == [w[0] for w in want] and got

    def test_trigram_model(self, spark):
        m3 = build_freetext_model(
            spark.createDataFrame([(t,) for t in TEXTS], "text string"), grams=3
        )
        want = _brute(TEXTS, "the table ", 10, grams=3)
        got = [
            (r.suggestion, pytest.approx(r.score, rel=1e-12))
            for r in free_text_suggest(m3, "the table ", grams=3).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want] and got

    def test_validation(self, spark, model):
        with pytest.raises(ValueError):
            free_text_suggest(model, "   ")
        with pytest.raises(ValueError):
            free_text_suggest(model, "x", grams=0)
