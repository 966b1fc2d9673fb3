"""Corpus-profiling statistics vs brute force; the HLL++ sketch stays
within its advertised error bound."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pytest


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


@pytest.fixture(scope="module")
def prof_df(spark, corpus_pdf):
    pdf = corpus_pdf.reset_index().rename(columns={"index": "doc_id"})
    return spark.createDataFrame(pdf[["doc_id", "content"]]), pdf


def test_vocabulary_stats(prof_df):
    from lucene_spark.pipeline.sketches import vocabulary_stats

    df, pdf = prof_df
    r = vocabulary_stats(df, text_col="content").collect()[0]
    toks = [t for c in pdf["content"] for t in _tok(c)]
    vocab = len(set(toks))
    assert r["n_docs"] == len(pdf)
    assert r["n_tokens"] == len(toks)
    assert r["vocab_exact"] == vocab
    # HLL++ with rsd=0.05: allow 4 sigma
    assert abs(r["vocab_hll"] - vocab) <= max(2, 4 * 0.05 * vocab)


def test_length_quantiles(prof_df):
    from lucene_spark.pipeline.sketches import length_quantiles

    df, pdf = prof_df
    got = {r["prob"]: r["q"] for r in length_quantiles(df, text_col="content").collect()}
    lens = np.array(sorted(len(_tok(c)) for c in pdf["content"]), dtype=float)
    for p in (0.25, 0.5, 0.75, 0.95):
        want = float(np.quantile(lens, p, method="linear"))
        assert got[p] == pytest.approx(want, abs=1e-9), p


def test_heavy_hitters(prof_df):
    from lucene_spark.pipeline.sketches import term_heavy_hitters

    df, pdf = prof_df
    got = [(r["term"], r["ttf"], r["df"]) for r in term_heavy_hitters(df, k=5, text_col="content").collect()]
    ttf: Counter = Counter()
    dfc: Counter = Counter()
    for c in pdf["content"]:
        ts = _tok(c)
        ttf.update(ts)
        dfc.update(set(ts))
    want = sorted(((t, n, dfc[t]) for t, n in ttf.items()), key=lambda x: (-x[1], x[0]))[:5]
    assert got == want
