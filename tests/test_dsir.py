"""DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169) vs a
from-definition python brute force: hashed unigram+bigram bucket
models, add-k log-ratio importance weights, deterministic Gumbel top-k
selection."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from lucene_spark.pipeline.dsir import (
    doc_bucket_counts,
    dsir_select,
    importance_weights,
)

B = 64  # small bucket space so collisions are actually exercised


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _grams(text: str) -> list[str]:
    t = _toks(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(s: str, n_buckets: int = B) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n_buckets


def _model(texts, n_buckets=B):
    cnt: dict[int, int] = {}
    for t in texts:
        for g in _grams(t):
            b = _bucket(g, n_buckets)
            cnt[b] = cnt.get(b, 0) + 1
    return cnt, sum(cnt.values())


def _brute_logw(text, p_cnt, tp, q_cnt, tq, k=1.0, n_buckets=B):
    logw = 0.0
    for g in _grams(text):
        b = _bucket(g, n_buckets)
        logw += math.log((p_cnt.get(b, 0) + k) / (tp + k * n_buckets))
        logw -= math.log((q_cnt.get(b, 0) + k) / (tq + k * n_buckets))
    return logw


def _gumbel(doc_id: int) -> float:
    u = (
        int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1_000_000 + 0.5
    ) / 1_000_000
    return -math.log(-math.log(u))


RAW = [
    "the table scans the table with a hash probe",
    "a fast merge joins a slow merge over sorted runs",
    "click here to win a free prize click here now",
    "buy cheap prize offers now free free free",
    "the optimizer picks a hash join for the table scan",
    "zz qq xx vv kk jj",
    "",  # token-less: logw must be exactly 0
    "sorted runs merge into one run with a heap",
]
TARGET = [
    "the table scan feeds a hash join",
    "sorted runs are merged by the optimizer",
    "a hash probe walks the table",
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TARGET)], "doc_id long, text string"
    )


class TestImportanceWeights:
    def test_logw_matches_brute(self, spark, raw, target):
        got = {
            r.doc_id: (r.n_grams, r.logw)
            for r in importance_weights(raw, target, n_buckets=B).collect()
        }
        assert set(got) == set(range(len(RAW)))  # total over raw, incl. empty doc
        p_cnt, tp = _model(TARGET)
        q_cnt, tq = _model(RAW)
        for i, t in enumerate(RAW):
            assert got[i][0] == len(_grams(t)), i
            assert got[i][1] == pytest.approx(_brute_logw(t, p_cnt, tp, q_cnt, tq), rel=1e-12, abs=1e-12), i

    def test_in_domain_beats_spam(self, spark, raw, target):
        # semantic check needs a collision-free feature space — at B=64
        # hash collisions legitimately blur the signal, so use the
        # paper's 10k-bucket regime here
        got = {
            r.doc_id: r.logw
            for r in importance_weights(raw, target, n_buckets=10_000).collect()
        }
        # per-gram normalized weight: database-ish docs over spam docs
        for good in (0, 1, 4, 7):
            for bad in (2, 3):
                ng, nb = len(_grams(RAW[good])), len(_grams(RAW[bad]))
                assert got[good] / ng > got[bad] / nb, (good, bad)

    def test_doc_bucket_counts(self, spark, raw):
        got = {
            (r.doc_id, r.bucket): r.c
            for r in doc_bucket_counts(raw, n_buckets=B).collect()
        }
        want: dict[tuple[int, int], int] = {}
        for i, t in enumerate(RAW):
            for g in _grams(t):
                key = (i, _bucket(g))
                want[key] = want.get(key, 0) + 1
        assert got == want

    def test_partitioning_invariant(self, spark, raw, target):
        base = importance_weights(raw, target, n_buckets=B).collect()
        shuffled = importance_weights(raw.repartition(7), target.repartition(3), n_buckets=B).collect()
        assert {r.doc_id: r.logw for r in base} == {r.doc_id: r.logw for r in shuffled}

    def test_k_validation(self, spark, raw, target):
        with pytest.raises(ValueError, match="smoothing k"):
            importance_weights(raw, target, k=0.0)


class TestSelection:
    def test_gumbel_topk_matches_brute(self, spark, raw, target):
        n = 4
        sel = dsir_select(raw, target, n=n, n_buckets=B).collect()
        p_cnt, tp = _model(TARGET)
        q_cnt, tq = _model(RAW)
        keys = {
            i: _brute_logw(t, p_cnt, tp, q_cnt, tq) + _gumbel(i)
            for i, t in enumerate(RAW)
        }
        want = sorted(keys, key=lambda i: (-keys[i], i))[:n]
        assert [r.doc_id for r in sel] == want
        for r in sel:
            assert r.key == pytest.approx(keys[r.doc_id], rel=1e-12)

    def test_select_deterministic(self, spark, raw, target):
        a = [r.doc_id for r in dsir_select(raw, target, n=3, n_buckets=B).collect()]
        b = [r.doc_id for r in dsir_select(raw.repartition(5), target, n=3, n_buckets=B).collect()]
        assert a == b

    def test_n_validation(self, spark, raw, target):
        with pytest.raises(ValueError, match="selection size"):
            dsir_select(raw, target, n=0)
