"""FeatureField / DistanceFeatureQuery vs from-definition brute force.

References:
- FeatureField.java:196-218 — the feature value is stored IN the term
  frequency as floatToIntBits(v) >>> 15 and decoded as
  intBitsToFloat(tf << 15) (mantissa truncated to its top 8 bits).
- FeatureField.java:231-239 LinearFunction (w * v, float32 arithmetic),
  :305-312 LogFunction ((float)(w * Math.log(a + v))), :373-387
  SaturationFunction (w * (1 - pivot/(v + pivot)), float32 — the
  monotonic rewrite), :441-450 SigmoidFunction
  ((float)(w * (1 - pivot^a/(v^a + pivot^a)))).
- FeatureField.java:519-527/560-575/596-608 — the weight parameter is
  an enclosing BoostQuery; constructor validation (weight in (0,64],
  scalingFactor >= 1, pivot > 0).
- LongDistanceFeatureQuery.java:46-52,95-122 — score =
  boost * pivot / (pivot + |value - origin|), pivot > 0.
- LatLonPointDistanceFeatureQuery — geo variant over haversine.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.kernels import decode_feature_values, value_scores

N_DOCS = 150


def _decode_ref(v: float) -> float:
    """Independent decodeFeatureValue: struct-based bit twiddling."""
    bits = struct.unpack("<i", struct.pack("<f", float(np.float32(v))))[0]
    tf = bits >> 15  # encode (freq)
    return struct.unpack("<f", struct.pack("<i", tf << 15))[0]  # decode


@pytest.fixture(scope="module")
def feat_index(spark, tmp_path_factory):
    from lucene_spark.fixtures import make_corpus
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    pdf = pd.DataFrame(make_corpus(N_DOCS, seed=11)).drop(columns=["content_sha256"])
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    # pagerank: positive floats incl. values needing >8 mantissa bits
    # (quantization must bite); ts: a long "timestamp"; lat/lon points
    pdf["pagerank"] = [((i * 37) % 199 + 1) * 1.37 for i in range(len(pdf))]
    pdf["ts"] = [1_000_000 + i * 977 for i in range(len(pdf))]
    pdf["lat"] = [((i * 7919) % 18000) / 100.0 - 90.0 for i in range(len(pdf))]
    pdf["lon"] = [((i * 104729) % 36000) / 100.0 - 180.0 for i in range(len(pdf))]
    d = str(tmp_path_factory.mktemp("featix"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=64, term_buckets=4)).build(
        spark.createDataFrame(pdf), d
    )
    return SearchIndex(spark, d), pdf


def _hits(td):
    return [(d, float(s)) for d, s in td.hits]


def test_decode_feature_value_matches_bit_twiddle():
    vals = [1.0, 3.0, 1000.5, 1.17549435e-38, 89.0, 123456.78, 0.015625, 7.3]
    got = decode_feature_values(np.array(vals, dtype=np.float64))
    for v, g in zip(vals, got):
        assert float(g) == _decode_ref(v), v
    # quantization truncates, never rounds up
    assert float(got[2]) <= np.float32(1000.5)


@pytest.mark.parametrize(
    "node,fn",
    [
        (A.FeatureQuery("pagerank", "linear"), lambda d: np.float32(1.0) * np.float32(d)),
        (
            A.FeatureQuery("pagerank", "log", a=2.5),
            lambda d: np.float32(1.0 * np.log(2.5 + float(d))),
        ),
        (
            A.FeatureQuery("pagerank", "saturation", pivot=50.0),
            lambda d: np.float32(1.0)
            * (np.float32(1.0) - np.float32(50.0) / (np.float32(d) + np.float32(50.0))),
        ),
        (
            A.FeatureQuery("pagerank", "sigmoid", pivot=50.0, a=2.0),
            lambda d: np.float32(1.0 * (1.0 - 50.0**2.0 / (float(d) ** 2.0 + 50.0**2.0))),
        ),
    ],
)
def test_feature_functions_match_brute(feat_index, node, fn):
    index, pdf = feat_index
    se = Searcher(index)
    want = {}
    for i, v in enumerate(pdf["pagerank"]):
        dec = _decode_ref(v)
        want[i] = float(np.float32(fn(dec)))
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _hits(se.search(node, k=10))
    assert got == [(d, pytest.approx(s, abs=0)) for d, s in ranked]
    assert _hits(se.search(node, k=10, mode="distributed")) == got


def test_feature_boost_is_reference_weight(feat_index):
    """FeatureField queries carry weight as an enclosing BoostQuery."""
    index, pdf = feat_index
    se = Searcher(index)
    node = A.BoostQuery(A.FeatureQuery("pagerank", "saturation", pivot=50.0), 1.5)
    want = {}
    for i, v in enumerate(pdf["pagerank"]):
        dec = np.float32(_decode_ref(v))
        want[i] = float(
            np.float32(1.5) * (np.float32(1.0) - np.float32(50.0) / (dec + np.float32(50.0)))
        )
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert _hits(se.search(node, k=10)) == ranked


def test_feature_should_composition(feat_index):
    """BM25 SHOULD + feature SHOULD sum per DisjunctionSumScorer
    (float64 accumulate, float32 cast) — the newSaturationQuery javadoc
    usage pattern."""
    index, _ = feat_index
    se = Searcher(index)
    feat = A.FeatureQuery("pagerank", "saturation", pivot=50.0)
    q = A.BooleanQuery(((A.Occur.SHOULD, A.TermQuery("return")), (A.Occur.SHOULD, feat)))
    bm = {d: s for d, s in _hits(se.search("return", k=N_DOCS))}
    fs = {d: s for d, s in _hits(se.search(feat, k=N_DOCS))}
    want = {}
    for d in set(bm) | set(fs):
        want[d] = float(np.float32(np.float64(bm.get(d, 0.0)) + np.float64(fs.get(d, 0.0))))
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _hits(se.search(q, k=10))
    assert got == ranked
    assert _hits(se.search(q, k=10, mode="distributed")) == ranked


def test_long_distance_feature(feat_index):
    index, pdf = feat_index
    se = Searcher(index)
    node = A.LongDistanceFeatureQuery("ts", origin=1_050_000, pivot=10_000)
    want = {
        i: float(np.float32(10_000.0 / (10_000.0 + abs(float(v) - 1_050_000.0))))
        for i, v in enumerate(pdf["ts"])
    }
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _hits(se.search(node, k=10))
    assert got == ranked
    assert _hits(se.search(node, k=10, mode="distributed")) == ranked


def test_geo_distance_feature(feat_index):
    from lucene_spark.search.geo import haversine_np

    index, pdf = feat_index
    se = Searcher(index)
    node = A.GeoDistanceFeatureQuery("lat", "lon", 48.8, 2.3, 1_000_000.0)
    d = haversine_np(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 48.8, 2.3)
    want = {i: float(np.float32(1e6 / (1e6 + d[i]))) for i in range(len(pdf))}
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _hits(se.search(node, k=10))
    assert got == ranked
    assert _hits(se.search(node, k=10, mode="distributed")) == ranked


def test_feature_in_filtered_bool(feat_index):
    """Feature SHOULD + metadata FILTER composes (the rewritten
    req(FILTER)+opt shape); filter removes docs, scores unchanged."""
    index, pdf = feat_index
    se = Searcher(index)
    feat = A.FeatureQuery("pagerank", "saturation", pivot=50.0)
    flt = A.FieldRangeQuery("ts", lower=1_020_000)
    q = A.BooleanQuery(((A.Occur.SHOULD, feat), (A.Occur.FILTER, flt)))
    fs = {d: s for d, s in _hits(se.search(feat, k=N_DOCS))}
    allowed = {i for i, v in enumerate(pdf["ts"]) if v >= 1_020_000}
    want = sorted(
        ((d, s) for d, s in fs.items() if d in allowed), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert _hits(se.search(q, k=10)) == want
    assert _hits(se.search(q, k=10, mode="distributed")) == want


def test_constructor_validation(feat_index):
    index, _ = feat_index
    se = Searcher(index)
    with pytest.raises(ValueError, match="pivot"):
        se.search(A.FeatureQuery("pagerank", "saturation", pivot=0.0), k=5)
    with pytest.raises(ValueError, match="scalingFactor"):
        se.search(A.FeatureQuery("pagerank", "log", a=0.5), k=5)
    with pytest.raises(ValueError, match="feature function"):
        se.search(A.FeatureQuery("pagerank", "nope"), k=5)
    with pytest.raises(ValueError, match="pivotDistance"):
        se.search(A.LongDistanceFeatureQuery("ts", origin=0, pivot=0), k=5)
    with pytest.raises(ValueError, match="pivotDistance"):
        se.search(A.GeoDistanceFeatureQuery("lat", "lon", 0.0, 0.0, 0.0), k=5)


def test_value_scores_shared_kernel():
    """Both modes score through value_scores: spot-check the kernel
    directly against the struct-based reference."""
    vals = np.array([[3.0], [1000.5], [89.0]])
    got = value_scores("feature_saturation", (10.0,), 2.0, vals)
    for row, g in zip(vals[:, 0], got):
        dec = np.float32(_decode_ref(row))
        want = np.float32(2.0) * (np.float32(1.0) - np.float32(10.0) / (dec + np.float32(10.0)))
        assert float(g) == float(want)
