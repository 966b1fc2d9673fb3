"""LatLonPoint geo queries vs numpy brute force.

Reference: LatLonPoint.java:236-297 (newBoxQuery / newDistanceQuery),
LatLonDocValuesField.newDistanceSort, SloppyMath.haversinMeters with
EARTH_MEAN_RADIUS 6371008.7714 m. Constant-score semantics; boxes with
min_lon > max_lon cross the dateline.
"""

from __future__ import annotations

import math
import shutil

import numpy as np
import pytest

from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.geo import EARTH_MEAN_RADIUS_M, nearest

LAT = lambda i: (i * 7919) % 18000 / 100.0 - 90.0  # noqa: E731
LON = lambda i: (i * 104729) % 36000 / 100.0 - 180.0  # noqa: E731


def hav_m(lat1, lon1, lat2, lon2):
    p = math.pi / 180.0
    dlat, dlon = (lat2 - lat1) * p, (lon2 - lon1) * p
    h = math.sin(dlat / 2) ** 2 + math.cos(lat1 * p) * math.cos(lat2 * p) * math.sin(dlon / 2) ** 2
    return 2 * EARTH_MEAN_RADIUS_M * math.asin(math.sqrt(h))


@pytest.fixture(scope="module")
def geo_index(tmp_path_factory, spark, corpus_pdf):
    """Index whose docs carry deterministic lat/lon metadata columns."""
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf = ordered.copy()
    pdf["lat"] = [LAT(i) for i in range(len(pdf))]
    pdf["lon"] = [LON(i) for i in range(len(pdf))]
    d = str(tmp_path_factory.mktemp("geoix"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4)).build(
        spark.createDataFrame(pdf).drop("content_sha256"), d
    )
    yield SearchIndex(spark, d), pdf
    shutil.rmtree(d, ignore_errors=True)


def _ids(td):
    return sorted(h for h, _ in td.hits)


def test_box_query(geo_index):
    ix, pdf = geo_index
    s = Searcher(ix)
    q = A.GeoBoxQuery("lat", "lon", -30.0, 45.0, -90.0, 60.0)
    want = sorted(
        i for i in range(len(pdf))
        if -30.0 <= LAT(i) <= 45.0 and -90.0 <= LON(i) <= 60.0
    )
    assert _ids(s.search(q, k=10**6)) == want
    assert _ids(s.search(q, k=10**6, mode="distributed")) == want


def test_box_query_dateline_crossing(geo_index):
    ix, pdf = geo_index
    s = Searcher(ix)
    q = A.GeoBoxQuery("lat", "lon", -90.0, 90.0, 150.0, -150.0)
    want = sorted(i for i in range(len(pdf)) if LON(i) >= 150.0 or LON(i) <= -150.0)
    assert _ids(s.search(q, k=10**6)) == want


def test_distance_query(geo_index):
    ix, pdf = geo_index
    s = Searcher(ix)
    center, radius = (10.0, 20.0), 4_000_000.0
    q = A.GeoDistanceQuery("lat", "lon", center[0], center[1], radius)
    want = sorted(
        i for i in range(len(pdf)) if hav_m(center[0], center[1], LAT(i), LON(i)) <= radius
    )
    assert want, "fixture radius must match something"
    assert _ids(s.search(q, k=10**6)) == want
    assert _ids(s.search(q, k=10**6, mode="distributed")) == want


def test_geo_filter_keeps_term_scores(geo_index):
    """FILTER geo clause restricts matches without touching BM25 scores
    (BooleanQuery.rewriteNoScoring on FILTER occurrence)."""
    ix, pdf = geo_index
    s = Searcher(ix)
    box = A.GeoBoxQuery("lat", "lon", -90.0, 0.0, -180.0, 180.0)
    q = A.BooleanQuery(((A.Occur.MUST, A.TermQuery("return")), (A.Occur.FILTER, box)))
    got = s.search(q, k=10**6)
    base = {h: sc for h, sc in s.search("return", k=10**6).hits}
    south = {i for i in range(len(pdf)) if LAT(i) <= 0.0}
    want = sorted((h for h in base if h in south))
    assert _ids(got) == want
    for h, sc in got.hits:
        assert sc == base[h]


def test_nearest_sort(geo_index):
    ix, pdf = geo_index
    s = Searcher(ix)
    center = (48.8, 2.3)
    rows = nearest(s, "return", center[0], center[1], k=5).collect()
    got = [(r["doc_id"], round(r["distance_m"], 3)) for r in rows]
    match = {h for h, _ in s.search("return", k=10**6).hits}
    want = sorted(
        ((i, round(hav_m(center[0], center[1], LAT(i), LON(i)), 3)) for i in match),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gm), (wd, wm) in zip(got, want):
        assert abs(gm - wm) < 1e-3
