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


def _point_in_ring(lat, lon, ring):
    pts = list(ring)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    inside = False
    for (y1, x1), (y2, x2) in zip(pts, pts[1:] + pts[:1]):
        if ((y1 > lat) != (y2 > lat)) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


SHELL = ((-10.001, -50.001), (40.001, -60.001), (55.001, 10.001), (20.001, 60.001), (-30.001, 20.001))
HOLE = ((0.001, -20.001), (15.001, -25.001), (10.001, 5.001))


def test_polygon_query(geo_index):
    """LatLonPoint.newPolygonQuery: even-odd ray cast, shell + hole."""
    ix, pdf = geo_index
    s = Searcher(ix)
    q = A.GeoPolygonQuery("lat", "lon", SHELL, (HOLE,))
    got = sorted(d for d, _ in s.search(q, k=10**6).hits)
    want = sorted(
        i
        for i in range(len(pdf))
        if _point_in_ring(LAT(i), LON(i), SHELL) and not _point_in_ring(LAT(i), LON(i), HOLE)
    )
    assert got == want and want  # non-degenerate
    # hole actually removes something
    no_hole = sorted(d for d, _ in s.search(A.GeoPolygonQuery("lat", "lon", SHELL), k=10**6).hits)
    assert set(no_hole) > set(got)
    # closed-ring input (first point repeated) is accepted
    closed = SHELL + (SHELL[0],)
    same = sorted(d for d, _ in s.search(A.GeoPolygonQuery("lat", "lon", closed), k=10**6).hits)
    assert same == no_hole


def test_polygon_as_filter_and_distributed(geo_index):
    ix, pdf = geo_index
    s = Searcher(ix)
    poly = A.GeoPolygonQuery("lat", "lon", SHELL)
    q = A.BooleanQuery(((A.Occur.MUST, A.TermQuery("return")), (A.Occur.FILTER, poly)))
    got = s.search(q, k=50)
    got_d = s.search(q, k=50, mode="distributed")
    assert got.hits == got_d.hits
    inside = {i for i in range(len(pdf)) if _point_in_ring(LAT(i), LON(i), SHELL)}
    assert all(d in inside for d, _ in got.hits)
