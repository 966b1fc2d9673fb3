"""Engine-level KNN vector search (KnnFloatVectorQuery +
VectorSimilarityFunction roles): exact top-k over the vectors sidecar
with pre-filter semantics, verified against a numpy brute-force
oracle for every metric and filter shape."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher

DIMS = 16


def _vec_for(i: int) -> list[float]:
    rng = np.random.RandomState(1000 + i)
    return [float(x) for x in rng.randn(DIMS).astype(np.float32)]


@pytest.fixture(scope="module")
def knn_ix(tmp_path_factory, spark, corpus_pdf):
    pdf = corpus_pdf.drop(columns=["content_sha256"]).copy()
    pdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["vec"] = [_vec_for(i) for i in range(len(pdf))]
    d = str(tmp_path_factory.mktemp("knn"))
    corpus = spark.createDataFrame(pdf)
    cfg = IndexConfig(docs_per_chunk=64, term_buckets=4, vector_field="vec")
    IndexBuilder(spark, cfg).build(corpus, d)
    ix = SearchIndex(spark, d)
    # doc ids are assigned by (repo, path, commit) rank == pdf order,
    # so row i of pdf IS doc i
    mat = np.array([_vec_for(i) for i in range(len(pdf))], dtype=np.float64)
    yield ix, Searcher(ix), mat, pdf
    shutil.rmtree(d, ignore_errors=True)


def _brute(mat, qv, metric, allowed=None, k=5):
    qv = np.asarray(qv, dtype=np.float64)
    if metric == "cosine":
        sims = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        scores = (1 + sims) / 2
    elif metric == "dot":
        scores = (1 + mat @ qv) / 2
    else:
        scores = 1.0 / (1.0 + ((mat - qv) ** 2).sum(axis=1))
    ids = np.arange(len(mat))
    if allowed is not None:
        mask = np.isin(ids, allowed)
        ids, scores = ids[mask], scores[mask]
    order = np.lexsort((ids, -scores))[:k]
    return [(int(ids[i]), float(scores[i])) for i in order]


class TestKnn:
    @pytest.mark.parametrize("metric", ["cosine", "dot", "euclidean"])
    def test_exact_topk_matches_numpy(self, knn_ix, metric):
        _, s, mat, _ = knn_ix
        qv = _vec_for(9999)
        got = s.knn_search(qv, k=5, metric=metric)
        exp = _brute(mat, qv, metric, k=5)
        assert [d for d, _ in got.hits] == [d for d, _ in exp]
        for (_, a), (_, b) in zip(got.hits, exp):
            assert abs(a - b) < 1e-6

    def test_metadata_prefilter_pushdown(self, knn_ix):
        """filter = keyword equality → pushed-down docs-table scan;
        exactly k survivors all satisfying the predicate."""
        ix, s, mat, pdf = knn_ix
        qv = _vec_for(777)
        got = s.knn_search(qv, k=5, filter=A.FieldValueQuery("lang", "python"))
        allowed = np.where(pdf["lang"].values == "python")[0]
        exp = _brute(mat, qv, "cosine", allowed=allowed, k=5)
        assert [d for d, _ in got.hits] == [d for d, _ in exp]
        langs = {
            r["lang"]
            for r in ix.docs.filter(
                F.col("doc_id").isin([d for d, _ in got.hits])
            ).collect()
        }
        assert langs == {"python"}

    def test_text_query_prefilter(self, knn_ix):
        """filter = full-text query (the KnnFloatVectorQuery filter
        argument): candidates restricted to the query's match set."""
        _, s, mat, _ = knn_ix
        qv = _vec_for(42)
        filt = "return AND if"
        matches = s.search(filt, k=10_000)
        allowed = np.array(sorted(d for d, _ in matches.hits))
        got = s.knn_search(qv, k=5, filter=filt)
        exp = _brute(mat, qv, "cosine", allowed=allowed, k=5)
        assert [d for d, _ in got.hits] == [d for d, _ in exp]

    def test_k_exceeds_candidates(self, knn_ix):
        _, s, mat, pdf = knn_ix
        qv = _vec_for(5)
        n_go = int((pdf["lang"].values == "go").sum())
        got = s.knn_search(qv, k=10_000, filter=A.FieldValueQuery("lang", "go"))
        assert len(got.hits) == n_go

    def test_no_vector_field_raises(self, spark, index_dir):
        s = Searcher(SearchIndex(spark, index_dir))
        with pytest.raises(ValueError, match="vector"):
            s.knn_search([0.0] * DIMS, k=3)

    def test_match_none_filter(self, knn_ix):
        _, s, _, _ = knn_ix
        got = s.knn_search(_vec_for(1), k=3, filter="zzznosuchterm")
        assert got.hits == []
