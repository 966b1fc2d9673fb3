"""Index-time sort + early-terminating sorted search
(IndexWriterConfig.setIndexSort, IndexWriterConfig.java:475;
TopFieldCollector early exit when the query sort matches the index
sort). Doc ids on a sorted index follow the sort columns, so the top-k
by that sort = the first k matches in doc order — the loop stops
visiting (and decoding) doc-range chunks at the first boundary with k
collected hits."""

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.postprocess import sorted_search

SORT = ("-n_chars", "repo", "path", "commit")


@pytest.fixture(scope="module")
def sorted_ix(tmp_path_factory, spark, corpus_df):
    d = str(tmp_path_factory.mktemp("ixsort"))
    corpus = corpus_df.drop("content_sha256").withColumn("n_chars", F.length("content"))
    cfg = IndexConfig(docs_per_chunk=32, term_buckets=4, positions=True, index_sort=SORT)
    IndexBuilder(spark, cfg).build(corpus, d)
    ix = SearchIndex(spark, d)
    yield ix, Searcher(ix)
    shutil.rmtree(d, ignore_errors=True)


class TestIndexSort:
    def test_manifest_and_id_order(self, spark, sorted_ix):
        ix, _ = sorted_ix
        assert ix.index_sort == list(SORT)
        rows = ix.docs.select("doc_id", "n_chars").orderBy("doc_id").collect()
        lens = [r["n_chars"] for r in rows]
        # doc-id order IS n_chars-descending order
        assert lens == sorted(lens, reverse=True)
        assert [r["doc_id"] for r in rows] == list(range(len(rows)))

    def test_valuespec_sliced_per_chunk(self, sorted_ix):
        """A driver-resolved ValueSpec (FeatureQuery over a docvalues
        column) must be sliced to each chunk's doc window during the
        chunk-at-a-time sorted scan — without the slice every chunk
        re-emits the spec's FULL doc set: duplicated doc ids and
        out-of-window docs in the early-terminated prefix."""
        from lucene_spark.search import ast as A

        _, s = sorted_ix
        q = A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("return")),
                (A.Occur.SHOULD, A.FeatureQuery("n_chars", "saturation", pivot=256.0)),
            )
        )
        td = s.search_sorted_index(q, k=40)
        ids = [d for d, _ in td.hits]
        assert len(ids) == len(set(ids)), "duplicated doc ids across chunks"
        # the sorted scan fills in doc-id order: prefix must be exactly [0..k)
        assert ids == sorted(ids)
        full = s.search_sorted_index(q, k=10_000)
        fids = [d for d, _ in full.hits]
        assert fids == sorted(set(fids))

    def test_feature_only_query_visits_value_chunks(self, sorted_ix):
        """A clause scored ONLY by a value source (FeatureQuery) must
        contribute its docs' chunks to the sorted scan — previously
        ordered_chunks stayed empty and the query returned 0 hits."""
        from lucene_spark.search import ast as A

        _, s = sorted_ix
        q = A.FeatureQuery("n_chars", "saturation", pivot=256.0)
        td = s.search_sorted_index(q, k=7)
        assert len(td.hits) == 7
        ids = [d for d, _ in td.hits]
        assert ids == sorted(ids) and len(set(ids)) == 7

    def test_early_termination_on_dense_term(self, sorted_ix):
        _, s = sorted_ix
        td = s.search_sorted_index("return", k=5)  # df == N in fixtures
        assert len(td.hits) == 5
        assert td.info["early_terminated"] is True
        assert td.info["chunks_scanned"] < td.info["chunks_total"]
        assert td.relation == "GREATER_THAN_OR_EQUAL_TO"
        # no termination when k exceeds the match count
        td_all = s.search_sorted_index("return", k=10_000)
        assert td_all.relation == "EQUAL_TO"
        assert td_all.info["early_terminated"] is False
        assert td_all.total_hits == len(td_all.hits)

    @pytest.mark.parametrize(
        "query",
        [
            "return",
            "return AND if",
            '"return if"',
            "ret*",
            "*:*",
            "+int -return",
            A.FieldValueQuery("lang", "python"),
        ],
    )
    def test_matches_full_sorted_search(self, sorted_ix, query):
        """Early-terminated result ≡ exhaustive ORDER BY n_chars DESC,
        doc_id LIMIT k on the same index (TopFieldCollector contract:
        early exit never changes the top-k)."""
        ix, s = sorted_ix
        td = s.search_sorted_index(query, k=7)
        full = sorted_search(s, query, ix.docs, [("n_chars", False)], k=7).collect()
        assert [d for d, _ in td.hits] == [r["doc_id"] for r in full]

    def test_scores_match_relevance_search(self, sorted_ix):
        """Hits carry true BM25 scores (setScores role)."""
        _, s = sorted_ix
        td = s.search_sorted_index("return AND if", k=5)
        by_id = dict(s.search("return AND if", k=10_000).hits)
        for d, sc in td.hits:
            assert abs(by_id[d] - sc) < 1e-6

    def test_same_documents_as_unsorted_index(self, spark, sorted_ix, index_dir):
        """The sorted index returns the same DOCUMENTS (by stored key)
        as sorting the unsorted index's matches — ids differ, content
        doesn't."""
        ix, s = sorted_ix
        oix = SearchIndex(spark, index_dir)
        os_ = Searcher(oix)
        exp = (
            sorted_search(
                os_,
                "return AND if",
                oix.docs.join(
                    ix.docs.select("repo", "path", "commit", "n_chars"),
                    ["repo", "path", "commit"],
                ),
                [("n_chars", False)],
                k=6,
            )
            .select("repo", "path", "commit")
            .collect()
        )
        got = s.search_sorted_index("return AND if", k=6)
        ids = [int(d) for d, _ in got.hits]
        gkeys = {
            r["doc_id"]: (r["repo"], r["path"], r["commit"])
            for r in ix.docs.filter(F.col("doc_id").isin(ids)).collect()
        }
        assert [gkeys[d] for d in ids] == [(r["repo"], r["path"], r["commit"]) for r in exp]

    def test_unsorted_index_refuses(self, spark, index_dir):
        s = Searcher(SearchIndex(spark, index_dir))
        with pytest.raises(ValueError, match="index_sort"):
            s.search_sorted_index("return", k=5)
