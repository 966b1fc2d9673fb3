"""IndexSearcher.explain / searchAfter parity + CheckIndex validation."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.parser import parse_query


@pytest.fixture(scope="module")
def searcher(search_index):
    return Searcher(search_index)


class TestExplain:
    def test_term_explain_matches_score(self, searcher, oracle):
        top = searcher.search(A.TermQuery("return"), k=3).hits
        doc, score = top[0]
        ex = searcher.explain(A.TermQuery("return"), doc)
        assert ex["match"] is True
        assert np.float32(ex["value"]) == np.float32(score)
        descs = [d["description"] for d in ex["details"]]
        assert any("freq" in d for d in descs)
        assert any("weight" in d for d in descs)

    def test_boolean_explain_sums(self, searcher):
        q = parse_query("return AND if")
        doc, score = searcher.search(q, k=1).hits[0]
        ex = searcher.explain(q, doc)
        assert ex["match"] and np.float32(ex["value"]) == np.float32(score)
        child_sum = sum(d["value"] for d in ex["details"] if d["match"])
        assert ex["value"] == pytest.approx(child_sum, rel=1e-5)

    def test_non_matching_doc(self, searcher, oracle):
        scores = oracle.score(A.TermQuery("zzz_nonexistent"))
        assert scores == {}
        ex = searcher.explain(A.TermQuery("return"), 10**9)
        assert ex["match"] is False and ex["value"] == 0.0

    def test_filter_detail_non_scoring(self, searcher):
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.FieldValueQuery("lang", "java")),
            )
        )
        hits = searcher.search(q, k=1).hits
        ex = searcher.explain(q, hits[0][0])
        filt = [d for d in ex["details"] if d["description"].startswith("FILTER")]
        assert filt and filt[0]["value"] == 0.0


class TestSearchAfter:
    def test_pagination_covers_full_ranking(self, searcher, oracle):
        q = A.TermQuery("return")
        full = oracle.top_k(q, 30)
        page1 = searcher.search(q, k=10).hits
        page2 = searcher.search_after(page1[-1], q, k=10).hits
        page3 = searcher.search_after(page2[-1], q, k=10).hits
        got = page1 + page2 + page3
        assert [d for d, _ in got] == [d for d, _ in full]
        for (gd, gs), (od, os_) in zip(got, full):
            assert np.float32(gs) == np.float32(os_)

    def test_after_none_is_search(self, searcher):
        q = parse_query("return OR if")
        assert searcher.search_after(None, q, k=5).hits == searcher.search(q, k=5).hits

    def test_after_ties_break_by_doc(self, searcher):
        # constant-score query: every hit ties on score → pagination
        # must advance purely by doc id
        q = A.ConstantScoreQuery(A.TermQuery("return"))
        p1 = searcher.search(q, k=7).hits
        p2 = searcher.search_after(p1[-1], q, k=7).hits
        docs = [d for d, _ in p1 + p2]
        assert docs == sorted(docs)
        assert len(set(docs)) == len(docs)


class TestFieldRangeAndSorted:
    @pytest.fixture(scope="class")
    def mini(self, spark, tmp_path_factory):
        from lucene_spark.index import IndexBuilder, IndexConfig, SearchIndex

        rows = [
            (i, "r", f"p{i}", "c", "en", 100 + 10 * i, f"alpha beta doc{i} " + "pad " * i)
            for i in range(12)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, repo string, path string, commit string, lang string, size long, content string"
        )
        d = str(tmp_path_factory.mktemp("mini_idx"))
        IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=2)).build(
            df, d, assign_ids=False
        )
        idx = SearchIndex(spark, d)
        return idx, Searcher(idx)

    def test_metadata_passthrough(self, mini):
        idx, _ = mini
        assert "size" in idx.docs.columns

    def test_numeric_range_filter(self, mini):
        _, s = mini
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("alpha")),
                (A.Occur.FILTER, A.FieldRangeQuery("size", 120, 150)),
            )
        )
        got = sorted(d for d, _ in s.search(q, k=100).hits)
        assert got == [2, 3, 4, 5]  # sizes 120..150 inclusive

    def test_exclusive_and_open_bounds(self, mini):
        _, s = mini
        q = A.FieldRangeQuery("size", 120, 150, include_lower=False, include_upper=False)
        got = sorted(d for d, _ in s.search(q, k=100).hits)
        assert got == [3, 4]
        q = A.FieldRangeQuery("size", None, 110)
        assert sorted(d for d, _ in s.search(q, k=100).hits) == [0, 1]

    def test_parsed_numeric_range(self, mini):
        _, s = mini
        got = sorted(d for d, _ in s.search(parse_query("size:[120 TO 150]"), k=100).hits)
        assert got == [2, 3, 4, 5]

    def test_sorted_search(self, mini):
        from lucene_spark.search.postprocess import sorted_search

        idx, s = mini
        out = sorted_search(s, A.TermQuery("alpha"), idx.docs, [("size", False)], k=3).collect()
        assert [r["doc_id"] for r in out] == [11, 10, 9]  # largest sizes first

    def test_sorted_search_after_pages(self, mini):
        """searchAfter(FieldDoc) paging: consecutive pages concatenate
        to the unpaged prefix, including across sort-value ties."""
        from lucene_spark.search.postprocess import sorted_search

        idx, s = mini
        q = A.TermQuery("alpha")
        cols = [("size", False)]
        full = sorted_search(s, q, idx.docs, cols, k=12).collect()
        pages, after = [], None
        for _ in range(4):
            page = sorted_search(s, q, idx.docs, cols, k=3, after=after).collect()
            if not page:
                break
            pages.extend(page)
            last = page[-1]
            after = (last["size"], last["doc_id"])
        assert [r["doc_id"] for r in pages] == [r["doc_id"] for r in full]

    def test_sorted_search_after_with_nulls(self, mini):
        """NULL sort values page correctly: desc puts NULLs last
        (Spark default), and pages must still concatenate to the
        unpaged prefix — including marks taken from NULL rows."""
        from pyspark.sql import functions as F

        from lucene_spark.search.postprocess import sorted_search

        idx, s = mini
        docs = idx.docs.withColumn(
            "size", F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("size"))
        )
        q = A.TermQuery("alpha")
        cols = [("size", False)]
        full = sorted_search(s, q, docs, cols, k=50).collect()
        pages, after = [], None
        for _ in range(8):
            page = sorted_search(s, q, docs, cols, k=3, after=after).collect()
            if not page:
                break
            pages.extend(page)
            last = page[-1]
            after = (last["size"], last["doc_id"])
        assert [r["doc_id"] for r in pages] == [r["doc_id"] for r in full]
        assert any(r["size"] is None for r in pages)  # NULL rows paged too

    def test_sorted_search_after_validates_arity(self, mini):
        from lucene_spark.search.postprocess import sorted_search

        idx, s = mini
        with pytest.raises(ValueError, match="one value per sort col"):
            sorted_search(
                s, A.TermQuery("alpha"), idx.docs, [("size", False)], k=3, after=(1,)
            )


class TestStoredFields:
    def test_doc_fetch(self, searcher, corpus_pdf):
        hit_doc, _ = searcher.search("return", k=1).hits[0]
        row = searcher.doc(hit_doc)
        assert row is not None and row["doc_id"] == hit_doc
        assert "content_sha256" in row and row["lang"]

    def test_doc_missing(self, searcher):
        assert searcher.doc(10**12) is None

    def test_retrieve_join(self, searcher):
        td = searcher.search("return AND if", k=5)
        out = searcher.retrieve(td).collect()
        assert [r["doc_id"] for r in out] == [d for d, _ in td.hits]
        assert all(r["content_sha256"] for r in out)


class TestCheckIndex:
    def test_clean_index_passes(self, spark, search_index):
        from lucene_spark.index.check import check_index

        report = check_index(search_index)
        assert report["status"] == "ok"
        assert report["posting_lists"] > 0
        assert report["doc_count_ok"] and report["sum_ttf_ok"]

    def test_corrupt_df_detected(self, spark, search_index, tmp_path):
        import shutil

        from pyspark.sql import functions as F

        from lucene_spark.index.check import CheckIndexError, check_index
        from lucene_spark.index.reader import SearchIndex

        bad_dir = str(tmp_path / "bad_index")
        shutil.copytree(search_index.index_dir, bad_dir)
        # tamper: bump df on one postings row
        p = spark.read.parquet(f"{bad_dir}/postings")
        tampered = p.withColumn(
            "df", F.when(F.col("term") == "return", F.col("df") + 1).otherwise(F.col("df"))
        )
        tampered.write.mode("overwrite").parquet(f"{bad_dir}/postings_tmp")
        shutil.rmtree(f"{bad_dir}/postings")
        shutil.move(f"{bad_dir}/postings_tmp", f"{bad_dir}/postings")
        bad = SearchIndex(spark, bad_dir)
        with pytest.raises(CheckIndexError):
            check_index(bad)
        report = check_index(bad, raise_on_failure=False)
        assert report["bad_df"] > 0 or report["term_stats_mismatches"] > 0


class TestSearchTimeout:
    """IndexSearcher.setTimeout(QueryTimeout) / TimeLimitingCollector:
    best-effort budget, partial-but-correct results, relation GTE."""

    def test_no_timeout_is_identity(self, search_index):
        from lucene_spark.search.engine import Searcher

        a = Searcher(search_index).search("return OR class", k=10)
        b = Searcher(search_index, timeout_ms=60_000).search("return OR class", k=10)
        assert a.hits == b.hits and not b.info.get("timed_out")

    def test_expired_budget_flags_and_stays_correct(self, search_index):
        from lucene_spark.search.engine import Searcher

        full = {d for d, _ in Searcher(search_index).search("return OR class", k=10).hits}
        # an already-expired budget: first checkpoint trips
        td = Searcher(search_index, timeout_ms=-1).search("return OR class", k=10)
        assert td.info.get("timed_out") is True
        assert td.relation == "GREATER_THAN_OR_EQUAL_TO"
        # every returned hit is a real fully-scored match
        assert {d for d, _ in td.hits} <= full
        td2 = Searcher(search_index, timeout_ms=-1).search("return AND class", k=10)
        assert td2.info.get("timed_out") is True and td2.hits == []
