"""Delete tombstones: search-time liveDocs semantics + physical purge.

Lucene contract (Lucene90LiveDocsFormat; SegmentMerger): before a
merge, deleted docs vanish from results but statistics (df, norms,
avgdl) still count them — surviving docs keep their exact scores.
After a purge-merge, stats are recomputed.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.index.builder import IndexConfig
from lucene_spark.index.checkpoint import ResumableIndexBuilder
from lucene_spark.index.deletes import delete_by_query, delete_docs, purge_deletes
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher

CFG = dict(docs_per_chunk=64, term_buckets=4)


@pytest.fixture()
def del_index(tmp_path, spark, corpus_df):
    d = str(tmp_path / "ix")
    ResumableIndexBuilder(spark, IndexConfig(**CFG), n_segments=3).build(
        corpus_df.drop("content_sha256"), d
    )
    return d


class TestDeleteByQuery:
    def test_delete_by_query(self, spark, del_index):
        s = Searcher(SearchIndex(spark, del_index))
        q = A.BooleanQuery(((A.Occur.MUST, A.TermQuery("return")), (A.Occur.MUST, A.TermQuery("if"))))
        victims = {d for d, _ in s.search(q, k=10**9).hits}
        assert victims
        n = delete_by_query(s, q)
        assert n == len(victims)
        after = Searcher(SearchIndex(spark, del_index))  # reopen (DirectoryReader contract)
        remaining = {d for d, _ in after.search(q, k=10**9).hits}
        assert remaining == set()
        # docs matching only one of the terms survive
        assert after.search(A.TermQuery("return"), k=10**9).hits


class TestLiveDocs:
    def test_deleted_vanish_scores_unchanged(self, spark, del_index):
        before = Searcher(SearchIndex(spark, del_index))
        base_hits = before.search("return", k=30).hits
        victims = [base_hits[0][0], base_hits[3][0], base_hits[7][0]]
        n = delete_docs(spark, del_index, victims)
        assert n == 3

        after = Searcher(SearchIndex(spark, del_index))  # reader reopen
        for query in ["return", "return AND if", "return OR class", '"return if"', "ret*"]:
            hits = after.search(query, k=10_000).hits
            got_ids = {d for d, _ in hits}
            assert not (got_ids & set(victims)), query
        # surviving docs: EXACT same scores as before the delete
        survived = {d: s for d, s in base_hits if d not in victims}
        now = {d: s for d, s in after.search("return", k=30 + 3).hits}
        for d, s in survived.items():
            assert now[d] == s

    def test_wand_path_respects_deletes(self, spark, del_index):
        s0 = Searcher(SearchIndex(spark, del_index))
        top = s0.search("return OR if OR class", k=5).hits  # WAND path
        delete_docs(spark, del_index, [top[0][0]])
        s1 = Searcher(SearchIndex(spark, del_index))
        got = s1.search("return OR if OR class", k=5).hits
        assert top[0][0] not in {d for d, _ in got}
        # remaining ranking preserved
        assert [d for d, _ in got[:4]] == [d for d, _ in top[1:5]]

    def test_distributed_respects_deletes(self, spark, del_index):
        s0 = Searcher(SearchIndex(spark, del_index))
        top = s0.search("return AND if", k=5, mode="distributed").hits
        delete_docs(spark, del_index, [top[0][0]])
        s1 = Searcher(SearchIndex(spark, del_index))
        got = s1.search("return AND if", k=5, mode="distributed").hits
        assert top[0][0] not in {d for d, _ in got}

    def test_count_excludes_deleted(self, spark, del_index):
        s0 = Searcher(SearchIndex(spark, del_index))
        n0 = s0.count("return")
        victim = s0.search("return", k=1).hits[0][0]
        delete_docs(spark, del_index, [victim])
        assert Searcher(SearchIndex(spark, del_index)).count("return") == n0 - 1


class TestPurge:
    def test_purge_recomputes_stats(self, spark, del_index):
        s0 = Searcher(SearchIndex(spark, del_index))
        pre_hits = s0.search("return", k=5).hits
        victims = [d for d, _ in pre_hits[:4]]
        old_fifth_score = pre_hits[4][1]
        delete_docs(spark, del_index, victims)
        stats_before = SearchIndex(spark, del_index).stats

        rec = purge_deletes(spark, del_index, IndexConfig(**CFG))
        assert rec["purged"] == 4

        ix = SearchIndex(spark, del_index)
        assert len(ix.deleted_ids) == 0  # tombstones cleared
        assert ix.stats.doc_count == stats_before.doc_count - 4
        assert ix.stats.sum_total_term_freq < stats_before.sum_total_term_freq
        s1 = Searcher(ix)
        hits = s1.search("return", k=10_000).hits
        assert not ({d for d, _ in hits} & set(victims))
        # scores DIFFER now (stats changed) — that's the Lucene merge contract
        assert s1.search("return", k=1).hits[0][1] != old_fifth_score
