"""BooleanQuery extras: minimumNumberShouldMatch + FILTER occur
semantics vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


@pytest.fixture(scope="module")
def corpus_texts(corpus_pdf):
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return {i: ordered.loc[i, "content"] for i in range(len(ordered))}


class TestMinimumShouldMatch:
    @pytest.mark.parametrize("msm", [1, 2, 3])
    def test_msm_doc_sets(self, search_index, corpus_texts, msm):
        terms = ("return", "class", "import")
        q = A.BooleanQuery(tuple((A.Occur.SHOULD, A.TermQuery(t)) for t in terms), minimum_should_match=msm)
        s = Searcher(search_index)
        got = {d for d, _ in s.search(q, k=10_000).hits}
        want = set()
        for d, text in corpus_texts.items():
            toks = set(tokenize(text))
            if sum(t in toks for t in terms) >= msm:
                want.add(d)
        assert got == want

    def test_msm_exceeding_surviving_shoulds_matches_nothing(self, search_index):
        """Boolean2ScorerSupplier: optional.size() < minShouldMatch →
        no scorer. SHOULD terms absent from the index drop at compile;
        if fewer survive than msm the whole query (MUSTs included)
        matches nothing — it must NOT degrade to the MUST matches."""
        s = Searcher(search_index)
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.SHOULD, A.TermQuery("zzqqxnotaterm")),
                (A.Occur.SHOULD, A.TermQuery("qqzzalsonotaterm")),
            ),
            minimum_should_match=2,
        )
        td = s.search(q, k=100)
        assert td.hits == [] and td.total_hits == 0
        # one surviving SHOULD out of two absent, msm=1: MUST ∩ SHOULD
        q1 = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.SHOULD, A.TermQuery("zzqqxnotaterm")),
                (A.Occur.SHOULD, A.TermQuery("class")),
            ),
            minimum_should_match=1,
        )
        assert s.search(q1, k=10).hits

    def test_msm_equals_and_when_all(self, search_index):
        s = Searcher(search_index)
        terms = ("return", "class")
        q_msm = A.BooleanQuery(tuple((A.Occur.SHOULD, A.TermQuery(t)) for t in terms), minimum_should_match=2)
        q_and = A.BooleanQuery(tuple((A.Occur.MUST, A.TermQuery(t)) for t in terms))
        a = s.search(q_msm, k=500).hits
        b = s.search(q_and, k=500).hits
        # same docs, same scores (sum over both terms)
        assert [d for d, _ in a] == [d for d, _ in b]
        for (_, x), (_, y) in zip(a, b):
            assert x == pytest.approx(y, rel=1e-6)


class TestFilterOccur:
    def test_filter_does_not_score(self, search_index, corpus_texts):
        """FILTER restricts the doc set but contributes no score
        (BooleanClause.FILTER, BooleanQuery.java:77-180)."""
        s = Searcher(search_index)
        q_filter = A.BooleanQuery(
            ((A.Occur.MUST, A.TermQuery("return")), (A.Occur.FILTER, A.TermQuery("class")))
        )
        q_must = A.BooleanQuery(
            ((A.Occur.MUST, A.TermQuery("return")), (A.Occur.MUST, A.TermQuery("class")))
        )
        q_term = A.TermQuery("return")
        f = s.search(q_filter, k=1000)
        m = s.search(q_must, k=1000)
        t = {d: sc for d, sc in s.search(q_term, k=10_000).hits}
        # same doc set as MUST+MUST
        assert {d for d, _ in f.hits} == {d for d, _ in m.hits}
        # but scored like the bare term query
        for d, sc in f.hits:
            assert sc == pytest.approx(t[d], rel=1e-6)


class TestCountShortcuts:
    def test_term_count_equals_df_and_brute(self, spark, search_index, oracle):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(search_index)
        # Weight#count fast path (df) must equal the evaluated count
        assert s.count(A.TermQuery("return")) == len(oracle.score(A.TermQuery("return")))
        assert s.count(A.MatchAllDocsQuery()) == search_index.stats.doc_count
        assert s.count(A.TermQuery("zzz_not_a_term")) == 0

    def test_count_falls_back_under_deletes(self, spark, corpus_df, tmp_path):
        import numpy as np

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.deletes import delete_docs
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        d = str(tmp_path / "cix")
        IndexBuilder(spark, IndexConfig(docs_per_chunk=64, term_buckets=2)).build(
            corpus_df.drop("content_sha256"), d
        )
        s = Searcher(SearchIndex(spark, d))
        full = s.count(A.TermQuery("return"))
        victim = s.search(A.TermQuery("return"), k=1).hits[0][0]
        delete_docs(spark, d, [victim])
        s2 = Searcher(SearchIndex(spark, d))  # reopen sees tombstone
        assert s2.count(A.TermQuery("return")) == full - 1
        assert s2.count(A.MatchAllDocsQuery()) == s.count(A.MatchAllDocsQuery()) - 1


class TestFilteredWand:
    """FILTER/MUST_NOT doc-set clauses on term disjunctions take the
    block-max WAND path (req(filter)+opt(TOP_SCORES) branch) and must
    equal exhaustive evaluation exactly."""

    def _mk(self, *clauses, msm=0):
        from lucene_spark.search import ast as A

        return A.BooleanQuery(tuple(clauses), minimum_should_match=msm)

    def test_filtered_disjunction_equals_exhaustive(self, search_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(search_index)
        q = self._mk(
            (A.Occur.SHOULD, A.TermQuery("return")),
            (A.Occur.SHOULD, A.TermQuery("class")),
            (A.Occur.FILTER, A.FieldValueQuery("lang", "python")),
        )
        got = s.search(q, k=10)
        assert got.info.get("decoded_blocks") is not None, "must take the WAND path"
        # exhaustive truth: force via a searcher shape WAND rejects
        sf = Searcher(search_index)
        base = {d: sc for d, sc in sf.search(self._mk(
            (A.Occur.SHOULD, A.TermQuery("return")),
            (A.Occur.SHOULD, A.TermQuery("class")),
        ), k=10**6).hits}
        lang_docs = set(search_index.field_doc_set(("eq", "lang", "python"), None)
                        if False else
                        [r["doc_id"] for r in search_index.docs.filter("lang = 'python'").select("doc_id").collect()])
        want = sorted(((d, sc) for d, sc in base.items() if d in lang_docs),
                      key=lambda t: (-t[1], t[0]))[:10]
        assert [(d, round(sc, 6)) for d, sc in got.hits] == [(d, round(sc, 6)) for d, sc in want]

    def test_not_clause_on_disjunction(self, search_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(search_index)
        q = self._mk(
            (A.Occur.SHOULD, A.TermQuery("return")),
            (A.Occur.SHOULD, A.TermQuery("class")),
            (A.Occur.MUST_NOT, A.FieldValueQuery("lang", "python")),
        )
        got = s.search(q, k=10)
        lang_docs = {r["doc_id"] for r in search_index.docs.filter("lang = 'python'").select("doc_id").collect()}
        assert all(d not in lang_docs for d, _ in got.hits)
        base = {d: sc for d, sc in Searcher(search_index).search(self._mk(
            (A.Occur.SHOULD, A.TermQuery("return")),
            (A.Occur.SHOULD, A.TermQuery("class")),
        ), k=10**6).hits}
        want = sorted(((d, sc) for d, sc in base.items() if d not in lang_docs),
                      key=lambda t: (-t[1], t[0]))[:10]
        assert [(d, round(sc, 6)) for d, sc in got.hits] == [(d, round(sc, 6)) for d, sc in want]

    def test_filter_and_msm(self, search_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = Searcher(search_index)
        q = self._mk(
            (A.Occur.SHOULD, A.TermQuery("return")),
            (A.Occur.SHOULD, A.TermQuery("class")),
            (A.Occur.SHOULD, A.TermQuery("data")),
            (A.Occur.FILTER, A.FieldRangeQuery("lang", "go", "js")),
            msm=2,
        )
        got = s.search(q, k=10)
        # brute: msm>=2 over the three terms + lang range filter
        base3 = Searcher(search_index)
        per_term = {}
        for t in ("return", "class", "data"):
            per_term[t] = dict(base3.search(t, k=10**6).hits)
        import numpy as np
        docs_in = {r["doc_id"] for r in search_index.docs.filter("lang >= 'go' AND lang <= 'js'").select("doc_id").collect()}
        cand = {}
        for d in set().union(*[set(v) for v in per_term.values()]):
            n = sum(1 for t in per_term if d in per_term[t])
            if n >= 2 and d in docs_in:
                cand[d] = float(np.float32(sum(np.float64(per_term[t][d]) for t in per_term if d in per_term[t])))
        want = sorted(cand.items(), key=lambda t: (-t[1], t[0]))[:10]
        assert [(d, round(sc, 5)) for d, sc in got.hits] == [(d, round(sc, 5)) for d, sc in want]
