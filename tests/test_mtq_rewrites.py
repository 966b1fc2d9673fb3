"""MultiTermQuery rewrite methods beyond CONSTANT_SCORE:
SCORING_BOOLEAN (ScoringRewrite.java:40-55) and top-terms
(TopTermsRewrite.java:119-122 — equal-boost expansions keep the
lexicographically smallest). Oracle = explicit SHOULD boolean over the
brute-force expansion set."""

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


def _expansions(corpus_pdf, pred):
    from lucene_spark.analysis import tokenize

    terms = set()
    for t in corpus_pdf["content"]:
        terms.update(x for x in tokenize(t) if pred(x))
    return sorted(terms)


class TestScoringBoolean:
    def test_prefix_scoring_boolean_equals_explicit_bool(self, search_index, corpus_pdf, oracle):
        s = Searcher(search_index)
        terms = _expansions(corpus_pdf, lambda x: x.startswith("re"))
        q = A.PrefixQuery("re", rewrite="scoring_boolean")
        got = s.search(q, k=10).hits
        want = oracle.top_k(
            A.BooleanQuery(tuple((A.Occur.SHOULD, A.TermQuery(t)) for t in terms)), 10
        )
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 2e-4 * max(1.0, abs(b))

    def test_scores_differ_from_constant(self, search_index):
        s = Searcher(search_index)
        const = s.search(A.PrefixQuery("re"), k=5).hits
        scored = s.search(A.PrefixQuery("re", rewrite="scoring_boolean"), k=5).hits
        assert all(sc == 1.0 for _, sc in const)
        assert any(sc != 1.0 for _, sc in scored)

    def test_wildcard_and_regexp_routes(self, search_index, corpus_pdf, oracle):
        s = Searcher(search_index)
        terms = _expansions(corpus_pdf, lambda x: x.endswith("urn"))
        want = oracle.top_k(
            A.BooleanQuery(tuple((A.Occur.SHOULD, A.TermQuery(t)) for t in terms)), 10
        )
        for q in (
            A.WildcardQuery("*urn", rewrite="scoring_boolean"),
            A.RegexpQuery(".*urn", rewrite="scoring_boolean"),
        ):
            got = s.search(q, k=10).hits
            assert [d for d, _ in got] == [d for d, _ in want], q


class TestTopTerms:
    def test_top_terms_keeps_smallest(self, search_index, corpus_pdf, oracle):
        s = Searcher(search_index)
        terms = _expansions(corpus_pdf, lambda x: x.startswith("re"))
        assert len(terms) > 3
        keep = terms[:3]  # equal boosts -> lexicographically smallest
        q = A.PrefixQuery("re", rewrite="top_terms", top_n=3)
        got = s.search(q, k=10).hits
        want = oracle.top_k(
            A.BooleanQuery(tuple((A.Occur.SHOULD, A.TermQuery(t)) for t in keep)), 10
        )
        assert [d for d, _ in got] == [d for d, _ in want]

    def test_unknown_rewrite_raises(self, search_index):
        s = Searcher(search_index)
        with pytest.raises(ValueError, match="rewrite"):
            s.search(A.PrefixQuery("re", rewrite="bogus"), k=5)

    def test_empty_expansion_matches_nothing(self, search_index):
        s = Searcher(search_index)
        td = s.search(A.PrefixQuery("zzzzqq", rewrite="scoring_boolean"), k=5)
        assert td.total_hits == 0
