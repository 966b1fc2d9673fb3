"""Multi-field text indexing (the FieldInfos union role,
lucene/core/src/java/org/apache/lucene/index/FieldInfos.java): each
extra tokenized field gets its own postings key space
(field + \\x1f + term), its own norms and its own collection stats, so
BM25 scores with per-field df / avgdl / docCount exactly like
per-field Lucene (IndexSearcher.collectionStatistics per field)."""

import shutil

import numpy as np
import pytest

import lucene_spark.search.ast as A
from lucene_spark.search.engine import Searcher


@pytest.fixture(scope="module")
def mf_index(tmp_path_factory, spark, corpus_df):
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    d = str(tmp_path_factory.mktemp("mf_index"))
    cfg = IndexConfig(docs_per_chunk=64, term_buckets=4, extra_fields=("path",), positions=True)
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256"), d)
    ix = SearchIndex(spark, d)
    yield ix
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def path_oracle(corpus_pdf):
    """OracleIndex over the PATH strings with the engine's doc_id
    assignment — independent per-field BM25 reference."""
    from lucene_spark.testing.oracle import OracleIndex

    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return OracleIndex.from_texts({i: ordered.loc[i, "path"] for i in range(len(ordered))})


@pytest.fixture(scope="module")
def content_oracle(corpus_pdf):
    from lucene_spark.testing.oracle import OracleIndex

    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    return OracleIndex.from_texts({i: ordered.loc[i, "content"] for i in range(len(ordered))})


def _close(hits, expect, tol=2e-4):
    assert [d for d, _ in hits] == [d for d, _ in expect]
    for (_, a), (_, b) in zip(hits, expect):
        assert abs(a - b) <= tol * max(1.0, abs(b))


class TestMultiField:
    def test_per_field_stats(self, mf_index):
        assert mf_index.text_fields == ("content", "path")
        st_c, st_p = mf_index.stats, mf_index.stats_for("path")
        assert st_c.doc_count == 200
        # path fields are short — per-field avgdl must differ wildly
        assert st_p.sum_total_term_freq < st_c.sum_total_term_freq / 5

    def test_term_query_extra_field_matches_oracle(self, mf_index, path_oracle):
        s = Searcher(mf_index)
        for t in ("src", "py", "java"):
            hits = s.search(A.TermQuery(t, field="path"), k=10).hits
            _close(hits, path_oracle.top_k(A.TermQuery(t), 10))

    def test_primary_field_unaffected(self, mf_index, content_oracle, search_index):
        """Primary-field scores identical to the single-field index —
        extra fields must not perturb primary stats/norms."""
        s_mf, s_sf = Searcher(mf_index), Searcher(search_index)
        for q in ("return", "int if", '"return int"'):
            assert s_mf.search(q, k=10).hits == s_sf.search(q, k=10).hits

    def test_cross_field_boolean(self, mf_index, path_oracle, content_oracle):
        """content:return AND path:py — per-field BM25 contributions sum."""
        s = Searcher(mf_index)
        q = A.BooleanQuery(
            ((A.Occur.MUST, A.TermQuery("return")), (A.Occur.MUST, A.TermQuery("py", field="path"))), 0
        )
        hits = s.search(q, k=10).hits
        sc_c = content_oracle.score(A.TermQuery("return"))
        sc_p = path_oracle.score(A.TermQuery("py"))
        both = {d: float(np.float32(sc_c[d]) + np.float32(sc_p[d])) for d in sc_c if d in sc_p}
        expect = sorted(both.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        _close(hits, expect)

    def test_wand_path_field_disjunction(self, mf_index, path_oracle):
        """Pure term disjunction on the extra field rides the WAND path
        with the FIELD's norm cache — must equal exhaustive oracle."""
        s = Searcher(mf_index)
        q = A.BooleanQuery(
            ((A.Occur.SHOULD, A.TermQuery("py", field="path")),
             (A.Occur.SHOULD, A.TermQuery("go", field="path"))), 0
        )
        oq = A.BooleanQuery(((A.Occur.SHOULD, A.TermQuery("py")), (A.Occur.SHOULD, A.TermQuery("go"))), 0)
        _close(s.search(q, k=10).hits, path_oracle.top_k(oq, 10))

    def test_distributed_equals_driver(self, mf_index):
        s = Searcher(mf_index)
        q = A.BooleanQuery(
            ((A.Occur.SHOULD, A.TermQuery("return")), (A.Occur.SHOULD, A.TermQuery("py", field="path"))), 0
        )
        drv = s.search(q, k=10).hits
        dist = s.search(q, k=10, mode="distributed").hits
        assert [d for d, _ in drv] == [d for d, _ in dist]
        for (_, a), (_, b) in zip(drv, dist):
            assert abs(a - b) <= 1e-6

    def test_parser_field_value_analyzed(self, mf_index, path_oracle):
        """`path:src` through the PARSER: FieldValueQuery on a tokenized
        field gets analyzed term semantics (reference QueryParser on a
        TextField)."""
        s = Searcher(mf_index)
        _close(s.search("path:src", k=10).hits, path_oracle.top_k(A.TermQuery("src"), 10))

    def test_phrase_on_extra_field(self, mf_index, path_oracle):
        s = Searcher(mf_index)
        q = A.PhraseQuery(("src", "can"), field="path")
        _close(s.search(q, k=10).hits, path_oracle.top_k(A.PhraseQuery(("src", "can")), 10))

    def test_prefix_expansion_scoped_to_field(self, mf_index, path_oracle):
        """PrefixQuery on the extra field expands ONLY within that
        field's key space (startswith on the composite prefix)."""
        s = Searcher(mf_index)
        hits = s.search(A.PrefixQuery("ja", field="path"), k=200).hits
        expect = path_oracle.top_k(A.PrefixQuery("ja"), 200)
        assert {d for d, _ in hits} == {d for d, _ in expect}

    def test_primary_expansion_excludes_composite_keys(self, mf_index, corpus_pdf):
        """A PRIMARY-field multi-term expansion must not leak other
        fields' composite keys: 'java' lives only in path terms, so a
        content wildcard '*ava' matches nothing — before the key-space
        filter it matched 'path<SEP>java' and returned path hits."""
        from lucene_spark.index.builder import FIELD_SEP

        for kind, arg in [("regexp", ".*ava"), ("prefix", "j"), ("range", ("pata", "pati", True, True))]:
            terms = mf_index.expand_terms(kind, arg)
            assert all(FIELD_SEP not in t for t in terms), (kind, terms)
        # 'java' lives in every .java path term; the content wildcard
        # must return exactly the docs whose CONTENT has an *ava term
        import re

        from lucene_spark.analysis import tokenize as _tok

        s = Searcher(mf_index)
        got = {d for d, _ in s.search(A.WildcardQuery("*ava"), k=10**6).hits}
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        pat = re.compile(r".*ava$")
        want = {
            i
            for i in range(len(ordered))
            if any(pat.fullmatch(x) for x in _tok(ordered.loc[i, "content"]))
        }
        assert got == want

    def test_count_and_explain(self, mf_index, path_oracle):
        s = Searcher(mf_index)
        n_py = len(path_oracle.score(A.TermQuery("py")))
        assert s.count(A.TermQuery("py", field="path")) == n_py
        doc = s.search(A.TermQuery("py", field="path"), k=1).hits[0][0]
        e = s.explain(A.TermQuery("py", field="path"), doc)
        assert e["match"] and e["value"] > 0

    def test_keyword_fields_still_keyword(self, mf_index):
        """lang is NOT a tokenized field — `lang:python` stays a
        StringField equality docset filter."""
        s = Searcher(mf_index)
        td = s.search("lang:python AND return", k=5)
        assert len(td.hits) > 0


class TestMultiFieldQueryParser:
    """MultiFieldQueryParser (lucene/queryparser/classic/
    MultiFieldQueryParser.java:43-121): every clause the user did not
    field-qualify expands into a SHOULD disjunction of per-field
    copies, optionally boosted per field."""

    def test_term_fans_out(self):
        from lucene_spark.search.parser import parse_multifield

        q = parse_multifield("hello", ("content", "path"))
        assert q == A.BooleanQuery(
            ((A.Occur.SHOULD, A.TermQuery("hello")), (A.Occur.SHOULD, A.TermQuery("hello", field="path")))
        )

    def test_single_field_is_identity(self):
        from lucene_spark.search.parser import parse_multifield, parse_query

        assert parse_multifield("hello world", ("content",)) == parse_query("hello world")

    def test_boost_wraps(self):
        from lucene_spark.search.parser import parse_multifield

        q = parse_multifield("hello", ("content", "path"), boosts={"path": 2.0})
        assert q == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("hello")),
                (A.Occur.SHOULD, A.BoostQuery(A.TermQuery("hello", field="path"), 2.0)),
            )
        )

    def test_field_qualified_clause_not_expanded(self):
        from lucene_spark.search.parser import parse_multifield

        q = parse_multifield("return AND path:py", ("content", "path"))
        assert isinstance(q, A.BooleanQuery)
        (o1, c1), (o2, c2) = q.clauses
        assert o1 is A.Occur.MUST and o2 is A.Occur.MUST
        assert isinstance(c1, A.BooleanQuery)  # the fanned 'return'
        assert c2 == A.FieldValueQuery("path", "py")  # untouched

    def test_phrase_and_prefix_fan(self):
        from lucene_spark.search.parser import parse_multifield

        q = parse_multifield('"int return" foo*', ("content", "path"))
        assert isinstance(q, A.BooleanQuery)
        phr, pre = (c for _, c in q.clauses)
        assert phr.clauses[0][1] == A.PhraseQuery(("int", "return"))
        assert phr.clauses[1][1] == A.PhraseQuery(("int", "return"), field="path")
        assert pre.clauses[0][1] == A.PrefixQuery("foo")
        assert pre.clauses[1][1] == A.PrefixQuery("foo", field="path")

    def test_must_not_fans_under_occur(self):
        from lucene_spark.search.parser import parse_multifield

        q = parse_multifield("+return -py", ("content", "path"))
        occ = [o for o, _ in q.clauses]
        assert occ == [A.Occur.MUST, A.Occur.MUST_NOT]
        for _, sub in q.clauses:
            assert isinstance(sub, A.BooleanQuery) and len(sub.clauses) == 2

    def test_e2e_should_sums_per_field_bm25(self, mf_index, content_oracle, path_oracle):
        from lucene_spark.search.parser import parse_multifield

        s = Searcher(mf_index)
        hits = s.search(parse_multifield("return", ("content", "path")), k=10).hits
        sc_c = content_oracle.score(A.TermQuery("return"))
        sc_p = path_oracle.score(A.TermQuery("return"))
        union = {
            d: float(np.float32(sc_c.get(d, 0.0)) + np.float32(sc_p.get(d, 0.0)))
            for d in set(sc_c) | set(sc_p)
        }
        expect = sorted(union.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        _close(hits, expect)

    def test_e2e_boost_scales_field(self, mf_index, content_oracle, path_oracle):
        from lucene_spark.search.parser import parse_multifield

        s = Searcher(mf_index)
        q = parse_multifield("py", ("content", "path"), boosts={"path": 3.0})
        hits = s.search(q, k=10).hits
        sc_c = content_oracle.score(A.TermQuery("py"))
        sc_p = path_oracle.score(A.TermQuery("py"))
        union = {
            d: float(np.float32(sc_c.get(d, 0.0)) + np.float32(3.0) * np.float32(sc_p.get(d, 0.0)))
            for d in set(sc_c) | set(sc_p)
        }
        expect = sorted(union.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        _close(hits, expect)
