"""ComplexPhraseQueryParser subset: slots with wildcards / fuzzy /
alternative groups rewrite to or-slot span-near interval trees.

Reference: lucene/queryparser/.../complexPhrase/
ComplexPhraseQueryParser.java (:47-60 two-pass javadoc, rewrite
:259-340, :336 SpanNearQuery(clauses, slop, inOrder)).
"""

from __future__ import annotations

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.complexphrase import parse_complex_phrase
from lucene_spark.search.intervals import IMaxGaps, IOr, IOrdered, ITerm, IUnordered


class TestParse:
    def test_plain_terms(self, search_index):
        q = parse_complex_phrase(search_index.index, "return if", slop=0)
        assert isinstance(q, A.IntervalQuery)
        assert q.source == IMaxGaps(0, IOrdered((ITerm("return"), ITerm("if"))))

    def test_group_and_wildcard(self, search_index):
        idx = search_index.index
        q = parse_complex_phrase(idx, "(return import) el*", slop=2, in_order=False)
        src = q.source
        assert isinstance(src, IMaxGaps) and src.gaps == 2
        assert isinstance(src.source, IUnordered)
        s1, s2 = src.source.sources
        assert s1 == IOr((ITerm("return"), ITerm("import")))
        want = {ITerm(t) for t in idx.expand_terms("regexp", "el.*")}
        got = set(s2.sources) if isinstance(s2, IOr) else {s2}
        assert got == want and want

    def test_fuzzy_slot(self, search_index):
        idx = search_index.index
        q = parse_complex_phrase(idx, "return clas~1")
        s2 = q.source.source.sources[1]
        want = set(idx.expand_terms("fuzzy", ("clas", 1, 0)))
        got = {t.term for t in (s2.sources if isinstance(s2, IOr) else (s2,))}
        assert got == want and "class" in got

    def test_empty_slot_matches_nothing(self, search_index):
        q = parse_complex_phrase(search_index.index, "return zzznope*")
        assert isinstance(q, A.MatchNoDocsQuery)

    def test_single_slot(self, search_index):
        q = parse_complex_phrase(search_index.index, "ret*")
        assert isinstance(q.source, (IOr, ITerm))


class TestEngine:
    def test_equals_hand_built_span(self, search_index):
        """The parsed tree must score identically to the hand-built
        or-slot span-near (construction equivalence) and behave like
        the phrase's expansion semantics end-to-end."""
        idx = search_index.index
        q = parse_complex_phrase(idx, "(return import) el*", slop=3)
        want_src = IMaxGaps(
            3,
            IOrdered(
                (
                    IOr((ITerm("return"), ITerm("import"))),
                    IOr(tuple(ITerm(t) for t in idx.expand_terms("regexp", "el.*"))),
                )
            ),
        )
        got = search_index.search(q, k=10**6)
        # the parser emits span-convention scoring (ComplexPhrase
        # rewrites to SpanNearQuery in the reference)
        want = search_index.search(A.IntervalQuery(want_src, score_mode="span"), k=10**6)
        assert got.hits == want.hits and got.hits

    def test_matches_are_real_adjacencies(self, search_index, corpus_pdf):
        """slop=0 ordered: every hit has an expansion-term pair adjacent
        in order (brute token scan)."""
        from lucene_spark.analysis.tokenizer import tokenize

        idx = search_index.index
        q = parse_complex_phrase(idx, "(return int) if")
        got = {d for d, _ in search_index.search(q, k=10**6).hits}
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        want = set()
        for i in range(len(ordered)):
            toks = tokenize(ordered.loc[i, "content"])
            for j in range(len(toks) - 1):
                if toks[j] in ("return", "int") and toks[j + 1] == "if":
                    want.add(i)
                    break
        assert got == want and got

    def test_unordered_superset(self, search_index):
        idx = search_index.index
        o = {d for d, _ in search_index.search(parse_complex_phrase(idx, "return the", slop=2), k=10**6).hits}
        u = {
            d
            for d, _ in search_index.search(
                parse_complex_phrase(idx, "return the", slop=2, in_order=False), k=10**6
            ).hits
        }
        assert o <= u


@pytest.fixture(scope="module")
def search_index(spark, corpus_pdf, tmp_path_factory):
    import shutil

    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.search.engine import Searcher

    pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    d = str(tmp_path_factory.mktemp("cpx"))
    IndexBuilder(
        spark, IndexConfig(docs_per_chunk=128, term_buckets=4, positions=True)
    ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
    yield Searcher(SearchIndex(spark, d))
    shutil.rmtree(d, ignore_errors=True)
