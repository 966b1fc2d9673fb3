"""XML query parser (queryparser/xml CoreParser): golden parse shapes
mirroring the reference's test XML corpus (BooleanQuery.xml,
TermQuery.xml, RangeQuery.xml, DisjunctionMaxQuery.xml, SpanQuery.xml
shapes) + e2e equivalence against programmatically-built queries."""

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.xmlparser import parse_xml_query


class TestParseShapes:
    def test_term_query(self):
        q = parse_xml_query('<TermQuery fieldName="content">sumitomo</TermQuery>')
        assert q == A.TermQuery("sumitomo")

    def test_term_query_unanalyzed(self):
        # TermQueryBuilder passes text through verbatim (no analyzer)
        q = parse_xml_query('<TermQuery fieldName="content">SuMiTomo</TermQuery>')
        assert q == A.TermQuery("SuMiTomo")

    def test_field_name_required(self):
        with pytest.raises(ValueError, match="fieldName"):
            parse_xml_query("<TermQuery>sumitomo</TermQuery>")

    def test_field_name_inheritance(self):
        # DOMUtils.getAttributeWithInheritance: fieldName flows down
        q = parse_xml_query(
            '<BooleanQuery fieldName="contents">'
            '<Clause occurs="should"><TermQuery>merger</TermQuery></Clause>'
            '<Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>'
            '<Clause occurs="must"><TermQuery>bank</TermQuery></Clause>'
            "</BooleanQuery>"
        )
        assert q == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("merger", field="contents")),
                (A.Occur.MUST_NOT, A.TermQuery("sumitomo", field="contents")),
                (A.Occur.MUST, A.TermQuery("bank", field="contents")),
            )
        )

    def test_boost_and_msm(self):
        q = parse_xml_query(
            '<BooleanQuery fieldName="content" minimumNumberShouldMatch="2" boost="3.0">'
            '<Clause occurs="should"><TermQuery>a</TermQuery></Clause>'
            '<Clause occurs="should"><TermQuery boost="2.0">b</TermQuery></Clause>'
            '<Clause occurs="should"><TermQuery>c</TermQuery></Clause>'
            "</BooleanQuery>"
        )
        assert isinstance(q, A.BoostQuery) and q.boost == 3.0
        assert q.query.minimum_should_match == 2
        assert q.query.clauses[1][1] == A.BoostQuery(A.TermQuery("b"), 2.0)

    def test_filter_occurs(self):
        q = parse_xml_query(
            '<BooleanQuery fieldName="content">'
            '<Clause occurs="must"><TermQuery>a</TermQuery></Clause>'
            '<Clause occurs="filter"><TermQuery>b</TermQuery></Clause>'
            "</BooleanQuery>"
        )
        assert (A.Occur.FILTER, A.TermQuery("b")) in q.clauses

    def test_occurs_case_insensitive(self):
        # BooleanQueryBuilder matches occurs case-insensitively; the
        # reference XML's canonical spelling is camelCase "mustNot"
        q = parse_xml_query(
            '<BooleanQuery fieldName="content">'
            '<Clause occurs="MUST"><TermQuery>a</TermQuery></Clause>'
            '<Clause occurs="mustNot"><TermQuery>b</TermQuery></Clause>'
            "</BooleanQuery>"
        )
        assert (A.Occur.MUST, A.TermQuery("a")) in q.clauses
        assert (A.Occur.MUST_NOT, A.TermQuery("b")) in q.clauses

    def test_terms_query_uses_analyzer(self):
        # TermsQuery must tokenize with the SAME chain the rest of the
        # parse uses — porter-stemmed here, like UserQuery would
        q = parse_xml_query(
            '<TermsQuery fieldName="content">running quickly</TermsQuery>',
            analyzer="porter",
        )
        terms = {c[1].term for c in q.clauses}
        assert terms == {"run", "quickli"}

    def test_terms_query_analyzes(self):
        q = parse_xml_query(
            '<TermsQuery fieldName="content" minimumNumberShouldMatch="2">'
            "Table, Merge &amp; Hash</TermsQuery>"
        )
        assert q == A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("table")),
                (A.Occur.SHOULD, A.TermQuery("merge")),
                (A.Occur.SHOULD, A.TermQuery("hash")),
            ),
            2,
        )

    def test_range_query(self):
        q = parse_xml_query(
            '<RangeQuery fieldName="date" lowerTerm="19870409" upperTerm="19870412"/>'
        )
        assert q == A.TermRangeQuery("19870409", "19870412", field="date")
        q2 = parse_xml_query(
            '<RangeQuery fieldName="date" lowerTerm="a" upperTerm="b" includeUpper="false"/>'
        )
        assert q2.include_upper is False

    def test_point_range_query(self):
        q = parse_xml_query(
            '<PointRangeQuery fieldName="n_chars" type="long" lowerTerm="100" upperTerm="300"/>'
        )
        assert q == A.FieldRangeQuery("n_chars", 100, 300)
        qd = parse_xml_query(
            '<PointRangeQuery fieldName="x" type="double" lowerTerm="0.5" upperTerm="1.5"/>'
        )
        assert qd.lower == 0.5 and qd.upper == 1.5

    def test_dismax_nested_singleton_rewrites(self):
        # DisjunctionMaxQuery.rewrite: a 1-clause dismax becomes its clause
        q = parse_xml_query(
            '<DisjunctionMaxQuery fieldName="content">'
            "<TermQuery>merger</TermQuery>"
            '<DisjunctionMaxQuery tieBreaker="0.3"><TermQuery>verger</TermQuery></DisjunctionMaxQuery>'
            "</DisjunctionMaxQuery>"
        )
        assert q == A.DisjunctionMaxQuery(
            (A.TermQuery("merger"), A.TermQuery("verger")), tie_breaker=0.0
        )

    def test_match_all_and_constant_score(self):
        assert parse_xml_query("<MatchAllDocsQuery/>") == A.MatchAllDocsQuery()
        q = parse_xml_query(
            '<ConstantScoreQuery boost="1.5">'
            '<RangeQuery fieldName="content" lowerTerm="aa" upperTerm="ab"/>'
            "</ConstantScoreQuery>"
        )
        assert isinstance(q, A.BoostQuery) and isinstance(q.query, A.ConstantScoreQuery)

    def test_user_query(self):
        q = parse_xml_query('<UserQuery>"table merge" AND hash</UserQuery>')
        assert q == A.BooleanQuery(
            (
                (A.Occur.MUST, A.PhraseQuery(("table", "merge"))),
                (A.Occur.MUST, A.TermQuery("hash")),
            )
        )

    def test_span_near_matches_ast(self):
        q = parse_xml_query(
            '<SpanNear fieldName="content" slop="4" inOrder="true">'
            "<SpanTerm>table</SpanTerm><SpanTerm>hash</SpanTerm></SpanNear>"
        )
        from lucene_spark.search.spans import span_near, span_query

        assert q == span_query(span_near(["table", "hash"], slop=4, in_order=True))

    def test_span_not_include_exclude(self):
        q = parse_xml_query(
            '<SpanNot fieldName="content">'
            '<Include><SpanNear slop="2" inOrder="false">'
            "<SpanTerm>table</SpanTerm><SpanTerm>hash</SpanTerm></SpanNear></Include>"
            "<Exclude><SpanTerm>merge</SpanTerm></Exclude></SpanNot>"
        )
        from lucene_spark.search.spans import span_near, span_not, span_query

        assert q == span_query(
            span_not(span_near(["table", "hash"], slop=2, in_order=False), "merge")
        )

    def test_errors(self):
        for bad in (
            '<FooQuery fieldName="x">y</FooQuery>',
            '<BooleanQuery fieldName="x"><Clause occurs="perhaps"><TermQuery>y</TermQuery></Clause></BooleanQuery>',
            '<SpanNear fieldName="x"><SpanTerm>a</SpanTerm></SpanNear>',
            '<BoostingTermQuery fieldName="x">y</BoostingTermQuery>',
            '<PointRangeQuery fieldName="x" type="decimal" lowerTerm="1"/>',
        ):
            with pytest.raises(ValueError):
                parse_xml_query(bad)


class TestE2E:
    def test_xml_equals_programmatic(self, search_index):
        s = Searcher(search_index)
        xml = (
            '<BooleanQuery fieldName="content">'
            '<Clause occurs="must"><TermQuery>return</TermQuery></Clause>'
            '<Clause occurs="should"><TermQuery boost="2.0">int</TermQuery></Clause>'
            '<Clause occurs="mustnot"><TermQuery>java</TermQuery></Clause>'
            "</BooleanQuery>"
        )
        ast_q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.SHOULD, A.BoostQuery(A.TermQuery("int"), 2.0)),
                (A.Occur.MUST_NOT, A.TermQuery("java")),
            )
        )
        assert s.search(parse_xml_query(xml), k=10).hits == s.search(ast_q, k=10).hits

    def test_xml_spannear_e2e(self, search_index):
        s = Searcher(search_index)
        xml = (
            '<SpanNear fieldName="content" slop="3" inOrder="true">'
            "<SpanTerm>return</SpanTerm><SpanTerm>if</SpanTerm></SpanNear>"
        )
        got = s.search(parse_xml_query(xml), k=10).hits
        want = s.search(A.SpanNearQuery(("return", "if"), slop=3, in_order=True), k=10).hits
        assert [d for d, _ in got] == [d for d, _ in want]
