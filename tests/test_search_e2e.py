"""End-to-end rank identity: the engine's top-k (docIDs AND float32
scores) must equal the brute-force oracle exactly — Lucene's CheckHits
strategy (SURVEY §5) — across query shapes, k values, execution modes,
and pruning on/off. Plus algebraic equivalence laws
(SearchEquivalenceTestBase role)."""

import numpy as np
import pytest

from lucene_spark.fixtures import make_queries
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.parser import parse_query


@pytest.fixture(scope="module")
def searcher(search_index):
    # low threshold so pruning engages on the 200-doc fixture
    return Searcher(search_index, total_hits_threshold=10)


@pytest.fixture(scope="module")
def query_set(corpus_pdf):
    return make_queries(corpus_pdf, n_per_band=2)


def assert_rank_identical(engine_hits, oracle_hits, msg=""):
    assert len(engine_hits) == len(oracle_hits), f"{msg}: sizes {len(engine_hits)} vs {len(oracle_hits)}"
    for i, ((ed, es), (od, os_)) in enumerate(zip(engine_hits, oracle_hits)):
        assert ed == od, f"{msg}: rank {i} doc {ed} != {od}"
        assert np.float32(es) == np.float32(os_), f"{msg}: rank {i} score {es} != {os_}"


class TestRankIdentity:
    def test_fixture_query_set(self, searcher, oracle, query_set):
        for q in query_set:
            ast = parse_query(q["query"])
            got = searcher.search(ast, k=q["k"]).hits
            want = oracle.top_k(ast, q["k"])
            assert_rank_identical(got, want, f"q={q['query']!r} k={q['k']}")

    @pytest.mark.parametrize("k", [1, 10, 100])
    def test_single_terms_all_k(self, searcher, oracle, k):
        for term in ["return", "int", "if", "self", "nonexistentterm"]:
            got = searcher.search(A.TermQuery(term), k=k).hits
            want = oracle.top_k(A.TermQuery(term), k)
            assert_rank_identical(got, want, f"term={term} k={k}")

    def test_boost_query(self, searcher, oracle):
        q = parse_query("return^2 OR if")
        assert_rank_identical(searcher.search(q, k=20).hits, oracle.top_k(q, 20), "boost")

    def test_must_not(self, searcher, oracle):
        q = parse_query("+return -if")
        assert_rank_identical(searcher.search(q, k=50).hits, oracle.top_k(q, 50), "must_not")

    def test_nested(self, searcher, oracle):
        q = parse_query("(return OR if) AND (int OR class)")
        assert_rank_identical(searcher.search(q, k=30).hits, oracle.top_k(q, 30), "nested")

    def test_synonym(self, searcher, oracle):
        q = A.SynonymQuery(("return", "int"))
        assert_rank_identical(searcher.search(q, k=25).hits, oracle.top_k(q, 25), "synonym")

    def test_dismax(self, searcher, oracle):
        q = A.DisjunctionMaxQuery((A.TermQuery("return"), A.TermQuery("if")), tie_breaker=0.3)
        assert_rank_identical(searcher.search(q, k=25).hits, oracle.top_k(q, 25), "dismax")

    def test_match_all(self, searcher, oracle):
        q = A.MatchAllDocsQuery()
        assert_rank_identical(searcher.search(q, k=15).hits, oracle.top_k(q, 15), "matchall")

    def test_match_all_minus_term(self, searcher, oracle):
        q = A.BooleanQuery(((A.Occur.MUST, A.MatchAllDocsQuery()), (A.Occur.MUST_NOT, A.TermQuery("return"))))
        assert_rank_identical(searcher.search(q, k=15).hits, oracle.top_k(q, 15), "all-minus")

    def test_filter_clause(self, searcher, oracle):
        q = A.BooleanQuery(((A.Occur.SHOULD, A.TermQuery("return")), (A.Occur.FILTER, A.TermQuery("if"))))
        assert_rank_identical(searcher.search(q, k=20).hits, oracle.top_k(q, 20), "filter")

    def test_minimum_should_match(self, searcher, oracle):
        q = A.BooleanQuery(
            (
                (A.Occur.SHOULD, A.TermQuery("return")),
                (A.Occur.SHOULD, A.TermQuery("if")),
                (A.Occur.SHOULD, A.TermQuery("int")),
            ),
            minimum_should_match=2,
        )
        assert_rank_identical(searcher.search(q, k=30).hits, oracle.top_k(q, 30), "msm")


class TestMultiTerm:
    def test_prefix(self, searcher, oracle):
        q = A.PrefixQuery("re")
        assert_rank_identical(searcher.search(q, k=300).hits, oracle.top_k(q, 300), "prefix")

    def test_wildcard(self, searcher, oracle):
        q = A.WildcardQuery("r?turn")
        assert_rank_identical(searcher.search(q, k=300).hits, oracle.top_k(q, 300), "wildcard")

    def test_regexp(self, searcher, oracle):
        q = A.RegexpQuery("ret.*|int")
        assert_rank_identical(searcher.search(q, k=300).hits, oracle.top_k(q, 300), "regexp")

    def test_fuzzy(self, searcher, oracle):
        q = A.FuzzyQuery("retur", max_edits=2)
        assert_rank_identical(searcher.search(q, k=300).hits, oracle.top_k(q, 300), "fuzzy")

    def test_term_in_set(self, searcher, oracle):
        q = A.TermInSetQuery(("return", "if", "zzznope"))
        assert_rank_identical(searcher.search(q, k=300).hits, oracle.top_k(q, 300), "tis")

    def test_prefix_scored_in_boolean(self, searcher, oracle):
        q = A.BooleanQuery(((A.Occur.MUST, A.TermQuery("return")), (A.Occur.MUST, A.PrefixQuery("cl"))))
        assert_rank_identical(searcher.search(q, k=50).hits, oracle.top_k(q, 50), "bool+prefix")


class TestWand:
    """WAND ≡ exhaustive (TestWANDScorer role), and pruning must engage."""

    @pytest.mark.parametrize("k", [1, 3, 10, 50, 150])
    def test_wand_equals_exhaustive(self, searcher, search_index, oracle, k):
        from lucene_spark.search.engine import Searcher as S

        q = parse_query("return OR if OR class OR import")
        wand_hits = searcher.search(q, k=k).hits  # disjunction → WAND path
        spec_q, spec, stats, _ = searcher.prepare(q)
        exh = searcher._search_exhaustive(spec, k, stats.cache())
        assert_rank_identical(wand_hits, exh.hits, f"wand-vs-exhaustive k={k}")
        assert_rank_identical(wand_hits, oracle.top_k(q, k), f"wand-vs-oracle k={k}")

    def test_tie_heavy_trimmed_wand_equals_exhaustive(self, spark, tmp_path_factory):
        """Exact-score ties across doc ids (duplicated docs) + heap
        trims + low threshold: WAND must keep the exhaustive doc-asc
        tie-break (prune strictly BELOW kth — interval order is not
        doc order, so nextUp pruning could drop an equal-scoring
        smaller id) and hits_seen must never double-count docs
        re-pulled after a trim."""
        import shutil

        import pandas as pd

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search.engine import Searcher as S

        texts = [
            "alpha beta gamma delta",
            "alpha epsilon zeta eta",
            "beta theta iota kappa",
            "alpha beta lam mu",
        ]
        rows = []
        for i in range(600):
            rows.append((i, "r", f"p{i}", "c", "en", texts[i % 4]))
        pdf = pd.DataFrame(rows, columns=["doc_id", "repo", "path", "commit", "lang", "content"])
        d = str(tmp_path_factory.mktemp("wandtie"))
        IndexBuilder(
            spark, IndexConfig(docs_per_chunk=128, term_buckets=2, positions=False)
        ).build(spark.createDataFrame(pdf), d, assign_ids=False)
        s = S(SearchIndex(spark, d), total_hits_threshold=10)
        q = A.BooleanQuery(
            ((A.Occur.SHOULD, A.TermQuery("alpha")), (A.Occur.SHOULD, A.TermQuery("beta")))
        )
        for k in (1, 5, 17, 40):
            td = s.search(q, k=k)
            _, spec, stats, _ = s.prepare(q)
            exh = s._search_exhaustive(spec, k, stats.cache())
            assert td.hits == exh.hits, f"k={k}"
            if td.relation == "EQUAL_TO":
                assert td.total_hits == exh.total_hits, f"k={k}"
            else:
                assert td.total_hits <= exh.total_hits, f"k={k}"
        shutil.rmtree(d, ignore_errors=True)

    def test_pruning_engages(self, searcher):
        td = searcher.search(parse_query("return OR if"), k=3)
        info = td.info
        assert info.get("decoded_blocks") is not None
        # with threshold=10 and a 200-doc corpus, some block should be pruned
        assert info["decoded_blocks"] <= info["total_blocks"]

    def test_high_threshold_no_relation_change(self, search_index, oracle):
        s = Searcher(search_index, total_hits_threshold=10**9)
        q = parse_query("return OR if")
        td = s.search(q, k=5)
        assert td.relation == "EQUAL_TO"
        assert_rank_identical(td.hits, oracle.top_k(q, 5), "no-prune")


class TestDistributed:
    """Distributed (chunk-parallel applyInPandas) ≡ driver mode."""

    @pytest.mark.parametrize(
        "query,k",
        [
            ("return", 10),
            ("return AND if", 20),
            ("return OR if OR class", 15),
            ("+return -if", 25),
            ("(return OR if) AND int", 10),
        ],
    )
    def test_distributed_equals_driver(self, searcher, oracle, query, k):
        q = parse_query(query)
        got = searcher.search(q, k=k, mode="distributed").hits
        assert_rank_identical(got, oracle.top_k(q, k), f"distributed {query!r}")


class TestConjunctionKernel:
    """Skip-data conjunction (BlockMaxConjunctionScorer role) ≡ oracle
    and ≡ exhaustive evaluation — the dispatch must not change results."""

    @pytest.mark.parametrize("k", [1, 5, 50, 500])
    def test_and_rank_identity(self, searcher, oracle, k):
        for qs in ["return AND if", "return AND if AND int", "class AND return"]:
            q = parse_query(qs)
            td = searcher.search(q, k=k)
            assert "blocks_decoded" in td.info, f"conjunction kernel not used for {qs!r}"
            assert_rank_identical(td.hits, oracle.top_k(q, k), f"conj {qs!r} k={k}")

    def test_total_hits_exact(self, searcher, oracle):
        q = parse_query("return AND if")
        td = searcher.search(q, k=3)
        assert td.relation == "EQUAL_TO"
        assert td.total_hits == len(oracle.score(A.rewrite(q)))

    def test_skips_blocks_for_asymmetric_terms(self, searcher, oracle):
        # a term pair where the rare side bounds the candidates: the
        # common side must not decode more blocks than it has, and the
        # kernel reports its decode accounting
        td = searcher.search(parse_query("self AND return"), k=10)
        info = td.info
        assert info["hits_seen"] > 0
        assert info["blocks_decoded"] >= 2
        assert info["blocks_skipped"] >= 0

    def test_mixed_shapes_not_dispatched(self, searcher):
        # shapes outside pure-term AND must keep the exhaustive path
        td = searcher.search(parse_query("return AND (if OR int)"), k=10)
        assert "blocks_decoded" not in td.info
        td = searcher.search(parse_query("+return -if"), k=10)
        assert "blocks_decoded" not in td.info


class TestFieldQueries:
    """Keyword-field (StringField) scoping: `lang:x` = column-equality
    doc set; FILTER occur keeps content-only BM25 scores rank-identical."""

    @pytest.fixture(scope="class")
    def lang_of(self, corpus_pdf):
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        return {i: ordered.loc[i, "lang"] for i in range(len(ordered))}

    def test_filter_rank_identity(self, searcher, oracle, lang_of):
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.FieldValueQuery("lang", "java")),
            )
        )
        got = searcher.search(q, k=20).hits
        scores = oracle.score(A.TermQuery("return"))
        want = sorted(
            ((d, float(s)) for d, s in scores.items() if lang_of[d] == "java"),
            key=lambda t: (-np.float32(t[1]), t[0]),
        )[:20]
        assert_rank_identical(got, want, "lang-filtered")

    def test_parsed_field_and(self, searcher, oracle, lang_of):
        got = {d for d, _ in searcher.search(parse_query("lang:go AND return"), k=10**6).hits}
        want = {d for d in oracle.score(A.TermQuery("return")) if lang_of[d] == "go"}
        assert got == want

    def test_pure_field_query(self, searcher, lang_of):
        got = {d for d, _ in searcher.search(parse_query("lang:c"), k=10**6).hits}
        want = {d for d, lg in lang_of.items() if lg == "c"}
        assert got == want

    def test_field_no_match(self, searcher):
        assert searcher.search(parse_query("lang:klingon"), k=10).hits == []

    def test_distributed_field_filter(self, searcher, oracle, lang_of):
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.FieldValueQuery("lang", "python")),
            )
        )
        got = searcher.search(q, k=15, mode="distributed").hits
        scores = oracle.score(A.TermQuery("return"))
        want = sorted(
            ((d, float(s)) for d, s in scores.items() if lang_of[d] == "python"),
            key=lambda t: (-np.float32(t[1]), t[0]),
        )[:15]
        assert_rank_identical(got, want, "distributed lang-filtered")

    def test_parsed_range_equals_ast(self, searcher):
        a = searcher.search(parse_query("[scan TO table]"), k=10**6).hits
        b = searcher.search(A.TermRangeQuery("scan", "table"), k=10**6).hits
        assert a == b

    def test_field_in_set(self, searcher, lang_of):
        """DocValuesTermsQuery role: set membership == union of the
        per-value equality queries, as a FILTER keeps scores."""
        q = A.FieldInSetQuery("lang", ("go", "c"))
        got = {d for d, _ in searcher.search(q, k=10**6).hits}
        want = {d for d, lg in lang_of.items() if lg in ("go", "c")}
        assert got == want and want
        filt = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, q),
            )
        )
        base = dict(searcher.search(A.TermQuery("return"), k=10**6).hits)
        for d, s in searcher.search(filt, k=10**6).hits:
            assert lang_of[d] in ("go", "c") and s == base[d]
        # distributed twin
        gd = {d for d, _ in searcher.search(q, k=10**6, mode="distributed").hits}
        assert gd == want


class TestEquivalences:
    def test_commutativity(self, searcher):
        a = searcher.search(parse_query("return AND if"), k=20).hits
        b = searcher.search(parse_query("if AND return"), k=20).hits
        assert a == b

    def test_or_superset_of_and(self, searcher):
        and_hits = {d for d, _ in searcher.search(parse_query("return AND if"), k=500).hits}
        or_hits = {d for d, _ in searcher.search(parse_query("return OR if"), k=500).hits}
        assert and_hits <= or_hits

    def test_count_matches_topk(self, searcher, oracle):
        q = parse_query("return OR if")
        assert searcher.count(q) == len(oracle.score(A.rewrite(q)))

    def test_total_hits(self, searcher, oracle):
        q = parse_query("return AND if")
        td = searcher.search(q, k=5)
        true_count = len(oracle.score(A.rewrite(q)))
        if td.relation == "EQUAL_TO":
            assert td.total_hits == true_count
        else:
            assert td.total_hits <= true_count
