"""Index-time synonyms: SynonymGraphFilter + FlattenGraphFilter for
single-token rules (analysis/common/.../synonym/SynonymGraphFilter.java
:221-280, SynonymMap.java:143-215 expand=true/keepOrig=true,
core/.../core/FlattenGraphFilter.java:51): each occurrence of a set
member additionally indexes every other member stacked at posInc 0, so
querying ANY member matches documents containing any of them — no
query-side rewrite needed, unlike the query-time SynonymQuery path
(tests/test_synonyms.py)."""

import shutil

import pytest

from lucene_spark.analysis.shingles import build_synonym_map, synonym_stream
from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.codec.smallfloat import int_to_byte4
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.testing.oracle import OracleIndex

SETS = (("return", "retour"), ("if", "unless"))


class TestStream:
    def test_basic_stacking(self):
        m = build_synonym_map([("quick", "fast")])
        t, p, o = synonym_stream(["the", "quick", "fox"], [0, 1, 2], m)
        assert t == ["the", "quick", "fast", "fox"]
        assert p == [0, 1, 1, 2]
        assert o == [False, False, True, False]

    def test_expand_is_symmetric(self):
        m = build_synonym_map([("a", "b", "c")])
        assert m == {"a": ("b", "c"), "b": ("a", "c"), "c": ("a", "b")}

    def test_multi_set_union_and_lowercase(self):
        m = build_synonym_map([("Fast", "quick"), ("fast", "rapid")])
        assert set(m["fast"]) == {"quick", "rapid"}
        assert m["quick"] == ("fast",) and m["rapid"] == ("fast",)

    def test_offsets_copy_source(self):
        m = build_synonym_map([("quick", "fast")])
        t, p, o, s, e = synonym_stream(["quick"], [0], m, [3], [8])
        assert t == ["quick", "fast"]
        assert s == [3, 3] and e == [8, 8]

    def test_rejects_singleton_set(self):
        with pytest.raises(ValueError, match=">= 2 distinct"):
            build_synonym_map([("only", "ONLY")])

    def test_position_holes_preserved(self):
        m = build_synonym_map([("quick", "fast")])
        _t, p, _o = synonym_stream(["quick", "fox"], [0, 3], m)
        assert p == [0, 0, 3]


@pytest.fixture(scope="module")
def syn_index(tmp_path_factory, spark, corpus_df):
    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    d = str(tmp_path_factory.mktemp("syn_index"))
    cfg = IndexConfig(docs_per_chunk=64, term_buckets=4, positions=True, synonyms=SETS)
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256"), d)
    ix = SearchIndex(spark, d)
    yield ix
    shutil.rmtree(d, ignore_errors=True)


def _ordered(corpus_pdf):
    return corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)


def _stacked_oracle(corpus_pdf) -> OracleIndex:
    """OracleIndex over the synonym-stacked streams with Lucene's
    statistics split: sum_ttf counts stacked postings (OracleIndex
    derives it from the stacked lengths), norms discount them
    (patched to the surface token count — discountOverlaps)."""
    m = build_synonym_map(SETS)
    toks, poss, surface = {}, {}, {}
    for i, text in enumerate(_ordered(corpus_pdf)["content"]):
        base = tokenize(text)
        t, p, _o = synonym_stream(base, list(range(len(base))), m)
        toks[i], poss[i], surface[i] = t, p, len(base)
    oix = OracleIndex(toks, poss)
    for d, n in surface.items():
        oix.dl[d] = n
        oix.norm[d] = int_to_byte4(n)
    return oix


class TestEngine:
    def test_statistics_split(self, syn_index, corpus_pdf):
        m = build_synonym_map(SETS)
        want_sum = 0
        for text in _ordered(corpus_pdf)["content"]:
            base = tokenize(text)
            t, _p, _o = synonym_stream(base, list(range(len(base))), m)
            want_sum += len(t)
        assert syn_index.stats.sum_total_term_freq == want_sum
        assert syn_index.stats.doc_count == len(corpus_pdf)

    def test_norms_discount_stacked(self, syn_index, corpus_pdf):
        got = {r["doc_id"]: r["norm"] for r in syn_index.norms.collect()}
        for i, text in enumerate(_ordered(corpus_pdf)["content"]):
            assert got[i] == int_to_byte4(len(tokenize(text)))

    def test_alias_term_scores_exact(self, syn_index, corpus_pdf):
        # 'retour' never appears in the fixture surface text — every hit
        # and every float32 score comes from the stacked copies
        s = Searcher(syn_index)
        oix = _stacked_oracle(corpus_pdf)
        for term in ("retour", "return", "unless"):
            got = s.search(A.TermQuery(term), k=10**6).hits
            want = oix.top_k(A.TermQuery(term), k=10**6)
            assert got == want, term

    def test_set_members_share_postings(self, syn_index):
        s = Searcher(syn_index)
        a = s.search(A.TermQuery("return"), k=10**6).hits
        b = s.search(A.TermQuery("retour"), k=10**6).hits
        assert a == b

    def test_phrase_across_synonym(self, syn_index, corpus_pdf):
        # '"retour if"' must match surface '(return) (if)' adjacencies
        s = Searcher(syn_index)
        got = {d for d, _ in s.search(A.PhraseQuery(("retour", "if")), k=10**6).hits}
        want = set()
        for i, text in enumerate(_ordered(corpus_pdf)["content"]):
            toks = tokenize(text)
            if any(a == "return" and b == "if" for a, b in zip(toks, toks[1:])):
                want.add(i)
        assert got == want
        # exact f32 phrase scores vs the stacked brute
        oix = _stacked_oracle(corpus_pdf)
        assert (
            s.search(A.PhraseQuery(("retour", "if")), k=10).hits
            == oix.top_k(A.PhraseQuery(("retour", "if")), k=10)
        )

    def test_distributed_twin(self, syn_index):
        s = Searcher(syn_index)
        drv = s.search(A.TermQuery("retour"), k=10).hits
        dist = s.search(A.TermQuery("retour"), k=10, mode="distributed").hits
        assert drv == dist

    def test_manifest_records_sets(self, syn_index):
        assert syn_index.manifest["synonyms"] == [list(g) for g in SETS]

    def test_mutually_exclusive_with_other_stages(self):
        from lucene_spark.index.builder import IndexConfig, _stacker_of

        with pytest.raises(ValueError, match="mutually exclusive"):
            _stacker_of(IndexConfig(synonyms=(("a", "b"),), stem_repeat=True))
