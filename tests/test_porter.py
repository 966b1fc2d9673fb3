"""Porter stemming analyzer (PorterStemFilter role): algorithm unit
tests plus an end-to-end equivalence oracle — an index built with
analyzer="porter" behaves exactly like a standard-analyzer index built
over pre-stemmed text, and query terms are stemmed with the same
chain (QueryBuilder analyzes through the indexing analyzer)."""

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.porter import porter_stem
from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search.engine import Searcher

# (input, full-algorithm output) — from Porter's published description
# worked end-to-end (steps 1a..5b), spot-validated classics included
CASES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"), ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("digitizer", "digit"), ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"), ("formaliti", "formal"),
    ("formative", "form"), ("formalize", "formal"), ("hopeful", "hope"),
    ("goodness", "good"), ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"), ("adoption", "adopt"),
    ("communism", "commun"), ("activate", "activ"), ("effective", "effect"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"), ("roll", "roll"),
    ("controlling", "control"), ("running", "run"), ("runs", "run"),
    ("generalizations", "gener"), ("oscillators", "oscil"), ("tables", "tabl"),
    ("table", "tabl"), ("indexing", "index"), ("indexes", "index"),
]


class TestPorterAlgorithm:
    @pytest.mark.parametrize("word,expected", CASES)
    def test_known_pairs(self, word, expected):
        assert porter_stem(word) == expected

    def test_subset_passthrough(self):
        # non-alpha / short tokens pass through (documented subset)
        for t in ["x86_64", "a", "to", "3rd", "été", "foo_bar"]:
            assert porter_stem(t) == t

    def test_tokenize_stem_chain(self):
        assert tokenize("Running the Tables", stem=True) == ["run", "the", "tabl"]


DOCS = [
    ("r", "a.py", "c1", "en", "running tables quickly indexes"),
    ("r", "b.py", "c2", "en", "the table runs and indexing continues"),
    ("r", "c.py", "c3", "en", "nothing relevant here at all"),
    ("r", "d.py", "c4", "en", "run table index"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="module")
def porter_ix(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("porter"))
    corpus = spark.createDataFrame(DOCS, SCHEMA)
    IndexBuilder(
        spark, IndexConfig(docs_per_chunk=64, term_buckets=2, analyzer="porter")
    ).build(corpus, d)
    ix = SearchIndex(spark, d)
    yield ix, Searcher(ix)
    shutil.rmtree(d, ignore_errors=True)


class TestPorterIndex:
    def test_manifest(self, porter_ix):
        ix, _ = porter_ix
        assert ix.analyzer == "porter"

    def test_inflections_unify(self, porter_ix):
        """'running', 'runs' and 'run' share one postings entry."""
        _, s = porter_ix
        for q in ["running", "runs", "run"]:
            hits = {d for d, _ in s.search(q, k=10).hits}
            assert hits == {0, 1, 3}, q
        assert s.count("tables") == 3
        assert s.count("indexing") == 3

    def test_phrase_with_stems(self, porter_ix):
        _, s = porter_ix
        # "running tables" ≡ stems "run tabl" — matches doc 0 ("running
        # tables") and doc 3 ("run table"), both adjacent
        hits = {d for d, _ in s.search('"running tables"', k=10).hits}
        assert hits == {0, 3}

    def test_scores_equal_prestemmed_standard_index(
        self, tmp_path_factory, spark, porter_ix
    ):
        """analyzer='porter' ≡ standard analyzer over pre-stemmed text:
        same docs AND same BM25 scores (df/dl/norms all identical)."""
        pre = [
            (r, p, c, lang, " ".join(porter_stem(t) for t in tokenize(txt)))
            for r, p, c, lang, txt in DOCS
        ]
        d2 = str(tmp_path_factory.mktemp("prestemmed"))
        IndexBuilder(spark, IndexConfig(docs_per_chunk=64, term_buckets=2)).build(
            spark.createDataFrame(pre, SCHEMA), d2
        )
        s2 = Searcher(SearchIndex(spark, d2))
        _, s1 = porter_ix
        pairs = [  # (porter-index query, equivalent pre-stemmed query)
            ("running", "run"),
            ("runs AND tables", "run AND tabl"),
            ('"run table"', '"run tabl"'),
            ("index OR run", "index OR run"),
            ("*:*", "*:*"),
        ]
        for q, q2 in pairs:
            a = s1.search(q, k=10).hits
            b = s2.search(q2, k=10).hits
            assert [d for d, _ in a] == [d for d, _ in b], q
            for (_, x), (_, y) in zip(a, b):
                assert abs(x - y) < 1e-6
        shutil.rmtree(d2, ignore_errors=True)

    def test_multiterm_not_analyzed(self, porter_ix):
        """Wildcards/prefixes are not stemmed (classic QueryParser
        contract) — they expand against the STEMMED dictionary."""
        _, s = porter_ix
        # dictionary holds 'run', not 'running': 'runn*' matches nothing
        assert s.search("runn*", k=10).hits == []
        assert {d for d, _ in s.search("ru*", k=10).hits} == {0, 1, 3}

    def test_standard_index_unaffected(self, spark, index_dir):
        s = Searcher(SearchIndex(spark, index_dir))
        assert s.index.analyzer == "standard"
