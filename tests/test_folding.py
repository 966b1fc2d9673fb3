"""ASCIIFoldingFilter + char-filter stage tests.

Goldens mirror /root/reference/lucene/analysis/common/src/test/org/
apache/lucene/analysis/miscellaneous/TestASCIIFoldingFilter.java:48-196.
"""

from __future__ import annotations

import shutil

from lucene_spark.analysis.folding import fold_ascii, html_strip, mapping_char_filter
from lucene_spark.analysis.tokenizer import tokenize


class TestFoldAscii:
    def test_latin1_accents_golden(self):
        # TestASCIIFoldingFilter.testLatin1Accents pairs, verbatim
        pairs = [
            ("Des", "Des"), ("mot", "mot"), ("clés", "cles"), ("À", "A"),
            ("LA", "LA"), ("CHAÎNE", "CHAINE"), ("Á", "A"), ("Â", "A"),
            ("Ã", "A"), ("Ä", "A"), ("Å", "A"), ("Æ", "AE"), ("Ç", "C"),
            ("È", "E"), ("É", "E"), ("Ê", "E"), ("Ë", "E"), ("Ì", "I"),
            ("Í", "I"), ("Î", "I"), ("Ï", "I"), ("Ĳ", "IJ"), ("Ð", "D"),
            ("Ñ", "N"), ("Ò", "O"), ("Ó", "O"), ("Ô", "O"), ("Õ", "O"),
            ("Ö", "O"), ("Ø", "O"), ("Œ", "OE"), ("Þ", "TH"), ("Ù", "U"),
            ("Ú", "U"), ("Û", "U"), ("Ü", "U"), ("Ý", "Y"), ("Ÿ", "Y"),
            ("à", "a"), ("á", "a"), ("â", "a"), ("ã", "a"), ("ä", "a"),
            ("å", "a"), ("æ", "ae"), ("ç", "c"), ("è", "e"), ("é", "e"),
            ("ê", "e"), ("ë", "e"), ("ì", "i"), ("í", "i"), ("î", "i"),
            ("ï", "i"), ("ĳ", "ij"), ("ð", "d"), ("ñ", "n"), ("ò", "o"),
            ("ó", "o"), ("ô", "o"), ("õ", "o"), ("ö", "o"), ("ø", "o"),
            ("œ", "oe"), ("ß", "ss"), ("þ", "th"), ("ù", "u"), ("ú", "u"),
            ("û", "u"), ("ü", "u"), ("ý", "y"), ("ÿ", "y"), ("ﬁ", "fi"),
            ("ﬂ", "fl"),
        ]
        for src, want in pairs:
            assert fold_ascii(src) == want, (src, want, fold_ascii(src))

    def test_unmodified_letters(self):
        # testUnmodifiedLetters: ASCII and unmapped scripts pass through
        for s in ("hello", "WORLD", "123", "a_b", "русский", "日本語", "ελλ"):
            assert fold_ascii(s) == s

    def test_latin_extended_a(self):
        assert fold_ascii("Łukasz") == "Lukasz"
        assert fold_ascii("Đorđe") == "Dorde"
        assert fold_ascii("ŋ") == "ng" and fold_ascii("Ŋ") == "NG"
        assert fold_ascii("ʼn") == "'n"
        assert fold_ascii("señor Škoda čeština") == "senor Skoda cestina"

    def test_analyzer_chain(self):
        assert tokenize("Clés ÉTÉ Škoda", stem="ascii") == ["cles", "ete", "skoda"]


class TestHtmlStrip:
    def test_tags_become_spaces_length_preserving(self):
        src = "<p>hello <b>big</b> world</p>"
        out = html_strip(src)
        assert len(out) == len(src)
        assert out.split() == ["hello", "big", "world"]
        # offsets index the original markup
        assert out.index("hello") == src.index("hello")
        assert out.index("world") == src.index("world")

    def test_entities_decode_with_pad(self):
        src = "fish &amp; chips &lt;tag&gt;"
        out = html_strip(src)
        assert len(out) == len(src)
        # documented divergence from the reference: pad spaces after a
        # decoded entity separate it from adjacent text (tokens never
        # glue across an entity) — identical output for the standard
        # grammar, which splits on '&'/'<'/'>' anyway
        assert out.split() == ["fish", "&", "chips", "<", "tag>"]
        assert html_strip("&#65; &copy;").split() == ["A", "©"]

    def test_comments_and_attrs(self):
        src = '<!-- note -->x<a href="y>z">link</a>'
        out = html_strip(src)
        assert len(out) == len(src)
        assert out.split() == ["x", "link"]

    def test_tokenize_with_char_filter(self):
        got = tokenize("<h1>Hello</h1> <p>World &amp; peace</p>", char_filters=("html_strip",))
        assert got == ["hello", "world", "peace"]


class TestMappingCharFilter:
    def test_basic(self):
        f = mapping_char_filter({"ph": "f ", "&": " "})
        assert f("phone&graph") == "f one graf ".replace("graf ", "graf ")
        assert len(f("phone&graph")) == len("phone&graph")

    def test_growth_rejected(self):
        import pytest

        with pytest.raises(ValueError):
            mapping_char_filter({"&": "and"})
        with pytest.raises(ValueError):
            mapping_char_filter({"": "x"})

    def test_empty_mapping_is_noop(self):
        f = mapping_char_filter({})
        assert f("anything at all") == "anything at all"


class TestAsciiIndex:
    def test_accented_index_round_trip(self, spark, corpus_pdf, tmp_path_factory):
        """Index accent-translated text with the ascii analyzer: folding
        restores the original token stream, so results equal a standard
        index over the original text (bijection proof)."""
        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search.engine import Searcher

        pdf = corpus_pdf.copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        acc = pdf.copy()
        acc["content"] = acc["content"].str.translate(str.maketrans("aeo", "áéö"))
        d1 = str(tmp_path_factory.mktemp("accix"))
        d2 = str(tmp_path_factory.mktemp("stdix"))
        IndexBuilder(
            spark, IndexConfig(analyzer="ascii", docs_per_chunk=128, term_buckets=4)
        ).build(spark.createDataFrame(acc).drop("content_sha256"), d1, assign_ids=False)
        IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4)).build(
            spark.createDataFrame(pdf).drop("content_sha256"), d2, assign_ids=False
        )
        s1 = Searcher(SearchIndex(spark, d1))
        s2 = Searcher(SearchIndex(spark, d2))
        for q in ("return", "return AND if", '"return if"'):
            assert s1.search(q, k=10).hits == s2.search(q, k=10).hits, q
        # accented QUERY terms fold too (same analyzer at query time)
        assert s1.search("rétúrn", k=10).hits == s2.search("return", k=10).hits
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
