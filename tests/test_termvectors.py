"""Term vectors (Lucene90CompressingTermVectorsFormat role): per-doc
term/tf/positions vs a brute re-tokenization, including field scoping
and the no-term-vectors error path."""

from __future__ import annotations

import shutil
from collections import Counter

import pytest

from lucene_spark.analysis.tokenizer import tokenize_with_positions
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex


@pytest.fixture(scope="module")
def tv_index(tmp_path_factory, spark, corpus_df):
    d = str(tmp_path_factory.mktemp("tv_index"))
    cfg = IndexConfig(
        docs_per_chunk=64, term_buckets=4, positions=True,
        extra_fields=("path",), term_vectors=True,
    )
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256"), d)
    yield SearchIndex(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def _brute(text: str):
    toks, poss = tokenize_with_positions(text)
    tf = Counter(toks)
    pos_of: dict[str, list[int]] = {}
    for t, p in zip(toks, poss):
        pos_of.setdefault(t, []).append(p)
    return tf, pos_of


class TestTermVectors:
    @pytest.mark.parametrize("doc", [0, 7, 42, 199])
    def test_primary_field_vs_brute(self, tv_index, corpus_pdf, doc):
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        tf, pos_of = _brute(ordered.loc[doc, "content"])
        rows = tv_index.term_vector(doc).collect()
        assert {r["term"]: r["tf"] for r in rows} == dict(tf)
        for r in rows:
            assert sorted(r["poss"]) == pos_of[r["term"]]

    def test_extra_field_scoped(self, tv_index, corpus_pdf):
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        tf, _ = _brute(ordered.loc[3, "path"])
        rows = tv_index.term_vector(3, field="path").collect()
        assert {r["term"]: r["tf"] for r in rows} == dict(tf)

    def test_point_read_is_pushed_down(self, tv_index):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            tv_index.term_vector(7).explain(True)
        assert "GreaterThan" in buf.getvalue() or "EqualTo(doc_id" in buf.getvalue() or "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)" in buf.getvalue()

    def test_missing_table_raises(self, search_index):
        with pytest.raises(ValueError, match="term vectors"):
            search_index.term_vectors_df  # the session index is built without them


class TestFVHParity:
    """highlight_indexed parity between the postings-offsets source and
    the term-vectors source (FastVectorHighlighter role) on an index
    built with both — byte-identical passages."""

    import pytest as _pytest

    @_pytest.fixture(scope="class")
    def hl_index(self, tmp_path_factory, spark, corpus_pdf):
        import shutil

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search.engine import Searcher

        pdf = corpus_pdf.copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("hlix"))
        IndexBuilder(
            spark,
            IndexConfig(
                docs_per_chunk=128, term_buckets=4, positions=True,
                offsets=True, term_vectors=True,
            ),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        yield Searcher(SearchIndex(spark, d)), pdf
        shutil.rmtree(d, ignore_errors=True)

    def test_sources_identical(self, spark, hl_index):
        from lucene_spark.search.postprocess import highlight_indexed

        searcher, pdf = hl_index
        docs = spark.createDataFrame(pdf[["doc_id", "content"]]).withColumnRenamed(
            "content", "text"
        )
        for q in ("return", "return AND if", '"return if"'):
            a = highlight_indexed(searcher, q, docs, k=5, source="offsets")
            b = highlight_indexed(searcher, q, docs, k=5, source="term_vectors")
            c = highlight_indexed(searcher, q, docs, k=5, source="analysis")
            assert a == b, q
            assert a == c, q
            assert a and all(h["passages"] for h in a)
            assert all("<b>" in p for h in a for p in h["passages"])

    def test_analysis_source_needs_no_offsets(self, spark, corpus_pdf, tmp_path_factory):
        """OffsetSource.ANALYSIS works on an index built with neither
        offsets nor term vectors (the UnifiedHighlighter fallback)."""
        import shutil

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.postprocess import highlight_indexed

        pdf = corpus_pdf.head(60).copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("hlana"))
        IndexBuilder(
            spark,
            IndexConfig(docs_per_chunk=128, term_buckets=4, positions=True),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        s = Searcher(SearchIndex(spark, d))
        docs = spark.createDataFrame(pdf[["doc_id", "content"]]).withColumnRenamed(
            "content", "text"
        )
        hl = highlight_indexed(s, "return AND if", docs, k=5, source="analysis")
        assert hl and all(h["passages"] for h in hl)
        assert all("<b>" in p for h in hl for p in h["passages"])
        # offsets source on the same index must refuse (no offsets table)
        import pytest

        with pytest.raises(Exception):
            highlight_indexed(s, "return", docs, k=3, source="offsets")
        shutil.rmtree(d, ignore_errors=True)

    def test_tv_without_offsets_raises(self, spark, corpus_pdf, tmp_path_factory):
        import shutil

        import pytest

        from lucene_spark.index.builder import IndexBuilder, IndexConfig
        from lucene_spark.index.reader import SearchIndex
        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.postprocess import highlight_indexed

        pdf = corpus_pdf.head(40).copy().reset_index(drop=True)
        pdf["doc_id"] = range(len(pdf))
        d = str(tmp_path_factory.mktemp("hlnov"))
        IndexBuilder(
            spark,
            IndexConfig(docs_per_chunk=128, term_buckets=4, positions=True, term_vectors=True),
        ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
        s = Searcher(SearchIndex(spark, d))
        docs = spark.createDataFrame(pdf[["doc_id", "content"]]).withColumnRenamed(
            "content", "text"
        )
        with pytest.raises(ValueError, match="lack offsets"):
            highlight_indexed(s, "return", docs, k=3, source="term_vectors")
        shutil.rmtree(d, ignore_errors=True)
