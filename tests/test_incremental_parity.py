"""Regression tests for incremental-path parity with the one-shot
build: extra fields in writer/resumable segments, rollback safety on
flat builds, stacked+offsets inversion, check_index on stem_repeat,
synonym replacement inside phrases, tiered DV compaction layout, and
resumable metadata columns."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.builder import FIELD_SEP, IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


def _ids(pdf):
    pdf = pdf.copy().reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    return pdf


class TestStackedOffsets:
    def test_shingles_with_offsets_builds(self, spark, corpus_pdf, tmp_path_factory):
        """Stacked stage + offsets=True used to crash: the offsets
        branch dropped the carried dl column (AnalysisException)."""
        pdf = _ids(corpus_pdf.head(40)).drop(columns=["content_sha256"])
        d = str(tmp_path_factory.mktemp("shof"))
        m = IndexBuilder(
            spark,
            IndexConfig(
                docs_per_chunk=64, term_buckets=2, positions=True,
                offsets=True, shingles=(2, 2),
            ),
        ).build(spark.createDataFrame(pdf), d, assign_ids=False)
        assert m["docs"] == 40
        s = Searcher(SearchIndex(spark, d))
        assert s.search('"return if"', k=3).hits


class TestRollbackFlatGuard:
    def test_rollback_keeps_flat_covered_segments(self, spark, corpus_pdf, tmp_path_factory):
        """rollback() on a fresh resumable build (no commits.json) must
        NOT delete the segment intermediates behind the flat tables."""
        from lucene_spark.index.checkpoint import ResumableIndexBuilder
        from lucene_spark.index.writer import IndexWriter

        pdf = _ids(corpus_pdf.head(60)).drop(columns=["content_sha256"])
        d = str(tmp_path_factory.mktemp("rbf"))
        ResumableIndexBuilder(
            spark, IndexConfig(docs_per_chunk=64, term_buckets=2, positions=True), n_segments=2
        ).build(spark.createDataFrame(pdf), d, assign_ids=False)
        segs_before = sorted(os.listdir(f"{d}/segments"))
        assert segs_before
        w = IndexWriter(spark, d)
        removed = w.rollback()
        assert removed == []
        assert sorted(p for p in os.listdir(f"{d}/segments") if p.startswith("seg=")) == [
            p for p in segs_before if p.startswith("seg=")
        ]
        # a genuinely uncommitted staged segment IS still dropped
        w.add_documents(spark.createDataFrame(pdf.head(5)).drop("doc_id"))
        assert w.rollback() != []


class TestWriterExtraFields:
    def test_added_docs_searchable_on_extra_field(self, spark, corpus_pdf, tmp_path_factory):
        from lucene_spark.index.checkpoint import ResumableIndexBuilder
        from lucene_spark.index.writer import IndexWriter

        pdf = _ids(corpus_pdf.head(50)).drop(columns=["content_sha256"])
        cfg = IndexConfig(
            docs_per_chunk=64, term_buckets=2, positions=True, extra_fields=("path",)
        )
        d = str(tmp_path_factory.mktemp("wxf"))
        ResumableIndexBuilder(spark, cfg, n_segments=2).build(
            spark.createDataFrame(pdf.head(30)), d, assign_ids=False
        )
        w = IndexWriter(spark, d, cfg)
        w.add_documents(spark.createDataFrame(pdf.tail(20)).drop("doc_id"))
        w.commit(full=True)
        ix = SearchIndex(spark, d)
        # per-field stats row survives the incremental commit
        st = ix.stats_for("path")
        assert st.doc_count == 50
        # appended docs carry prefixed postings
        seg_terms = (
            spark.read.parquet(f"{d}/term_stats")
            .filter(F.col("term").startswith("path" + FIELD_SEP))
            .count()
        )
        assert seg_terms > 0
        s = Searcher(ix)
        tok = pdf.tail(20)["path"].iloc[0].split("/")[-1].split(".")[0].lower()
        td = s.search(A.TermQuery(tok, field="path"), k=50)
        assert td.hits


class TestCheckIndexStacked:
    def test_check_index_passes_stem_repeat(self, spark, corpus_pdf, tmp_path_factory):
        from lucene_spark.index.check import check_index

        pdf = _ids(corpus_pdf.head(30)).drop(columns=["content_sha256"])
        d = str(tmp_path_factory.mktemp("ckstem"))
        IndexBuilder(
            spark,
            IndexConfig(docs_per_chunk=64, term_buckets=2, positions=True, stem_repeat=True),
        ).build(spark.createDataFrame(pdf), d, assign_ids=False)
        report = check_index(SearchIndex(spark, d))
        assert report["sum_ttf_ok"] is True


class TestSynonymReplacementPhrase:
    def test_replacement_rule_rewrites_phrase(self):
        from lucene_spark.analysis.synonyms import expand_synonyms, parse_solr_synonyms

        syn = parse_solr_synonyms("colour => color")
        q = expand_synonyms(A.PhraseQuery(("colour", "scheme")), syn)
        assert q == A.PhraseQuery(("color", "scheme"))
        # bare term agrees (the previously-inconsistent pair)
        qt = expand_synonyms(A.TermQuery("colour"), syn)
        assert getattr(qt, "term", None) == "color" or qt == A.TermQuery("color")


class TestTieredDvCompaction:
    def test_apply_dv_updates_keeps_tier_layout(self, spark, corpus_pdf, tmp_path_factory):
        from lucene_spark.index.dvupdates import apply_dv_updates, update_numeric_doc_values
        from lucene_spark.index.writer import IndexWriter

        pdf = _ids(corpus_pdf.head(40)).drop(columns=["content_sha256"])
        pdf["stars"] = [float(i % 7) for i in range(len(pdf))]
        from lucene_spark.index.checkpoint import ResumableIndexBuilder

        cfg = IndexConfig(docs_per_chunk=64, term_buckets=2, positions=True)
        d = str(tmp_path_factory.mktemp("dvt"))
        ResumableIndexBuilder(spark, cfg, n_segments=2).build(
            spark.createDataFrame(pdf.head(25)), d, assign_ids=False
        )
        w = IndexWriter(spark, d, cfg)
        w.add_documents(spark.createDataFrame(pdf.tail(15)).drop("doc_id"))
        w.commit()  # tiered commit -> docs/tier=K layout
        assert any(p.startswith("tier=") for p in os.listdir(f"{d}/docs"))
        update_numeric_doc_values(spark, d, "stars", {0: 99.0})
        fields = apply_dv_updates(spark, d)
        assert fields == ["stars"]
        # partition layout survived, value folded in
        assert any(p.startswith("tier=") for p in os.listdir(f"{d}/docs"))
        docs = spark.read.parquet(f"{d}/docs")
        assert docs.filter(F.col("doc_id") == 0).first()["stars"] == 99.0
        # a subsequent commit still works on the partitioned dir
        w.add_documents(spark.createDataFrame(pdf.head(3)).drop("doc_id"))
        w.commit()
        assert SearchIndex(spark, d).docs.count() == 43


class TestResumableMetadata:
    def test_resumable_keeps_all_metadata_columns(self, spark, corpus_pdf, tmp_path_factory):
        from lucene_spark.index.checkpoint import ResumableIndexBuilder

        pdf = _ids(corpus_pdf.head(30)).drop(columns=["content_sha256"])
        pdf["stars"] = [float(i) for i in range(len(pdf))]
        d = str(tmp_path_factory.mktemp("rsm"))
        ResumableIndexBuilder(
            spark, IndexConfig(docs_per_chunk=64, term_buckets=2, positions=True), n_segments=2
        ).build(spark.createDataFrame(pdf), d, assign_ids=False)
        ix = SearchIndex(spark, d)
        assert "stars" in ix.docs.columns
        assert ix.docs.filter(F.col("stars") > 20).count() == 9
