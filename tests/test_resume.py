"""Resumable checkpointed builds: equivalence with one-shot, resume
skip/rebuild semantics, lineage fingerprints."""

from __future__ import annotations

import json
import os

import pytest

from lucene_spark.index.builder import IndexConfig, assign_doc_ids
from lucene_spark.index.checkpoint import ResumableIndexBuilder
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search.engine import Searcher

CFG = dict(docs_per_chunk=64, term_buckets=4)


@pytest.fixture(scope="module")
def resumable_dir(tmp_path_factory, spark, corpus_df):
    d = str(tmp_path_factory.mktemp("rix"))
    b = ResumableIndexBuilder(spark, IndexConfig(**CFG), n_segments=4)
    metrics = b.build(corpus_df.drop("content_sha256"), d)
    return d, metrics


class TestResumableBuild:
    def test_equals_one_shot(self, spark, resumable_dir, index_dir):
        """Same corpus through the checkpointed path and the one-shot
        path must give identical search results (rank AND score)."""
        d, metrics = resumable_dir
        assert metrics["docs"] == 200
        # NOTE: index_dir fixture uses docs_per_chunk=128; chunking
        # differs but scores/ranks must not.
        s_res = Searcher(SearchIndex(spark, d))
        s_one = Searcher(SearchIndex(spark, index_dir))
        for q in ["return", "return AND if", "return OR class OR int", '"return if"', "+int -return"]:
            a = s_res.search(q, k=15)
            b = s_one.search(q, k=15)
            assert a.hits == b.hits, q

    def test_checkpoint_records(self, resumable_dir):
        d, metrics = resumable_dir
        for seg in range(4):
            p = f"{d}/checkpoints/seg_{seg}.json"
            assert os.path.exists(p)
            rec = json.load(open(p))
            assert rec["status"] == "done"
            assert rec["n_docs"] > 0 and rec["n_postings"] > 0
            assert rec["docs_per_sec"] is not None
            assert len(rec["top_df_terms"]) == 10  # skew report
            assert ":" in rec["fingerprint"]
        assert sum(r["n_docs"] for r in metrics["segments"]) == 200

    def test_rebuild_resumes_all_segments(self, spark, corpus_df, resumable_dir):
        d, _ = resumable_dir
        b = ResumableIndexBuilder(spark, IndexConfig(**CFG), n_segments=4)
        metrics = b.build(corpus_df.drop("content_sha256"), d)
        assert metrics["resumed_segments"] == 4

    def test_tampered_checkpoint_triggers_rebuild(self, spark, corpus_df, resumable_dir):
        d, _ = resumable_dir
        p = f"{d}/checkpoints/seg_2.json"
        rec = json.load(open(p))
        rec["fingerprint"] = "bogus:0"
        json.dump(rec, open(p, "w"))
        b = ResumableIndexBuilder(spark, IndexConfig(**CFG), n_segments=4)
        metrics = b.build(corpus_df.drop("content_sha256"), d)
        assert metrics["resumed_segments"] == 3  # seg 2 rebuilt
        assert json.load(open(p))["fingerprint"] != "bogus:0"

    def test_partial_then_resume(self, tmp_path, spark, corpus_df):
        """Simulated crash after 2 of 4 segments: a fresh build() must
        redo only the missing segments and produce a working index."""
        d = str(tmp_path / "partial")
        os.makedirs(d)
        b = ResumableIndexBuilder(spark, IndexConfig(**CFG), n_segments=4)
        ids = assign_doc_ids(corpus_df.drop("content_sha256")).persist()
        for seg in (0, 1):
            b.build_segment(ids, d, seg)
        metrics = b.build(corpus_df.drop("content_sha256"), d)
        assert metrics["resumed_segments"] == 2
        td = Searcher(SearchIndex(spark, d)).search("return", k=5)
        assert len(td.hits) == 5
        ids.unpersist()
