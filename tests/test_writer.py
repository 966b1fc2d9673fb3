"""IndexWriter: incremental add / update / delete / commit
(IndexWriter.java addDocument/updateDocument/deleteDocuments/commit)."""

from __future__ import annotations

import shutil

import pytest

from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.index.writer import IndexWriter
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher

CFG = dict(docs_per_chunk=64, term_buckets=2, positions=True)


@pytest.fixture()
def wdir(tmp_path):
    d = str(tmp_path / "wix")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestIndexWriter:
    def test_incremental_adds_equal_oneshot(self, spark, corpus_df, wdir, tmp_path):
        """Two staged adds + commit ≡ a one-shot build over the same
        docs: same hit sets, same scores (stats are global)."""
        corpus = corpus_df.drop("content_sha256")
        w = IndexWriter(spark, wdir, IndexConfig(**CFG))
        a = w.add_documents(corpus.limit(120))
        b = w.add_documents(corpus.subtract(corpus.limit(120)))
        assert a["n_docs"] + b["n_docs"] == corpus.count()
        assert b["first_doc_id"] == a["n_docs"]
        ix = w.commit()
        s = Searcher(ix)

        oneshot = str(tmp_path / "oneshot")
        IndexBuilder(spark, IndexConfig(**CFG)).build(corpus, oneshot)
        s1 = Searcher(SearchIndex(spark, oneshot))
        for q in ["return", "return AND if", '"return if"']:
            got = s.search(q, k=1000)
            want = s1.search(q, k=1000)
            assert got.total_hits == want.total_hits
            assert sorted(round(sc, 5) for _, sc in got.hits) == sorted(
                round(sc, 5) for _, sc in want.hits
            )

    def test_update_replaces_and_expunges(self, spark, corpus_df, wdir):
        corpus = corpus_df.drop("content_sha256")
        w = IndexWriter(spark, wdir, IndexConfig(**CFG))
        w.add_documents(corpus)
        n = corpus.count()
        row = corpus.limit(1).collect()[0]
        upd = spark.createDataFrame(
            [(row["repo"], row["path"], row["commit"], "en", "zzzfresh zzzfresh replacement")],
            "repo string, path string, commit string, lang string, content string",
        )
        rec = w.update_documents(upd, key_cols=("repo", "path", "commit"))
        assert rec["tombstones"] == 1 and rec["n_docs"] == 1
        ix = w.commit(expunge_deletes=True)
        s = Searcher(ix)
        assert ix.stats.doc_count == n  # one out, one in
        td = s.search("zzzfresh", k=10)
        assert td.total_hits == 1
        # the replaced content is gone: its doc id is not the new one
        assert td.hits[0][0] == rec["first_doc_id"]

    def test_update_without_expunge_masks_old(self, spark, corpus_df, wdir):
        corpus = corpus_df.drop("content_sha256")
        w = IndexWriter(spark, wdir, IndexConfig(**CFG))
        w.add_documents(corpus)
        row = corpus.limit(1).collect()[0]
        upd = spark.createDataFrame(
            [(row["repo"], row["path"], row["commit"], "en", "zzzmasked once")],
            "repo string, path string, commit string, lang string, content string",
        )
        w.update_documents(upd, key_cols=("repo", "path", "commit"))
        ix = w.commit()  # tombstones stay liveDocs masks
        s = Searcher(ix)
        assert s.search("zzzmasked", k=10).total_hits == 1
        # stats still count the masked doc (Lucene pre-merge contract)
        assert ix.stats.doc_count == corpus.count() + 1

    def test_writer_refuses_oneshot_dir(self, spark, corpus_df, tmp_path):
        oneshot = str(tmp_path / "oneshot2")
        IndexBuilder(spark, IndexConfig(**CFG)).build(corpus_df.drop("content_sha256"), oneshot)
        with pytest.raises(ValueError):
            IndexWriter(spark, oneshot)

    def test_delete_documents_roundtrip(self, spark, corpus_df, wdir):
        corpus = corpus_df.drop("content_sha256")
        w = IndexWriter(spark, wdir, IndexConfig(**CFG))
        w.add_documents(corpus)
        ix = w.commit()
        s = Searcher(ix)
        victim = s.search("return", k=1).hits[0][0]
        w.delete_documents([victim])
        s2 = Searcher(SearchIndex(spark, w.index_dir))
        assert victim not in [d for d, _ in s2.search("return", k=1000).hits]


class TestScaleSafeIdAssignment:
    """Round-4 verdict #3 minor: add_documents used a global
    Window.orderBy (one partition per batch). It now reuses the
    builder's partition-offset pattern — ids must be bit-identical to
    the old global-rank semantics, with no single-partition exchange
    in the staged-segment lineage."""

    def test_id_parity_with_global_rank(self, spark, corpus_df, wdir):
        corpus = corpus_df.drop("content_sha256")
        w = IndexWriter(spark, wdir, IndexConfig(**CFG))
        w.add_documents(corpus.limit(60))
        w.add_documents(corpus.subtract(corpus.limit(60)))
        staged = spark.read.parquet(f"{wdir}/segments/seg=w0/docs")
        pdf = staged.select("doc_id", "repo", "path", "commit").toPandas()
        expect = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        assert expect["doc_id"].tolist() == list(range(len(expect)))
        staged2 = spark.read.parquet(f"{wdir}/segments/seg=w1/docs")
        lo = staged2.agg({"doc_id": "min"}).first()[0]
        assert lo == 60  # second segment continues at the base

    def test_no_single_partition_exchange(self, spark, corpus_df):
        from lucene_spark.index.builder import assign_doc_ids

        ided = assign_doc_ids(corpus_df.drop("content_sha256"))
        plan = ided._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
        getattr(ided, "_assign_ids_persisted").unpersist()
