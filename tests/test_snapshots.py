"""IndexWriter.rollback + SnapshotDeletionPolicy snapshot/restore.

Contract: rollback discards staged-but-uncommitted segments and leaves
the last commit searchable (IndexWriter.java:2337); a snapshot pins a
commit point (SnapshotDeletionPolicy.java:38-74) and restore returns
the index to exactly that point — search results, stats, deletes, and
DV updates included — as long as no full merge rewrote the files.
"""

from __future__ import annotations

import shutil

import pytest

from lucene_spark.index.builder import IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.index.writer import IndexWriter
from lucene_spark.search.engine import Searcher

CFG = dict(docs_per_chunk=128, term_buckets=4, positions=True)


@pytest.fixture()
def writer_env(tmp_path, spark, corpus_pdf):
    d = str(tmp_path / "snapix")
    corpus = spark.createDataFrame(corpus_pdf).drop("content_sha256")
    w = IndexWriter(spark, d, IndexConfig(**CFG))
    yield w, corpus, d
    shutil.rmtree(d, ignore_errors=True)


def _hits(spark, d, q="return", k=5):
    return Searcher(SearchIndex(spark, d)).search(q, k=k).hits


def test_rollback_discards_uncommitted(spark, writer_env):
    w, corpus, d = writer_env
    w.add_documents(corpus.limit(100))
    w.commit()
    before = _hits(spark, d)
    stats_before = SearchIndex(spark, d).stats
    w.add_documents(corpus.subtract(corpus.limit(100)))
    dropped = w.rollback()
    assert dropped, "an uncommitted segment should have been dropped"
    # a re-commit after rollback must not resurrect the batch
    w.commit()
    assert _hits(spark, d) == before
    assert SearchIndex(spark, d).stats == stats_before


def test_snapshot_restore_roundtrip(spark, writer_env):
    w, corpus, d = writer_env
    w.add_documents(corpus.limit(100))
    w.commit()
    sid = w.snapshot()
    want_hits = _hits(spark, d)
    want_stats = SearchIndex(spark, d).stats
    # advance: second batch + tiered commit + a delete + a DV update
    w.add_documents(corpus.subtract(corpus.limit(100)))
    w.commit()
    w.delete_documents([0, 1])
    assert SearchIndex(spark, d).stats != want_stats
    rec = w.restore(sid)
    assert rec["snapshot"] == sid and rec["files_removed"] > 0
    assert _hits(spark, d) == want_hits
    assert SearchIndex(spark, d).stats == want_stats
    assert len(SearchIndex(spark, d).deleted_ids) == 0


def test_restore_after_full_merge_raises(spark, writer_env):
    w, corpus, d = writer_env
    w.add_documents(corpus.limit(100))
    w.commit()
    sid = w.snapshot()
    w.add_documents(corpus.subtract(corpus.limit(100)))
    w.commit(full=True)  # rewrites tiers in place → snapshot gone
    with pytest.raises(ValueError, match="gone"):
        w.restore(sid)


def test_snapshot_preserves_deletes_state(spark, writer_env):
    w, corpus, d = writer_env
    w.add_documents(corpus.limit(150))
    w.commit()
    w.delete_documents([3])
    sid = w.snapshot()  # snapshot WITH one tombstone
    w.delete_documents([4, 5])
    w.restore(sid)
    assert sorted(SearchIndex(spark, d).deleted_ids.tolist()) == [3]
