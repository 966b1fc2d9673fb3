"""Numeric doc-values updates (IndexWriter.updateNumericDocValue).

Contract (IndexWriter.java:1900-1930 + DV-update gen files): update a
per-doc value without re-inverting — postings/norms/statistics (and
therefore BM25 scores) unchanged; filters/sorts/function scores see
the new value; later generations win; a reader is a snapshot (reopen
to observe); compaction folds updates into the docs table with
identical results.
"""

from __future__ import annotations

import shutil

import pytest

from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.dvupdates import apply_dv_updates, update_numeric_doc_values
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher


@pytest.fixture()
def dv_index(tmp_path, spark, corpus_pdf):
    d = str(tmp_path / "dvix")
    pdf = corpus_pdf.copy()
    pdf["n_chars"] = pdf["content"].str.len().astype("int64")
    IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4)).build(
        spark.createDataFrame(pdf).drop("content_sha256"), d
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _range_ids(searcher, field, lo, hi):
    td = searcher.search(A.FieldRangeQuery(field, lo, hi), k=10**6)
    return sorted(h for h, _ in td.hits)


def test_update_changes_filters_not_scores(spark, dv_index):
    before = Searcher(SearchIndex(spark, dv_index))
    base_hits = before.search("return", k=10).hits
    victims = _range_ids(before, "n_chars", 0, 10**9)[:5]
    update_numeric_doc_values(spark, dv_index, "n_chars", {d: -1.0 for d in victims})
    after = Searcher(SearchIndex(spark, dv_index))
    # the updated docs now fall out of a positive range filter
    got = _range_ids(after, "n_chars", 0, 10**9)
    assert set(got) == set(_range_ids(before, "n_chars", 0, 10**9)) - set(victims)
    assert _range_ids(after, "n_chars", -2, -1) == sorted(victims)
    # scores untouched (stats/postings/norms not rewritten)
    assert after.search("return", k=10).hits == base_hits


def test_unknown_field_rejected(spark, dv_index):
    # IndexWriter.updateNumericDocValue rejects unknown DV fields up
    # front — a bad update must never poison subsequent reader opens
    with pytest.raises(ValueError, match="no_such_field"):
        update_numeric_doc_values(spark, dv_index, "no_such_field", {0: 1.0})
    # readers still open fine (no sidecar was written)
    assert Searcher(SearchIndex(spark, dv_index)).search("return", k=1).hits


def test_snapshot_semantics(spark, dv_index):
    reader = SearchIndex(spark, dv_index)
    _ = reader.docs.count()  # snapshot taken
    update_numeric_doc_values(spark, dv_index, "n_chars", {0: -5.0})
    old = reader.docs.filter("doc_id = 0").select("n_chars").first()[0]
    assert old != -5  # old reader keeps its snapshot
    new = SearchIndex(spark, dv_index).docs.filter("doc_id = 0").select("n_chars").first()[0]
    assert new == -5


def test_last_generation_wins_and_compaction(spark, dv_index):
    update_numeric_doc_values(spark, dv_index, "n_chars", {1: -7.0, 2: -7.0})
    update_numeric_doc_values(spark, dv_index, "n_chars", {2: -9.0})
    view = SearchIndex(spark, dv_index).docs
    vals = {r["doc_id"]: r["n_chars"] for r in view.filter("doc_id IN (1,2)").collect()}
    assert vals == {1: -7, 2: -9}
    before = view.orderBy("doc_id").collect()
    assert apply_dv_updates(spark, dv_index) == ["n_chars"]
    folded = SearchIndex(spark, dv_index)
    assert folded.docs.orderBy("doc_id").collect() == before
    import os

    assert not os.path.exists(f"{dv_index}/dv_updates")


def test_writer_update_by_query(spark, tmp_path, corpus_pdf):
    from lucene_spark.index.writer import IndexWriter

    d = str(tmp_path / "dvw")
    pdf = corpus_pdf.copy()
    pdf["n_chars"] = pdf["content"].str.len().astype("int64")
    w = IndexWriter(spark, d, IndexConfig(docs_per_chunk=128, term_buckets=4))
    w.add_documents(spark.createDataFrame(pdf).drop("content_sha256"))
    w.commit()
    n = w.update_numeric_doc_value("class", "n_chars", -42.0)
    assert n > 0
    ix = SearchIndex(spark, d)
    got = ix.docs.filter("n_chars = -42").count()
    assert got == n
    shutil.rmtree(d, ignore_errors=True)
