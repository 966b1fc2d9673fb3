"""IndexWriter.addIndexes (CodecReader variant): merging slice-built
indexes must reproduce the one-shot build over the concatenated corpus
TABLE-IDENTICALLY — same postings blobs, skip data, impacts, term
dictionary and collection stats — because the merge re-runs the
builder's global aggregation over decoded (never re-analyzed) postings.

Reference: lucene/core/src/java/org/apache/lucene/index/
IndexWriter.java:3137 (addIndexes(CodecReader...)), SegmentMerger.java:41.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.fixtures import make_corpus
from lucene_spark.index.addindexes import add_indexes
from lucene_spark.index.builder import IndexBuilder, IndexConfig, assign_doc_ids
from lucene_spark.index.check import check_index
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher

N, CUT1, CUT2, DPC = 160, 60, 110, 32


@pytest.fixture(scope="module")
def merged_setup(tmp_path_factory, spark):
    pdf = make_corpus(n_docs=N, seed=43)
    df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
    base = tmp_path_factory.mktemp("ix_add")
    cfg = IndexConfig(docs_per_chunk=DPC, term_buckets=2, positions=True)
    gold = str(base / "gold")
    IndexBuilder(spark, cfg).build(df, gold, assign_ids=False)
    # three slice indexes, each 0-based like an independently-built index
    slices = [(0, CUT1), (CUT1, CUT2), (CUT2, N)]
    parts = []
    for i, (lo, hi) in enumerate(slices):
        d = str(base / f"part{i}")
        IndexBuilder(spark, cfg).build(
            df.filter(f"doc_id >= {lo} and doc_id < {hi}").withColumn(
                "doc_id", F.col("doc_id") - lo
            ),
            d,
            assign_ids=False,
        )
        parts.append(d)
    dest = str(base / "dest")
    shutil.copytree(parts[0], dest)
    metrics = add_indexes(spark, dest, parts[1:])
    yield {"gold": gold, "dest": dest, "parts": parts, "metrics": metrics, "base": str(base)}
    shutil.rmtree(str(base), ignore_errors=True)


QUERIES = [
    A.TermQuery("return"),
    A.BooleanQuery(((A.Occur.MUST, A.TermQuery("if")), (A.Occur.SHOULD, A.TermQuery("int")))),
    A.BooleanQuery(((A.Occur.MUST, A.TermQuery("if")), (A.Occur.MUST_NOT, A.TermQuery("int")))),
    A.PhraseQuery(("return", "if")),
    A.PhraseQuery(("return", "if"), slop=3),
    A.PrefixQuery("ret"),
]


def _table_rows(spark, d, t):
    df = spark.read.parquet(f"{d}/{t}")
    rows = df.collect()

    def norm(v):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, list):
            return tuple(v)
        return v

    cols = sorted(df.columns)
    return sorted(tuple(norm(r[c]) for c in cols) for r in rows)


class TestMergeEqualsGold:
    def test_doc_bases(self, merged_setup):
        assert merged_setup["metrics"]["doc_bases"] == [0, CUT1, CUT2]
        assert merged_setup["metrics"]["docs"] == N
        assert merged_setup["metrics"]["added_docs"] == N - CUT1

    @pytest.mark.parametrize(
        "table", ["postings", "term_stats", "collection_stats", "norms", "docs"]
    )
    def test_tables_identical(self, spark, merged_setup, table):
        assert _table_rows(spark, merged_setup["dest"], table) == _table_rows(
            spark, merged_setup["gold"], table
        )

    def test_check_index(self, spark, merged_setup):
        check_index(SearchIndex(spark, merged_setup["dest"]))

    @pytest.mark.parametrize("mode", ["driver", "distributed"])
    def test_search_equals_gold(self, spark, merged_setup, mode):
        s_m = Searcher(SearchIndex(spark, merged_setup["dest"]))
        s_g = Searcher(SearchIndex(spark, merged_setup["gold"]))
        for q in QUERIES:
            a = s_m.search(q, k=40, mode=mode).hits
            b = s_g.search(q, k=40, mode=mode).hits
            assert [(d, round(x, 6)) for d, x in a] == [(d, round(x, 6)) for d, x in b], q


class TestOutDirAndOffsets:
    def test_out_dir_leaves_dest_untouched(self, spark, merged_setup, tmp_path):
        parts = merged_setup["parts"]
        out = str(tmp_path / "merged_out")
        before = _table_rows(spark, parts[0], "term_stats")
        add_indexes(spark, parts[0], [parts[1]], out_dir=out)
        assert _table_rows(spark, parts[0], "term_stats") == before
        n = spark.read.parquet(f"{out}/norms").count()
        assert n == CUT2

    def test_offsets_index_merge(self, spark, tmp_path):
        """Offsets (and therefore positions) survive the decode →
        re-pack round trip byte-identically."""
        pdf = make_corpus(n_docs=64, seed=9)
        df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
        cfg = IndexConfig(docs_per_chunk=DPC, term_buckets=2, offsets=True)
        gold, a, b = str(tmp_path / "gold"), str(tmp_path / "a"), str(tmp_path / "b")
        IndexBuilder(spark, cfg).build(df, gold, assign_ids=False)
        IndexBuilder(spark, cfg).build(df.filter("doc_id < 32"), a, assign_ids=False)
        IndexBuilder(spark, cfg).build(
            df.filter("doc_id >= 32").withColumn("doc_id", F.col("doc_id") - 32),
            b,
            assign_ids=False,
        )
        add_indexes(spark, a, [b])
        assert _table_rows(spark, a, "postings") == _table_rows(spark, gold, "postings")


class TestValidation:
    def test_deletes_rejected(self, spark, merged_setup, tmp_path):
        from lucene_spark.index.deletes import delete_docs

        d = str(tmp_path / "del")
        shutil.copytree(merged_setup["parts"][0], d)
        delete_docs(spark, d, [0])
        with pytest.raises(ValueError, match="deletes"):
            add_indexes(spark, d, [merged_setup["parts"][1]])
        with pytest.raises(ValueError, match="deletes"):
            add_indexes(spark, merged_setup["parts"][1], [d])

    def test_chain_mismatch_rejected(self, spark, merged_setup, tmp_path):
        pdf = make_corpus(n_docs=16, seed=3)
        df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
        other = str(tmp_path / "porter")
        IndexBuilder(
            spark, IndexConfig(docs_per_chunk=DPC, term_buckets=2, analyzer="porter")
        ).build(df, other, assign_ids=False)
        with pytest.raises(ValueError, match="chain differs"):
            add_indexes(spark, merged_setup["parts"][0], [other])

    def test_index_sort_rejected(self, spark, merged_setup, tmp_path):
        pdf = make_corpus(n_docs=16, seed=3)
        df = spark.createDataFrame(pdf).drop("content_sha256")
        srt = str(tmp_path / "sorted")
        IndexBuilder(
            spark,
            IndexConfig(docs_per_chunk=DPC, term_buckets=2, index_sort=("repo", "path", "commit")),
        ).build(df, srt)
        with pytest.raises(ValueError, match="index-sorted"):
            add_indexes(spark, merged_setup["parts"][0], [srt])
