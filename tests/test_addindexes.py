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


class TestCopyVariant:
    """mode='copy' (addIndexes(Directory...), IndexWriter.java:2954):
    tier append with a map-only doc-id re-encode — no term shuffle.
    With chunk-aligned cuts the merged ids equal the one-shot build's,
    so search results must match gold exactly in both modes."""

    @pytest.fixture(scope="class")
    def copy_setup(self, tmp_path_factory, spark):
        n, c1, c2 = 160, 64, 128  # cuts on chunk boundaries (DPC=32)
        pdf = make_corpus(n_docs=n, seed=47)
        df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
        base = tmp_path_factory.mktemp("ix_copy")
        cfg = IndexConfig(docs_per_chunk=DPC, term_buckets=2, positions=True)
        gold = str(base / "gold")
        IndexBuilder(spark, cfg).build(df, gold, assign_ids=False)
        parts = []
        for i, (lo, hi) in enumerate([(0, c1), (c1, c2), (c2, n)]):
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
        m1 = add_indexes(spark, dest, [parts[1]], mode="copy")
        # second add onto the now-tiered dest (tier chaining)
        m2 = add_indexes(spark, dest, [parts[2]], mode="copy")
        yield {"gold": gold, "dest": dest, "parts": parts, "m1": m1, "m2": m2,
               "base": str(base)}
        shutil.rmtree(str(base), ignore_errors=True)

    def test_metrics_and_layout(self, copy_setup):
        assert copy_setup["m1"]["doc_bases"] == [0, 64]
        assert copy_setup["m1"]["tiers_added"] == [1]
        assert copy_setup["m2"]["doc_bases"] == [0, 128]
        assert copy_setup["m2"]["tiers_added"] == [2]
        assert copy_setup["m2"]["docs"] == 160

    @pytest.mark.parametrize("mode", ["driver", "distributed"])
    def test_search_equals_gold(self, spark, copy_setup, mode):
        s_m = Searcher(SearchIndex(spark, copy_setup["dest"]))
        s_g = Searcher(SearchIndex(spark, copy_setup["gold"]))
        for q in QUERIES:
            a = s_m.search(q, k=40, mode=mode).hits
            b = s_g.search(q, k=40, mode=mode).hits
            assert [(d, round(x, 6)) for d, x in a] == [(d, round(x, 6)) for d, x in b], q

    def test_check_index(self, spark, copy_setup):
        check_index(SearchIndex(spark, copy_setup["dest"]))

    def test_unaligned_base_leaves_gap(self, spark, copy_setup, tmp_path):
        """Non-chunk-aligned dest size: the next base rounds UP to a
        chunk boundary, leaving a doc-id gap; src hits shift by base."""
        pdf = make_corpus(n_docs=80, seed=48)
        df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
        cfg = IndexConfig(docs_per_chunk=DPC, term_buckets=2, positions=True)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        IndexBuilder(spark, cfg).build(df.filter("doc_id < 50"), a, assign_ids=False)
        IndexBuilder(spark, cfg).build(
            df.filter("doc_id >= 50").withColumn("doc_id", F.col("doc_id") - 50),
            b,
            assign_ids=False,
        )
        sb = Searcher(SearchIndex(spark, b))
        hits_b = sb.search(A.TermQuery("return"), k=50).hits
        m = add_indexes(spark, a, [b], mode="copy")
        assert m["doc_bases"] == [0, 64]  # 50 rounds up to 64
        sa = Searcher(SearchIndex(spark, a))
        ids = {d for d, _ in sa.search(A.TermQuery("return"), k=200).hits}
        # every src hit appears shifted by the aligned base
        assert {d + 64 for d, _ in hits_b} <= ids

    def test_tier_chaining_keeps_bucket_fanout(self, copy_setup):
        """Bucket count must come from the newest tier dir on an
        already-tiered dest — not collapse to 1 because the top-level
        term_stats dir holds only tier=N subdirs."""
        import os

        d = f"{copy_setup['dest']}/postings/tier=2"
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 2  # term_buckets=2 preserved on the chained add

    def test_copy_rejects_writer_managed(self, spark, copy_setup, tmp_path):
        import json as _json

        d = str(tmp_path / "wm")
        shutil.copytree(copy_setup["parts"][0], d)
        with open(f"{d}/commits.json", "w") as fh:
            _json.dump({"tiers": []}, fh)
        with pytest.raises(ValueError, match="writer-managed"):
            add_indexes(spark, d, [copy_setup["parts"][1]], mode="copy")


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

    def test_positions_mismatch_rejected(self, spark, merged_setup, tmp_path):
        """A positioned dest cannot absorb a positions-less source (and
        vice versa) — the IndexOptions-mismatch rejection."""
        pdf = make_corpus(n_docs=16, seed=6)
        df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
        nopos = str(tmp_path / "nopos")
        IndexBuilder(
            spark, IndexConfig(docs_per_chunk=DPC, term_buckets=2, positions=False)
        ).build(df, nopos, assign_ids=False)
        with pytest.raises(ValueError, match="IndexOptions"):
            add_indexes(spark, merged_setup["parts"][0], [nopos])
        with pytest.raises(ValueError, match="IndexOptions"):
            add_indexes(spark, nopos, [merged_setup["parts"][0]], mode="copy")

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
