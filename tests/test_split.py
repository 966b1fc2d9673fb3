"""Index splitting (IndexSplitter / PKIndexSplitter role): each half must
be byte-equivalent to an index built directly over that slice of the
corpus, and the MultiReader composition of the halves must reproduce the
original index's results exactly."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from lucene_spark.fixtures import make_corpus
from lucene_spark.index.builder import IndexBuilder, IndexConfig, assign_doc_ids
from lucene_spark.index.check import check_index
from lucene_spark.index.reader import SearchIndex
from lucene_spark.index.split import split_index
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.multi import MultiSearcher

N, CUT, DPC = 160, 64, 32


@pytest.fixture(scope="module")
def split_setup(tmp_path_factory, spark):
    pdf = make_corpus(n_docs=N, seed=41)
    df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
    base = tmp_path_factory.mktemp("ix_split")
    orig, lo, hi = str(base / "orig"), str(base / "lo"), str(base / "hi")
    cfg = IndexConfig(docs_per_chunk=DPC, term_buckets=2, positions=True)
    IndexBuilder(spark, cfg).build(df, orig, assign_ids=False)
    n_lo, n_hi = split_index(spark, orig, CUT, lo, hi)
    assert (n_lo, n_hi) == (CUT, N - CUT)
    # gold halves: independent builds over the corpus slices (the hi
    # slice re-assigned 0-based ids, the same renumbering the split does)
    gold_lo, gold_hi = str(base / "gold_lo"), str(base / "gold_hi")
    IndexBuilder(spark, cfg).build(
        df.filter(f"doc_id < {CUT}"), gold_lo, assign_ids=False
    )
    from pyspark.sql import functions as F

    IndexBuilder(spark, cfg).build(
        df.filter(f"doc_id >= {CUT}").withColumn("doc_id", F.col("doc_id") - CUT),
        gold_hi,
        assign_ids=False,
    )
    yield {k: v for k, v in locals().items() if isinstance(v, str)}
    shutil.rmtree(str(base), ignore_errors=True)


QUERIES = [
    A.TermQuery("return"),
    A.BooleanQuery(((A.Occur.MUST, A.TermQuery("if")), (A.Occur.SHOULD, A.TermQuery("int")))),
    A.PhraseQuery(("return", "if")),
    A.PrefixQuery("ret"),
]


class TestSplitHalves:
    def test_check_index_passes(self, spark, split_setup):
        for k in ("lo", "hi"):
            check_index(SearchIndex(spark, split_setup[k]))  # raises on failure

    @pytest.mark.parametrize("half", ["lo", "hi"])
    def test_half_equals_gold_rebuild(self, spark, split_setup, half):
        s_split = Searcher(SearchIndex(spark, split_setup[half]))
        s_gold = Searcher(SearchIndex(spark, split_setup[f"gold_{half}"]))
        for q in QUERIES:
            a = s_split.search(q, k=50).hits
            b = s_gold.search(q, k=50).hits
            assert [(d, round(x, 6)) for d, x in a] == [(d, round(x, 6)) for d, x in b], q

    @pytest.mark.parametrize("half", ["lo", "hi"])
    def test_postings_decode_equals_gold(self, spark, split_setup, half):
        """Per-term doc/tf/norm/position streams must be identical to a
        from-scratch build over the slice. Chunk LAYOUT may legitimately
        differ (a term hot in the original can be cold in the half), so
        chunks are merged per term before comparing."""
        from lucene_spark.codec.forutil import unpack_postings
        from lucene_spark.codec.positions import unpack_positions

        def stream(d):
            rows = spark.read.parquet(f"{d}/postings").select(
                "term", "chunk_id", "blob", "pos_blob"
            ).collect()
            per_term = {}
            for r in sorted(rows, key=lambda r: (r["term"], r["chunk_id"])):
                ids, tfs, norms = unpack_postings(bytes(r["blob"]))
                plists = (
                    [p.tolist() for p in unpack_positions(bytes(r["pos_blob"]), tfs)]
                    if r["pos_blob"] is not None
                    else [[]] * len(ids)
                )
                per_term.setdefault(r["term"], []).extend(
                    zip(ids.tolist(), tfs.tolist(), norms.tolist(), plists)
                )
            return {t: sorted(v) for t, v in per_term.items()}

        assert stream(split_setup[half]) == stream(split_setup[f"gold_{half}"])

    def test_stats_equal_gold(self, spark, split_setup):
        for half in ("lo", "hi"):
            a = SearchIndex(spark, split_setup[half]).stats
            b = SearchIndex(spark, split_setup[f"gold_{half}"]).stats
            assert (a.doc_count, a.sum_total_term_freq) == (b.doc_count, b.sum_total_term_freq)


class TestComposition:
    def test_multireader_equals_original(self, spark, split_setup):
        orig = Searcher(SearchIndex(spark, split_setup["orig"]))
        multi = MultiSearcher(
            [SearchIndex(spark, split_setup["lo"]), SearchIndex(spark, split_setup["hi"])]
        )
        for q in QUERIES:
            a = orig.search(q, k=30).hits
            b = multi.search(q, k=30).hits
            assert [(d, round(x, 6)) for d, x in a] == [(d, round(x, 6)) for d, x in b], q


class TestErrors:
    def test_cut_not_on_chunk_boundary(self, spark, split_setup, tmp_path):
        with pytest.raises(ValueError, match="multiple of docs_per_chunk"):
            split_index(spark, split_setup["orig"], CUT + 1, str(tmp_path / "a"), str(tmp_path / "b"))

    def test_deleted_index_rejected(self, spark, split_setup, tmp_path):
        from lucene_spark.index.deletes import delete_docs

        d = str(tmp_path / "del")
        shutil.copytree(split_setup["orig"], d)
        delete_docs(spark, d, [0])
        with pytest.raises(ValueError, match="deletes"):
            split_index(spark, d, CUT, str(tmp_path / "a"), str(tmp_path / "b"))


class TestMultiField:
    def test_extra_field_stats(self, spark, tmp_path_factory):
        from pyspark.sql import functions as F

        pdf = make_corpus(n_docs=96, seed=5)
        df = assign_doc_ids(spark.createDataFrame(pdf).drop("content_sha256"))
        df = df.withColumn(
            "title", F.array_join(F.slice(F.split(F.col("content"), " "), 1, 4), " ")
        )
        base = tmp_path_factory.mktemp("ix_split_mf")
        orig, lo, hi = str(base / "o"), str(base / "l"), str(base / "h")
        cfg = IndexConfig(docs_per_chunk=32, term_buckets=2, extra_fields=("title",))
        IndexBuilder(spark, cfg).build(df, orig, assign_ids=False)
        split_index(spark, orig, 32, lo, hi)
        o = SearchIndex(spark, orig)
        l_, h = SearchIndex(spark, lo), SearchIndex(spark, hi)
        for f in ("content", "title"):
            so, sl, sh = o.stats_for(f), l_.stats_for(f), h.stats_for(f)
            assert sl.sum_total_term_freq + sh.sum_total_term_freq == so.sum_total_term_freq
            assert sl.doc_count + sh.doc_count == so.doc_count
        # extra-field postings split correctly: each half's title match
        # set is exactly the original's, restricted to its doc range
        # (MultiSearchIndex composition is single-field by contract, so
        # the comparison is at the match-set level here)
        q = A.TermQuery("return", field="title")
        orig_ids = {d for d, _ in Searcher(o).search(q, k=10**6).hits}
        lo_ids = {d for d, _ in Searcher(l_).search(q, k=10**6).hits}
        hi_ids = {d for d, _ in Searcher(h).search(q, k=10**6).hits}
        assert lo_ids == {d for d in orig_ids if d < 32}
        assert hi_ids == {d - 32 for d in orig_ids if d >= 32}
        shutil.rmtree(str(base), ignore_errors=True)
