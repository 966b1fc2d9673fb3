"""HNSW graph ANN (pipeline/hnsw.py) vs brute-force cosine.

Contracts: the full-recall parameterization (ef >= shard size) is
EXACTLY brute force; the graph path at documented ef/M reaches
recall@10 >= 0.95 on the fixture embeddings; builds are deterministic
functions of (vectors, parameters)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(29)
    # clustered vectors (ANN-realistic): 8 centers + noise
    centers = rng.normal(size=(8, 32))
    rows = []
    for i in range(600):
        v = centers[i % 8] + rng.normal(scale=0.35, size=32)
        rows.append((i, v.astype(np.float32).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def graph_df(spark, emb_df, tmp_path_factory):
    from lucene_spark.pipeline.hnsw import build_hnsw

    d = str(tmp_path_factory.mktemp("hnsw"))
    build_hnsw(emb_df, d, n_shards=4, m=8, ef_construction=64)
    return spark.read.parquet(d)


def _queries(emb_df):
    return emb_df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _brute(emb_df, k):
    from lucene_spark.pipeline.similarity import brute_cosine_topk

    return {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
        for r in brute_cosine_topk(emb_df, _queries(emb_df), k=k).collect()
    }


class TestHnsw:
    def test_full_parameterization_equals_brute(self, spark, emb_df, graph_df):
        from lucene_spark.pipeline.hnsw import hnsw_cosine_topk

        got = {
            (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
            for r in hnsw_cosine_topk(graph_df, _queries(emb_df), k=5, ef=10**6).collect()
        }
        want = _brute(emb_df, 5)
        assert set(got) == set(want)
        for key in want:
            assert got[key][0] == want[key][0], key
            assert abs(got[key][1] - want[key][1]) < 1e-9, key

    def test_graph_recall_at_10(self, spark, emb_df, graph_df):
        from lucene_spark.pipeline.hnsw import hnsw_cosine_topk

        got = hnsw_cosine_topk(graph_df, _queries(emb_df), k=10, ef=64).collect()
        by_q: dict = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        want = _brute(emb_df, 10)
        truth: dict = {}
        for (q, _rk), (v, _s) in want.items():
            truth.setdefault(q, set()).add(v)
        recalls = [
            len(by_q.get(q, set()) & vs) / len(vs) for q, vs in truth.items()
        ]
        assert sum(recalls) / len(recalls) >= 0.95, recalls

    def test_build_deterministic(self, spark, emb_df, tmp_path_factory):
        from lucene_spark.pipeline.hnsw import build_hnsw

        d1 = str(tmp_path_factory.mktemp("h1"))
        d2 = str(tmp_path_factory.mktemp("h2"))
        build_hnsw(emb_df.repartition(7), d1, n_shards=4, m=8, ef_construction=64)
        build_hnsw(emb_df.repartition(3), d2, n_shards=4, m=8, ef_construction=64)
        a = spark.read.parquet(d1).orderBy("shard", "idx").collect()
        b = spark.read.parquet(d2).orderBy("shard", "idx").collect()
        assert [(r["shard"], r["idx"], r["vec_id"], r["level"], r["nbrs"]) for r in a] == [
            (r["shard"], r["idx"], r["vec_id"], r["level"], r["nbrs"]) for r in b
        ]

    def test_level_zero_connected(self, spark, graph_df):
        # every node reachable from the shard entry at level 0 — the
        # property the descent relies on
        for shard_rows in [
            [r for r in graph_df.collect() if r["shard"] == s] for s in range(4)
        ]:
            if not shard_rows:
                continue
            adj: dict = {}
            for r in shard_rows:
                adj[r["idx"]] = set(r["nbrs"][0]) if r["nbrs"] else set()
            for r in shard_rows:
                for lev, lst in enumerate(r["nbrs"]):
                    if lev == 0:
                        for x in lst:
                            adj.setdefault(x, set()).add(r["idx"])
                            adj[r["idx"]].add(x)
            start = next(iter(adj))
            seen = {start}
            stack = [start]
            while stack:
                for nb in adj.get(stack.pop(), ()):
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            assert len(seen) == len(adj)


class TestFilteredHnsw:
    """The pre-filter/acceptDocs contract (KnnVectorQuery.searchLeaf):
    <=k accepted per shard -> exact; else filtered graph walk with
    visitedLimit = accepted cardinality and exact fallback."""

    def _brute_filtered(self, emb_df, accept_ids, k):
        from pyspark.sql import functions as F

        from lucene_spark.pipeline.similarity import brute_cosine_topk

        sub = emb_df.filter(F.col("vec_id").isin(list(accept_ids)))
        return {
            (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
            for r in brute_cosine_topk(sub, _queries(emb_df), k=k).collect()
        }

    def test_filtered_full_param_equals_brute(self, spark, emb_df, graph_df):
        from lucene_spark.pipeline.hnsw import hnsw_cosine_topk

        accept_ids = set(range(0, 600, 3))
        acc = spark.createDataFrame([(i,) for i in accept_ids], "vec_id long")
        got = {
            (r["query_id"], r["rank"]): (r["vec_id"], r["sim"])
            for r in hnsw_cosine_topk(
                graph_df, _queries(emb_df), k=5, ef=10**6, accept=acc
            ).collect()
        }
        want = self._brute_filtered(emb_df, accept_ids, 5)
        # brute runs on the filtered corpus, so queries outside the
        # accept set never self-exclude there; compare on vec_ids
        assert {k_: v[0] for k_, v in got.items()} == {
            k_: v[0] for k_, v in want.items()
        }

    def test_highly_selective_filter_is_exact(self, spark, emb_df, graph_df):
        # <= k accepted per shard -> the short-circuit exact path; must
        # equal brute-filtered even at tiny ef
        from lucene_spark.pipeline.hnsw import hnsw_cosine_topk

        accept_ids = {11, 47, 101, 203, 305, 407, 509, 599}
        acc = spark.createDataFrame([(i,) for i in accept_ids], "vec_id long")
        got = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in hnsw_cosine_topk(
                graph_df, _queries(emb_df), k=5, ef=8, accept=acc
            ).collect()
        }
        want = {
            k_: v[0] for k_, v in self._brute_filtered(emb_df, accept_ids, 5).items()
        }
        assert got == want

    def test_visited_limit_fallback_is_exact(self, spark, emb_df, graph_df):
        # card just above k per shard: the walk scores more nodes than
        # the limit -> exact fallback; results must equal brute-filtered
        from lucene_spark.pipeline.hnsw import hnsw_cosine_topk

        accept_ids = set(range(0, 600, 17))  # ~36 total, ~9/shard > k=5
        acc = spark.createDataFrame([(i,) for i in accept_ids], "vec_id long")
        got = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in hnsw_cosine_topk(
                graph_df, _queries(emb_df), k=5, ef=16, accept=acc
            ).collect()
        }
        want = {
            k_: v[0] for k_, v in self._brute_filtered(emb_df, accept_ids, 5).items()
        }
        assert got == want

    def test_moderate_filter_graph_recall(self, spark, emb_df, graph_df):
        from lucene_spark.pipeline.hnsw import hnsw_cosine_topk

        accept_ids = set(range(0, 600, 2))  # half the corpus
        acc = spark.createDataFrame([(i,) for i in accept_ids], "vec_id long")
        got = hnsw_cosine_topk(
            graph_df, _queries(emb_df), k=10, ef=64, accept=acc
        ).collect()
        by_q: dict = {}
        for r in got:
            assert r["vec_id"] in accept_ids  # filter honored
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        want = self._brute_filtered(emb_df, accept_ids, 10)
        truth: dict = {}
        for (q, _rk), (v, _s) in want.items():
            truth.setdefault(q, set()).add(v)
        recalls = [len(by_q.get(q, set()) & vs) / len(vs) for q, vs in truth.items()]
        assert sum(recalls) / len(recalls) >= 0.9, recalls
