"""LSH band-bucket size cap: a degenerate bucket (mass-duplicated
boilerplate) must not blow up into O(|bucket|^2) candidate rows, and
the cap must never be silent — the stats relation quantifies dropped
candidate mass. Recall contract: byte-identical mass goes through
exact_duplicates FIRST; the cap trades sampled recall only on the
residual near-identical template mass, and every surviving pair is
still exact-verified."""

import pytest
from pyspark.sql import functions as F


class TestBandBucketCap:
    def test_cap_bounds_members_and_reports_dropped(self, spark):
        from lucene_spark.pipeline.dedup import band_bucket_cap

        # one degenerate bucket of 9000 + one small bucket of 50
        big = spark.range(9000).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit("hot").alias("key")
        )
        small = spark.range(50).select(
            (F.col("id") + 100000).alias("doc_id"),
            F.lit(1).alias("band"),
            F.lit("cold").alias("key"),
        )
        banded = big.unionByName(small)
        capped, stats = band_bucket_cap(banded, max_bucket=500)
        by_bucket = {
            (r["band"], r["key"]): r["n"]
            for r in capped.groupBy("band", "key").agg(F.count("*").alias("n")).collect()
        }
        # hash thinning keeps an EXPECTED max_bucket members; allow 3x
        assert by_bucket[(0, "hot")] <= 1500
        assert by_bucket[(0, "hot")] >= 100
        # under-cap buckets pass through untouched
        assert by_bucket[(1, "cold")] == 50
        st = {(r["band"], r["key"]): r for r in stats.collect()}
        assert set(st) == {(0, "hot")}
        r = st[(0, "hot")]
        assert r["size"] == 9000
        assert r["kept"] == by_bucket[(0, "hot")]
        assert r["dropped"] == 9000 - r["kept"]

    def test_cap_none_is_passthrough_with_empty_stats(self, spark):
        from lucene_spark.pipeline.dedup import band_bucket_cap

        banded = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit("k").alias("key")
        )
        capped, stats = band_bucket_cap(banded, None)
        assert capped.count() == 100
        assert stats.count() == 0

    def test_thinning_is_deterministic(self, spark):
        from lucene_spark.pipeline.dedup import band_bucket_cap

        banded = spark.range(5000).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit("h").alias("key")
        )
        a, _ = band_bucket_cap(banded, 300)
        b, _ = band_bucket_cap(banded, 300)
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )


class TestMinhashAdversarial:
    @pytest.fixture(scope="class")
    def template_docs(self, spark):
        # 3000 near-identical docs: a long shared template + a tiny
        # per-doc suffix -> every doc lands in the SAME band buckets
        template = " ".join(f"boiler{w}" for w in range(60))
        rows = [(i, f"{template} tail{i % 7}") for i in range(3000)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_candidates_bounded_and_mass_reported(self, spark, template_docs):
        from lucene_spark.pipeline.dedup import minhash_lsh_pairs

        pairs, stats = minhash_lsh_pairs(
            template_docs, threshold=0.5, max_bucket=50, return_stats=True
        )
        st = stats.agg(
            F.sum("dropped").alias("dropped"), F.sum("kept").alias("kept")
        ).collect()[0]
        # the degenerate buckets were actually capped, and said so
        assert st["dropped"] and st["dropped"] > 0
        assert st["kept"] and st["kept"] <= 50 * 3 * 32  # ~max_bucket per band
        # surviving pairs are still exact-verified true near-dups
        got = pairs.limit(20).collect()
        assert all(r["jaccard"] >= 0.5 for r in got)

    def test_uncapped_small_corpus_unchanged(self, spark, template_docs):
        # cap >> bucket size: output identical to the uncapped op
        from lucene_spark.pipeline.dedup import minhash_lsh_pairs

        sample = template_docs.filter(F.col("doc_id") < 40)
        capped = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(sample, threshold=0.5, max_bucket=10_000).collect()
        }
        uncapped = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(sample, threshold=0.5, max_bucket=None).collect()
        }
        assert capped == uncapped and len(capped) > 0


class TestEmbeddingAdversarial:
    def test_degenerate_embedding_mass_capped(self, spark):
        import numpy as np

        from lucene_spark.pipeline.similarity import embedding_near_dup

        rng = np.random.default_rng(3)
        base = rng.normal(size=8)
        rows = [
            (i, (base + rng.normal(scale=1e-3, size=8)).tolist()) for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs, stats = embedding_near_dup(
            df, threshold=0.99, mode="lsh", max_bucket=40, return_stats=True
        )
        st = stats.agg(F.sum("dropped").alias("d")).collect()[0]
        assert st["d"] and st["d"] > 0
        got = pairs.limit(10).collect()
        assert all(r["sim"] >= 0.99 for r in got)

    def test_exact_mode_stats_empty(self, spark):
        from lucene_spark.pipeline.similarity import embedding_near_dup

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.01])], "vec_id long, embedding array<double>"
        )
        pairs, stats = embedding_near_dup(df, 0.9, mode="exact", return_stats=True)
        assert stats.count() == 0 and pairs.count() == 1
