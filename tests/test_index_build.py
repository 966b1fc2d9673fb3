"""Index build invariants — the CheckIndex role
(lucene/core/src/java/org/apache/lucene/index/CheckIndex.java:529,999,2389):
every posting list re-read and cross-checked against independent
ground truth, stats reconciled, plus the north-rule per-row invariant
(content sha256 parity with the source table)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis import tokenize
from lucene_spark.codec.forutil import unpack_postings
from lucene_spark.codec.smallfloat import int_to_byte4


@pytest.fixture(scope="module")
def decoded_postings(search_index):
    rows = search_index.postings.collect()
    out = {}
    for r in rows:
        d, t, n = unpack_postings(bytes(r["blob"]))
        out.setdefault(r["term"], []).append((r["chunk_id"], d, t, n, r))
    for term in out:
        out[term].sort(key=lambda x: x[0])
    return out


@pytest.fixture(scope="module")
def ground_truth(corpus_pdf):
    """Independent inversion in pure Python over the fixture corpus."""
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    postings = {}
    dls = {}
    for doc_id, content in enumerate(ordered["content"]):
        toks = tokenize(content)
        dls[doc_id] = len(toks)
        for t in toks:
            postings.setdefault(t, {}).setdefault(doc_id, 0)
            postings[t][doc_id] += 1
    return ordered, postings, dls


def test_doc_ids_are_rank_over_keys(search_index, ground_truth):
    ordered, _, _ = ground_truth
    docs = search_index.docs.orderBy("doc_id").collect()
    assert len(docs) == len(ordered)
    for r in docs:
        i = r["doc_id"]
        assert r["repo"] == ordered.loc[i, "repo"]
        assert r["path"] == ordered.loc[i, "path"]
        assert r["commit"] == ordered.loc[i, "commit"]
    ids = [r["doc_id"] for r in docs]
    assert ids == list(range(len(ordered)))


def test_content_sha256_parity(search_index, ground_truth):
    """North-rule per-row invariant (BASELINE.json input_hint)."""
    ordered, _, _ = ground_truth
    rows = search_index.docs.orderBy("doc_id").collect()
    for r in rows:
        expected = hashlib.sha256(ordered.loc[r["doc_id"], "content"].encode()).hexdigest()
        assert r["content_sha256"] == expected
        assert r["content_sha256"] == ordered.loc[r["doc_id"], "content_sha256"]


def test_norms_match_token_counts(search_index, ground_truth):
    _, _, dls = ground_truth
    rows = search_index.norms.collect()
    assert len(rows) == len(dls)
    for r in rows:
        assert r["dl"] == dls[r["doc_id"]]
        assert r["norm"] == int_to_byte4(dls[r["doc_id"]])


def test_postings_match_ground_truth(decoded_postings, ground_truth):
    _, postings, dls = ground_truth
    assert set(decoded_postings) == set(postings)
    for term, chunks in decoded_postings.items():
        docs = np.concatenate([c[1] for c in chunks])
        tfs = np.concatenate([c[2] for c in chunks])
        norms = np.concatenate([c[3] for c in chunks])
        assert (np.diff(docs) > 0).all(), f"{term}: doc ids not strictly increasing"
        truth = postings[term]
        assert len(docs) == len(truth), term
        for d, tf, nm in zip(docs, tfs, norms):
            assert truth[int(d)] == tf, (term, d)
            assert nm == int_to_byte4(dls[int(d)])


def test_term_stats_consistent(search_index, decoded_postings):
    rows = {r["term"]: (r["df"], r["ttf"]) for r in search_index.term_stats_df.collect()}
    for term, chunks in decoded_postings.items():
        df = sum(len(c[1]) for c in chunks)
        ttf = sum(int(c[2].sum()) for c in chunks)
        assert rows[term] == (df, ttf), term
        # chunk-row df/ttf columns agree with blob contents
        for _, d, t, _, r in chunks:
            assert r["df"] == len(d)
            assert r["ttf"] == int(t.sum())


def test_collection_stats(search_index, ground_truth):
    _, _, dls = ground_truth
    stats = search_index.stats
    assert stats.doc_count == len(dls)
    assert stats.sum_total_term_freq == sum(dls.values())


def test_hot_terms_are_chunked(search_index):
    """docs_per_chunk=128 in conftest → hot terms must split into
    doc-range chunks with bounded row sizes (the skew-salting path)."""
    rows = search_index.postings.groupBy("term").agg(
        F.count("*").alias("n_chunks"), F.max("df").alias("max_df"), F.sum("df").alias("df")
    ).collect()
    hot = [r for r in rows if r["df"] > 128]
    assert hot, "fixture corpus should contain hot terms (return/int/...)"
    for r in hot:
        assert r["n_chunks"] > 1, f"hot term {r['term']} not chunked"
    for r in rows:
        assert r["max_df"] <= 128, "chunk row exceeds docs_per_chunk bound"


def test_manifest_vocab_metrics(search_index):
    """Build observability: terms/partition + skew-salting metrics in
    the manifest (docs/sec is asserted non-null alongside)."""
    m = search_index.manifest
    assert m["docs_per_sec"] > 0
    v = m["vocab"]
    tp = v["terms_per_partition"]
    assert tp["buckets"] == 4 and tp["min"] <= tp["avg"] <= tp["max"]
    # per-bucket counts must sum back to the vocabulary
    assert v["terms_total"] >= tp["max"]
    # the fixture corpus has hot terms (df > docs_per_chunk=128)
    assert v["hot_terms_chunked"] > 0
    assert v["max_chunks_per_term"] == -(-v["max_df"] // 128)
    # chunking metric agrees with the physical postings layout
    n_chunks = (
        search_index.postings.groupBy("term").count().agg(F.max("count")).first()[0]
    )
    assert v["max_chunks_per_term"] >= n_chunks


def test_impacts_are_pareto(search_index, decoded_postings):
    from lucene_spark.codec.impacts import block_impacts

    rows = search_index.postings.collect()
    for r in rows:
        d, t, n = unpack_postings(bytes(r["blob"]))
        expected = block_impacts(t, n.astype(np.int64))
        got = {}
        for b, f, nm in zip(r["imp_block"], r["imp_freq"], r["imp_norm"]):
            got.setdefault(b, []).append((f, nm))
        for b, imp in enumerate(expected):
            assert sorted(got.get(b, [])) == sorted(imp), (r["term"], b)


def test_build_is_input_partitioning_invariant(spark, corpus_df, tmp_path):
    """Cluster-size determinism: the SAME corpus built from 1 input
    partition and from 7 yields content-identical index tables (blobs
    included). At 1000 executors a retried/rescaled build must produce
    the same index — chunk assignment keys on doc_id, packing is
    deterministic per (term, chunk), nothing depends on task layout."""
    from lucene_spark.index.builder import IndexBuilder, IndexConfig

    cfg = IndexConfig(docs_per_chunk=64, term_buckets=4, positions=True)
    d1, d7 = str(tmp_path / "p1"), str(tmp_path / "p7")
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256").repartition(1), d1)
    IndexBuilder(spark, cfg).build(corpus_df.drop("content_sha256").repartition(7), d7)

    def snap(d, sub, key):
        df = spark.read.parquet(f"{d}/{sub}")
        rows = [tuple(r) for r in df.select(*sorted(df.columns)).collect()]
        return sorted(
            tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else
                  (tuple(v) if isinstance(v, list) else v) for v in row)
            for row in rows
        )

    for sub in ("postings", "norms", "collection_stats", "docs"):
        assert snap(d1, sub, sub) == snap(d7, sub, sub), sub
