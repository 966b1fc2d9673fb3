"""Training-data pipeline operators: dedup, similarity, textstats,
multimodal — brute-force oracles in pure python/numpy."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.tokenizer import tokenize


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def docs_pdf(docs_df):
    return docs_df.toPandas().sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _shingle_set(text: str, n: int = 5) -> set:
    toks = tokenize(text)
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_jaccard_pairs(pdf, threshold: float) -> dict[tuple[int, int], float]:
    sh = {r.doc_id: _shingle_set(r.text) for r in pdf.itertuples()}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sh.items(), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter:
            j = inter / len(sa | sb)
            if j >= threshold:
                out[(min(a, b), max(a, b))] = j
    return out


class TestDedup:
    def test_exact_duplicates(self, spark):
        from lucene_spark.pipeline import exact_duplicates

        df = spark.createDataFrame(
            [(0, "a b c"), (1, "a b c"), (2, "x y"), (3, "a b c")], "doc_id long, text string"
        )
        rows = {r["rep_id"]: r["n_dups"] for r in exact_duplicates(df).collect()}
        assert rows == {0: 3, 2: 1}

    def test_jaccard_pairs_vs_brute(self, spark, docs_df, docs_pdf):
        from lucene_spark.pipeline import jaccard_pairs

        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs(docs_df, threshold=0.5).collect()
        }
        want = _brute_jaccard_pairs(docs_pdf, 0.5)
        assert set(got) == set(want)
        for k in got:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_fnv1a64_batch_matches_scalar_definition(self):
        import numpy as np

        from lucene_spark.pipeline.dedup import _fnv1a64_batch

        def scalar(s: str) -> int:
            h = 0xCBF29CE484222325
            for c in s.encode():
                h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h

        toks = np.array(["", "a", "abc", "hello world", "x" * 40, "0 1 2 3 4"])
        got = _fnv1a64_batch(toks)
        assert [int(v) for v in got] == [scalar(t) for t in toks]

    def test_hot_shingle_cap_keeps_identical_docs(self, spark):
        """Restricted Jaccard: sizes come from the SAME hot-filtered
        shingle space as the intersections, so two identical docs
        score 1.0 even when their shared shingles are df-capped."""
        from lucene_spark.pipeline import jaccard_pairs

        hot = " common boilerplate words repeated across every document in this corpus"
        uniq = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight",
            "red green blue cyan magenta yellow black white",
        ]
        # three pairs of identical docs; the hot tail's shingles have
        # df=6 (> cap) and get filtered, each pair's unique shingles
        # have df=2 and survive
        rows = [(2 * i + j, u + hot) for i, u in enumerate(uniq) for j in (0, 1)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs(df, threshold=0.9, max_shingle_df=3).collect()
        }
        assert set(got) == {(0, 1), (2, 3), (4, 5)}
        assert all(v == pytest.approx(1.0) for v in got.values())

    def test_minhash_lsh_equals_exact(self, spark, docs_df, docs_pdf):
        from lucene_spark.pipeline import minhash_lsh_pairs

        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(docs_df, threshold=0.5).collect()
        }
        want = _brute_jaccard_pairs(docs_pdf, 0.5)
        assert set(got) == set(want)

    def test_simhash_identical_docs_zero_distance(self, spark):
        from lucene_spark.pipeline import simhash_pairs

        df = spark.createDataFrame(
            [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"), (2, "zz yy xx ww vv uu")],
            "doc_id long, text string",
        )
        rows = simhash_pairs(df, max_hamming=3).collect()
        assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in rows} == {(0, 1, 0)}

    def test_simhash_finds_near_dups(self, spark, docs_df):
        from lucene_spark.pipeline import simhash_pairs

        rows = simhash_pairs(docs_df, max_hamming=3).collect()
        # the corpus has 25 planted near-dup pairs at jaccard ~0.98;
        # simhash(64-bit, hamming<=3) should find a majority of them
        assert len(rows) >= 10
        for r in rows:
            assert r["doc_a"] < r["doc_b"] and r["hamming"] <= 3


class TestSimilarity:
    def test_brute_cosine_vs_numpy(self, spark, emb_df):
        from lucene_spark.pipeline import brute_cosine_topk

        queries = emb_df.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = brute_cosine_topk(emb_df, queries, k=5).collect()

        pdf = emb_df.toPandas().sort_values("vec_id")
        m = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
        ids = pdf["vec_id"].to_numpy()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        for q in range(4):
            order = sorted(
                ((float(sims[q, j]), int(ids[j])) for j in range(len(ids)) if ids[j] != q),
                key=lambda t: (-t[0], t[1]),
            )[:5]
            mine = sorted(
                [(r["rank"], r["vec_id"], r["sim"]) for r in got if r["query_id"] == q]
            )
            assert [v for _, v, _ in mine] == [v for _, v in order]
            for (_, _, s), (sw, _) in zip(mine, order):
                assert s == pytest.approx(sw, rel=1e-9)

    def test_lsh_subset_of_true_ranking(self, spark, emb_df):
        from lucene_spark.pipeline import lsh_cosine_topk

        queries = emb_df.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rows = lsh_cosine_topk(emb_df, queries, k=5).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["vec_id"] != r["query_id"]
            assert -1.0001 <= r["sim"] <= 1.0001


class TestEmbeddingNearDup:
    def _numpy_pairs(self, emb_df, threshold):
        pdf = emb_df.toPandas().sort_values("vec_id")
        m = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
        ids = pdf["vec_id"].to_numpy()
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        return {
            (int(ids[i]), int(ids[j])): float(sims[i, j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if sims[i, j] >= threshold
        }

    def test_exact_pairs_vs_numpy(self, spark, emb_df):
        from lucene_spark.pipeline import embedding_near_dup

        got = {
            (r["doc_a"], r["doc_b"]): r["sim"]
            for r in embedding_near_dup(emb_df, threshold=0.45, mode="exact").collect()
        }
        want = self._numpy_pairs(emb_df, 0.45)
        assert set(got) == set(want)
        for k, v in got.items():
            assert v == pytest.approx(want[k], rel=1e-9)

    def test_lsh_equals_exact_on_planted_dups(self, spark):
        # planted near-dups: 40 base vectors, each with a perturbed copy
        # at cosine >= 0.95; LSH-banded path must find every pair the
        # exact path finds at threshold 0.9
        rng = np.random.default_rng(3)
        base = rng.standard_normal((40, 32))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        near = base + 0.04 * rng.standard_normal((40, 32))  # noise norm ~0.23 → cos ~0.97
        rows = [(i, base[i].tolist()) for i in range(40)] + [
            (100 + i, near[i].tolist()) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        from lucene_spark.pipeline import embedding_near_dup

        exact = {
            (r["doc_a"], r["doc_b"]) for r in embedding_near_dup(df, 0.9, mode="exact").collect()
        }
        lsh = {(r["doc_a"], r["doc_b"]) for r in embedding_near_dup(df, 0.9, mode="lsh").collect()}
        assert len(exact) >= 30  # the planting worked
        assert lsh == exact


class TestIVF:
    def test_full_probe_equals_brute(self, spark, emb_df):
        from lucene_spark.pipeline import brute_cosine_topk, ivf_cosine_topk

        queries = emb_df.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        brute = [
            (r["query_id"], r["rank"], r["vec_id"])
            for r in brute_cosine_topk(emb_df, queries, k=5).collect()
        ]
        full = [
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ivf_cosine_topk(emb_df, queries, k=5, n_centroids=8, n_probe=8).collect()
        ]
        assert sorted(full) == sorted(brute)

    def test_partial_probe_recall(self, spark, emb_df):
        from lucene_spark.pipeline import brute_cosine_topk, ivf_cosine_topk

        queries = emb_df.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        brute = {
            (r["query_id"], r["vec_id"]) for r in brute_cosine_topk(emb_df, queries, k=5).collect()
        }
        ivf = {
            (r["query_id"], r["vec_id"])
            for r in ivf_cosine_topk(emb_df, queries, k=5, n_centroids=8, n_probe=3).collect()
        }
        # probing 3/8 clusters must still recover most true neighbors,
        # and every returned sim must be a true cosine (verified exact)
        assert len(ivf & brute) / len(brute) >= 0.5
        assert len(ivf) == len(brute)  # k results per query either way


class TestTextStats:
    def test_quality_metrics(self, spark, docs_df, docs_pdf):
        from lucene_spark.pipeline import quality_metrics

        got = {r["doc_id"]: r for r in quality_metrics(docs_df).collect()}
        for rec in docs_pdf.head(25).itertuples():
            toks = tokenize(rec.text)
            r = got[rec.doc_id]
            assert r["n_tokens"] == len(toks)
            assert r["n_chars"] == len(rec.text)
            assert r["avg_token_len"] == pytest.approx(sum(map(len, toks)) / len(toks), abs=1e-4)
            assert r["ttr"] == pytest.approx(len(set(toks)) / len(toks), abs=1e-4)

    def test_language_id(self, spark, docs_df, docs_pdf):
        from lucene_spark.pipeline import language_id

        got = {r["doc_id"]: r for r in language_id(docs_df).collect()}
        from lucene_spark.pipeline.textstats import EN_STOPWORDS

        for rec in docs_pdf.head(25).itertuples():
            toks = tokenize(rec.text)
            ratio = sum(t in EN_STOPWORDS for t in toks) / len(toks)
            r = got[rec.doc_id]
            assert r["en_ratio"] == pytest.approx(ratio, abs=1e-4)
            assert r["pred_lang"] == ("en" if ratio >= 0.05 else "unknown")

    def test_token_counts_and_fingerprints(self, spark, docs_df, docs_pdf):
        import hashlib

        from lucene_spark.pipeline import fingerprints, token_counts

        tc = {r["doc_id"]: r for r in token_counts(docs_df).collect()}
        fp = {r["doc_id"]: r["fp"] for r in fingerprints(docs_df).collect()}
        for rec in docs_pdf.head(25).itertuples():
            toks = tokenize(rec.text)
            assert tc[rec.doc_id]["an_tokens"] == len(toks)
            assert tc[rec.doc_id]["ws_tokens"] == len(rec.text.split())
            assert tc[rec.doc_id]["bpe_est"] == sum(-(-len(t) // 4) for t in toks)
            assert fp[rec.doc_id] == hashlib.md5(" ".join(toks).encode()).hexdigest()


class TestMultimodal:
    def test_metadata_real_header_decode(self, spark, docs_df):
        from lucene_spark.pipeline.multimodal import extract_metadata, with_payload

        payloads = with_payload(docs_df)
        a = sorted(tuple(r) for r in extract_metadata(payloads).collect())
        b = sorted(tuple(r) for r in extract_metadata(payloads).collect())
        assert a == b
        for r in extract_metadata(payloads).collect():
            did = r["doc_id"]
            assert r["kind"] in ("image", "audio", "video")
            assert r["n_bytes"] > 0
            if r["kind"] == "image":
                # dimensions parsed from the ACTUAL PNG/JPEG header
                assert r["format"] == ("png" if did % 6 == 0 else "jpeg")
                assert r["width"] == did % 640 + 1
                assert r["height"] == did % 480 + 1
                assert r["n_frames"] == 1 and r["sample_rate"] == 0
            elif r["kind"] == "audio":
                assert r["format"] == "wav"
                assert r["sample_rate"] == 8000 + (did % 8) * 1000
                assert r["n_frames"] == (r["n_bytes"] - 44) // 2
            else:
                # duration/dimensions parsed from the ACTUAL MP4 boxes
                assert r["format"] == "mp4"
                assert r["n_frames"] == did % 240 + 24
                assert r["width"] == did % 1920 + 16
                assert r["height"] == did % 1080 + 16

    def test_decoders_roundtrip_and_reject_garbage(self):
        from lucene_spark.pipeline.media import (
            decode_image,
            decode_wav,
            jpeg_bytes,
            png_bytes,
            wav_bytes,
        )

        assert decode_image(png_bytes(640, 123, b"xx")) == ("png", 640, 123)
        assert decode_image(jpeg_bytes(31, 4095)) == ("jpeg", 31, 4095)
        assert decode_image(b"not an image") is None
        assert decode_image(b"\xff\xd8\x00\x00garbage") is None
        assert decode_wav(wav_bytes(44100, b"\x00" * 10)) == (44100, 1, 16, 5)
        assert decode_wav(b"RIFFxxxx") is None
        # GIF + BMP headers parse too
        import struct

        gif = b"GIF89a" + struct.pack("<HH", 320, 200)
        assert decode_image(gif) == ("gif", 320, 200)
        bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 77, -55) + b"\x00" * 4
        assert decode_image(bmp) == ("bmp", 77, 55)

    def test_mp4_roundtrip_and_reject_garbage(self):
        from lucene_spark.pipeline.media import decode_mp4, mp4_bytes

        b = mp4_bytes(1920, 1080, 240, b"mdat-payload")
        assert len(b) == 244 + len(b"mdat-payload")  # closed-form size
        assert decode_mp4(b) == (24, 240, 1920, 1080)
        assert decode_mp4(b"not a video") is None
        assert decode_mp4(b"\x00\x00\x00\x14ftypisom") is None  # truncated

    def test_frame_sample_video_only(self, spark, docs_df):
        from lucene_spark.pipeline.multimodal import frame_sample, with_payload

        payloads = with_payload(docs_df.limit(60))
        video_ids = {r["doc_id"] for r in payloads.filter(F.col("kind") == "video").collect()}
        rows = frame_sample(payloads).collect()
        assert {r["doc_id"] for r in rows} <= video_ids
        assert all(len(r["frame_bytes"]) > 0 for r in rows)
        # frame count follows the MP4 header: every_n=8 over did%240+24
        by_doc = {}
        for r in rows:
            by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
        for did, n in by_doc.items():
            want = -(-(did % 240 + 24) // 8)  # ceil(frames / 8)
            assert n == want, did


class TestDuplicateClusters:
    @staticmethod
    def _union_find(n_pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in n_pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    def test_random_graphs_vs_union_find(self, spark):
        import numpy as np
        from lucene_spark.pipeline.dedup import duplicate_clusters

        rng = np.random.default_rng(3)
        for _ in range(3):
            n = int(rng.integers(5, 40))
            m = int(rng.integers(1, 60))
            pairs = sorted(
                {
                    (int(min(a, b)), int(max(a, b)))
                    for a, b in rng.integers(0, n, (m, 2))
                    if a != b
                }
            )
            if not pairs:
                continue
            pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
            got = {
                r["doc_id"]: r["cluster"] for r in duplicate_clusters(pdf).collect()
            }
            assert got == self._union_find(pairs)

    def test_chain_diameter(self, spark):
        # worst case for label propagation: a path graph
        from lucene_spark.pipeline.dedup import duplicate_clusters

        pairs = [(i, i + 1) for i in range(12)]
        pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {r["doc_id"]: r["cluster"] for r in duplicate_clusters(pdf).collect()}
        assert got == {i: 0 for i in range(13)}

    def test_canonical_docs_keeps_reps_and_singletons(self, spark):
        from lucene_spark.pipeline.dedup import canonical_docs

        docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)], "doc_id long, text string")
        pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], "doc_a long, doc_b long")
        kept = sorted(r["doc_id"] for r in canonical_docs(docs, pairs).collect())
        # clusters {1,3,5} -> keep 1; {6,7} -> keep 6; singletons 0,2,4 kept
        assert kept == [0, 1, 2, 4, 6]


class TestRepetitionSignals:
    """Gopher repetition filters (Rae et al. 2021 Table A1) vs python
    brute force."""

    def test_matches_brute(self, spark):
        import re

        from lucene_spark.pipeline.textstats import repetition_signals

        rows = [
            (0, "aa bb\naa bb\ncc dd"),               # one duplicated line
            (1, "xx yy zz\nqq rr ss"),                 # no repetition
            (2, "go go go go"),                        # heavy 2-gram repeat
            (3, ""),                                   # empty doc
            (4, "one\none\none\ntwo"),                 # 3x same line
            (5, "solo"),                               # >0 token chars, no 2-gram → 0.0 not NULL
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
        for doc_id, text in rows:
            lines = [l for l in text.split("\n") if l]
            dl = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
            tot = sum(len(l) for l in lines)
            dist = sum(len(l) for l in set(lines))
            dlc = 1.0 - dist / tot if tot else 0.0
            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
            tok_chars = sum(len(t) for t in toks)
            grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            if grams and tok_chars:
                from collections import Counter

                c = Counter(grams)
                best = max(c.items(), key=lambda kv: (kv[1], kv[0]))
                tf = best[1] * (len(best[0]) - 1) / tok_chars
            else:
                tf = 0.0
            r = got[doc_id]
            assert abs(r["dup_line_frac"] - round(dl, 4)) < 1e-9, doc_id
            assert abs(r["dup_line_char_frac"] - round(dlc, 4)) < 1e-9, doc_id
            assert abs(r["top_ngram_char_frac"] - round(tf, 4)) < 1e-9, doc_id

    def test_fixture_corpus_runs(self, spark, corpus_pdf):
        from lucene_spark.pipeline.textstats import repetition_signals

        docs = corpus_pdf.reset_index().rename(columns={"index": "doc_id", "content": "text"})
        out = repetition_signals(spark.createDataFrame(docs[["doc_id", "text"]]))
        assert out.count() == len(docs)
        row = out.first()
        assert 0.0 <= row["top_ngram_char_frac"] <= 1.0


class TestSemanticDedup:
    """SemDeDup (Abbas et al. 2023 §2): within-cluster near-dup removal
    keeping the member LEAST similar to its centroid."""

    @staticmethod
    def _brute(vecs: dict[int, np.ndarray], cent: np.ndarray, thr: float):
        ct = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        unit = {
            i: v / max(np.linalg.norm(v), 1e-12) for i, v in vecs.items()
        }
        assign = {i: (int(np.argmax(ct @ u)), float((ct @ u).max())) for i, u in unit.items()}
        flags = {}
        for c in {a for a, _ in assign.values()}:
            members = sorted(
                (i for i in vecs if assign[i][0] == c),
                key=lambda i: (assign[i][1], i),
            )
            for j, b in enumerate(members):
                flags[b] = any(
                    float(unit[a] @ unit[b]) >= thr for a in members[:j]
                )
        return assign, flags

    def test_matches_brute_with_pinned_centroids(self, spark, emb_df):
        from lucene_spark.pipeline.similarity import semantic_dedup

        dim = len(emb_df.select("embedding").first()[0])
        rng = np.random.default_rng(5)
        cent = rng.normal(size=(4, dim))
        got = {
            r["vec_id"]: (r["cluster"], r["centroid_sim"], r["is_dup"])
            for r in semantic_dedup(emb_df, threshold=0.45, centroids=cent).collect()
        }
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()
        }
        assign, flags = self._brute(vecs, cent, 0.45)
        assert set(got) == set(vecs)
        for i in vecs:
            assert got[i][0] == assign[i][0], i
            assert abs(got[i][1] - assign[i][1]) < 1e-9, i
            assert got[i][2] == flags[i], i

    def test_planted_duplicate_flagged_keep_low(self, spark, emb_df):
        from lucene_spark.pipeline.similarity import semantic_dedup

        pdf = emb_df.limit(20).toPandas()
        base = np.asarray(pdf.loc[0, "embedding"], dtype=np.float32)
        rows = [(int(r.vec_id), list(map(float, r.embedding))) for r in pdf.itertuples()]
        rows.append((9999, list(map(float, base * np.float32(1.5)))))  # exact dup direction
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r for r in
               semantic_dedup(df, threshold=0.99, n_clusters=2, sample=21).collect()}
        a, b = out[int(pdf.loc[0, "vec_id"])], out[9999]
        # the pair is mutually >= 0.99: exactly ONE flagged, and it is
        # the one MORE similar to the centroid (keep-low survives)
        assert a["is_dup"] != b["is_dup"]
        dup, keep = (a, b) if a["is_dup"] else (b, a)
        assert dup["centroid_sim"] >= keep["centroid_sim"]

    def test_trained_path_runs_and_is_deterministic(self, spark, emb_df):
        from lucene_spark.pipeline.similarity import semantic_dedup

        r1 = sorted(map(tuple, semantic_dedup(emb_df, threshold=0.45, n_clusters=4).collect()))
        r2 = sorted(map(tuple, semantic_dedup(
            emb_df.repartition(7), threshold=0.45, n_clusters=4).collect()))
        # partitioning-invariant decisions (sampling is id-ordered);
        # centroid_sim itself may move a last ulp with Arrow batch
        # shape (BLAS blocked-summation order), so decisions compare
        # exactly and the float to 1e-9
        assert [(i, c, d) for i, c, _s, d in r1] == [(i, c, d) for i, c, _s, d in r2]
        assert all(abs(a[2] - b[2]) < 1e-9 for a, b in zip(r1, r2))
