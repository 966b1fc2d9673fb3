"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All Spark-first: tokenization is the engine's vectorized analyzer UDF,
shingling/banding/joins are JVM-side built-ins, and only the MinHash /
SimHash signature kernels cross into Python (Arrow-batched pandas UDFs
over numpy — no per-row Python).

Scale notes (100 TB, 10^9+ docs):
- shingles are joined as strings here (oracle-matchable); at scale pass
  ``hashed=True`` so the shuffle carries int64 xxhash64 values instead.
- the exact-Jaccard pair join is quadratic in docs-per-shingle; it is
  meant for *verification of candidate pairs* (the standard
  LSH-then-verify pipeline, `minhash_lsh_pairs`) — only the LSH bucket
  join and the candidate verify run at full scale, never all-pairs.
- hot shingles (boilerplate lines) are dropped by ``max_shingle_df``
  before the join — the same skew-salting idea as the index builder's
  hot-term chunking.
- LSH band buckets can be size-capped (``max_bucket``, opt-in —
  default None keeps the verified output exact): a degenerate
  bucket — mass-duplicated boilerplate, common in web crawls — would
  otherwise emit O(|bucket|^2) candidate rows before distinct. The cap
  is not silent: ``return_stats=True`` yields the oversized-bucket
  relation (kept/dropped member counts) alongside the pairs. Run
  ``exact_duplicates`` FIRST — byte-identical mass duplicates collapse
  there for one shuffle, and the cap then only touches the residual
  near-identical template mass, where sampled recall is the honest
  trade (every kept pair is still exact-verified).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from lucene_spark.analysis.tokenizer import tokenize_series

# MinHash universal-hash parameters: h_i(x) = (a_i * x + b_i) mod P.
_MERSENNE_P = (1 << 61) - 1


def tokens_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, tokens) via the engine's StandardAnalyzer-equivalent UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return tokenize_series(s)

    return df.select(F.col(id_col).alias("doc_id"), _tok(F.col(text_col)).alias("tokens"))


def shingles(df: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, built JVM-side from
    the token array (transform over an index sequence; no Python)."""
    t = tokens_df(df, text_col, id_col)
    expr = f"transform(sequence(0, size(tokens) - {n}), i -> array_join(slice(tokens, i + 1, {n}), ' '))"
    return (
        t.filter(F.size("tokens") >= n)
        .select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
        .distinct()
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup → (rep_id = min doc_id, n_dups, content
    sha256). One shuffle on the 64-hex digest (not the full text)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("n_dups"))
    )


def _pair_jaccard(sh: DataFrame, candidates: DataFrame | None, max_shingle_df: int | None) -> DataFrame:
    """Exact Jaccard per doc pair from a (doc_id, shingle) relation.
    candidates=(doc_a < doc_b) restricts the join (LSH verify path);
    None = all pairs sharing >=1 shingle (small corpora only)."""
    s = sh
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("c")).filter(F.col("c") > max_shingle_df)
        s = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    # sizes from the SAME (possibly hot-filtered) relation the
    # intersections come from — restricted Jaccard over the surviving
    # shingle space, so identical boilerplate-heavy docs still score
    # 1.0 when their shared hot shingles are dropped from the join
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = s.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = s.select(F.col("doc_id").alias("doc_b"), "shingle")
    joined = a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        joined = joined.join(candidates, ["doc_a", "doc_b"], "left_semi")
    inter = joined.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (all-pairs via the shingle
    inverted index). Quadratic in per-shingle df — cap with
    ``max_shingle_df`` or use :func:`minhash_lsh_pairs` at scale."""
    sh = shingles(df, n, text_col, id_col)
    return _pair_jaccard(sh, None, max_shingle_df).filter(F.col("jaccard") >= threshold)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE_P, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE_P, size=num_perm, dtype=np.int64)
    return a, b


def _mulmod_p61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod (2^61 - 1) in pure uint64 numpy (no Python bignums):
    32-bit limb split + the Mersenne fold 2^61 ≡ 1 (so 2^64 ≡ 8,
    2^32·m ≡ m>>29 + (m & (2^29-1))<<32). Inputs must be < 2^61."""
    P = np.uint64(_MERSENNE_P)
    a1, a0 = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    b1, b0 = b >> np.uint64(32), b & np.uint64(0xFFFFFFFF)
    hi = a1 * b1 * np.uint64(8)  # (a1·b1)·2^64 mod P
    mid = a1 * b0 + a0 * b1  # < 2^62, · 2^32 mod P:
    mid = (mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
    lo = a0 * b0
    lo = (lo >> np.uint64(61)) + (lo & P)
    t = hi + mid + lo  # < 2^63
    t = (t >> np.uint64(61)) + (t & P)
    return np.where(t >= P, t - P, t)


def _fnv1a64_batch(tokens: np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit over an array of (ASCII-safe) token strings,
    vectorized across tokens: one uint64 sweep per byte position
    instead of a Python loop per byte. Identical output to the scalar
    per-byte FNV-1a definition (tests/test_pipeline.py asserts the
    equivalence against a from-definition scalar)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode() for t in tokens]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    cols = np.arange(maxlen)
    mask = cols[None, :] < lens[:, None]
    mat[mask] = flat
    h = np.full(n, np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            live = mask[:, j]
            h[live] = (h[live] ^ mat[live, j]) * prime
    return h


def minhash_signatures(
    sh: DataFrame, num_perm: int = 128, seed: int = 7
) -> DataFrame:
    """(doc_id, sig: array<long>[num_perm]) — MinHash over xxhash64'd
    shingles. The shingle→int64 hash is JVM-side (F.xxhash64); the
    min-over-permutations kernel is one Arrow-batched numpy UDF."""
    from pyspark.sql.functions import pandas_udf

    a, b = _minhash_params(num_perm, seed)

    @pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        au = a.astype(np.uint64)[None, :]
        bu = b.astype(np.uint64)[None, :]
        out = []
        for hs in hashes:
            # (k shingles, num_perm) universal hashes — pure uint64
            # Mersenne-61 mulmod (no Python bignums; ~100x the old
            # object-dtype kernel)
            x = (np.asarray(hs, dtype=np.uint64) % np.uint64(_MERSENNE_P))[:, None]
            v = (_mulmod_p61(x, au) + bu) % np.uint64(_MERSENNE_P)
            out.append(np.min(v, axis=0).astype(np.int64))
        return pd.Series(out)

    grouped = sh.groupBy("doc_id").agg(F.collect_list(F.xxhash64("shingle")).alias("hashes"))
    return grouped.select("doc_id", _sig("hashes").alias("sig"))


def band_bucket_cap(
    banded: DataFrame,
    max_bucket: int | None,
    id_col: str = "doc_id",
    on: tuple[str, str] = ("band", "key"),
) -> tuple[DataFrame, DataFrame]:
    """Bound LSH band-bucket size before the candidate self-join.

    A degenerate bucket of size S (mass-duplicated boilerplate) emits
    O(S^2) candidate rows before ``distinct`` — the one unbounded term
    in the banded-LSH cost model. Members of a bucket over
    ``max_bucket`` are deterministically hash-thinned (keep iff
    xxhash64(id, band, key) ≡ 0 mod ceil(S/max_bucket)) to an expected
    S/ceil(S/max_bucket) survivors — between max_bucket/2 and
    max_bucket, dipping toward the low end just past each multiple of
    max_bucket; the window count shuffles on the same
    (band, key) the join needs. Returns (capped relation, stats
    relation of oversized buckets: band, key, size, kept, dropped) —
    the stats side makes the cap non-silent: callers quantify dropped
    candidate mass with one small aggregation. With max_bucket=None
    both sides pass through unfiltered (stats is empty).
    """
    if max_bucket is None:
        empty = banded.select(
            *[F.col(c) for c in on],
            F.lit(0).cast("long").alias("size"),
            F.lit(0).cast("long").alias("kept"),
            F.lit(0).cast("long").alias("dropped"),
        ).limit(0)
        return banded, empty
    w = Window.partitionBy(*on)
    sz = F.count("*").over(w)
    thin = F.greatest(F.ceil(sz / F.lit(max_bucket)).cast("long"), F.lit(1).cast("long"))
    keep = F.pmod(F.xxhash64(F.col(id_col), *[F.col(c) for c in on]), thin) == 0
    marked = banded.withColumn("_bsz", sz).withColumn("_keep", keep)
    capped = marked.filter("_keep").drop("_bsz", "_keep")
    stats = (
        marked.filter(F.col("_bsz") > max_bucket)
        .groupBy(*on)
        .agg(
            F.first("_bsz").alias("size"),
            F.sum(F.col("_keep").cast("long")).alias("kept"),
        )
        .withColumn("dropped", F.col("size") - F.col("kept"))
    )
    return capped, stats


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 5,
    num_perm: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    max_bucket: int | None = None,
    return_stats: bool = False,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    shingle → minhash sig → band → bucket self-join → candidate pairs →
    exact Jaccard verify → (doc_a, doc_b, jaccard >= threshold).
    With num_perm=128 / bands=32 (rows=4), the miss probability for a
    pair at similarity 0.9 is (1 - 0.9^4)^32 ≈ 3e-7 — the verified
    output matches exact all-pairs Jaccard in practice, at a bucket-join
    cost instead of a quadratic one.

    ``max_bucket`` (default None = no capping, so the exactness claim
    above holds unconditionally) opts into bounding each band bucket
    (see :func:`band_bucket_cap`): a degenerate bucket — mass-duplicated
    boilerplate — emits O(|bucket|^2) candidates, so the 100-TB recipe
    is exact_duplicates first, then a cap (e.g. 10_000) with
    ``return_stats=True`` so the dropped candidate mass is quantified,
    never silent. Capping deliberately trades recall inside oversized
    buckets for a bounded join.
    """
    rows = num_perm // bands
    # NOT persisted: the relation is corpus-sized (caching it at 100 TB
    # is pure write amplification, and a session looping over corpora
    # would leak one pinned copy per call); the second pass over it
    # (the verify join) recomputes a map-only tokenize+explode
    sh = shingles(df, n, text_col, id_col)
    sig = minhash_signatures(sh, num_perm, seed)
    band_expr = f"transform(sequence(0, {bands - 1}), b -> struct(b AS band, array_join(slice(sig, b * {rows} + 1, {rows}), ',') AS key))"
    banded = sig.select("doc_id", F.explode(F.expr(band_expr)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    banded, stats = band_bucket_cap(banded, max_bucket)
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "key")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    out = _pair_jaccard(sh, cand, None).filter(F.col("jaccard") >= threshold)
    return (out, stats) if return_stats else out


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit tf-weighted token simhash, then
    pigeonhole banding (4 x 16-bit chunks: any pair with hamming <= 3
    shares at least one exact chunk) and an exact hamming verify.
    Returns (doc_a, doc_b, hamming)."""
    from pyspark.sql.functions import pandas_udf

    t = tokens_df(df, text_col, id_col)

    @pandas_udf(LongType())
    def _simhash(tokens: pd.Series) -> pd.Series:
        # hash the batch VOCABULARY once (vectorized FNV-1a), then each
        # doc's votes are one matmul over its distinct-token counts —
        # no per-token Python anywhere
        out = np.zeros(len(tokens), dtype=np.uint64)
        docs = [np.asarray(t, dtype=object) for t in tokens]
        nonempty = [d for d in docs if len(d)]
        if not nonempty:
            return pd.Series(out.astype(np.int64))
        vocab, inv = np.unique(np.concatenate(nonempty), return_inverse=True)
        hs = _fnv1a64_batch(vocab)
        vbits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1  # (vocab, 64) in ±1
        shifts = np.uint64(1) << np.arange(64, dtype=np.uint64)
        off = 0
        for i, d in enumerate(docs):
            if not len(d):
                continue
            ids = inv[off : off + len(d)]
            off += len(d)
            counts = np.bincount(ids, minlength=0)
            used = np.nonzero(counts)[0]
            votes = counts[used] @ vbits[used]
            out[i] = (shifts[votes > 0]).sum()
        return pd.Series(out.astype(np.int64))

    sigs = t.select("doc_id", _simhash("tokens").alias("simhash")).persist()
    chunk_expr = (
        "transform(sequence(0, 3), c -> struct(c AS chunk, pmod(shiftright(simhash, c * 16), 65536) AS key))"
    )
    chunks = sigs.select("doc_id", "simhash", F.explode(F.expr(chunk_expr)).alias("ck")).select(
        "doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key")
    )
    left = chunks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk", "key")
    right = chunks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk", "key")
    cand = (
        left.join(right, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def duplicate_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over duplicate pairs: (doc_id, cluster)
    where cluster = min doc id in the component — the step that turns
    pairwise near-dup output into keep/drop decisions for a training
    corpus.

    Algorithm: min-label propagation (each round every vertex takes the
    min label among itself and its neighbors; the simple variant of the
    MapReduce connected-components family — "Connected Components in
    MapReduce and Beyond" small-star/large-star is the O(log n) cousin).
    Rounds needed = component diameter; LSH/verify dup clusters are
    near-cliques, so 2–3 rounds is typical. Each round is one
    shuffle-join + one aggregation, fully declarative; labels are
    localCheckpoint()ed per round so the plan (and lineage) stays O(1)
    across iterations — the standard Spark iterative-algorithm pattern.

    Only docs that appear in ``pairs`` are returned (singletons have no
    component)."""
    e = pairs.select(
        F.col("doc_a").cast("long").alias("src"), F.col("doc_b").cast("long").alias("dst")
    )
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .select(F.col("src").alias("v"), F.least(F.col("src"), F.col("m")).alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = (
            edges.join(labels.withColumnRenamed("v", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nl"))
            .withColumnRenamed("src", "v")
        )
        new_labels = (
            labels.join(prop, "v", "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "v")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster"))


def canonical_docs(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop every duplicate except its cluster representative (min doc
    id): the end-to-end dedup filter a data pipeline applies before
    training. Docs not in any pair pass through untouched."""
    losers = (
        duplicate_clusters(pairs)
        .filter(F.col("cluster") != F.col("doc_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
