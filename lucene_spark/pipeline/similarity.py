"""Embedding similarity search: brute-force cosine top-k + LSH variant.

The dot products run JVM-side (`F.zip_with` + `F.aggregate` over the
double-cast arrays — whole-stage codegen, no Python). The query side is
broadcast (it is small by construction), so brute force is one narrow
pass over the corpus: no shuffle until the per-query top-k.

Scale path: `lsh_cosine_topk` buckets vectors by random-hyperplane sign
bits so each query only scans its bucket (plus multiprobe neighbors);
at 100 TB you would partition the corpus table by the bucket key so
Catalyst prunes files on it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    queries: (query_id, embedding) — small, broadcast. Returns
    (query_id, rank, vec_id, sim) with rank by (sim desc, vec_id asc).
    Cosine = dot(a, b) / (|a| * |b|) computed in float64.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cd = c.withColumn("_cd", F.expr("transform(_cv, x -> CAST(x AS DOUBLE))"))
    qd = q.withColumn("_qd", F.expr("transform(_qv, x -> CAST(x AS DOUBLE))"))
    joined = cd.crossJoin(F.broadcast(qd)).filter(F.col("vec_id") != F.col("query_id"))
    sim = joined.withColumn(
        "sim",
        _dot(F.col("_cd"), F.col("_qd"))
        / (
            F.sqrt(_dot(F.col("_cd"), F.col("_cd")))
            * F.sqrt(_dot(F.col("_qd"), F.col("_qd")))
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long"), "vec_id", "sim")
    )


def hyperplanes(dim: int, n_bits: int = 16, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _signature_udf(planes: np.ndarray):
    """Random-hyperplane sign signature: one Arrow-batched numpy
    matmul per batch (rows x dim) @ (dim x bits) → packed long key."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    pt = planes.T  # (dim, n_bits)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ pt) >= 0
        # int64 even for n_bits == 0 (the full-recall single-bucket
        # parameterization that makes LSH provably equal brute force)
        return pd.Series((bits @ weights).astype(np.int64))

    return _sig


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 32,
    band_bits: int = 4,
    seed: int = 11,
    mode: str = "auto",
    max_bucket: int | None = None,
    return_stats: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    cosine(a, b) >= threshold. Returns (doc_a, doc_b, sim), float64.

    Two candidate-generation paths:

    - ``lsh`` (the 100 TB path): sign-LSH banding — n_bits hyperplane
      sign bits split into bands of band_bits; a pair is a candidate iff
      it agrees on ALL bits of at least one band (the MinHash-LSH band
      trick applied to random-hyperplane bits). Each band is a shuffle
      on (band, key) — no cartesian. Miss probability per true pair is
      (1 - (1 - acos(t)/pi)^band_bits)^(n_bits/band_bits); at t=0.9 and
      the defaults it is < 1e-8. Candidates are then exactly verified.
    - ``exact``: keyless self-join a < b. For thresholds below ~0.8 the
      band filter loses selectivity (random pairs agree on a 4-bit band
      w.p. ~6%, and a true 60-degree pair is barely likelier), so the
      honest plan IS the quadratic one; use it only at bench scale or
      behind a pre-filter.

    ``auto`` picks lsh for threshold >= 0.8, exact below.

    ``max_bucket`` (default None = no capping — every candidate the
    bands generate is verified) opts into bounding each sign-LSH band
    bucket (lsh mode only): a degenerate bucket — mass-duplicated
    embeddings — would emit O(|bucket|^2) candidates before distinct,
    so at 100-TB scale pass a cap (e.g. 10_000) and
    ``return_stats=True``; oversized buckets are deterministically
    hash-thinned (see dedup.band_bucket_cap) and the stats relation
    quantifies the dropped candidate mass, never silent.
    """
    from lucene_spark.pipeline.dedup import band_bucket_cap

    if mode == "auto":
        mode = "lsh" if threshold >= 0.8 else "exact"
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")).withColumn(
        "_cd", F.expr("transform(_cv, x -> CAST(x AS DOUBLE))")
    )
    stats = None
    if mode == "lsh":
        dim = len(corpus.select(vec_col).first()[0])
        sig = _band_signatures_udf(hyperplanes(dim, n_bits, seed), band_bits)
        bands = c.select("vec_id", F.posexplode(sig(F.col("_cv"))).alias("band", "key"))
        bands, stats = band_bucket_cap(bands, max_bucket, id_col="vec_id")
        cand = (
            bands.alias("a")
            .join(bands.alias("b"), ["band", "key"])
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
            .distinct()
        )
    else:
        a = c.select(F.col("vec_id").alias("doc_a"), F.col("_cd").alias("_ad"))
        b = c.select(F.col("vec_id").alias("doc_b"), F.col("_cd").alias("_bd"))
        cand = a.join(b, F.col("doc_a") < F.col("doc_b"))
    pairs = cand
    if mode == "lsh":
        pairs = (
            cand.join(c.select(F.col("vec_id").alias("doc_a"), F.col("_cd").alias("_ad")), "doc_a")
            .join(c.select(F.col("vec_id").alias("doc_b"), F.col("_cd").alias("_bd")), "doc_b")
        )
    sim = pairs.withColumn(
        "sim",
        _dot(F.col("_ad"), F.col("_bd"))
        / (F.sqrt(_dot(F.col("_ad"), F.col("_ad"))) * F.sqrt(_dot(F.col("_bd"), F.col("_bd")))),
    )
    out = sim.filter(F.col("sim") >= threshold).select("doc_a", "doc_b", "sim")
    if return_stats:
        if stats is None:  # exact mode: no buckets, empty stats shape
            stats = out.sparkSession.createDataFrame(
                [], "band int, key long, size long, kept long, dropped long"
            )
        return out, stats
    return out


def _band_signatures_udf(planes: np.ndarray, band_bits: int):
    """vector → array of per-band packed sign keys (one numpy matmul
    per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    n_bits = planes.shape[0]
    assert n_bits % band_bits == 0
    pt = planes.T
    weights = (1 << np.arange(band_bits)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = ((m @ pt) >= 0).reshape(len(m), n_bits // band_bits, band_bits)
        keys = bits @ weights  # (rows, n_bands)
        return pd.Series(list(keys))

    return _sig


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> np.ndarray:
    """Spherical k-means on a deterministic driver-side sample (IVF
    coarse quantizer training — sample-train is the standard recipe;
    the full corpus never leaves the executors). Returns unit centroids
    (n_centroids, dim), deterministic for a given corpus + seed."""
    rows = corpus.orderBy(id_col).limit(sample).select(vec_col).collect()
    m = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for j in range(len(cent)):
            members = m[assign == j]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[j] = v / n
    return cent


def _cluster_udf(cent: np.ndarray):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    ct = cent.T

    @pandas_udf(IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ ct, axis=1).astype(np.int32))

    return _assign


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 11,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: corpus vectors are bucketed by
    nearest coarse centroid; each query exactly scans only its n_probe
    nearest buckets (the classic IVF-Flat layout). At 100 TB the
    cluster id is a partition column of the corpus table, so Catalyst
    prunes (n_centroids - n_probe)/n_centroids of the files per query;
    recall/cost is tuned by n_probe (n_probe = n_centroids ≡ brute)."""
    cent = centroids if centroids is not None else train_centroids(
        corpus, n_centroids, vec_col=vec_col, id_col=id_col, seed=seed
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = c.withColumn("cluster", _cluster_udf(cent)(F.col("_cv")))

    n_probe = min(n_probe, len(cent))
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    ct = cent.T

    @pandas_udf(ArrayType(IntegerType()))
    def _probes(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ ct), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    qp = q.withColumn("cluster", F.explode(_probes(F.col("_qv"))))
    pairs = (
        c.withColumn("_cd", F.expr("transform(_cv, x -> CAST(x AS DOUBLE))"))
        .join(F.broadcast(qp.withColumn("_qd", F.expr("transform(_qv, x -> CAST(x AS DOUBLE))"))), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    sim = pairs.withColumn(
        "sim",
        _dot(F.col("_cd"), F.col("_qd"))
        / (F.sqrt(_dot(F.col("_cd"), F.col("_cd"))) * F.sqrt(_dot(F.col("_qd"), F.col("_qd")))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long"), "vec_id", "sim")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 11,
) -> DataFrame:
    """Approximate cosine top-k: `n_tables` independent sign-LSH
    bucketings; a query scans only the vectors sharing a bucket in at
    least one table. Recall grows with n_tables; cost per query drops
    ~2^n_bits-fold vs brute force."""
    dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    cb, qb = [], []
    for t in range(n_tables):
        sig = _signature_udf(hyperplanes(dim, n_bits, seed + t))
        cb.append(c.select("vec_id", F.lit(t).alias("tbl"), sig(F.col("_cv")).alias("key")))
        qb.append(q.select("query_id", F.lit(t).alias("tbl"), sig(F.col("_qv")).alias("key")))
    c_buckets = cb[0]
    for x in cb[1:]:
        c_buckets = c_buckets.unionByName(x)
    q_buckets = qb[0]
    for x in qb[1:]:
        q_buckets = q_buckets.unionByName(x)
    cand = (
        q_buckets.join(c_buckets, ["tbl", "key"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    pairs = (
        cand.join(c.withColumn("_cd", F.expr("transform(_cv, x -> CAST(x AS DOUBLE))")), "vec_id")
        .join(F.broadcast(q.withColumn("_qd", F.expr("transform(_qv, x -> CAST(x AS DOUBLE))"))), "query_id")
    )
    sim = pairs.withColumn(
        "sim",
        _dot(F.col("_cd"), F.col("_qd"))
        / (F.sqrt(_dot(F.col("_cd"), F.col("_cd"))) * F.sqrt(_dot(F.col("_qd"), F.col("_qd")))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long"), "vec_id", "sim")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
    centroids: np.ndarray | None = None,
    sample: int = 4096,
    iters: int = 10,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 §2): k-means the
    embedding space, then look for duplicates only WITHIN each cluster.
    Cluster members are ordered by similarity to their centroid
    ASCENDING (ties by id) and a member is flagged ``is_dup`` when some
    EARLIER member is within ``threshold`` cosine — so of every
    near-duplicate group exactly the member LEAST similar to the
    centroid survives, the keep-low policy the paper selected.

    Returns (vec_id, cluster, centroid_sim, is_dup).

    Scale shape: centroid training is a driver-side sample (the
    corpus never centralizes); assignment is a map-only Arrow UDF with
    broadcast centroids; the single shuffle is the groupBy(cluster),
    and pairwise work is O(cluster_size^2) PER TASK — n_clusters grows
    with the corpus (the paper runs 50k clusters on LAION-440M) so
    cluster size, and with it task memory, stays bounded. Pass
    ``centroids`` explicitly to pin the quantizer (retry determinism
    across cluster resizes comes free: training samples by id order,
    not partition layout)."""
    from pyspark.sql.functions import pandas_udf

    cent = (
        centroids
        if centroids is not None
        else train_centroids(
            corpus, n_clusters, sample=sample, iters=iters,
            vec_col=vec_col, id_col=id_col, seed=seed,
        )
    )
    cent = np.asarray(cent, dtype=np.float64)
    # spherical k-means centroids are unit vectors by definition —
    # normalize rows so an explicitly-passed quantizer behaves the same
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    ct = cent.T

    @pandas_udf("cluster int, csim double")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ ct
        a = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {"cluster": a.astype(np.int32), "csim": sims[np.arange(len(a)), a]}
        )

    ann = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .withColumn("_ac", _assign("_v"))
        .select(
            "vec_id",
            F.col("_ac.cluster").alias("cluster"),
            F.col("_ac.csim").alias("csim"),
            "_v",
        )
    )
    thr = float(threshold)

    def _flag(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["csim", "vec_id"], ascending=[True, True]).reset_index(drop=True)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        # dup[j] = some i earlier in keep-low order with cos >= threshold
        dup = np.triu(sims >= thr, 1).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"],
                "centroid_sim": pdf["csim"],
                "is_dup": dup,
            }
        )

    return ann.groupBy("cluster").applyInPandas(
        _flag, "vec_id long, cluster int, centroid_sim double, is_dup boolean"
    )
