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


def _with_unit(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Add L2-normalized double vector + keep zero-vectors NULL."""
    d = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    nrm = F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.withColumn("_d", d).withColumn(
        out, F.when(nrm > 0, F.expr("transform(_d, x -> x / sqrt(aggregate(_d, 0D, (a, v) -> a + v * v)))"))
    ).drop("_d")


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
        return pd.Series(bits @ weights)

    return _sig


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
