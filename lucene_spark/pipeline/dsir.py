"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
feature distribution looks like a small TARGET corpus (e.g. Wikipedia +
books), by importance weights under bag-of-n-grams models.

The GPT-3 / LLaMA-era pipelines use a trained quality classifier for
the same role; DSIR §3 replaces the classifier with two closed-form
generative models so the whole selector is counts + a log-ratio — which
also makes it deterministic and ANSI-SQL-expressible, hence a full
correctness-gate operator here.

Definition (paper §3.1-3.2, word-level variant):
- features: word unigrams AND bigrams of the lowercase ``[a-z0-9]+``
  token stream (the pipeline's analyzer convention), hashed into
  ``n_buckets`` buckets (paper: 10,000) — hashing bounds the model size
  independent of vocabulary.
- models: per-bucket add-k-smoothed categorical distributions
  p (target) and q (raw): p_b = (cnt_b + k) / (total + k·B).
- importance weight of doc i with bucket counts c_ib:
  log w_i = Σ_b c_ib · (ln p_b − ln q_b).
- selection (§3, Gumbel top-k resampling without replacement): keep the
  top-n docs by log w_i + g_i with g_i standard Gumbel noise. The noise
  here is DETERMINISTIC — u_i derived from md5(doc_id) exactly like
  ``curation.sample_deterministic`` — so retries, partitioning, and
  cluster size cannot change the selected set (and the gate oracle can
  re-derive it).

100-TB shape: the target corpus is small by construction (it is the
quality reference), so its model is one tiny aggregate; the raw-side
model is ONE map-side-combined shuffle of (bucket, count) partials into
B ≈ 10⁴ rows; per-doc weights are one explode → broadcast-join against
the B-row weight relation → one doc-keyed aggregation; selection is
ORDER BY + LIMIT = TakeOrderedAndProject (per-partition top-n, tiny
driver merge). No Python in the plan, nothing corpus-sized ever
centralizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_U_BUCKETS = 1_000_000  # gumbel-uniform resolution (md5 bucket space)


def _grams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) — unigrams + space-joined bigrams of the token
    stream. Pure JVM: split → slice/zip → explode."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != "")
    t = df.select(F.col(id_col), toks.alias("_toks")).filter(F.size("_toks") > 0)
    bi = F.zip_with(
        F.slice("_toks", 1, F.greatest(F.size("_toks") - 1, F.lit(0))),
        F.slice("_toks", 2, F.greatest(F.size("_toks") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return t.select(
        id_col, F.explode(F.concat(F.col("_toks"), bi)).alias("gram")
    )


def _bucket(col, n_buckets: int):
    """md5-hex-prefix bucket — identical in Spark and ANSI SQL (the
    ``curation._hash_bucket`` convention), so the hashed feature space
    is oracle-reproducible. Murmur3 would be faster but engine-bound."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def doc_bucket_counts(
    df: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document hashed-feature counts (id, bucket, c) — the c_ib of
    the paper. One map-side-combined aggregation keyed by (id, bucket);
    rows out ≤ min(doc grams, B) per doc."""
    g = _grams(df, text_col, id_col)
    return g.groupBy(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket")).agg(
        F.count("*").alias("c")
    )


def train_bucket_model(
    df: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level bucket counts (bucket, cnt) + the count total on
    every row (scalar carried as a column, the ``train_bigram_lm``
    convention, so the model is ONE self-contained relation)."""
    g = _grams(df, text_col, id_col)
    cnt = g.groupBy(_bucket(F.col("gram"), n_buckets).alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    tot = cnt.select(F.sum("cnt").alias("total"))
    return cnt.crossJoin(F.broadcast(tot))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 10_000,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_grams, logw): log importance weight of every raw doc,
    log w = Σ_b c_b·(ln p̂_b − ln q̂_b) with add-k smoothed bucket
    models — target model p̂ from ``target``, raw model q̂ from ``raw``
    itself (paper §3.1). Docs with zero tokens keep logw = 0 (empty
    sum), so the relation is total over ``raw``."""
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    B = int(n_buckets)
    p = train_bucket_model(target, B, text_col, id_col).select(
        "bucket", F.col("cnt").alias("ct"), F.col("total").alias("tp")
    )
    q = train_bucket_model(raw, B, text_col, id_col).select(
        "bucket", F.col("cnt").alias("cq"), F.col("total").alias("tq")
    )
    # totals are scalars — pin them onto the joined relation so the
    # log-ratio is a plain column expression (unseen side counts 0)
    tots = p.select(F.first("tp").alias("tp")).crossJoin(q.select(F.first("tq").alias("tq")))
    lr = (
        p.drop("tp")
        .join(q.drop("tq"), "bucket", "full_outer")
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + k) / (F.col("tp") + k * B))
                - F.log((F.coalesce(F.col("cq"), F.lit(0)) + k) / (F.col("tq") + k * B))
            ).alias("lr"),
        )
    )
    docg = doc_bucket_counts(raw, B, text_col, id_col)
    # buckets in neither model cannot appear in docg (docg's grams are a
    # subset of the raw model's), so a plain inner broadcast join is
    # total — no default-ratio branch needed
    w = (
        docg.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lr")).alias("logw"),
        )
    )
    return (
        raw.select(id_col)
        .join(w, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def gumbel_noise(id_col: str = "doc_id"):
    """Deterministic standard-Gumbel draw per doc: u from the doc-id
    md5 bucket (mid-bucket offset keeps u in (0, 1) exactly), then
    g = −ln(−ln u). No RNG state — retry/cluster-size invariant, and
    the identical expression runs in the SQL oracle."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % _U_BUCKETS
        + F.lit(0.5)
    ) / _U_BUCKETS
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    n_buckets: int = 10_000,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end DSIR selector: top-``n`` raw docs by
    logw + Gumbel (sampling-without-replacement via Gumbel top-k,
    paper §3 step 3). Returns (doc_id, n_grams, logw, key) sorted by
    the selection key; doc_id breaks exact ties deterministically.
    ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    top-n, only n rows reach the driver merge."""
    if n <= 0:
        raise ValueError(f"selection size n must be > 0, got {n}")
    w = importance_weights(raw, target, n_buckets, k, text_col, id_col)
    return (
        w.select("*", (F.col("logw") + gumbel_noise(id_col)).alias("key"))
        .orderBy(F.desc("key"), id_col)
        .limit(n)
    )
