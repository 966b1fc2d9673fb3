"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data": documents are ranked by the perplexity
of a language model; low-perplexity = fluent/typical text, extreme
values flag boilerplate or garbage. The GPT-3 / LLaMA data pipelines
apply the same idea as a quality filter).

This is the deterministic, oracle-checkable stand-in for a KenLM
Kneser-Ney model: an add-k-smoothed BIGRAM model with a BOS context
marker. The modeling choice is documented, simple, and — unlike a
binary KenLM blob — derivable from the corpus itself in one pass, so
the whole operator is expressible in ANSI SQL for the correctness
gate. Swap ``lm`` for counts trained on a reference corpus (e.g.
Wikipedia) to reproduce CCNet's "perplexity under a clean-corpus LM"
exactly — the scoring plan is identical.

Model definition (all natural logs, float64):
- tokens: lowercase ``[a-z0-9]+`` runs (the pipeline's analyzer
  convention); a document with 0 tokens gets NULL perplexity.
- bigrams: (prev, cur) with prev ranging over ``<s>`` + tokens[:-1]
  (one bigram per token; ``<s>`` never appears as ``cur``).
- counts: c12(prev, cur) and c1(prev) = Σ_cur c12(prev, cur);
  V = |{cur}| (distinct bigram targets of the TRAINING corpus).
- probability: p(cur|prev) = (c12 + k) / (c1 + k·V), add-k smoothing
  with k = 1 by default; unseen contexts/targets fall back to
  c12 = c1 = 0.
- perplexity: exp(−(Σ ln p) / n_bigrams) per document.

100-TB shape: training is ONE map-side-combined shuffle of (prev, cur)
partial counts (the c1 relation derives from c12, a second shuffle of
the much smaller count relation); scoring joins the exploded corpus
bigrams against the count relations keyed by (prev, cur) / (prev) —
plain shuffle joins that AQE converts to broadcasts when the model is
small, with no driver-side materialization of either side — then one
aggregation keyed by doc_id. Everything is JVM expressions; no Python
in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id_col, prev, cur) — one row per token; prev of the first token
    is the BOS marker. Pure JVM: split -> shifted zip -> explode."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != "")
    t = df.select(F.col(id_col), toks.alias("_toks")).filter(F.size("_toks") > 0)
    prev = F.concat(F.array(F.lit(BOS)), F.slice("_toks", 1, F.size("_toks") - 1))
    pair = F.arrays_zip(prev.alias("prev"), F.col("_toks").alias("cur"))
    return t.select(id_col, F.explode(pair).alias("_g")).select(
        id_col, F.col("_g.prev").alias("prev"), F.col("_g.cur").alias("cur")
    )


def train_bigram_lm(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bigram count relation (prev, cur, c12, c1) + the vocabulary size
    V on every row (a scalar; carried as a column so the model stays
    ONE self-contained relation that can be persisted/joined without a
    driver round-trip)."""
    g = _bigrams(df, text_col, id_col)
    c12 = g.groupBy("prev", "cur").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("prev").agg(F.sum("c12").alias("c1"))
    v = c12.select(F.countDistinct("cur").alias("V"))
    return c12.join(c1, "prev").crossJoin(F.broadcast(v))


def perplexity(
    df: DataFrame,
    lm: DataFrame | None = None,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, ppl): add-k bigram perplexity of each doc
    under ``lm`` (a ``train_bigram_lm`` relation; defaults to
    self-training on ``df`` — the "how typical is this doc of the
    corpus" signal). Token-less docs keep a row with NULL ppl so the
    output is a total function of the input ids."""
    if k <= 0:
        raise ValueError("add-k smoothing needs k > 0")
    if lm is None:
        lm = train_bigram_lm(df, text_col, id_col)
    # V is a model-global scalar; broadcast its single row onto the
    # gram relation so unseen contexts (left-join NULLs) still smooth
    vdf = lm.select(F.max("V").alias("_V"))
    g = _bigrams(df, text_col, id_col).crossJoin(F.broadcast(vdf))
    lp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + F.lit(float(k)))
        / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(float(k)) * F.col("_V"))
    )
    agg = (
        g.join(lm.select("prev", "cur", "c12"), ["prev", "cur"], "left")
        .join(lm.select("prev", "c1").dropDuplicates(["prev"]), ["prev"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.exp(-F.avg(lp)).alias("ppl"),
        )
    )
    # token-less docs: keep the row, NULL ppl
    ids = df.select(id_col).distinct()
    return ids.join(agg, id_col, "left").select(
        id_col, F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"), "ppl"
    )
