"""Corpus curation: benchmark decontamination + deterministic sampling.

Training-data pipeline operators beyond the reference (SURVEY's
LLM-pipeline mandate):

- **Decontamination**: drop/flag corpus documents that share any
  word n-gram with an evaluation benchmark (the GPT-3 appendix-C /
  Llama "13-gram overlap" protocol). Scale shape: the benchmark side
  is SMALL (eval sets are thousands of rows), so its n-gram set
  BROADCASTS and the corpus side is a map-only semi-join over one
  projection — zero shuffle, scan-bound at 100 TB. No Python: the
  shingling is `split` + `sequence`/`transform` + `array_join`
  (whole-stage codegen), membership is a broadcast hash join.

- **Deterministic sampling**: reproducible document sampling keyed on
  a stable hash of the id (md5 hex → integer bucket in [0, 10^6)),
  optionally stratified per group with independent per-group rates.
  Hash-bucket sampling is the 100 TB shape: no RNG state, no
  shuffle, identical output on any cluster size or retry — and the
  same expression is ANSI-SQL, so results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_col(text_col: str, n: int):
    """All word n-grams of lower(text) as an array<string> column —
    pure JVM: split → sequence of start offsets → slice + join."""
    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda x: x != "")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Distinct corpus ids sharing at least one word ``n``-gram with
    any benchmark row. The benchmark n-gram set is broadcast (eval
    sets are small by construction); the corpus explode is a map-only
    projection — the only wide op is the final distinct on the
    (tiny) contaminated-id set."""
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(_ngram_col(bcol, n)).alias("gram")).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"), F.explode(_ngram_col(text_col, n)).alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .select("doc_id")
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti broadcast join)."""
    bad = contaminated_ids(corpus, benchmark, n, text_col, id_col, bench_text_col)
    return corpus.join(
        F.broadcast(bad.withColumnRenamed("doc_id", id_col)), id_col, "left_anti"
    )


_BUCKETS = 1_000_000


def _hash_bucket(id_col: str):
    """Stable bucket in [0, 1e6): md5 of the id string, first 8 hex
    digits as an integer — identical in Spark and ANSI SQL (no
    engine-specific hash), uniform enough for sampling."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % _BUCKETS


def sample_deterministic(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Reproducible ~``fraction`` sample: keep rows whose hash bucket
    falls below fraction * 1e6. No RNG, no shuffle; stable under
    retries, partitioning, and cluster size."""
    return df.filter(_hash_bucket(id_col) < int(fraction * _BUCKETS))


def sample_stratified(
    df: DataFrame, rates: dict[str, float], group_col: str, id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group deterministic rates (quality-tier / language
    rebalancing): ``rates`` maps group value → keep fraction; groups
    absent from the map keep ``default_rate``. One scan, no shuffle —
    the rate lookup is a broadcast-eligible CASE expression."""
    bucket = _hash_bucket(id_col)
    expr = F.lit(int(default_rate * _BUCKETS))
    for val, rate in rates.items():
        # None key = the NULL group (equality is NULL-valued against
        # NULL, so it needs isNull — otherwise NULL-group rows would
        # silently fall through to default_rate)
        cond = F.col(group_col).isNull() if val is None else F.col(group_col) == val
        expr = F.when(cond, F.lit(int(rate * _BUCKETS))).otherwise(expr)
    return df.filter(bucket < expr)


def rebalance_sources(
    df: DataFrame,
    group_col: str,
    max_frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Source/domain mix rebalancing (the Pile / LLaMA-style data
    mixing: cap any one source's share of the corpus): groups holding
    more than ``max_frac`` of all rows are deterministically
    downsampled to (in expectation) exactly that share of the ORIGINAL
    corpus; smaller groups pass through whole.

    Rates derive from group counts, so the plan is: one tiny aggregate
    keyed by the group (rows = #groups), broadcast back onto a
    map-only md5-bucket filter — the same no-RNG determinism as
    :func:`sample_deterministic` (identical output under retries and
    any cluster size). Two scans of the corpus, zero wide shuffles of
    data rows."""
    if not (0.0 < max_frac <= 1.0):
        raise ValueError("max_frac must be in (0, 1]")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    total = df.count()
    cap = max_frac * total
    rates = {
        r[group_col]: (1.0 if r["_gn"] <= cap else cap / r["_gn"])
        for r in counts.collect()
    }
    return sample_stratified(df, rates, group_col, id_col)


C4_TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def c4_line_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_lines: int = 5,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning...", §2.2 — the public rule list):

    - keep only lines ending in a terminal punctuation mark;
    - drop lines with fewer than ``min_words_per_line`` words;
    - drop lines containing the word "javascript";
    - drop PAGES containing "lorem ipsum" or a curly brace, or with
      fewer than ``min_lines`` retained lines.

    (The original also drops pages matching an external profanity
    wordlist and near-duplicate 3-sentence spans; the wordlist is an
    external artifact — hook your own via a filter — and span dedup is
    :func:`lucene_spark.pipeline.substrings.remove_duplicated_ngrams`.)

    Everything is array-lambda / string expressions — one scan, zero
    shuffle, whole-stage codegen; at 100 TB this is ingest-bound.

    Returns (id, text = retained lines joined, n_lines, n_kept_lines,
    has_brace, has_lorem, keep_doc)."""
    lines = F.split(F.col(text_col), "\n")

    def _keep(l):
        words = F.size(F.filter(F.split(F.trim(l), " +"), lambda w: w != ""))
        punct = F.lit(False)
        for p in C4_TERMINAL_PUNCT:
            punct = punct | l.endswith(p)
        return punct & (words >= min_words_per_line) & ~F.lower(l).contains("javascript")

    kept = F.filter(lines, _keep)
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    keep_doc = ~has_lorem & ~has_brace & (F.size(kept) >= min_lines)
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(text_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        has_brace.cast("long").alias("has_brace"),
        has_lorem.cast("long").alias("has_lorem"),
        keep_doc.cast("long").alias("keep_doc"),
    )


# PII scrubbing patterns — deliberately RE2-safe (no backreferences or
# lookaround) so the identical pattern strings run in Spark's Java
# regex AND DuckDB's RE2 oracle with the same matches.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}", "<PHONE>"),
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: tuple = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Redact common PII shapes from a text column (the standard
    pre-training scrub pass — e.g. the BigScience ROOTS / RefinedWeb
    pipelines redact emails, IPs and phone numbers with typed
    placeholders). Applies each pattern in ``kinds`` order with
    ``regexp_replace`` — pure JVM string expressions, one scan, zero
    shuffle; at 100 TB this is ingest-bound like the C4 filters.

    Returns the input relation with ``text_col`` rewritten plus one
    ``n_<kind>`` count column per kind (redaction telemetry)."""
    out = df
    text = F.col(text_col)
    counts = []
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{kind}")
        )
        text = F.regexp_replace(text, pat, repl)
    keep = [F.col(c) for c in df.columns if c != text_col]
    return out.select(*keep, *counts, text.alias(text_col))
