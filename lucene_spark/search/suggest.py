"""Suggesters over the term dictionary (the lucene/suggest module role).

Two suggesters backed by the index's term-stats table (term, df, ttf)
— the same relation the reference's suggesters derive their weights
from when built ``fromDictionary(new LuceneDictionary(reader, field))``:

- ``complete_prefix``: prefix completion ranked by collection weight
  (lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
  AnalyzingSuggester.java role; weight = totalTermFreq as in
  DocumentValueSourceDictionary-style weighting). A prefix predicate on
  the sorted/bucketed term table — Catalyst pushes the ``StartsWith``
  filter into the parquet scan, so the lookup prunes to the term-range
  files exactly like the reference's FST prefix walk prunes arcs.

- ``spell_suggest``: single-token spell correction
  (lucene/suggest/src/java/org/apache/lucene/search/spell/
  DirectSpellChecker.java:42-80 role): candidate terms within
  ``max_edits`` Levenshtein edits (reference default maxEdits=2,
  LevenshteinAutomata bound), ranked better-distance-first then by
  docFreq desc (DirectSpellChecker's ScoreTerm comparator ranks by
  similarity score then docfreq, SuggestWord.java:52-60); the
  candidate scan is a vectorized ``levenshtein`` predicate with a
  length pre-filter, JVM-side — the automaton-intersection role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _primary_terms_df(index) -> DataFrame:
    """The term dictionary as every suggester must see it: PRIMARY key
    space only (extra tokenized fields live under composite
    field+SEP+term keys — leaking them would suggest raw composite
    strings), and per-tier rows of a tiered-writer index summed (the
    reader's term_stats() does the same grouping; ungrouped rows would
    duplicate suggestions with split weights)."""
    from lucene_spark.index.builder import FIELD_SEP

    t = index.term_stats_df.filter(~F.col("term").contains(FIELD_SEP))
    if "tier" in t.columns:
        t = t.groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
        )
    return t


def complete_prefix(index, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions of ``prefix`` by ttf desc, term asc.
    Returns (term, weight)."""
    return (
        _primary_terms_df(index).filter(F.col("term").startswith(prefix))
        .select("term", F.col("ttf").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k)
    )


def complete_regex(index, pattern: str, k: int = 10) -> DataFrame:
    """Top-k completions matching a regular expression, by ttf desc,
    term asc — the RegexCompletionQuery role (lucene/suggest/src/java/
    .../document/RegexCompletionQuery.java:30-60: a CompletionQuery
    whose automaton comes from RegExp instead of a prefix). The
    anchored rlike predicate runs over the sorted term dictionary —
    the same pushed-down scan as every multi-term expansion.
    Returns (term, weight)."""
    return (
        _primary_terms_df(index).filter(F.col("term").rlike(f"^(?:{pattern})$"))
        .select("term", F.col("ttf").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k)
    )


def infix_suggest(
    suggestions_df: DataFrame,
    fragment: str,
    k: int = 10,
    text_col: str = "suggestion",
    weight_col: str = "weight",
    token_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """AnalyzingInfixSuggester role (lucene/suggest/src/java/org/
    apache/lucene/search/suggest/analyzing/AnalyzingInfixSuggester.java:
    60-96, lookup at :560-640): suggestions are full texts analyzed
    into tokens; a lookup matches every suggestion with ANY token
    having ``fragment`` as a prefix (the 'infix' = the match may start
    at any token, not just the first), ranked by weight desc.

    The reference builds a dedicated aux index over the suggestion
    texts; here the suggestion relation IS the aux index — the token-
    prefix predicate evaluates JVM-side (regexp_extract_all + EXISTS
    lambda, whole-stage codegen) over the scan and the top-k is a
    TakeOrderedAndProject, so the lookup is one pruned pass at any
    scale. ``token_pattern`` is the regex analyzer (default: the
    lowercase-alnum subset the corpus guarantees; swap for a stricter
    pattern to match a custom analyzer).

    Returns (suggestion, weight) ordered by weight desc, suggestion asc.
    """
    # Column API, not an interpolated SQL string: the fragment rides as
    # a literal through startswith, so LIKE/regex metacharacters (%, _,
    # quotes, backslashes) in user input match literally
    frag = fragment.lower()
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(token_pattern), F.lit(0))
    tok = F.exists(toks, lambda t: t.startswith(frag))
    return (
        suggestions_df.filter(tok)
        .select(
            F.col(text_col).alias("suggestion"),
            F.col(weight_col).cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )


def spell_suggest(index, term: str, k: int = 5, max_edits: int = 2) -> DataFrame:
    """Top-k corrections for ``term``: candidates with
    0 < levenshtein <= max_edits, ordered by (distance asc, df desc,
    term asc). Returns (term, dist, df). Documented deviation: CLASSIC
    Levenshtein (JVM builtin, SQL-oracle-matched); the reference
    DirectSpellChecker defaults to the transposition-primitive metric
    — FuzzyQuery (the QUERY path) implements it, see
    search/textmatch.osa_distance."""
    t = _primary_terms_df(index)
    dist = F.levenshtein(F.col("term"), F.lit(term))
    return (
        t.filter(
            (F.length("term") >= len(term) - max_edits)
            & (F.length("term") <= len(term) + max_edits)
        )
        .withColumn("dist", dist.cast("long"))
        .filter((F.col("dist") > 0) & (F.col("dist") <= max_edits))
        .select("term", "dist", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def fuzzy_suggest(
    index,
    typed: str,
    k: int = 10,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
) -> DataFrame:
    """FuzzySuggester (lucene/suggest/src/java/org/apache/lucene/search/
    suggest/analyzing/FuzzySuggester.java:47-110): prefix completion
    tolerating typos — a term suggests for ``typed`` when SOME PREFIX
    of the term is within ``max_edits`` Levenshtein edits of the typed
    text. Defaults mirror the reference: maxEdits=1 (:66
    DEFAULT_MAX_EDITS), nonFuzzyPrefix=1 (:72 — the first typed char
    must match exactly), minFuzzyLength=3 (:78 — shorter inputs
    complete exactly, no fuzz). Ranked by weight (ttf) desc, term asc.
    Documented subset: the reference additionally unions the exact
    automaton so exact completions can never be starved by the edit
    budget — with weight ranking over a term dictionary the exact
    completions already satisfy the prefix-distance test (distance 0);
    and distances here are CLASSIC Levenshtein (JVM builtin,
    SQL-oracle-matched) where the reference's automata count adjacent
    transpositions as one edit (the query path's FuzzyQuery does
    implement that metric).

    Plan shape: the only candidate prefixes of a term that can sit
    within ``max_edits`` of ``typed`` have length |typed| ± max_edits,
    so min-prefix-distance = least() over 2·max_edits+1 JVM levenshtein
    calls — a pure whole-stage-codegen scan of the (pruned) term
    dictionary, TakeOrderedAndProject for the cut."""
    t = typed
    stats = _primary_terms_df(index)
    if len(t) < min_fuzzy_length:
        cand = stats.filter(F.col("term").startswith(t))
    else:
        pre = t[:non_fuzzy_prefix]
        lens = range(max(1, len(t) - max_edits), len(t) + max_edits + 1)
        dist = F.least(
            *[F.levenshtein(F.lit(t), F.substring("term", 1, L)) for L in lens]
        )
        cand = stats.filter(F.col("term").startswith(pre)).filter(dist <= max_edits)
    return (
        cand.select("term", F.col("ttf").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k)
    )


def _break_candidates(term: str, max_changes: int, min_len: int) -> list[tuple[tuple[str, ...], int]]:
    """All ways to break ``term`` into 2..max_changes+1 parts, every
    part >= min_len chars (the split lattice WordBreakSpellChecker
    walks recursively, WordBreakSpellChecker.java:239-299). Pure query
    metadata — at most len(term)^max_changes combos for ONE query
    term, generated driver-side like query parsing."""
    out: list[tuple[tuple[str, ...], int]] = []

    def rec(rest: str, parts: tuple[str, ...], breaks: int):
        for i in range(min_len, len(rest) - min_len + 1):
            left, right = rest[:i], rest[i:]
            out.append((parts + (left, right), breaks + 1))
            if breaks + 1 < max_changes:
                rec(right, parts + (left,), breaks + 1)

    rec(term, (), 0)
    return out


def word_breaks(
    index,
    term: str,
    k: int = 5,
    max_changes: int = 1,
    min_break_length: int = 1,
    min_suggestion_freq: int = 1,
    sort: str = "max",
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks (lucene/suggest/src/java/
    org/apache/lucene/search/spell/WordBreakSpellChecker.java:71-123,
    244-299): break a run-together term into dictionary words. A
    suggestion is a split of ``term`` into parts (each >= 
    ``min_break_length`` chars, at most ``max_changes`` breaks) where
    EVERY part has docFreq >= ``min_suggestion_freq``; ranked by number
    of breaks asc then max (default, NUM_CHANGES_THEN_MAX_FREQUENCY) or
    summed part frequency desc, suggestion asc for determinism. The
    default SUGGEST_WHEN_NOT_IN_INDEX mode returns nothing when the
    whole term is already a dictionary word (:97-99).

    Plan shape: the split lattice of ONE query term is driver-side
    metadata (like parsing); frequencies come from ONE broadcast
    hash join of the exploded parts against the term-stats relation
    (pruned scan), re-grouped per candidate — no collect of index data.

    Returns (suggestion: space-joined parts, changes, freq)."""
    spark = index.spark
    whole_df = index.term_stats([term]).get(term, (0, 0))[0]
    if whole_df > 0:
        return spark.createDataFrame([], "suggestion string, changes bigint, freq bigint")
    cands = _break_candidates(term, max_changes, max(1, min_break_length))
    if not cands:
        return spark.createDataFrame([], "suggestion string, changes bigint, freq bigint")
    rows = [
        (ci, pi, p, len(parts), changes)
        for ci, (parts, changes) in enumerate(cands)
        for pi, p in enumerate(parts)
    ]
    parts_df = spark.createDataFrame(
        rows, "cand_id long, part_idx long, part string, n_parts long, changes long"
    )
    stats = _primary_terms_df(index).select("term", F.col("df").cast("long").alias("df"))
    agg_freq = F.max("df") if sort == "max" else F.sum("df")
    # prune the term dictionary to the candidate parts (semi join
    # against the tiny broadcast parts set), then broadcast the pruned
    # frequencies back onto the candidate lattice
    cand_terms = parts_df.select(F.col("part").alias("term")).distinct()
    part_freqs = stats.join(F.broadcast(cand_terms), "term", "left_semi")
    joined = parts_df.join(
        F.broadcast(part_freqs), parts_df.part == part_freqs.term, "left"
    )
    return (
        joined.groupBy("cand_id", "n_parts", "changes")
        .agg(
            F.min(F.coalesce(F.col("df"), F.lit(0))).alias("minf"),
            agg_freq.alias("freq"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("part_idx", "part"))),
                    lambda s: s["part"],
                ),
                " ",
            ).alias("suggestion"),
        )
        .filter(F.col("minf") >= min_suggestion_freq)
        .select("suggestion", F.col("changes").cast("long"), F.col("freq").cast("long"))
        .orderBy(F.asc("changes"), F.desc("freq"), F.asc("suggestion"))
        .limit(k)
    )


def word_combinations(
    index,
    terms: list[str],
    k: int = 5,
    max_changes: int = 1,
    max_combine_length: int = 20,
    min_suggestion_freq: int = 1,
    mode: str = "when_not_in_index",
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations
    (WordBreakSpellChecker.java:145-236): combine runs of 2 ..
    ``max_changes``+1 ADJACENT input terms into one dictionary word.
    mode "when_not_in_index" keeps a combination only when at least one
    constituent is absent from the index (minFreq == 0, :205);
    "more_popular" requires the combined frequency to beat every
    constituent's (:204); "always" keeps all. Combined words longer
    than ``max_combine_length`` are skipped (:192-194). Ranked by
    number of combinations asc then combined docFreq desc (the
    CombinationsThenFreqComparator), then start index asc.

    Plan shape: the adjacent-run windows of the query's own term list
    are driver-side metadata; ONE broadcast join against term-stats
    resolves all frequencies (input terms + combined candidates).

    Returns (suggestion, start_idx, end_idx, changes, freq)."""
    spark = index.spark
    lookup = list(dict.fromkeys(list(terms)))
    windows = []
    for i in range(len(terms) - 1):
        combined = terms[i]
        for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
            combined = combined + terms[j]
            if len(combined) > max_combine_length:
                break
            windows.append((i, j, combined, j - i))
    if not windows:
        return spark.createDataFrame(
            [], "suggestion string, start_idx bigint, end_idx bigint, changes bigint, freq bigint"
        )
    freqs = index.term_stats(lookup + [w[2] for w in windows])
    out = []
    for i, j, combined, changes in windows:
        cf = freqs.get(combined, (0, 0))[0]
        part_freqs = [freqs.get(t, (0, 0))[0] for t in terms[i : j + 1]]
        if cf < min_suggestion_freq:
            continue
        if mode == "when_not_in_index" and min(part_freqs) != 0:
            continue
        if mode == "more_popular" and cf < max(part_freqs):
            continue
        out.append((combined, i, j, changes, cf))
    out.sort(key=lambda r: (r[3], -r[4], r[1]))
    return spark.createDataFrame(
        out[:k], "suggestion string, start_idx bigint, end_idx bigint, changes bigint, freq bigint"
    )


# ---- FreeTextSuggester (n-gram LM completion) -------------------------------


def build_freetext_model(
    df: DataFrame,
    text_col: str = "text",
    grams: int = 2,
    token_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """FreeTextSuggester build step (lucene/suggest/.../analyzing/
    FreeTextSuggester.java:81-124, :213-330 — an n-gram language model
    over the corpus: ShingleFilter grams of every order 1..``grams``
    with their occurrence counts, stored in one FST; DEFAULT_GRAMS=2).
    Returns the model as ONE relation (order, ctx, last, cnt) where
    ``ctx`` is the space-joined first order−1 tokens ('' for unigrams)
    and ``last`` the final token — the split the lookup filters on
    (context equality + completion prefix), so both predicates push
    into the scan of a persisted model. Building is a single
    map-side-combined shuffle of gram partial counts (the 100-TB
    shape; the reference builds one in-RAM FST per shard)."""
    if grams < 1:
        raise ValueError("grams must be >= 1")
    if token_pattern != "[a-z0-9]+":
        raise ValueError("only the [a-z0-9]+ analyzer convention is supported")
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != "")
    t = df.select(toks.alias("_toks")).filter(F.size("_toks") > 0)

    def _gram_struct(o: int):
        # NOTE: must be a ONE-parameter lambda — F.transform binds a
        # second lambda parameter to the array index
        return lambda i: F.struct(
            F.array_join(F.slice("_toks", i, F.lit(o - 1)), " ").alias("ctx"),
            F.element_at("_toks", i + F.lit(o - 1)).alias("last"),
        )

    frames = []
    for o in range(1, grams + 1):
        # one (ctx, last) struct per gram start position (1-based slice)
        g = F.transform(
            F.sequence(F.lit(1), F.size("_toks") - F.lit(o - 1)), _gram_struct(o)
        )
        frames.append(
            t.filter(F.size("_toks") >= o).select(
                F.lit(o).alias("order"), F.explode(g).alias("_g")
            )
        )
    un = frames[0]
    for fr in frames[1:]:
        un = un.unionByName(fr)
    return un.groupBy("order", F.col("_g.ctx").alias("ctx"), F.col("_g.last").alias("last")).agg(
        F.count("*").cast("long").alias("cnt")
    )


def free_text_suggest(
    model: DataFrame,
    key: str,
    num: int = 10,
    grams: int = 2,
    alpha: float = 0.4,
    token_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """FreeTextSuggester.lookup (FreeTextSuggester.java:433-700):
    predict the next/completed token from the last ``grams−1`` input
    tokens using stupid backoff (Brants et al. 2007; ALPHA=0.4 :124).

    - The last token of ``key`` is a partial completion prefix unless
      the key ends outside the token alphabet (trailing space =
      "lastTokenEnded" :500-516, which upgrades all contexts: 'foo '
      suggests bigram continuations of foo, never unigrams).
    - Models are tried highest-order first; each ATTEMPTED model
      multiplies the running backoff by ALPHA afterwards (skipped
      models — not enough input tokens, or the empty-prefix unigram
      guard :536-547 — do not consume a backoff step).
    - score = backoff · count(gram) / count(context) (unigrams divide
      by the total token count); a completed token already produced by
      a higher-order model is suppressed in lower ones (:622-686
      ``seen``; implemented as a window rank by model level).

    Returns (suggestion, score) — suggestion is the context plus the
    completed token, space-joined like the reference's separator-joined
    result key. The whole lookup is Catalyst plan: per-level pushdown
    filters on the model relation, a union of at most ``grams`` levels,
    one window, one TakeOrderedAndProject."""
    import re

    if grams < 1:
        raise ValueError("grams must be >= 1")
    low = key.lower()
    toks = re.findall(token_pattern, low)
    if not toks:
        raise ValueError("no tokens produced by the analyzer for key %r" % key)
    ended = re.search(f"(?:{token_pattern})$", low) is None
    prefix = "" if ended else toks[-1]
    ctx_tokens = toks if ended else toks[:-1]

    tot = model.filter(F.col("order") == 1).agg(F.sum("cnt").alias("_tot"))
    levels = []
    backoff = 1.0
    for g in range(grams - 1, -1, -1):
        if len(ctx_tokens) < g:
            continue  # not enough input: no backoff step (:541 continue)
        if g == 0 and prefix == "" and key:
            continue  # no unigram predictions from the empty string (:536)
        cand = model.filter(
            (F.col("order") == g + 1)
            & (F.col("ctx") == " ".join(ctx_tokens[-g:]) if g else F.col("ctx") == "")
            & F.col("last").startswith(prefix)
        )
        if g == 0:
            scored = cand.crossJoin(F.broadcast(tot)).select(
                "last",
                F.lit(grams - 1 - g).alias("_lvl"),
                (F.lit(backoff) * F.col("cnt") / F.col("_tot")).alias("score"),
            )
        else:
            c_toks = ctx_tokens[-g:]
            cc = (
                model.filter(
                    (F.col("order") == g)
                    & (F.col("ctx") == " ".join(c_toks[:-1]))
                    & (F.col("last") == c_toks[-1])
                )
                .agg(F.sum("cnt").alias("_cc"))
            )
            scored = cand.crossJoin(F.broadcast(cc)).select(
                "last",
                F.lit(grams - 1 - g).alias("_lvl"),
                (F.lit(backoff) * F.col("cnt") / F.col("_cc")).alias("score"),
            )
            scored = scored.withColumn(
                "suggestion", F.concat(F.lit(" ".join(c_toks) + " "), F.col("last"))
            )
        if g == 0:
            scored = scored.withColumn("suggestion", F.col("last"))
        levels.append(scored.select("suggestion", "last", "_lvl", "score"))
        backoff *= alpha
    if not levels:
        spark = model.sparkSession
        return spark.createDataFrame([], "suggestion string, score double")
    un = levels[0]
    for fr in levels[1:]:
        un = un.unionByName(fr)
    from pyspark.sql import Window

    w = Window.partitionBy("last").orderBy(F.asc("_lvl"))
    return (
        un.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col("score").isNotNull())
        .select("suggestion", "score")
        .orderBy(F.desc("score"), F.asc("suggestion"))
        .limit(num)
    )


def context_suggest(
    suggestions_df: DataFrame,
    prefix: str,
    contexts=None,
    k: int = 10,
    text_col: str = "suggestion",
    weight_col: str = "weight",
    contexts_col: str = "contexts",
    match_all: bool = False,
) -> DataFrame:
    """Context-filtered completion — the ContextQuery over
    ContextSuggestField role (lucene/suggest/src/java/.../document/
    ContextQuery.java:44-130 addContext(context, boost, exact) /
    addAllContexts; ContextSuggestField.java — each suggestion carries
    a set of context labels). The inner query is the prefix completion
    (PrefixCompletionQuery role) on ``text_col``; a suggestion is kept
    when one of its contexts matches an entry, and its score is
    ``weight * boost`` of the best matching entry — when several
    contexts of one suggestion match, the best-scoring path wins, the
    same dedup TopSuggestDocsCollector applies per doc.

    ``contexts``: {context: boost} for exact contexts, or a list of
    ``(context, boost, exact)`` triples where ``exact=False`` makes the
    entry match any stored context with that PREFIX (the reference's
    non-exact contexts). ``match_all=True`` = addAllContexts(): every
    suggestion with at least one context passes at boost 1.

    Entirely Catalyst (higher-order F.exists over the contexts array +
    greatest() over the per-entry boosts): filter and ranking push into
    the scan, TopK is a TakeOrderedAndProject — no Python in the plan.
    """
    text, weight, ctxs = F.col(text_col), F.col(weight_col), F.col(contexts_col)
    base = suggestions_df.filter(text.startswith(prefix))
    if match_all:
        scored = base.filter(ctxs.isNotNull() & (F.size(ctxs) > 0)).withColumn(
            "score", weight.cast("double")
        )
    else:
        if not contexts:
            raise ValueError("context_suggest needs contexts or match_all=True")
        entries = (
            [(c, float(b), True) for c, b in contexts.items()]
            if isinstance(contexts, dict)
            else [(c, float(b), bool(e)) for c, b, e in contexts]
        )
        for c, b, _ in entries:
            if b < 0:
                raise ValueError(f"context boost must be >= 0, got {b} for {c!r}")

        def _match(ctx, exact):
            if exact:
                return F.exists(ctxs, lambda c: c == F.lit(ctx))
            return F.exists(ctxs, lambda c: c.startswith(ctx))

        conds = [_match(c, e) for c, _, e in entries]
        any_match = conds[0]
        for cnd in conds[1:]:
            any_match = any_match | cnd
        boosts = [
            F.when(cnd, F.lit(b)).otherwise(F.lit(0.0))
            for cnd, (_, b, _e) in zip(conds, entries)
        ]
        boost = boosts[0] if len(boosts) == 1 else F.greatest(*boosts)
        scored = base.filter(any_match).withColumn(
            "score", weight.cast("double") * boost
        )
    return (
        scored.select(text.alias("suggestion"), "score")
        .orderBy(F.desc("score"), F.asc("suggestion"))
        .limit(k)
    )
