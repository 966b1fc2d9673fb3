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


def complete_prefix(index, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions of ``prefix`` by ttf desc, term asc.
    Returns (term, weight)."""
    return (
        index.term_stats_df.filter(F.col("term").startswith(prefix))
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
    frag = fragment.lower().replace("'", "\\'")
    tok = F.expr(
        f"exists(regexp_extract_all(lower(`{text_col}`), '{token_pattern}', 0), "
        f"t -> t LIKE '{frag}%')"
    )
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
    term asc). Returns (term, dist, df)."""
    t = index.term_stats_df
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
    completions already satisfy the prefix-distance test (distance 0).

    Plan shape: the only candidate prefixes of a term that can sit
    within ``max_edits`` of ``typed`` have length |typed| ± max_edits,
    so min-prefix-distance = least() over 2·max_edits+1 JVM levenshtein
    calls — a pure whole-stage-codegen scan of the (pruned) term
    dictionary, TakeOrderedAndProject for the cut."""
    t = typed
    stats = index.term_stats_df
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
