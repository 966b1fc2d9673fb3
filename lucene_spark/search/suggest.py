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
