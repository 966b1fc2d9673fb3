"""CommonTermsQuery (the lucene/queries CommonTermsQuery.java role).

The reference (lucene/queries/src/java/org/apache/lucene/queries/
CommonTermsQuery.java:63-120 ctor defaults, :146-210 buildQuery) splits
the query terms by document frequency at query time: a term is
*high-frequency* when ``df > maxTermFrequency * maxDoc`` (or
``df > maxTermFrequency`` when the cutoff is given as an absolute
count >= 1). The rewritten query:

- only low-freq terms → BooleanQuery(lowFreqOccur over them, low msm);
- only high-freq terms → BooleanQuery(highFreqOccur over them);
- both → MUST(low-freq bool) + SHOULD(high-freq bool): stopword-ish
  terms never select documents on their own, they only add score to
  documents already matched by the rare terms.

Spark disposition: the df lookups are the same IN-list point reads on
the term-stats table every query compiles through; the rewrite is pure
AST surgery and the result runs the normal WAND/conjunction path —
which is the point: the expensive high-df posting lists are only ever
intersected against the small low-df candidate set.
"""

from __future__ import annotations

from lucene_spark.search import ast as A


def common_terms_query(
    index,
    terms: tuple[str, ...],
    max_term_frequency: float = 0.01,
    low_freq_occur: A.Occur = A.Occur.SHOULD,
    high_freq_occur: A.Occur = A.Occur.SHOULD,
    low_freq_msm: int = 0,
    high_freq_msm: int = 0,
) -> A.Query:
    """Build the rewritten query for ``terms`` against ``index``'s
    current df stats (CommonTermsQuery.buildQuery)."""
    stats = index.term_stats(list(terms))
    n_docs = index.stats.doc_count
    import math

    # fractional cutoffs take Math.ceil in the reference
    # (CommonTermsQuery.java buildQuery: docFreq > Math.ceil(maxTermFrequency
    # * maxDoc)) — a df landing exactly on the ceiling stays LOW-frequency
    cutoff = (
        max_term_frequency
        if max_term_frequency >= 1.0
        else math.ceil(max_term_frequency * n_docs)
    )
    low = tuple(t for t in terms if stats.get(t, (0, 0))[0] <= cutoff)
    high = tuple(t for t in terms if stats.get(t, (0, 0))[0] > cutoff)
    lowq = (
        A.BooleanQuery(tuple((low_freq_occur, A.TermQuery(t)) for t in low), low_freq_msm)
        if low
        else None
    )
    highq = (
        A.BooleanQuery(tuple((high_freq_occur, A.TermQuery(t)) for t in high), high_freq_msm)
        if high
        else None
    )
    if lowq is None and highq is None:
        return A.MatchNoDocsQuery("no terms")
    if lowq is None:
        return A.rewrite(highq)
    if highq is None:
        return A.rewrite(lowq)
    return A.rewrite(
        A.BooleanQuery(((A.Occur.MUST, lowq), (A.Occur.SHOULD, highq)))
    )


def search_common_terms(searcher, terms: tuple[str, ...], k: int = 10, **params):
    return searcher.search(common_terms_query(searcher.index, terms, **params), k=k)
