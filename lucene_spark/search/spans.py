"""Span-query surface mapped onto the interval algebra.

Reference surface (all under /root/reference/lucene/queries/src/java/
org/apache/lucene/queries/spans/):
- SpanTermQuery.java — single-term spans (position, position+1).
- SpanNearQuery.java:42 — ordered/unordered conjunction within slop.
- SpanOrQuery.java:36-60 — union of clause spans.
- SpanNotQuery.java:34-62 — include spans not overlapping exclude
  spans, with ``pre``/``post`` expansion of the exclusion window.
- SpanFirstQuery.java:30-50 — spans ending within the first ``end``
  positions (SpanPositionRangeQuery with start 0).
- FieldMaskingSpanQuery.java:60-90 — treat a span on one field as if
  it were on another for compound matching.

The modern reference deprecates spans in favor of intervals (the
queries/intervals module) precisely because every span shape has an
interval equivalent; this module IS that mapping: each constructor
returns an intervals source tree, and :func:`span_query` wraps a tree
in the engine's IntervalQuery (SpanScorer-convention scoring: freq =
Σ 1/(1 + gaps) over minimal intervals, weight = summed idf over all
terms — the SpanWeight.buildSimWeight contract).

Semantics note (documented): interval trees yield MINIMAL intervals,
so nested same-start spans collapse to the tightest match — the
deprecation-path behavior, not bug-for-bug SpanOrQuery duplicate
emission.
"""

from __future__ import annotations

from lucene_spark.index.builder import FIELD_SEP
from lucene_spark.search import ast as A
from lucene_spark.search.intervals import (
    IContainedBy,
    IContaining,
    IEndingWithin,
    IExtend,
    IMaxGaps,
    INonOverlapping,
    IOr,
    IOrdered,
    IPositionRange,
    ITerm,
    IUnordered,
)

__all__ = [
    "span_term",
    "span_near",
    "span_or",
    "span_not",
    "span_first",
    "span_position_range",
    "span_containing",
    "span_within",
    "span_multi_term",
    "span_field_mask",
    "span_query",
]


def span_term(term: str, field: str | None = None) -> ITerm:
    """SpanTermQuery: one-position spans at every occurrence.
    ``field`` scopes the term to a non-primary tokenized field
    (composite key), letting spans from different fields compose in
    one tree — the engine-native form of what FieldMaskingSpanQuery
    enables in the reference."""
    if field:
        return ITerm(f"{field}{FIELD_SEP}{term}")
    return ITerm(term)


def span_near(clauses, slop: int = 0, in_order: bool = True):
    """SpanNearQuery(clauses, slop, inOrder): minimal intervals
    containing one span per clause (ordered: in clause order, no
    overlap) with at most ``slop`` interior gaps."""
    srcs = tuple(span_term(c) if isinstance(c, str) else c for c in clauses)
    inner = IOrdered(srcs) if in_order else IUnordered(srcs)
    return IMaxGaps(slop, inner)


def span_or(*clauses):
    """SpanOrQuery: union of the clause spans (minimalized)."""
    return IOr(tuple(span_term(c) if isinstance(c, str) else c for c in clauses))


def span_not(include, exclude, pre: int = 0, post: int = 0):
    """SpanNotQuery(include, exclude, pre, post): include spans that do
    not overlap an exclude span widened ``pre`` positions left and
    ``post`` right (SpanNotQuery.java:34-62). pre=post=0 is plain
    non-overlap; the reference builds the widened form the same way
    (Intervals.notWithin composes nonOverlapping + extend)."""
    include = span_term(include) if isinstance(include, str) else include
    exclude = span_term(exclude) if isinstance(exclude, str) else exclude
    if pre or post:
        exclude = IExtend(exclude, pre, post)
    return INonOverlapping(include, exclude)


def span_first(match, end: int):
    """SpanFirstQuery(match, end): spans ending within the first
    ``end`` positions (exclusive span end <= end)."""
    match = span_term(match) if isinstance(match, str) else match
    return IEndingWithin(match, end)


def span_position_range(match, start: int, end: int):
    """SpanPositionRangeQuery(match, start, end)
    (SpanPositionRangeQuery.java:28-45): spans with startPosition >=
    ``start`` and endPosition <= ``end`` (exclusive span end).
    start=0 degenerates to SpanFirstQuery."""
    match = span_term(match) if isinstance(match, str) else match
    if start <= 0:
        return IEndingWithin(match, end)
    return IPositionRange(match, start, end)


def span_containing(big, little):
    """SpanContainingQuery(big, little) (SpanContainingQuery.java:30-55):
    spans from ``big`` that contain at least one span from ``little``;
    matches are scored by the big side (the kept intervals ARE big's)."""
    big = span_term(big) if isinstance(big, str) else big
    little = span_term(little) if isinstance(little, str) else little
    return IContaining(big, little)


def span_within(little, big):
    """SpanWithinQuery(big, little) (SpanWithinQuery.java:30-55): spans
    from ``little`` that lie within (are contained by) a span from
    ``big``; matches are scored by the little side."""
    little = span_term(little) if isinstance(little, str) else little
    big = span_term(big) if isinstance(big, str) else big
    return IContainedBy(little, big)


def span_multi_term(index, pattern: str, max_expansions: int = 128, field: str | None = None):
    """SpanMultiTermQueryWrapper role (SpanMultiTermQueryWrapper.java:
    48-90): a wildcard/prefix pattern usable INSIDE a span tree. The
    reference rewrites the wrapped MultiTermQuery against the reader
    into a SpanOrQuery of the expanded terms
    (SpanRewriteMethod/TopTermsSpanBooleanQueryRewrite); here the
    pattern expands against the index's sorted term dictionary (the
    same pushed-down scan every multi-term query uses) into an IOr of
    span terms. Raises if the expansion is empty (a span tree has no
    MatchNoDocs leaf — callers handle the empty case like the
    reference's rewrite does, by the enclosing query matching
    nothing)."""

    pat = pattern.lower()
    if "*" in pat or "?" in pat:
        terms = index.expand_wildcard(pat, limit=max_expansions, field=field)
    else:
        terms = index.expand_terms("prefix", pat, limit=max_expansions, field=field)
    if not terms:
        raise ValueError(f"span multi-term pattern {pattern!r} expands to no terms")
    return IOr(tuple(ITerm(t) for t in terms))


def span_field_mask(source, field: str):
    """FieldMaskingSpanQuery compatibility (FieldMaskingSpanQuery.java:
    60-90): in the reference, masking lets a span that MATCHES on its
    own field participate in a compound span on ``field`` (legal only
    for fields tokenized in parallel). In this engine interval trees
    already compose across fields — every term carries its field in
    its composite key (see :func:`span_term` ``field=``) and positions
    are per-field token indexes, exactly the parallel-tokenization
    contract — so masking's matching role is a NO-OP here: the source
    is returned unchanged, still matching its own field's postings.
    Documented divergence: the reference scores a masked span with the
    mask field's norms; here each term keeps its own field's
    statistics. ``field`` is accepted for API parity."""
    if not isinstance(field, str) or not field:
        raise ValueError("mask field must be a non-empty string")
    return source


def span_query(source) -> A.IntervalQuery:
    """Wrap a span/interval source as an engine query (IntervalQuery;
    SpanScorer-convention freq accumulation)."""
    return A.IntervalQuery(source, score_mode="span")
