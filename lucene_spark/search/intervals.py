"""Interval query algebra — the lucene/queries/intervals module role.

Reference surface (all under /root/reference/lucene/queries/src/java/
org/apache/lucene/queries/intervals/):
- Intervals.java:66-120 term / ordered / unordered sources,
  :298 maxgaps, :417 within/containedBy, :443 containing, :127 or —
  the combinator factory.
- OrderedIntervalsSource.java / UnorderedIntervalsSource.java — the
  minimal-interval iteration contracts: an emitted interval never has
  another match properly nested inside it (the MinimizingConjunction
  algorithm of Vigna's "Efficient Lazy Algorithms for Minimal-Interval
  Semantics").
- IntervalQuery.java — scores matching docs through the similarity
  with a proximity-weighted freq; we use the SpanScorer sloppy
  accumulation freq = Σ 1/(1 + gaps) per emitted interval (the same
  convention the engine's SpanNearQuery kernel uses), where
  gaps = width − covered positions.

The evaluator here is a per-doc numpy kernel over the positions index
(the same data the phrase kernels read); candidate docs are pruned
doc-level first (conjunction/union over term postings), so the Python
tree walk only ever runs on position-verified candidates — the same
cost shape as the sloppy-phrase kernel.

Each source evaluates to a list of (start, end, covered) triples,
start-ascending, minimal (no proper nesting). ``covered`` counts the
term positions the interval binds, so gaps = (end - start + 1) -
covered generalizes "width - #terms" through nested combinators.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "ITerm",
    "IOrdered",
    "IUnordered",
    "IOr",
    "IMaxGaps",
    "IMaxWidth",
    "IContaining",
    "IContainedBy",
    "INotContaining",
    "INotContainedBy",
    "IOverlapping",
    "INonOverlapping",
    "IBefore",
    "IAfter",
    "IExtend",
    "IEndingWithin",
    "IPositionRange",
    "not_within",
    "terms_of",
    "eval_source",
]


@dataclass(frozen=True)
class ITerm:
    term: str


@dataclass(frozen=True)
class IOrdered:
    """Intervals.ordered: one interval per source, in order, each
    starting after the previous ends (no overlap)."""

    sources: tuple


@dataclass(frozen=True)
class IUnordered:
    """Intervals.unordered: one interval per source in any order
    (overlaps allowed, matching the reference default)."""

    sources: tuple


@dataclass(frozen=True)
class IOr:
    """Intervals.or: union of the sources' intervals, minimalized."""

    sources: tuple


@dataclass(frozen=True)
class IMaxGaps:
    """Intervals.maxgaps: only intervals with at most ``gaps`` interior
    gaps (width - covered <= gaps)."""

    gaps: int
    source: object


@dataclass(frozen=True)
class IContaining:
    """Intervals.containing(big, small): intervals of big containing an
    interval of small."""

    big: object
    small: object


@dataclass(frozen=True)
class IContainedBy:
    """Intervals.containedBy(small, big): intervals of small contained
    by an interval of big (Intervals.within with 0 slack)."""

    small: object
    big: object


@dataclass(frozen=True)
class IMaxWidth:
    """Intervals.maxwidth (Intervals.java:288 →
    FilteredIntervalsSource.maxWidth): only intervals spanning at most
    ``width`` positions (end - start + 1 <= width)."""

    width: int
    source: object


@dataclass(frozen=True)
class INotContaining:
    """Intervals.notContaining(minuend, subtrahend) (Intervals.java:430
    → NotContainingIntervalsSource): intervals of the minuend that do
    NOT contain any subtrahend interval.  The subtrahend never
    restricts candidate docs — a doc without it matches wholesale."""

    minuend: object
    subtrahend: object


@dataclass(frozen=True)
class INotContainedBy:
    """Intervals.notContainedBy(small, big) (Intervals.java:456):
    intervals of small NOT contained by any big interval."""

    small: object
    big: object


@dataclass(frozen=True)
class IOverlapping:
    """Intervals.overlapping(source, reference) (Intervals.java:387 →
    OverlappingIntervalsSource): source intervals overlapping at least
    one reference interval."""

    source: object
    reference: object


@dataclass(frozen=True)
class INonOverlapping:
    """Intervals.nonOverlapping(minuend, subtrahend)
    (Intervals.java:376 → NonOverlappingIntervalsSource): minuend
    intervals overlapping NO subtrahend interval."""

    minuend: object
    subtrahend: object


@dataclass(frozen=True)
class IBefore:
    """Intervals.before(source, reference) (Intervals.java:490):
    source intervals that END before the start of some reference
    interval (the reference builds this as containedBy(source,
    extend(offset(reference, true), MAX, 0)) — algebraically the same
    predicate end < max(reference starts))."""

    source: object
    reference: object


@dataclass(frozen=True)
class IAfter:
    """Intervals.after(source, reference) (Intervals.java:496):
    source intervals that START after the end of some reference
    interval (start > min(reference ends))."""

    source: object
    reference: object


@dataclass(frozen=True)
class IEndingWithin:
    """SpanFirstQuery / SpanPositionRangeQuery role
    (lucene/queries/src/java/org/apache/lucene/queries/spans/
    SpanFirstQuery.java:30-50, SpanPositionRangeQuery.java): intervals
    of ``source`` whose EXCLUSIVE span end (our inclusive end + 1) is
    <= ``limit`` — i.e. the match sits entirely within the first
    ``limit`` positions."""

    source: object
    limit: int


@dataclass(frozen=True)
class IPositionRange:
    """SpanPositionRangeQuery role (lucene/queries/.../spans/
    SpanPositionRangeQuery.java:28-45): intervals of ``source`` whose
    start >= ``start`` AND whose EXCLUSIVE span end (our inclusive end
    + 1) <= ``limit``. IEndingWithin is the start=0 special case
    (SpanFirstQuery, ":see SpanFirstQuery for a derivation optimized
    for start == 0")."""

    source: object
    start: int
    limit: int


@dataclass(frozen=True)
class IExtend:
    """Intervals.extend(source, before, after) (Intervals.java:320 →
    ExtendedIntervalsSource): each interval stretched ``before``
    positions left (clipped at 0) and ``after`` right.  ``covered`` is
    kept from the wrapped interval (the reference's gaps() likewise
    delegates to the wrapped iterator), so a downstream IMaxGaps sees
    the extension as extra gaps — documented deviation: the reference
    excludes extensions from gaps(); ours counts them, which only
    matters when composing extend inside maxgaps."""

    source: object
    before: int
    after: int


def not_within(minuend, positions: int, subtrahend):
    """Intervals.notWithin (Intervals.java:402): minuend intervals at
    least ``positions`` away from any subtrahend interval — built, as
    in the reference, from nonOverlapping + extend."""
    return INonOverlapping(minuend, IExtend(subtrahend, positions, positions))


# (positive operand, filter-only operand) of each filtered source; the
# filter operand never restricts candidate docs for the NOT variants.
_FILTER_SHAPES = {
    INotContaining: ("minuend", "subtrahend", False),
    INotContainedBy: ("small", "big", False),
    INonOverlapping: ("minuend", "subtrahend", False),
    IOverlapping: ("source", "reference", True),
    IBefore: ("source", "reference", True),
    IAfter: ("source", "reference", True),
}


def terms_of(src) -> set[str]:
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered, IOr)):
        out: set[str] = set()
        for s in src.sources:
            out |= terms_of(s)
        return out
    if isinstance(src, (IMaxGaps, IMaxWidth, IEndingWithin, IPositionRange)):
        return terms_of(src.source)
    if isinstance(src, IExtend):
        return terms_of(src.source)
    if isinstance(src, (IContaining, IContainedBy)):
        a = src.big if isinstance(src, IContaining) else src.small
        b = src.small if isinstance(src, IContaining) else src.big
        return terms_of(a) | terms_of(b)
    shape = _FILTER_SHAPES.get(type(src))
    if shape is not None:
        pos_attr, flt_attr, _req = shape
        return terms_of(getattr(src, pos_attr)) | terms_of(getattr(src, flt_attr))
    raise TypeError(type(src))


def map_terms(src, fn):
    """Rebuild the source tree with every term mapped through ``fn``
    (query-side analysis: stemming etc.). ``fn`` returning None keeps
    the original term (an unanalyzable term simply won't match)."""
    if isinstance(src, ITerm):
        t = fn(src.term)
        return ITerm(t if t is not None else src.term)
    if isinstance(src, IOrdered):
        return IOrdered(tuple(map_terms(s, fn) for s in src.sources))
    if isinstance(src, IUnordered):
        return IUnordered(tuple(map_terms(s, fn) for s in src.sources))
    if isinstance(src, IOr):
        return IOr(tuple(map_terms(s, fn) for s in src.sources))
    if isinstance(src, IMaxGaps):
        return IMaxGaps(src.gaps, map_terms(src.source, fn))
    if isinstance(src, IContaining):
        return IContaining(map_terms(src.big, fn), map_terms(src.small, fn))
    if isinstance(src, IContainedBy):
        return IContainedBy(map_terms(src.small, fn), map_terms(src.big, fn))
    if isinstance(src, IMaxWidth):
        return IMaxWidth(src.width, map_terms(src.source, fn))
    if isinstance(src, IEndingWithin):
        return IEndingWithin(map_terms(src.source, fn), src.limit)
    if isinstance(src, IPositionRange):
        return IPositionRange(map_terms(src.source, fn), src.start, src.limit)
    if isinstance(src, IExtend):
        return IExtend(map_terms(src.source, fn), src.before, src.after)
    shape = _FILTER_SHAPES.get(type(src))
    if shape is not None:
        pos_attr, flt_attr, _req = shape
        return type(src)(
            map_terms(getattr(src, pos_attr), fn), map_terms(getattr(src, flt_attr), fn)
        )
    raise TypeError(type(src))


def candidate_docs(src, doc_arrays: dict[str, np.ndarray]) -> np.ndarray:
    """Doc-level necessary condition: docs that could match the source
    (conjunction across combinator children, union for Or). Exact for
    term/or; an upper bound the position pass refines for the rest."""
    if isinstance(src, ITerm):
        return doc_arrays[src.term]
    if isinstance(src, IOr):
        out = None
        for s in src.sources:
            d = candidate_docs(s, doc_arrays)
            out = d if out is None else np.union1d(out, d)
        return out if out is not None else np.empty(0, dtype=np.int64)
    if isinstance(src, (IMaxGaps, IMaxWidth, IEndingWithin, IPositionRange)):
        return candidate_docs(src.source, doc_arrays)
    if isinstance(src, IExtend):
        return candidate_docs(src.source, doc_arrays)
    shape = _FILTER_SHAPES.get(type(src))
    if shape is not None:
        pos_attr, flt_attr, required = shape
        pos = candidate_docs(getattr(src, pos_attr), doc_arrays)
        if not required:  # NOT variants: subtrahend never restricts
            return pos
        ref = candidate_docs(getattr(src, flt_attr), doc_arrays)
        return np.intersect1d(pos, ref, assume_unique=True)
    if isinstance(src, (IOrdered, IUnordered)):
        children = src.sources
    else:  # IContaining / IContainedBy
        children = (
            (src.big, src.small) if isinstance(src, IContaining) else (src.small, src.big)
        )
    out = None
    for s in children:
        d = candidate_docs(s, doc_arrays)
        out = d if out is None else np.intersect1d(out, d, assume_unique=True)
    return out if out is not None else np.empty(0, dtype=np.int64)


def _minimalize(iv: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Drop intervals that properly contain another interval of the
    set (the minimal-interval invariant). Input need not be sorted."""
    if len(iv) <= 1:
        return sorted(iv)
    iv = sorted(iv, key=lambda t: (t[0], t[1]))
    # dedupe same (start,end) keeping max covered (tightest metadata)
    dedup: list[tuple[int, int, int]] = []
    for s, e, c in iv:
        if dedup and dedup[-1][0] == s and dedup[-1][1] == e:
            if c > dedup[-1][2]:
                dedup[-1] = (s, e, c)
            continue
        dedup.append((s, e, c))
    iv = dedup
    # suffix-min of ends over later-starting intervals: (s,e) contains a
    # later interval iff some interval with start > s has end <= e; with
    # equal starts the sort already puts the shorter first, and a longer
    # same-start interval contains it too.
    out: list[tuple[int, int, int]] = []
    n = len(iv)
    sufmin = [0] * (n + 1)
    INF = 1 << 62
    sufmin[n] = INF
    for i in range(n - 1, -1, -1):
        sufmin[i] = min(iv[i][1], sufmin[i + 1])
    for i, (s, e, c) in enumerate(iv):
        # a later-sorted interval (start >= s) with end <= e is properly
        # contained (later same-start entries are strictly longer, so
        # equality of start can only flag the longer one correctly via
        # the explicit same-start check below)
        if sufmin[i + 1] <= e:
            continue
        if out and out[-1][0] == s:  # shorter same-start already kept
            continue
        out.append((s, e, c))
    return out


def eval_source(src, pos_of) -> list[tuple[int, int, int]]:
    """Evaluate ``src`` for one document. ``pos_of(term)`` returns the
    sorted int64 position array of a term in this doc (empty if
    absent). Returns minimal (start, end, covered) triples sorted by
    start."""
    if isinstance(src, ITerm):
        return [(int(p), int(p), 1) for p in pos_of(src.term)]
    if isinstance(src, IOr):
        merged: list[tuple[int, int, int]] = []
        for s in src.sources:
            merged.extend(eval_source(s, pos_of))
        return _minimalize(merged)
    if isinstance(src, IMaxGaps):
        return [
            (s, e, c) for s, e, c in eval_source(src.source, pos_of) if (e - s + 1) - c <= src.gaps
        ]
    if isinstance(src, IContaining):
        big = eval_source(src.big, pos_of)
        small = eval_source(src.small, pos_of)
        if not small:
            return []
        return [bi for bi in big if any(bi[0] <= s and e <= bi[1] for s, e, _ in small)]
    if isinstance(src, IContainedBy):
        small = eval_source(src.small, pos_of)
        big = eval_source(src.big, pos_of)
        if not big:
            return []
        return [si for si in small if any(s <= si[0] and si[1] <= e for s, e, _ in big)]
    if isinstance(src, IMaxWidth):
        return [
            (s, e, c) for s, e, c in eval_source(src.source, pos_of) if e - s + 1 <= src.width
        ]
    if isinstance(src, IEndingWithin):
        return [
            (s, e, c) for s, e, c in eval_source(src.source, pos_of) if e + 1 <= src.limit
        ]
    if isinstance(src, IPositionRange):
        return [
            (s, e, c)
            for s, e, c in eval_source(src.source, pos_of)
            if s >= src.start and e + 1 <= src.limit
        ]
    if isinstance(src, IExtend):
        # ExtendedIntervalIterator streams the delegate's intervals with
        # widened bounds and does NOT re-minimalize (ExtendedIntervalIterator
        # .java:52-79) — clipped starts (max(0, s-before)) may nest, and
        # the reference's difference/containment iterators see ALL of
        # them (NonOverlappingIntervalsSource.java:64-80 walks every
        # subtrahend interval). Matching SpanNotQuery(pre, post): a
        # match is excluded if it overlaps ANY widened exclusion.
        # Output stays start- and end-ascending (minimal input has
        # strictly increasing starts and ends).
        return [
            (max(0, s - src.before), e + src.after, c)
            for s, e, c in eval_source(src.source, pos_of)
        ]
    if isinstance(src, INotContaining):
        m = eval_source(src.minuend, pos_of)
        sub = eval_source(src.subtrahend, pos_of)
        return [mi for mi in m if not any(mi[0] <= s and e <= mi[1] for s, e, _ in sub)]
    if isinstance(src, INotContainedBy):
        sm = eval_source(src.small, pos_of)
        big = eval_source(src.big, pos_of)
        return [si for si in sm if not any(s <= si[0] and si[1] <= e for s, e, _ in big)]
    if isinstance(src, IOverlapping):
        sv = eval_source(src.source, pos_of)
        ref = eval_source(src.reference, pos_of)
        return [si for si in sv if any(s <= si[1] and si[0] <= e for s, e, _ in ref)]
    if isinstance(src, INonOverlapping):
        m = eval_source(src.minuend, pos_of)
        sub = eval_source(src.subtrahend, pos_of)
        return [mi for mi in m if not any(s <= mi[1] and mi[0] <= e for s, e, _ in sub)]
    if isinstance(src, IBefore):
        sv = eval_source(src.source, pos_of)
        ref = eval_source(src.reference, pos_of)
        if not ref:
            return []
        max_start = max(s for s, _, _ in ref)
        return [si for si in sv if si[1] < max_start]
    if isinstance(src, IAfter):
        sv = eval_source(src.source, pos_of)
        ref = eval_source(src.reference, pos_of)
        if not ref:
            return []
        min_end = min(e for _, e, _ in ref)
        return [si for si in sv if si[0] > min_end]
    if isinstance(src, IOrdered):
        kids = [eval_source(s, pos_of) for s in src.sources]
        return _ordered(kids)
    if isinstance(src, IUnordered):
        kids = [eval_source(s, pos_of) for s in src.sources]
        return _unordered(kids)
    raise TypeError(type(src))


def _ordered(kids: list[list[tuple[int, int, int]]]) -> list[tuple[int, int, int]]:
    """Ordered conjunction over child interval lists: chain greedily
    forward (each child's first interval starting after the previous
    ends), then stretch-to-minimal backward (latest child intervals
    still forming a chain) — the OrderedIntervalsSource algorithm
    generalized from term positions to sub-intervals."""
    n = len(kids)
    if any(not k for k in kids):
        return []
    out: list[tuple[int, int, int]] = []
    i0 = 0
    while i0 < len(kids[0]):
        chain = [kids[0][i0]]
        ok = True
        for j in range(1, n):
            prev_end = chain[-1][1]
            nxt = None
            for iv in kids[j]:
                if iv[0] > prev_end:
                    nxt = iv
                    break
            if nxt is None:
                ok = False
                break
            chain.append(nxt)
        if not ok:
            break
        # backward stretch: latest interval of child j fully before
        # chain[j+1].start
        for j in range(n - 2, -1, -1):
            best = chain[j]
            for iv in kids[j]:
                if iv[1] < chain[j + 1][0] and iv[0] > best[0]:
                    best = iv
            chain[j] = best
        s, e = chain[0][0], chain[-1][1]
        out.append((s, e, sum(c for _, _, c in chain)))
        # advance past this start
        nxt_i0 = i0 + 1
        while nxt_i0 < len(kids[0]) and kids[0][nxt_i0][0] <= chain[0][0]:
            nxt_i0 += 1
        i0 = nxt_i0
    return _minimalize(out)


def _unordered(kids: list[list[tuple[int, int, int]]]) -> list[tuple[int, int, int]]:
    """Unordered conjunction (overlaps allowed): sliding window holding
    one interval per child; repeatedly advance the child whose interval
    starts earliest, emitting the window when advancing would move the
    left edge (UnorderedIntervalsSource's queue algorithm)."""
    n = len(kids)
    if any(not k for k in kids):
        return []
    idx = [0] * n
    out: list[tuple[int, int, int]] = []
    while True:
        cur = [kids[j][idx[j]] for j in range(n)]
        s = min(iv[0] for iv in cur)
        e = max(iv[1] for iv in cur)
        out.append((s, e, sum(c for _, _, c in cur)))
        # advance the child contributing the earliest start
        jmin = min(range(n), key=lambda j: kids[j][idx[j]][0])
        idx[jmin] += 1
        if idx[jmin] >= len(kids[jmin]):
            break
    return _minimalize(out)
