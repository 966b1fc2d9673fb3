"""StandardQueryParser interval functions — the ``fn:`` syntax.

Reference:
- lucene/queryparser/src/java/org/apache/lucene/queryparser/flexible/standard/parser/StandardSyntaxParser.jj:148,172-196
  (the Function lexer state: ``fn:`` enters it, ``(`` leaves it; the 21
  function names with their case variants)
- StandardSyntaxParser.jj:370-690 (per-function argument grammars)
- .../flexible/standard/nodes/intervalfn/*.java (each node's mapping to a
  queries/intervals Intervals.* factory; AnalyzedText.java maps a bare
  term to Intervals.analyzedText(term, analyzer, field, 0, true) — one
  token → a term source, several → an adjacency block)
- Intervals.java:354 (unorderedNoOverlaps = or(ordered(a,b), ordered(b,a)))
- Intervals.java:475 + MinimumShouldMatchIntervalsSource.java:39-62
  (atLeast: m == n → unordered, m > n → matches nothing, m < n →
  minimal spans over combinations of intervals from m of the sources)

Spark disposition: the parser is plan-time only — it produces an
``ast.IntervalQuery`` over the existing interval algebra
(search/intervals.py), so every parsed query runs through the same
vectorized kernels, candidate pruning, and driver/distributed paths as a
hand-built interval tree. ``atLeast`` rewrites compositionally into
or-of-unordered over the m-subsets (the reference's "span combinations
of intervals from minShouldMatch of the sources", Intervals.java:473),
and ``unorderedNoOverlaps`` into the reference's own or-of-ordered
identity — no new evaluator, no new scale surface. ``fn:wildcard`` /
``fn:fuzzyterm`` expand against the index term dictionary at parse time
(the pattern ComplexPhraseQueryParser already uses), so the executed
plan is a plain or-of-terms source.
"""

from __future__ import annotations

import re
from itertools import combinations

from lucene_spark.search import ast as A
from lucene_spark.search.intervals import (
    IContainedBy,
    IContaining,
    IExtend,
    IMaxGaps,
    IMaxWidth,
    INonOverlapping,
    INotContainedBy,
    INotContaining,
    IOr,
    IOrdered,
    IOverlapping,
    ITerm,
    IUnordered,
    IAfter,
    IBefore,
    not_within,
)

__all__ = ["at_least", "unordered_no_overlaps", "parse_interval_fn"]


def at_least(min_should_match: int, *sources):
    """Intervals.atLeast (Intervals.java:475): minimal spans covering
    intervals from ``min_should_match`` of the sources. m == n →
    unordered; m > n → matches nothing (NoMatchIntervalsSource role);
    m < n → or-of-unordered over the m-subsets (the definitional
    expansion of MinimumShouldMatchIntervalsSource's combination spans,
    kept compositional so the existing kernels execute it)."""
    n = len(sources)
    m = int(min_should_match)
    if m <= 0:
        raise ValueError(f"atLeast needs a positive minimum, got {m}")
    if m > n:
        return IOr(())  # NoMatchIntervalsSource: yields no intervals
    if m == n:
        return sources[0] if n == 1 else IUnordered(tuple(sources))
    if m == 1:
        # linear IOr — no combinatorial blowup, so no source cap
        return IOr(tuple(sources))
    if n > 8:
        raise ValueError(
            f"atLeast over {n} sources expands to C({n},{m}) subsets; cap is 8"
        )
    return IOr(tuple(IUnordered(c) for c in combinations(sources, m)))


def unordered_no_overlaps(a, b):
    """Intervals.unorderedNoOverlaps (Intervals.java:354): both sources
    present, no overlap — the reference's own identity
    or(ordered(a, b), ordered(b, a))."""
    return IOr((IOrdered((a, b)), IOrdered((b, a))))


# one token per lexeme: fn:name, parens, quoted string, bare atom
_TOK_RE = re.compile(
    r"""\s*(?:
        (?P<fn>fn:[A-Za-z]+)
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<q>"(?:[^"\\]|\\.)*")
      | (?P<atom>[^\s()"]+)
    )""",
    re.X,
)

# canonical name → lowercase variants accepted by the lexer state
# (StandardSyntaxParser.jj:172-196 lists both case forms; matching is
# done case-insensitively on the lowercase form here)
_FN_NAMES = {
    "atleast", "after", "before", "containedby", "containing", "extend",
    "or", "fuzzyterm", "maxgaps", "maxwidth", "nonoverlapping",
    "notcontainedby", "notcontaining", "notwithin", "ordered",
    "overlapping", "phrase", "unordered", "unorderednooverlaps",
    "wildcard", "within",
}


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOK_RE.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise ValueError(f"cannot lex interval function at: {s[i:]!r}")
            break
        i = m.end()
        for kind in ("fn", "lp", "rp", "q", "atom"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class _Parser:
    def __init__(self, toks, index, max_expansions, field: str | None = None):
        self.toks = toks
        self.i = 0
        self.index = index
        self.max_expansions = max_expansions
        # non-primary tokenized field: bare terms get composite postings
        # keys and expansions run against that field's dictionary space
        self.field = field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self, kind=None):
        k, v = self.peek()
        if k is None:
            raise ValueError("unexpected end of interval function")
        if kind is not None and k != kind:
            raise ValueError(f"expected {kind}, got {v!r}")
        self.i += 1
        return k, v

    def _number(self) -> int:
        _, v = self.take("atom")
        if not re.fullmatch(r"\d+", v):
            raise ValueError(f"expected a number, got {v!r}")
        return int(v)

    def _text_operand(self, raw: str):
        """AnalyzedText.java: one token → term source; several →
        adjacency block (ordered with zero gaps — Intervals.analyzedText
        with gaps=0, ordered=true). Term analysis itself happens in the
        Searcher (map_terms over the source, like every IntervalQuery)."""
        words = raw.split()
        if not words:
            raise ValueError("empty text operand")
        if len(words) == 1:
            return ITerm(self._key(words[0]))
        return IMaxGaps(0, IOrdered(tuple(ITerm(self._key(w)) for w in words)))

    def _key(self, t: str) -> str:
        """Scope a bare term to the parser's field (composite postings
        key, the span_term(field=...) convention); primary field =
        no prefix."""
        if self.field:
            from lucene_spark.index.builder import FIELD_SEP

            return f"{self.field}{FIELD_SEP}{t}"
        return t

    def _expand(self, kind: str, pattern, label: str, cap: int | None = None):
        if self.index is None:
            raise ValueError(f"fn:{label} needs an index for term expansion")
        # per-CALL cap (the fn's optional maxExpansions argument) — a
        # local bound, never a mutation of the parser-wide default
        cap = self.max_expansions if cap is None else min(cap, self.max_expansions)
        # field-scoped expansion runs against the FIELD's key space in
        # the term dictionary; returned terms are full composite keys
        if kind == "wildcard":
            terms = self.index.expand_wildcard(pattern, field=self.field)
        else:
            terms = self.index.expand_terms(kind, pattern, field=self.field)
        if len(terms) > cap:
            raise ValueError(f"fn:{label} expands to {len(terms)} terms > {cap}")
        if not terms:
            return IOr(())  # matches nothing
        if len(terms) == 1:
            return ITerm(terms[0])
        return IOr(tuple(ITerm(t) for t in sorted(terms)))

    def source(self):
        k, v = self.peek()
        if k == "fn":
            return self.function()
        if k == "q":
            self.take()
            return self._text_operand(re.sub(r"\\(.)", r"\1", v[1:-1]))
        if k == "atom":
            self.take()
            return self._text_operand(v)
        raise ValueError(f"expected an interval source, got {v!r}")

    def _sources_until_rp(self) -> list:
        out = []
        while self.peek()[0] not in ("rp", None):
            out.append(self.source())
        if not out:
            raise ValueError("function needs at least one source")
        return out

    def function(self):
        _, fnv = self.take("fn")
        name = fnv[3:].lower()
        if name not in _FN_NAMES:
            raise ValueError(f"unknown interval function {fnv!r}")
        self.take("lp")

        if name == "atleast":
            m = self._number()
            srcs = self._sources_until_rp()
            self.take("rp")
            return at_least(m, *srcs)
        if name in ("maxwidth", "maxgaps"):
            n = self._number()
            src = self.source()
            self.take("rp")
            return IMaxWidth(n, src) if name == "maxwidth" else IMaxGaps(n, src)
        if name in ("ordered", "unordered", "or", "phrase"):
            srcs = self._sources_until_rp()
            self.take("rp")
            if len(srcs) == 1:
                return srcs[0]
            if name == "ordered":
                return IOrdered(tuple(srcs))
            if name == "unordered":
                return IUnordered(tuple(srcs))
            if name == "or":
                return IOr(tuple(srcs))
            # Phrase.java → Intervals.phrase: adjacency block
            return IMaxGaps(0, IOrdered(tuple(srcs)))
        if name in ("within", "notwithin"):
            src = self.source()
            positions = self._number()
            ref = self.source()
            self.take("rp")
            if name == "within":
                # Within.java → Intervals.within(source, positions, ref):
                # source intervals contained by ref extended both ways
                return IContainedBy(src, IExtend(ref, positions, positions))
            return not_within(src, positions, ref)
        if name == "extend":
            src = self.source()
            before = self._number()
            after = self._number()
            self.take("rp")
            return IExtend(src, before, after)
        if name in ("wildcard", "fuzzyterm"):
            k, v = self.take()
            if k == "q":
                v = re.sub(r"\\(.)", r"\1", v[1:-1])
            elif k != "atom":
                raise ValueError(f"fn:{name} needs a pattern, got {v!r}")
            nums = []
            while self.peek()[0] == "atom" and re.fullmatch(r"\d+", self.peek()[1]):
                nums.append(self._number())
            self.take("rp")
            if name == "wildcard":
                return self._expand("wildcard", v, "wildcard", cap=nums[0] if nums else None)
            max_edits = nums[0] if nums else 2
            return self._expand(
                "fuzzy", (v, max_edits, 0), "fuzzyterm", cap=nums[1] if len(nums) > 1 else None
            )
        # two-source combinators
        a = self.source()
        b = self.source()
        self.take("rp")
        if name == "unorderednooverlaps":
            return unordered_no_overlaps(a, b)
        if name == "before":
            return IBefore(a, b)
        if name == "after":
            return IAfter(a, b)
        if name == "containing":
            return IContaining(a, b)
        if name == "notcontaining":
            return INotContaining(a, b)
        if name == "containedby":
            return IContainedBy(a, b)
        if name == "notcontainedby":
            return INotContainedBy(a, b)
        if name == "overlapping":
            return IOverlapping(a, b)
        if name == "nonoverlapping":
            return INonOverlapping(a, b)
        raise AssertionError(name)


def parse_interval_fn(
    s: str, index=None, field: str = "content", max_expansions: int = 128
) -> A.Query:
    """Parse a ``fn:...`` interval-function expression (optionally
    ``field:fn:...``) into an ``ast.IntervalQuery``. ``index`` is needed
    only when the expression uses ``fn:wildcard`` / ``fn:fuzzyterm``
    (term-dictionary expansion, 128-term default cap like the
    reference's multi-term machinery)."""
    s = s.strip()
    m = re.match(r"([A-Za-z_][\w.]*)\s*:\s*(fn:.*)$", s, re.S)
    if m and not m.group(1).lower() == "fn":
        field, s = m.group(1), m.group(2)
    # a non-primary tokenized field scopes the whole tree: bare terms
    # become composite postings keys and fn:wildcard/fn:fuzzyterm
    # expand against that field's key space (the span_term(field=...)
    # convention — IntervalQuery itself stays primary-keyed)
    primary = index.primary_field if index is not None else "content"
    scoped = field if field != primary else None
    p = _Parser(_lex(s), index, max_expansions, scoped)
    src = p.function()
    if p.peek()[0] is not None:
        raise ValueError(f"trailing input after interval function: {p.peek()[1]!r}")
    return A.IntervalQuery(src, field)
