"""ComplexPhraseQueryParser — phrases with embedded wildcards, fuzzy
terms and alternative groups.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java — quoted content is parsed
clause-by-clause (:47-60 two-pass javadoc); each clause rewrites to a
span clause (ComplexPhraseQuery.rewrite :259-340): a TermQuery becomes
SpanTermQuery, a MultiTermQuery (wildcard/fuzzy) rewrites and wraps as
SpanOr of its expansions (:380-420 wrapping rules), a boolean group
``(john jon)`` becomes SpanOrQuery of its alternatives, and the whole
phrase is SpanNearQuery(clauses, slop, inOrder) (:336).

Engine mapping: each slot expands against the term dictionary into an
or-of-terms interval operand (the flat interval kernels evaluate
or-slots vectorized), the phrase is IMaxGaps(slop, IOrdered|IUnordered)
— i.e. exactly :func:`lucene_spark.search.spans.span_near` with IOr
leaves — wrapped as an engine IntervalQuery (SpanScorer freq
convention, summed-idf weight over all expanded terms; the same
SpanWeight contract the reference's rewritten span tree scores with).

Supported slot syntax (the documented subset — the reference feeds
slots through the classic parser, so exotic clauses like ranges inside
phrases exist there; this covers the javadoc's own examples):
- plain term                 ``john``
- wildcard                   ``peters*``, ``sm?th``
- fuzzy                      ``jonathan~``, ``jonathan~1`` (maxEdits 2
  default, FuzzyQuery.defaultMaxEdits)
- alternative group          ``(john jon jonathan~)`` — any of the
  above, OR-ed
"""

from __future__ import annotations

import re

from lucene_spark.search import ast as A
from lucene_spark.search.intervals import IMaxGaps, IOr, IOrdered, ITerm, IUnordered

_SLOT_RE = re.compile(r"\(([^)]*)\)|(\S+)")


def _expand_atom(index, atom: str, max_expansions: int) -> list[str]:
    """One phrase atom -> concrete dictionary terms."""

    atom = atom.lower()
    m = re.fullmatch(r"(.+?)~(\d?)", atom)
    if m:
        base, ed = m.group(1), m.group(2)
        edits = int(ed) if ed else 2
        # classic Levenshtein expansion (documented subset — the plain
        # FuzzyQuery path implements the reference transpositions
        # metric; this parser keeps the SQL-oracle-matched classic)
        if edits > 2:
            # FuzzyQuery rejects maxEdits > LevenshteinAutomata
            # .MAXIMUM_SUPPORTED_DISTANCE (2) — silently expanding a
            # wider edit budget would diverge from the reference
            raise ValueError(f"fuzzy edit distance {edits} > 2 (FuzzyQuery maximum)")
        return index.expand_terms("fuzzy", (base, edits, 0), limit=max_expansions)
    if "*" in atom or "?" in atom:
        return index.expand_wildcard(atom, limit=max_expansions)
    return [atom] if index.term_stats([atom]).get(atom, (0, 0))[0] else []


def parse_complex_phrase(
    index,
    phrase: str,
    slop: int = 0,
    in_order: bool = True,
    max_expansions: int = 128,
) -> A.Query:
    """Parse the CONTENT of a complex phrase (without the quotes) into
    an engine query. ``slop``/``in_order`` mirror the reference's
    slopFactor and setInOrder. A slot whose expansion is empty makes
    the whole phrase match nothing (MatchNoDocsQuery — the reference's
    rewrite yields an empty SpanOr which matches nothing)."""
    slots: list[tuple[str, ...]] = []
    for grp, single in _SLOT_RE.findall(phrase.strip()):
        atoms = grp.split() if grp else [single]
        terms: list[str] = []
        for a in atoms:
            terms.extend(_expand_atom(index, a, max_expansions))
        uniq = tuple(dict.fromkeys(terms))
        if not uniq:
            return A.MatchNoDocsQuery(f"complex phrase slot {grp or single!r} expands to nothing")
        slots.append(uniq)
    if not slots:
        return A.MatchNoDocsQuery("empty complex phrase")
    if len(slots) == 1:
        src = IOr(tuple(ITerm(t) for t in slots[0])) if len(slots[0]) > 1 else ITerm(slots[0][0])
        return A.IntervalQuery(src, score_mode="span")
    ops = tuple(
        IOr(tuple(ITerm(t) for t in s)) if len(s) > 1 else ITerm(s[0]) for s in slots
    )
    inner = IOrdered(ops) if in_order else IUnordered(ops)
    return A.IntervalQuery(IMaxGaps(slop, inner), score_mode="span")
