"""Query-time synonym expansion — the SynonymGraphFilter / QueryBuilder
synonym role.

The reference applies synonyms with an analyzer stage
(lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
SynonymGraphFilter.java:55-90, built from SynonymMap.Builder), and
QueryBuilder turns same-position alternatives into a SynonymQuery
(QueryBuilder.java:391-400, newSynonymQuery) for single-token terms or
per-position alternatives of a MultiPhraseQuery for phrases
(QueryBuilder.java:544-560, analyzeMultiPhrase).

Here the same behavior runs as an AST rewrite (query-time synonyms —
the common deployment, since index-time synonyms bake the map into the
postings): every analyzed term that hits the map becomes the blended
SynonymQuery of its group; phrase slots grow same-position
alternatives (PhraseQuery → MultiPhraseQuery).  Expansion applies only
to ``field``-matching leaves; multi-term patterns (prefix/wildcard/
fuzzy/regexp/range) are never analyzed, matching the reference's
QueryBuilder contract.
"""

from __future__ import annotations

from lucene_spark.search import ast as A


def _norm_map(groups) -> dict[str, tuple[str, ...]]:
    """Accepts {term: alts} or an iterable of synonym groups (every
    member expands to the whole group, the SynonymMap.Builder
    ``add(..., includeOrig=true)`` bidirectional shape).  Keys and
    values are lowercased; a term never lists itself as an alt."""
    out: dict[str, tuple[str, ...]] = {}
    if isinstance(groups, dict):
        items = [(k, tuple(v) if not isinstance(v, str) else (v,)) for k, v in groups.items()]
        for k, alts in items:
            k = k.lower()
            out[k] = tuple(dict.fromkeys(a.lower() for a in alts if a.lower() != k))
    else:
        for group in groups:
            g = tuple(dict.fromkeys(t.lower() for t in group))
            for t in g:
                alts = tuple(x for x in g if x != t)
                out[t] = tuple(dict.fromkeys(out.get(t, ()) + alts))
    return {k: v for k, v in out.items() if v}


class SynonymMap:
    """Immutable term → alternatives map (SynonymMap role)."""

    def __init__(self, groups):
        self.map = _norm_map(groups)

    def alts(self, term: str) -> tuple[str, ...]:
        return self.map.get(term, ())


def expand_synonyms(q: A.Query, syn: "SynonymMap | dict | list", field: str = "content") -> A.Query:
    """Rewrite ``q`` with synonym expansion on ``field``'s analyzed
    leaves: TermQuery → SynonymQuery(group); PhraseQuery /
    MultiPhraseQuery slots → per-position alternatives.  Everything
    else passes through structurally (booleans/dismax/boost recurse)."""
    if not isinstance(syn, SynonymMap):
        syn = SynonymMap(syn)
    return _walk(q, syn, field)


def _slot_alts(terms: tuple[str, ...], syn: SynonymMap) -> tuple[str, ...]:
    out = list(terms)
    for t in terms:
        for a in syn.alts(t):
            if a not in out:
                out.append(a)
    return tuple(out)


def _walk(q: A.Query, syn: SynonymMap, field: str) -> A.Query:
    if isinstance(q, A.TermQuery) and q.field == field:
        alts = syn.alts(q.term)
        if alts:
            return A.SynonymQuery((q.term,) + alts, field=field)
        return q
    if isinstance(q, A.SynonymQuery) and q.field == field:
        return A.SynonymQuery(_slot_alts(q.terms, syn), field=field)
    if isinstance(q, A.PhraseQuery) and q.field == field:
        slots = tuple(_slot_alts((t,), syn) for t in q.terms)
        if all(len(s) == 1 for s in slots):
            return q
        return A.MultiPhraseQuery(slots, slop=q.slop, field=field)
    if isinstance(q, A.MultiPhraseQuery) and getattr(q, "field", field) == field:
        return A.MultiPhraseQuery(
            tuple(_slot_alts(s, syn) for s in q.positions), slop=q.slop, field=q.field
        )
    if isinstance(q, A.BooleanQuery):
        return A.BooleanQuery(
            tuple((occ, _walk(sub, syn, field)) for occ, sub in q.clauses),
            q.minimum_should_match,
        )
    if isinstance(q, A.DisjunctionMaxQuery):
        return A.DisjunctionMaxQuery(
            tuple(_walk(sub, syn, field) for sub in q.queries), q.tie_breaker
        )
    if isinstance(q, A.BoostQuery):
        return A.BoostQuery(_walk(q.query, syn, field), q.boost)
    if isinstance(q, A.ConstantScoreQuery):
        return A.ConstantScoreQuery(_walk(q.query, syn, field))
    return q
