"""TermAutomatonQuery — a proximity query whose transitions are terms.

The reference's sandbox operator (lucene/sandbox/src/java/org/apache/
lucene/sandbox/search/TermAutomatonQuery.java:66-80 javadoc): build an
automaton with ``create_state`` / ``set_accept`` / ``add_transition`` /
``add_any_transition``, then ``finish()`` — a generalization of
PhraseQuery / MultiPhraseQuery / SpanNearQuery. Matching visits every
doc holding ANY of the automaton's terms (a disjunction, not a
conjunction — TermAutomatonQuery.java:69-71) and merge-sorts positions
within each doc, running the determinized automaton over the token
stream; freq = the number of accept-state arrivals via term arcs or
initial-state seeds (TermAutomatonScorer.countMatches:222-345 — ANY
advances state but never bumps freq, and a match can never START with
an ANY arc because only term steps seed from state 0).

``finish()`` fidelity (TermAutomatonQuery.java finish():
- leading ANY (an ANY arc out of state 0) is rejected;
- trailing ANY (an ANY arc into an accept state) is rejected;
- every ANY arc is EXPANDED to match every term id (min=0 ..
  termCount-1, including the any id itself) before determinization, so
  a term step in the determinized automaton already subsumes the ANY
  alternative through subset merging;
- the determinized automaton must not accept the empty string.

The scorer's per-doc state walk is replicated by :func:`automaton_freq`
(position-indexed multisets of DFA states with path counts, the
PosState.count/add contract of TermAutomatonScorer:370-390 which never
deduplicates arrivals).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TermDFA:
    """Determinized term automaton in hashable form. ``terms[i]`` is
    the surface term of symbol ``i`` (None for the ANY symbol);
    ``steps`` is the flat transition table ((state, symbol, dest), …);
    state 0 is initial."""

    terms: tuple  # tuple[str | None, ...] — symbol id -> term
    steps: tuple  # tuple[tuple[int, int, int], ...]
    accepts: tuple  # tuple[int, ...]
    n_states: int
    any_sym: int | None = None

    def step_table(self) -> dict:
        return {(s, a): d for s, a, d in self.steps}

    def real_terms(self) -> tuple:
        return tuple(t for t in self.terms if t is not None)


class TermAutomatonBuilder:
    """The TermAutomatonQuery build surface (createState / setAccept /
    addTransition / addAnyTransition / finish —
    TermAutomatonQuery.java:99-135). State 0 is always initial."""

    def __init__(self):
        self._n = 1  # state 0 exists up front
        self._accept: set[int] = set()
        self._arcs: list[tuple[int, int, int]] = []  # (src, sym, dst)
        self._term_id: dict = {}
        self._id_term: dict = {}
        self._any_id: int | None = None
        self._finished = False

    def create_state(self) -> int:
        s = self._n
        self._n += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def _sym(self, term) -> int:
        if term in self._term_id:
            return self._term_id[term]
        i = len(self._term_id)
        self._term_id[term] = i
        self._id_term[i] = term
        if term is None:
            self._any_id = i
        return i

    def add_transition(self, src: int, dst: int, term: str) -> None:
        if term is None:
            raise ValueError("use add_any_transition for ANY arcs")
        self._arcs.append((src, self._sym(term), dst))

    def add_any_transition(self, src: int, dst: int) -> None:
        """An arc matching ANY token, query term or not
        (addAnyTransition, TermAutomatonQuery.java:125-128)."""
        self._arcs.append((src, self._sym(None), dst))

    def finish(self) -> TermDFA:
        """Validate, expand ANY arcs over the whole term alphabet, and
        determinize (subset construction — the Operations.determinize
        role). Mirrors finish()'s rejections verbatim."""
        any_id = self._any_id
        if any_id is not None:
            for src, sym, dst in self._arcs:
                if sym == any_id and src == 0:
                    raise ValueError("automaton cannot lead with an ANY transition")
                if sym == any_id and dst in self._accept:
                    raise ValueError("automaton cannot end with an ANY transition")
        term_count = len(self._term_id)
        # ANY expansion: the arc matches every symbol id (incl. any_id)
        arcs = []
        for src, sym, dst in self._arcs:
            if any_id is not None and sym == any_id:
                arcs.extend((src, a, dst) for a in range(term_count))
            else:
                arcs.append((src, sym, dst))
        # NFA -> DFA subset construction
        from collections import defaultdict

        nfa = defaultdict(set)
        for src, sym, dst in arcs:
            nfa[(src, sym)].add(dst)
        start = frozenset([0])
        subset_id = {start: 0}
        order = [start]
        dfa_steps = []
        i = 0
        while i < len(order):
            cur = order[i]
            i += 1
            by_sym = defaultdict(set)
            for s in cur:
                for a in range(term_count):
                    by_sym[a] |= nfa.get((s, a), set())
            for a, tgt in by_sym.items():
                if not tgt:
                    continue
                key = frozenset(tgt)
                if key not in subset_id:
                    subset_id[key] = len(order)
                    order.append(key)
                dfa_steps.append((subset_id[cur], a, subset_id[key]))
        accepts = tuple(
            i for i, sub in enumerate(order) if sub & self._accept
        )
        if 0 in accepts:
            raise ValueError("cannot accept the empty string")
        terms = tuple(self._id_term[i] for i in range(term_count))
        return TermDFA(
            terms=terms,
            steps=tuple(sorted(dfa_steps)),
            accepts=accepts,
            n_states=len(order),
            any_sym=any_id,
        )


def token_stream_to_automaton(tokens) -> TermDFA:
    """TokenStreamToTermAutomatonQuery.toQuery (TokenStreamToTerm
    AutomatonQuery.java:56-110): build the automaton from a token
    GRAPH — ``tokens`` is an iterable of (term, pos_inc, pos_length);
    states are positions, each token is an arc pos → pos+pos_length,
    the literal term '*' becomes an ANY arc, holes (pos_inc > 1) are
    rejected ("cannot handle holes; to accept any term, use '*'
    term"), and the last state is the (single) accept state."""
    b = TermAutomatonBuilder()
    pos = -1
    max_state = 0
    for term, pos_inc, pos_length in tokens:
        if pos_inc > 1:
            raise ValueError("cannot handle holes; to accept any term, use '*' term")
        if pos == -1 and pos_inc == 0:
            raise ValueError("first token must have pos_inc > 0")
        if pos_inc > 0:
            pos += pos_inc
        end_pos = pos + pos_length
        while max_state < end_pos:
            max_state = b.create_state()
        if term == "*":
            b.add_any_transition(pos, end_pos)
        else:
            b.add_transition(pos, end_pos, term)
    if pos == -1:
        raise ValueError("empty token stream")
    b.set_accept(max_state)
    return b.finish()


def try_rewrite(dfa: TermDFA):
    """TermAutomatonQuery.rewrite (TermAutomatonQuery.java:430-520):
    a single-term singleton becomes a TermQuery; a "sausage" (linear
    chain of positions, each position a set of terms, no ANY arcs, no
    mid-chain accepts) becomes PhraseQuery / MultiPhraseQuery. Returns
    the rewritten AST query or None to keep the automaton kernel."""
    from lucene_spark.search import ast as A

    table = dfa.step_table()
    if not dfa.steps:
        return A.MatchNoDocsQuery("empty term automaton")
    if dfa.any_sym is not None:
        return None  # ANY arcs only run through the automaton kernel
    accepts = set(dfa.accepts)
    slots: list[tuple] = []
    state = 0
    seen = {0}
    while True:
        arcs = [(a, d) for (s, a), d in table.items() if s == state]
        if not arcs:
            if state not in accepts:
                return A.MatchNoDocsQuery("term automaton accepts nothing")
            break
        if state in accepts:
            return None  # mid-chain accept: not a sausage
        dests = {d for _, d in arcs}
        if len(dests) != 1:
            return None
        dest = dests.pop()
        if dest in seen:
            return None  # cycle
        seen.add(dest)
        slots.append(tuple(sorted(dfa.terms[a] for a, _ in arcs)))
        state = dest
    if len(slots) == 1 and len(slots[0]) == 1:
        return A.TermQuery(slots[0][0])
    if all(len(s) == 1 for s in slots):
        return A.PhraseQuery(tuple(s[0] for s in slots))
    return A.MultiPhraseQuery(tuple(slots))


def automaton_freq(tok_stream, dfa_steps: dict, accepts, any_sym) -> int:
    """The TermAutomatonScorer.countMatches state walk (:222-345) over
    ONE doc's merged (position, symbol) stream of QUERY-TERM tokens,
    sorted by position. Maintains per-position path-count multisets of
    DFA states (PosState never deduplicates — :370-390), sweeps ANY
    from the PREVIOUS token position through the holes (:266-292 —
    ``startLastPos`` guard: the first iteration runs even with
    count==0, so the states at last_pos are ANY-stepped IN ADDITION to
    the term step they already took; a dist-2 span whose gap token is
    itself a query term therefore arrives twice, once via the expanded
    det term step and once via the separate any-symbol step, and
    PosState.add keeps both), seeds state 0 at every token (:320-329),
    and counts an accept arrival only on term steps and seeds
    (:313-316, 325-328 — never on ANY advances).

    ``tok_stream``: iterable of (pos, sym) sorted by pos (ties in any
    order — same-position stacked tokens all step from the same source
    set, the posQueue pop order contract).
    """
    from collections import defaultdict

    R: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    freq = 0
    last_pos = None
    for pos, sym in tok_stream:
        if any_sym is not None and last_pos is not None and last_pos < pos:
            # sweep ANY from last_pos (inclusive) up to pos-1 — the
            # reference starts AT lastPos (:268 `int startLastPos =
            # lastPos; while (lastPos < pos)`) so the source states of
            # the previous token get an any-symbol step IN ADDITION to
            # the term step they already took; the petered-out break
            # (:275-279) fires only past the first iteration.
            q = last_pos
            while q < pos:
                src = R.get(q)
                if not src:
                    if q > last_pos:
                        break  # petered out (:275-279)
                    q += 1
                    continue  # first iteration runs even with count==0
                nxt = R[q + 1]
                for s, c in src.items():
                    d = dfa_steps.get((s, any_sym))
                    if d is not None:
                        nxt[d] += c
                q += 1
        src = R.get(pos)
        if src:
            nxt = R[pos + 1]
            for s, c in src.items():
                d = dfa_steps.get((s, sym))
                if d is not None:
                    nxt[d] += c
                    if d in accepts:
                        freq += c
        d = dfa_steps.get((0, sym))
        if d is not None:
            R[pos + 1][d] += 1
            if d in accepts:
                freq += 1
        last_pos = pos
    return freq
