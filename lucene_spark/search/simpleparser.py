"""SimpleQueryParser — the never-throws human query syntax.

Re-expression of lucene/queryparser/src/java/org/apache/lucene/
queryparser/simple/SimpleQueryParser.java (state machine at :167-276
parseSubQuery, :289-356 consumePhrase, :358-425 consumeToken, :440-480
buildQueryTree): whatever the user types parses to SOME query; syntax
errors degrade (unmatched ``(`` / ``"`` are treated as literal or
extraneous, exactly per the reference's recovery rules).

Syntax (each feature individually flag-gated as in the reference):
  ``+``   AND junction             ``token1+token2``
  ``|``   OR junction              ``token1|token2``
  ``-``   negate next token        ``-token`` (``--token`` cancels)
  ``"``   phrase                   ``"t1 t2"``, ``"t1 t2"~5`` slop
  ``*``   trailing prefix          ``term*``
  ``~N``  fuzzy on a term          ``term~1`` (``~`` alone = 2, capped
          at 2 = LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)
  ``()``  precedence grouping
  ``\\``  escape any special char

Operator precedence is right-to-left by arrival: a junction-operator
CHANGE wraps the accumulated tree as the first clause of a new
BooleanQuery (buildQueryTree :467-476), so ``a | b + c`` evaluates
``(a OR b) AND c``.  The default junction for plain whitespace is OR
(SHOULD), switchable to AND per setDefaultOperator.

Negation compiles to the reference's exact shape: a BooleanQuery of
(MUST_NOT branch, SHOULD MatchAllDocsQuery) (:446-451) — the engine's
rewrite then folds it into the enclosing query.
"""

from __future__ import annotations

from lucene_spark.analysis import tokenize
from lucene_spark.search.ast import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    rewrite,
)

# feature flags (SimpleQueryParser.java:108-129); ALL = the -1 default
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_FLAGS = -1

_WS = " \t\n\r"
_MAX_EDITS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "current_op", "previous_op", "not_count")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top: Query | None = None
        self.current_op: Occur | None = None
        self.previous_op: Occur | None = None
        self.not_count = 0


class SimpleQueryParser:
    """parse(text) -> AST Query; never raises on query text."""

    def __init__(self, flags: int = ALL_FLAGS, default_operator: Occur = Occur.SHOULD):
        self.flags = flags
        if default_operator not in (Occur.SHOULD, Occur.MUST):
            raise ValueError("default operator must be SHOULD or MUST")
        self.default_operator = default_operator

    def _has(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    # -- public ------------------------------------------------------------

    def parse(self, text: str) -> Query:
        if text.strip() == "*":
            return MatchAllDocsQuery()
        state = _State(text, 0, len(text))
        self._parse_sub_query(state)
        if state.top is None:
            return MatchNoDocsQuery("empty string passed to query parser")
        return rewrite(state.top)

    # -- state machine (parseSubQuery :167) --------------------------------

    def _parse_sub_query(self, state: _State) -> None:
        data = state.data
        while state.index < state.length:
            ch = data[state.index]
            if ch == "(" and self._has(PRECEDENCE_OPERATORS):
                self._consume_sub_query(state)
            elif ch == ")" and self._has(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous, ignored
            elif ch == '"' and self._has(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif ch == "+" and self._has(AND_OPERATOR):
                # ignored when an op is pending or nothing precedes it
                if state.current_op is None and state.top is not None:
                    state.current_op = Occur.MUST
                state.index += 1
            elif ch == "|" and self._has(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = Occur.SHOULD
                state.index += 1
            elif ch == "-" and self._has(NOT_OPERATOR):
                state.not_count += 1
                state.index += 1
                continue  # keep not_count through the next char
            elif ch in _WS and self._has(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            state.not_count = 0

    def _consume_sub_query(self, state: _State) -> None:
        data = state.data
        start = state.index = state.index + 1
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # unmatched '(' is extraneous: rewind and let the contents
            # parse as plain tokens
            state.index = start
        elif state.index == start:
            # '()' — the pending junction would have applied to it
            state.current_op = None
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        data = state.data
        start = state.index = state.index + 1
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (
                        state.length > state.index + 1
                        and data[state.index + 1] == "~"
                        and self._has(NEAR_OPERATOR)
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # unmatched opening quote: extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase resets the junction
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        if c in _WS and self._has(WHITESPACE_OPERATOR):
            return True
        if c in "()" and self._has(PRECEDENCE_OPERATORS):
            return True
        if c == '"' and self._has(PHRASE_OPERATOR):
            return True
        if c == "+" and self._has(AND_OPERATOR):
            return True
        if c == "|" and self._has(OR_OPERATOR):
            return True
        return False

    def _consume_token(self, state: _State) -> None:
        data = state.data
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and self._has(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and self._has(PREFIX_OPERATOR)
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            edits = min(self._parse_fuzziness(state), _MAX_EDITS)
            branch = self._new_default_query(token) if edits == 0 else self._new_fuzzy_query(token, edits)
        elif prefix:
            branch = self._new_prefix_query("".join(buf[:-1]))
        else:
            branch = self._new_default_query("".join(buf))
        self._build_query_tree(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        """'~' suffix value; '~' alone = 2, non-numeric/negative = 0
        (parseFuzziness :487-520)."""
        if state.data[state.index] != "~":
            return 0
        buf: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                buf.append(state.data[state.index])
        text = "".join(buf)
        if text == "":
            return 2
        try:
            return max(0, int(text))
        except ValueError:
            return 0

    # -- tree assembly (buildQueryTree :440) -------------------------------

    def _build_query_tree(self, state: _State, branch: Query | None) -> None:
        if branch is None:
            return
        if state.not_count % 2 == 1:
            branch = BooleanQuery(((Occur.MUST_NOT, branch), (Occur.SHOULD, MatchAllDocsQuery())))
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                # junction change: accumulated tree becomes clause #1 of
                # a fresh BooleanQuery under the new junction
                state.top = BooleanQuery(((state.current_op, state.top),))
            assert isinstance(state.top, BooleanQuery)
            state.top = BooleanQuery(state.top.clauses + ((state.current_op, branch),))
            state.previous_op = state.current_op
        state.current_op = None

    # -- leaf builders (QueryBuilder role) ---------------------------------

    def _new_default_query(self, token: str) -> Query | None:
        terms = tokenize(token)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0])
        # multi-token analysis → SHOULD of term queries
        # (QueryBuilder.createBooleanQuery with Occur.SHOULD)
        return BooleanQuery(tuple((Occur.SHOULD, TermQuery(t)) for t in terms))

    def _new_phrase_query(self, phrase: str, slop: int) -> Query | None:
        terms = tokenize(phrase)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0])
        return PhraseQuery(tuple(terms), slop=slop)

    def _new_prefix_query(self, token: str) -> Query | None:
        if not token:
            return None
        return PrefixQuery(token.lower())

    def _new_fuzzy_query(self, token: str, edits: int) -> Query | None:
        if not token:
            return None
        return FuzzyQuery(token.lower(), max_edits=edits)


def parse_simple(
    text: str, flags: int = ALL_FLAGS, default_operator: Occur = Occur.SHOULD
) -> Query:
    """One-shot helper: SimpleQueryParser(flags, op).parse(text)."""
    return SimpleQueryParser(flags, default_operator).parse(text)
