"""Lucene expressions module: the JavaScript-ish numeric expression
language compiled to a Catalyst SQL expression.

Reference surface re-expressed Spark-first:
- lucene/expressions/src/java/org/apache/lucene/expressions/js/
  Javascript.g4:25-43 — the grammar (literals, arithmetic, bitwise,
  boolean/ternary, comparison, shifts, function calls, variables) with
  JavaScript operator precedence.
- js/JavascriptCompiler.java:560-700 — evaluation semantics: all
  arithmetic in IEEE double; COMPARISONS push 1.0/0.0 (pushCond);
  boolean operands and ternary conditions are truncated to integer
  and tested against 0 (typeStack INT + IFEQ/IFNE, so ``0.5 && 1``
  is FALSE); bitwise/shift operands truncate to long (pushBitwise/
  pushShift; shift counts mask to 6 bits like the JVM).
- js/JavascriptCompiler.properties — the default function table
  (abs..tanh, ln/log10/logn, min/max, pow, haversin*).
- Expression.java:21-60 / SimpleBindings.java:30-80 — compiled
  expressions evaluate per doc against *bindings* from variable name
  to a value source (a doc-value field, the relevance ``_score``, or
  another expression); unknown variables fail at bind time.
- ExpressionRescorer.java:35-90 — rescore top-N with the expression,
  first-pass relevance exposed to it as the ``_score`` binding.

Here ``compile_expression`` parses the source once (recursive-descent,
same precedence ladder as the grammar) and renders a Spark SQL string:
the compiled form is a *Catalyst expression*, so per-doc evaluation is
whole-stage-codegen JVM arithmetic — the exact role the reference's
ASM bytecode compilation plays, with zero Python in the hot path and
the same "compile once, evaluate per segment" shape at 100 TB.

Documented divergences (all NaN/edge-of-domain only):
- ``ln/log10/logn`` reproduce Java's -Infinity-at-0 / NaN-below-0
  (Spark's LN would return NULL there); comparisons and min/max carry
  explicit NaN guards matching Java semantics (Spark otherwise orders
  NaN above every double).
- ``haversin``/``haversinMeters`` use the exact haversine formula;
  the reference uses SloppyMath's approximation (error ≤ 40 cm,
  ExpressionMath.java:20-28).
- Deeply *nested* guarded functions duplicate operand text inside the
  CASE guards; Catalyst's common-subexpression elimination covers the
  evaluation cost, but pathological nesting depth (>~8 of ln/min/max)
  grows the SQL string geometrically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = [
    "JavascriptExpression",
    "compile_expression",
    "expression_rescore",
    "expression_sort",
]

# ---- lexer ------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+)
  | (?P<decimal>(?:[0-9]+\.[0-9]+|[0-9]+|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)
  | (?P<variable>[_$a-zA-Z][_$a-zA-Z0-9]*
        (?:\[(?:'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*"|[0-9]+)\])*
        (?:\.[_$a-zA-Z][_$a-zA-Z0-9]*
        (?:\[(?:'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*"|[0-9]+)\])*)*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!~&^|<>?:,])
    """,
    re.VERBOSE,
)


def _lex(source: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(source):
        m = _TOKEN.match(source, i)
        if m is None:
            raise ValueError(f"invalid character at position {i}: {source[i:i + 10]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---- parser (precedence climbing over the Javascript.g4 ladder) --------------

# Javascript.g4:28-43, lowest first. Ternary is handled separately
# (right-assoc); unary and primary below the table.
_BINARY_LEVELS: tuple[tuple[str, ...], ...] = (
    ("||",),
    ("&&",),
    ("|",),
    ("^",),
    ("&",),
    ("==", "!="),
    ("<", "<=", ">", ">="),
    ("<<", ">>", ">>>"),
    ("+", "-"),
    ("*", "/", "%"),
)

_FUNCTIONS: dict[str, int] = {
    # JavascriptCompiler.properties — name -> arity
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1, "atan": 1,
    "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1, "cosh": 1, "exp": 1,
    "floor": 1, "haversin": 4, "haversinMeters": 4, "ln": 1, "log10": 1,
    "logn": 2, "max": 2, "min": 2, "pow": 2, "sin": 1, "sinh": 1,
    "sqrt": 1, "tan": 1, "tanh": 1,
}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.pos = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.pos]

    def take(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, text: str) -> None:
        kind, val = self.take()
        if val != text:
            raise ValueError(f"expected {text!r}, got {val or kind!r}")

    def parse(self) -> tuple:
        node = self.ternary()
        kind, val = self.take()
        if kind != "eof":
            raise ValueError(f"unexpected trailing input: {val!r}")
        return node

    def ternary(self) -> tuple:
        cond = self.binary(0)
        if self.peek()[1] == "?":
            self.take()
            then = self.ternary()
            self.expect(":")
            other = self.ternary()  # right-assoc (g4 <assoc=right>)
            return ("cond", cond, then, other)
        return cond

    def binary(self, level: int) -> tuple:
        if level >= len(_BINARY_LEVELS):
            return self.unary()
        node = self.binary(level + 1)
        ops = _BINARY_LEVELS[level]
        while self.peek()[1] in ops and self.peek()[0] == "op":
            _, op = self.take()
            rhs = self.binary(level + 1)
            node = ("bin", op, node, rhs)
        return node

    def unary(self) -> tuple:
        kind, val = self.peek()
        if kind == "op" and val in ("!", "~", "+", "-"):
            self.take()
            return ("un", val, self.unary())
        return self.primary()

    def primary(self) -> tuple:
        kind, val = self.take()
        if val == "(":
            node = self.ternary()
            self.expect(")")
            return node
        if kind == "hex":
            return ("num", float(int(val, 16)))
        if kind == "octal":
            return ("num", float(int(val, 8)))
        if kind == "decimal":
            return ("num", float(val))
        if kind == "variable":
            if self.peek()[1] == "(":
                self.take()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.ternary())
                    while self.peek()[1] == ",":
                        self.take()
                        args.append(self.ternary())
                self.expect(")")
                arity = _FUNCTIONS.get(val)
                if arity is None:
                    raise ValueError(f"unknown function {val!r}")
                if arity != len(args):
                    raise ValueError(f"{val} expects {arity} argument(s), got {len(args)}")
                return ("call", val, tuple(args))
            return ("var", val)
        raise ValueError(f"unexpected token {val or kind!r}")


# ---- SQL rendering ------------------------------------------------------------

_NAN = "CAST('NaN' AS DOUBLE)"
_NEG_INF = "CAST('-Infinity' AS DOUBLE)"
# mean earth radius used by the reference's haversin (SloppyMath
# TO_METERS = 6371008.7714; ExpressionMath divides by 1000 for km)
_EARTH_M = "6371008.7714"


def _long(x: str) -> str:
    # JVM d2l: truncate toward zero, NaN -> 0, out-of-range saturates
    # to Long.MIN/MAX. try_cast gives the truncation and NULLs the
    # edge cases (works under ANSI mode, where a plain CAST throws).
    return (
        f"coalesce(try_cast({x} AS BIGINT), "
        f"CASE WHEN isnan({x}) THEN 0L WHEN {x} > 0.0D "
        f"THEN 9223372036854775807L ELSE -9223372036854775808L END)"
    )


def _int(x: str) -> str:
    # JVM d2i (shift counts): same, saturating at Integer.MIN/MAX.
    return (
        f"coalesce(try_cast({x} AS INT), "
        f"CASE WHEN isnan({x}) THEN 0 WHEN {x} > 0.0D "
        f"THEN 2147483647 ELSE -2147483648 END)"
    )


def _truth(x: str) -> str:
    # JavascriptCompiler pushes INT for boolean contexts: the operand
    # is TRUNCATED to integer, then tested != 0 (so 0.5 is falsy and
    # d2l(NaN) = 0 makes NaN falsy).
    return f"({_long(x)} <> 0)"


def _bool(cond: str) -> str:
    return f"(CASE WHEN {cond} THEN 1.0D ELSE 0.0D END)"


def _cmp(op: str, a: str, b: str) -> str:
    # Java double comparison: any NaN operand -> false (true for !=);
    # Spark instead orders NaN above all doubles, hence the guard.
    nan_result = "1.0D" if op == "!=" else "0.0D"
    op = {"==": "=", "!=": "<>"}.get(op, op)
    return (
        f"(CASE WHEN isnan({a}) OR isnan({b}) THEN {nan_result} "
        f"ELSE (CASE WHEN {a} {op} {b} THEN 1.0D ELSE 0.0D END) END)"
    )


def _ln_like(fn: str, x: str) -> str:
    # Math.log semantics: log(0) = -Inf, log(<0) = NaN; Spark's LN
    # returns NULL for both, so spell the domain edges out.
    return (
        f"(CASE WHEN {x} IS NULL THEN CAST(NULL AS DOUBLE) "
        f"WHEN {x} > 0.0D THEN {fn}({x}) "
        f"WHEN {x} = 0.0D THEN {_NEG_INF} ELSE {_NAN} END)"
    )


def _minmax(fn: str, a: str, b: str) -> str:
    # Math.max/min propagate NaN; GREATEST/LEAST would drop it.
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN CAST(NULL AS DOUBLE) "
        f"WHEN isnan({a}) OR isnan({b}) THEN {_NAN} ELSE {fn}({a}, {b}) END)"
    )


def _haversin(unit: str, args: list[str]) -> str:
    lat1, lon1, lat2, lon2 = args
    h = (
        f"POWER(SIN(RADIANS(({lat2}) - ({lat1})) / 2), 2) + "
        f"COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
        f"POWER(SIN(RADIANS(({lon2}) - ({lon1})) / 2), 2)"
    )
    meters = f"(2.0D * {_EARTH_M} * ASIN(SQRT({h})))"
    return meters if unit == "m" else f"({meters} / 1000.0D)"


def _render(node: tuple, bind) -> str:
    tag = node[0]
    if tag == "num":
        v = node[1]
        if v != v:
            return _NAN
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        return f"CAST('{v!r}' AS DOUBLE)"
    if tag == "var":
        return bind(node[1])
    if tag == "un":
        _, op, sub = node
        x = _render(sub, bind)
        if op == "-":
            return f"(- {x})"
        if op == "+":
            return x
        if op == "!":
            return _bool(f"NOT {_truth(x)}")
        return f"CAST(~ {_long(x)} AS DOUBLE)"  # ~
    if tag == "cond":
        _, c, t, e = node
        return (
            f"(CASE WHEN {_truth(_render(c, bind))} THEN {_render(t, bind)} "
            f"ELSE {_render(e, bind)} END)"
        )
    if tag == "call":
        _, name, args = node
        xs = [_render(a, bind) for a in args]
        if name in ("ln",):
            return _ln_like("LN", xs[0])
        if name == "log10":
            return _ln_like("LOG10", xs[0])
        if name == "logn":  # MathUtil.log(base, x) = log(x)/log(base)
            return f"({_ln_like('LN', xs[1])} / {_ln_like('LN', xs[0])})"
        if name in ("ceil", "floor"):
            # Math.ceil/floor return DOUBLE; Spark's return BIGINT (an
            # ANSI overflow for huge inputs). |x| >= 2^52 is already
            # integral (likewise NaN/Inf pass through).
            x = xs[0]
            return (
                f"(CASE WHEN {x} IS NULL THEN CAST(NULL AS DOUBLE) "
                f"WHEN isnan({x}) OR abs({x}) >= 4503599627370496.0D THEN {x} "
                f"ELSE CAST({name.upper()}({x}) AS DOUBLE) END)"
            )
        if name == "max":
            return _minmax("GREATEST", xs[0], xs[1])
        if name == "min":
            return _minmax("LEAST", xs[0], xs[1])
        if name == "pow":
            return f"POWER({xs[0]}, {xs[1]})"
        if name == "haversin":
            return _haversin("km", xs)
        if name == "haversinMeters":
            return _haversin("m", xs)
        return f"{name.upper()}({xs[0]})" if len(xs) == 1 else (
            f"{name.upper()}({xs[0]}, {xs[1]})"
        )
    if tag == "bin":
        _, op, l, r = node
        a, b = _render(l, bind), _render(r, bind)
        if op in ("+", "-", "*"):
            return f"(CAST({a} AS DOUBLE) {op} CAST({b} AS DOUBLE))"
        if op == "/":
            # IEEE double division (JVM DDIV): x/0 = +-Inf, 0/0 = NaN.
            # Spark under ANSI throws DIVIDE_BY_ZERO instead — spell
            # the zero-divisor branches out (divergence: a NEGATIVE
            # zero divisor yields +Inf here, -Inf on the JVM).
            return (
                f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN CAST(NULL AS DOUBLE) "
                f"WHEN {b} <> 0.0D THEN CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE) "
                f"WHEN isnan({a}) OR {a} = 0.0D THEN {_NAN} "
                f"WHEN {a} > 0.0D THEN CAST('Infinity' AS DOUBLE) "
                f"ELSE {_NEG_INF} END)"
            )
        if op == "%":
            # JVM DREM: x % 0 = NaN (ANSI Spark would throw).
            return (
                f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN CAST(NULL AS DOUBLE) "
                f"WHEN {b} = 0.0D THEN {_NAN} "
                f"ELSE CAST({a} AS DOUBLE) % CAST({b} AS DOUBLE) END)"
            )
        if op in ("<", "<=", ">", ">=", "==", "!="):
            return _cmp(op, a, b)
        if op == "&&":
            return _bool(f"{_truth(a)} AND {_truth(b)}")
        if op == "||":
            return _bool(f"{_truth(a)} OR {_truth(b)}")
        if op in ("&", "|", "^"):
            return f"CAST(({_long(a)} {op} {_long(b)}) AS DOUBLE)"
        fn = {"<<": "SHIFTLEFT", ">>": "SHIFTRIGHT", ">>>": "SHIFTRIGHTUNSIGNED"}[op]
        # pushShift: left goes through long, the COUNT through int
        # (the JVM then masks it to 6 bits — SHIFTLEFT(BIGINT, ...)
        # does the same)
        return f"CAST({fn}({_long(a)}, {_int(b)}) AS DOUBLE)"
    raise AssertionError(f"unknown node {tag}")


def _collect_vars(node: tuple, out: list) -> None:
    tag = node[0]
    if tag == "var" and node[1] not in out:
        out.append(node[1])
    elif tag == "un":
        _collect_vars(node[2], out)
    elif tag == "cond":
        for sub in node[1:]:
            _collect_vars(sub, out)
    elif tag == "call":
        for sub in node[2]:
            _collect_vars(sub, out)
    elif tag == "bin":
        _collect_vars(node[2], out)
        _collect_vars(node[3], out)


_BARE_ID = re.compile(r"[_a-zA-Z][_a-zA-Z0-9]*\Z")


@dataclass(frozen=True)
class JavascriptExpression:
    """A parsed expression (Expression.java role). ``variables`` lists
    the external variables in first-use order (VariableContext role).
    ``sql``/``column`` bind variables and produce the Catalyst form."""

    source: str
    ast: tuple
    variables: tuple[str, ...]

    def sql(self, bindings: dict | None = None, _depth: int = 0) -> str:
        """Render to a Spark SQL expression string. ``bindings`` maps
        variable name -> column name, SQL fragment, or another
        JavascriptExpression (SimpleBindings.java:30-80: a binding may
        itself be an expression). Unbound *bare* identifiers bind to
        the like-named column (the idiomatic Spark default); unbound
        dotted/bracketed variables raise like SimpleBindings.validate.
        """
        if _depth > 10:
            raise ValueError("expression binding cycle or depth > 10")
        bindings = bindings or {}

        def bind(name: str) -> str:
            v = bindings.get(name)
            if v is None:
                if _BARE_ID.fullmatch(name):
                    return f"COALESCE(CAST(`{name}` AS DOUBLE), CAST(0.0 AS DOUBLE))"
                raise ValueError(
                    f"invalid reference {name!r}: not in bindings "
                    f"{sorted(bindings)} and not a bare column name"
                )
            if isinstance(v, JavascriptExpression):
                return v.sql(bindings, _depth=_depth + 1)
            # a doc with no value reads as 0.0 at the VARIABLE level
            # (the DoubleValues binding contract — ExpressionValueSource
            # evaluates every variable to a double, value-less docs
            # yield 0; lucene/expressions/.../ExpressionValueSource.java)
            # so a NULL column never propagates NULL through the
            # rendered expression (and collection sites never see None)
            if _BARE_ID.fullmatch(str(v)):
                return f"COALESCE(CAST(`{v}` AS DOUBLE), CAST(0.0 AS DOUBLE))"
            return f"COALESCE(CAST(({v}) AS DOUBLE), CAST(0.0 AS DOUBLE))"

        return _render(self.ast, bind)

    def column(self, bindings: dict | None = None):
        from pyspark.sql import functions as F

        return F.expr(self.sql(bindings))


def compile_expression(source: str) -> JavascriptExpression:
    """JavascriptCompiler.compile(sourceText) role: parse once, reuse
    across bindings. Raises ValueError on syntax errors, unknown
    functions, or wrong arity (ParseException role)."""
    ast = _Parser(_lex(source)).parse()
    vs: list[str] = []
    _collect_vars(ast, vs)
    return JavascriptExpression(source, ast, tuple(vs))


# ---- search integration --------------------------------------------------------


def expression_sort(
    searcher, query, docs_df, expression, bindings=None, k: int = 10, ascending: bool = False
):
    """Expression.getSortField(bindings, reverse) +
    TopFieldCollector role: matches of ``query`` ordered by the
    expression value. ORDER BY <catalyst expr> LIMIT k — Catalyst runs
    it as TakeOrderedAndProject (per-partition top-k, then merge), the
    same early-termination shape the reference gets per leaf. Returns
    (rank, doc_id, sort_value)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from lucene_spark.search.postprocess import _join_hits, hits_frame

    if isinstance(expression, str):
        expression = compile_expression(expression)
    val = F.expr(expression.sql(bindings)).cast("double")
    ids = hits_frame(searcher, query, "driver").select("doc_id")
    order = [val.asc() if ascending else val.desc(), F.asc("doc_id")]
    ranked = _join_hits(docs_df, ids, "driver").withColumn("sort_value", val)
    w = Window.orderBy(
        F.col("sort_value").asc() if ascending else F.col("sort_value").desc(),
        F.asc("doc_id"),
    )
    return (
        ranked.orderBy(*order)
        .limit(k)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            F.col("doc_id").cast("long"),
            "sort_value",
        )
    )


def expression_rescore(
    searcher, first_pass, expression, docs_df, bindings=None, top_n: int = 10
):
    """ExpressionRescorer.java:35-90: re-rank the first-pass top docs
    by the expression value, the first-pass relevance bound as
    ``_score``. Only the O(first-pass) hit rows are evaluated; the
    expression itself runs in Catalyst over (hits ⨝ docs). Returns a
    TopDocs with the expression value as the score; ``total_hits`` is
    unchanged (rescoring reorders, it never changes the match set)."""
    from pyspark.sql import functions as F

    from lucene_spark.search.engine import TopDocs

    hits = list(first_pass.hits)
    if not hits:
        return TopDocs([], first_pass.total_hits, first_pass.relation, {"mode": "expr-rescore"})
    if isinstance(expression, str):
        expression = compile_expression(expression)
    bindings = dict(bindings or {})
    bindings.setdefault("_score", "_score")
    spark = searcher.index.spark
    ids = spark.createDataFrame(
        [(int(d), float(s)) for d, s in hits], "doc_id bigint, _score double"
    )
    joined = docs_df.join(F.broadcast(ids), "doc_id")
    rows = joined.select(
        "doc_id", F.expr(expression.sql(bindings)).cast("double").alias("v")
    ).collect()
    combined = sorted(
        # v can still be NULL at cast domain edges (try_cast truncation)
        ((int(r["doc_id"]), 0.0 if r["v"] is None else float(r["v"])) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )
    return TopDocs(
        combined[:top_n], first_pass.total_hits, first_pass.relation, {"mode": "expr-rescore"}
    )
