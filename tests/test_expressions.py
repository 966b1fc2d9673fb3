"""The JS expression language (lucene/expressions js/JavascriptCompiler):
golden value tests mirror TestJavascriptOperations.java /
TestJavascriptFunction.java; binding/sort/rescore tests mirror
TestExpressionSorts / ExpressionRescorer semantics with brute-force
python oracles."""

from __future__ import annotations

import math

import pytest

from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.expressions import (
    compile_expression,
    expression_rescore,
    expression_sort,
)

# (source, expected) — long-valued goldens from the reference's
# TestJavascriptOperations.java assertEvaluatesTo tables (result cast
# to long exactly as that harness does)
LONG_GOLDENS = [
    ("-1", -1), ("--1", 1), ("-(-1)", 1), ("1+0.5+0.5", 2), ("1+(1+2)", 4),
    ("1-(1-2)", 2), ("50*0.1", 5), ("10/0.5", 20), ("27/(9/3)", 9),
    ("1/0", 9223372036854775807), ("10%3", 1), ("27%(9%5)", 3),
    ("2 < 1 < 3", 1), ("2 < (1 < 3)", 0), ("(2 < 1) < 1", 1),
    ("1 <= 1 <= 0", 0), ("2 > (1 > 3)", 1), ("1 >= 1 >= 0", 1),
    ("-0 == 0", 1), ("1.1 == 1.1", 1), ("-2 != -1", 1),
    ("!1", 0), ("!!1", 1), ("!-2", 0),
    ("1 && 1", 1), ("-1 && -1", 1), ("-0 && -0", 0), ("0 || -1", 1),
    ("-0 || -0", 0),
    ("1 ? 2 : 3", 2), ("0 ? 2 : 3", 3), ("1 ? 2 ? 3 : 4 : 5", 3),
    ("0 ? 2 ? 3 : 4 : 5", 5), ("1 ? 0 ? 3 : 4 : 5", 4),
    ("0 ? 2 : 3 ? 4 : 5", 4), ("(0 ? 1 : 0) ? 3 : 4", 4),
    ("-1 << 31", -2147483648), ("4195 << 66", 16780),
    ("-4195 << 70", -268480), ("-15 << 62", 4611686018427387904),
    ("-1 >> 5", -1), ("-2147483646 >> 1", -1073741823), ("268480 >> 70", 4195),
    ("-1 >>> 37", 134217727), ("-5 >>> 33", 2147483647),
    ("-268480 >>> 102", 67108863), ("2147483648 >>> 1", 1073741824),
    ("7 & 3", 3), ("-1 & 25", 25), ("-100 | 15", -97), ("-1 ^ -5", 4),
    ("-100 ^ 15", -109), ("~-5", 4), ("~0", -1),
    ("5.6E2", 560), ("500E-2", 5), ("0x1234ABCDEF", 78193085935),
    ("0XF", 15), ("010", 8), ("0123456777", 21913087),
    ("1 << 0xA", 1024), ("010 << 2", 32),
    # truthiness truncates to integer (typeStack INT in the compiler)
    ("0.5 && 1", 0),
    ("min(2,3)", 2), ("max(45,46)", 46), ("abs(-5)", 5), ("pow(2,10)", 1024),
    ("floor(-2.5)", -3), ("ceil(2.1)", 3), ("sqrt(81)", 9), ("ln(exp(3))", 3),
    ("logn(2, 8)", 3), ("log10(1000)", 3),
]

# double-valued goldens (TestJavascriptFunction.java)
DOUBLE_GOLDENS = [
    ("logn(2, 12.3456789)", 3.6259342686489378),
    ("logn(2.5, 0.5)", -0.75647079736603),
    ("ln(0)", float("-inf")),
    ("0.1*2 + ln(1+3) - min(0.5, 0.25)", 0.2 + 1.3862943611198906 - 0.25),
]

# Java NaN semantics: comparisons false (!= true), truthiness false,
# min/max propagate (the reference's pushCond / ExpressionMath paths)
NAN_GOLDENS = [
    ("ln(-1) == ln(-1)", 0.0), ("ln(-1) != 3", 1.0), ("ln(-1) && 1", 0.0),
    ("(1/0) && 1", 1.0), ("0/0 < 1", 0.0), ("ln(-1) ? 5 : 7", 7.0),
]


class TestGoldens:
    def test_long_goldens(self, spark):
        cols = [
            f"coalesce(try_cast({compile_expression(s).sql()} AS BIGINT), "
            f"9223372036854775807L) AS c{i}"
            for i, (s, _) in enumerate(LONG_GOLDENS)
        ]
        row = spark.sql("SELECT " + ", ".join(cols)).collect()[0]
        for i, (s, want) in enumerate(LONG_GOLDENS):
            assert row[f"c{i}"] == want, s

    def test_double_goldens(self, spark):
        cols = [
            f"({compile_expression(s).sql()}) AS f{i}"
            for i, (s, _) in enumerate(DOUBLE_GOLDENS)
        ]
        row = spark.sql("SELECT " + ", ".join(cols)).collect()[0]
        for i, (s, want) in enumerate(DOUBLE_GOLDENS):
            got = row[f"f{i}"]
            assert got == want or math.isclose(got, want, rel_tol=1e-12), s

    def test_nan_semantics(self, spark):
        cols = [
            f"CAST({compile_expression(s).sql()} AS DOUBLE) AS n{i}"
            for i, (s, _) in enumerate(NAN_GOLDENS)
        ]
        row = spark.sql("SELECT " + ", ".join(cols)).collect()[0]
        for i, (s, want) in enumerate(NAN_GOLDENS):
            assert row[f"n{i}"] == want, s

    def test_nan_minmax(self, spark):
        sql = compile_expression("max(ln(-1), 5)").sql()
        got = spark.sql(f"SELECT CAST({sql} AS DOUBLE) AS v").collect()[0]["v"]
        assert math.isnan(got)

    def test_haversin(self, spark):
        # ExpressionMath.haversinKilometers on the reference's NYC pair;
        # we use the exact formula, the reference SloppyMath (<=40cm err)
        sql = compile_expression(
            "haversin(40.7143528, -74.0059731, 40.759011, -73.9844722)"
        ).sql()
        got = spark.sql(f"SELECT ({sql}) AS v").collect()[0]["v"]
        assert math.isclose(got, 5.285885589128556, rel_tol=1e-4)
        sqlm = compile_expression(
            "haversinMeters(40.7143528, -74.0059731, 40.759011, -73.9844722)"
        ).sql()
        gotm = spark.sql(f"SELECT ({sqlm}) AS v").collect()[0]["v"]
        assert math.isclose(gotm, got * 1000.0, rel_tol=1e-12)


class TestCompile:
    def test_syntax_errors(self):
        for bad in ("1 +", "(1", "1 ? 2", "foo(1)", "min(1)", "min(1,2,3)", "@", "1 2"):
            with pytest.raises(ValueError):
                compile_expression(bad)

    def test_variables_in_order(self):
        e = compile_expression("b + a + b + _score")
        assert e.variables == ("b", "a", "_score")

    def test_dotted_bracketed_variable(self):
        e = compile_expression("doc['pop'].value + doc.vol[0]")
        assert e.variables == ("doc['pop'].value", "doc.vol[0]")
        with pytest.raises(ValueError, match="not in bindings"):
            e.sql()
        sql = e.sql({"doc['pop'].value": "pop", "doc.vol[0]": "vol"})
        assert "`pop`" in sql and "`vol`" in sql

    def test_expression_binding(self):
        # SimpleBindings may bind a name to another expression
        inner = compile_expression("2 * x")
        e = compile_expression("y + 1")
        sql = e.sql({"y": inner, "x": "popularity"})
        assert "`popularity`" in sql

    def test_binding_cycle_raises(self):
        a = compile_expression("b + 1")
        with pytest.raises(ValueError, match="cycle|depth"):
            a.sql({"b": a})

    def test_compile_reusable_across_bindings(self, spark):
        e = compile_expression("v * 2")
        r1 = spark.sql(f"SELECT {e.sql({'v': '21'})} AS x").collect()[0]["x"]
        r2 = spark.sql(f"SELECT {e.sql({'v': '1'})} AS x").collect()[0]["x"]
        assert (r1, r2) == (42.0, 2.0)


class TestSearchIntegration:
    def test_expression_sort(self, search_index, oracle):
        s = Searcher(search_index)
        q = A.TermQuery("return")
        e = compile_expression("ln(1 + doc_id) * (doc_id % 5 + 1)")
        got = expression_sort(s, q, search_index.docs, e, k=10).collect()
        match = sorted(oracle.score(q))
        want = sorted(
            ((math.log(1 + d) * (d % 5 + 1), d) for d in match),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        assert [(r["rank"], r["doc_id"]) for r in got] == [
            (i + 1, d) for i, (_v, d) in enumerate(want)
        ]
        for r, (v, _d) in zip(got, want):
            assert math.isclose(r["sort_value"], v, rel_tol=1e-12)

    def test_expression_sort_ascending(self, search_index, oracle):
        s = Searcher(search_index)
        q = A.TermQuery("return")
        got = expression_sort(s, q, search_index.docs, "doc_id % 3", k=5, ascending=True).collect()
        match = sorted(oracle.score(q))
        want = sorted(((d % 3, d) for d in match), key=lambda t: (t[0], t[1]))[:5]
        assert [r["doc_id"] for r in got] == [d for _v, d in want]

    def test_expression_rescore(self, search_index, oracle):
        # ExpressionRescorer: first-pass relevance enters as _score
        s = Searcher(search_index)
        q = A.TermQuery("return")
        first = s.search(q, k=30)
        e = compile_expression("0.5 * _score + ln(1 + doc_id % 11)")
        td = expression_rescore(s, first, e, search_index.docs, top_n=10)
        want = sorted(
            ((0.5 * sc + math.log(1 + d % 11), d) for d, sc in first.hits),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        assert [d for d, _ in td.hits] == [d for _v, d in want]
        for (_, got_v), (v, _) in zip(td.hits, want):
            assert math.isclose(got_v, v, rel_tol=1e-6)
        assert td.total_hits == first.total_hits

    def test_rescore_null_binding_reads_zero(self, spark, search_index):
        """A doc with no value for a bound column reads 0.0 at the
        variable level (the DoubleValues binding contract,
        ExpressionValueSource.java) — no crash, no NULL propagation."""
        s = Searcher(search_index)
        first = s.search(A.TermQuery("return"), k=5)
        hit_ids = [d for d, _ in first.hits]
        # docs table with `size` NULL for one of the hit docs
        docs = search_index.docs.selectExpr(
            "doc_id",
            f"CASE WHEN doc_id = {hit_ids[0]} THEN CAST(NULL AS DOUBLE) "
            "ELSE CAST(length(path) AS DOUBLE) END AS size",
        )
        td = expression_rescore(s, first, "_score + ln(1 + size)", docs, top_n=5)
        assert len(td.hits) == len(first.hits)
        got = dict(td.hits)
        fp = dict(first.hits)
        # NULL size -> size reads 0.0 -> ln(1) = 0 -> value == _score
        assert math.isclose(got[hit_ids[0]], fp[hit_ids[0]], rel_tol=1e-6)

    def test_function_score_accepts_compiled_sql(self, search_index, oracle):
        from lucene_spark.search.functionscore import function_score

        s = Searcher(search_index)
        q = A.TermQuery("return")
        e = compile_expression("_score * (1 + doc_id % 7)")
        got = function_score(
            s, q, e.sql({"_score": "_score"}), search_index.docs, k=10
        ).collect()
        hits = oracle.top_k(q, k=10**9)
        want = sorted(
            ((float(sc) * (1 + d % 7), d) for d, sc in hits), key=lambda t: (-t[0], t[1])
        )[:10]
        assert [r["doc_id"] for r in got] == [d for _v, d in want]
