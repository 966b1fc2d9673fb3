"""Span surface (SpanOr / SpanNot / SpanFirst / field masking) mapped
onto the interval algebra — equivalence vs from-definition brute force
plus engine-level checks.

Reference: lucene/queries/src/java/org/apache/lucene/queries/spans/
SpanOrQuery.java, SpanNotQuery.java:34-62, SpanFirstQuery.java:30-50,
FieldMaskingSpanQuery.java:60-90.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from lucene_spark.search.intervals import eval_source
from lucene_spark.search.spans import (
    span_containing,
    span_field_mask,
    span_first,
    span_multi_term,
    span_near,
    span_not,
    span_or,
    span_position_range,
    span_query,
    span_term,
    span_within,
)


def _minimalize(iv):
    iv = sorted(set(iv))
    out = []
    for s, e in iv:
        if any((s2 >= s and e2 <= e) and (s2, e2) != (s, e) for s2, e2 in iv):
            continue  # properly contains another
        out.append((s, e))
    return out


def _brute(src, pos_of):
    """From-definition span evaluation: enumerate, then minimalize."""
    from lucene_spark.search import intervals as I

    if isinstance(src, I.ITerm):
        return [(int(p), int(p)) for p in pos_of(src.term)]
    if isinstance(src, I.IMaxGaps):
        inner = src.source
        kids = [_brute(s, pos_of) for s in inner.sources]
        if any(not k for k in kids):
            return []
        import itertools

        n = len(kids)
        out = []
        for combo in itertools.product(*kids):
            if isinstance(inner, I.IOrdered):
                ok = all(combo[j][0] > combo[j - 1][1] for j in range(1, n))
            else:
                ok = True
            if not ok:
                continue
            s = min(c[0] for c in combo)
            e = max(c[1] for c in combo)
            covered = sum(c[1] - c[0] + 1 for c in combo)
            if (e - s + 1) - covered <= src.gaps:
                out.append((s, e))
        return _minimalize(out)
    if isinstance(src, I.IOr):
        out = []
        for s in src.sources:
            out.extend(_brute(s, pos_of))
        return _minimalize(out)
    if isinstance(src, I.INonOverlapping):
        inc = _brute(src.minuend, pos_of)
        exc = src.subtrahend
        if isinstance(exc, I.IExtend):
            ex = [(max(0, s - exc.before), e + exc.after) for s, e in _brute(exc.source, pos_of)]
        else:
            ex = _brute(exc, pos_of)
        return [iv for iv in inc if not any(s <= iv[1] and iv[0] <= e for s, e in ex)]
    if isinstance(src, I.IEndingWithin):
        return [iv for iv in _brute(src.source, pos_of) if iv[1] + 1 <= src.limit]
    if isinstance(src, I.IPositionRange):
        return [
            iv
            for iv in _brute(src.source, pos_of)
            if iv[0] >= src.start and iv[1] + 1 <= src.limit
        ]
    if isinstance(src, I.IContaining):
        big = _brute(src.big, pos_of)
        small = _brute(src.small, pos_of)
        return [b for b in big if any(b[0] <= s and e <= b[1] for s, e in small)]
    if isinstance(src, I.IContainedBy):
        small = _brute(src.small, pos_of)
        big = _brute(src.big, pos_of)
        return [si for si in small if any(s <= si[0] and si[1] <= e for s, e in big)]
    raise TypeError(type(src))


class TestSpanBruteEquivalence:
    def test_fuzz(self):
        rng = random.Random(9)
        for trial in range(400):
            # 3 terms with disjoint position lists in [0, 25)
            universe = list(range(25))
            rng.shuffle(universe)
            lists, i = {}, 0
            for t in "abc":
                ln = rng.randint(1, 6)
                lists[t] = np.array(sorted(universe[i : i + ln]), dtype=np.int64)
                i += ln
            pos_of = lambda t: lists[t]
            slop = rng.randint(0, 5)
            shapes = [
                span_or("a", "b"),
                span_or("a", span_near(["b", "c"], slop, True)),
                span_not(span_near(["a", "b"], slop, rng.random() < 0.5), "c"),
                span_not(span_near(["a", "b"], slop, True), "c", pre=1, post=2),
                span_first("a", rng.randint(1, 12)),
                span_first(span_near(["a", "b"], slop, True), rng.randint(2, 20)),
                span_position_range("a", rng.randint(0, 8), rng.randint(8, 24)),
                span_position_range(
                    span_near(["a", "b"], slop, True), rng.randint(1, 8), rng.randint(8, 24)
                ),
                span_containing(span_near(["a", "c"], slop + 3, False), "b"),
                span_within("b", span_near(["a", "c"], slop + 3, False)),
            ]
            for src in shapes:
                got = [(s, e) for s, e, _c in eval_source(src, pos_of)]
                want = _brute(src, pos_of)
                assert got == want, (trial, src, {k: v.tolist() for k, v in lists.items()}, got, want)


class TestSpanEngine:
    def test_spanor_equals_term_union(self, spark, search_index):
        from lucene_spark.search import ast as A
        from lucene_spark.search.engine import Searcher

        s = search_index
        q = span_query(span_or("return", "if"))
        td = s.search(q, k=10**6)
        want = s.search(
            A.BooleanQuery(
                ((A.Occur.SHOULD, A.TermQuery("return")), (A.Occur.SHOULD, A.TermQuery("if")))
            ),
            k=10**6,
        )
        assert sorted(d for d, _ in td.hits) == sorted(d for d, _ in want.hits)

    def test_spannot_removes_overlaps(self, spark, search_index):
        s = search_index
        base = s.search(span_query(span_near(["return", "if"], 3, True)), k=10**6)
        not_q = s.search(
            span_query(span_not(span_near(["return", "if"], 3, True), "else")), k=10**6
        )
        base_ids = {d for d, _ in base.hits}
        not_ids = {d for d, _ in not_q.hits}
        assert not_ids <= base_ids

    def test_spanfirst_subset_by_limit(self, spark, search_index):
        s = search_index
        small = {d for d, _ in s.search(span_query(span_first("return", 3)), k=10**6).hits}
        big = {d for d, _ in s.search(span_query(span_first("return", 30)), k=10**6).hits}
        allm = {d for d, _ in s.search(span_query(span_term("return")), k=10**6).hits}
        assert small <= big <= allm and len(small) < len(allm)

    def test_position_range_brackets_spanfirst(self, spark, search_index):
        """span_position_range(0, n) == span_first(n); a start bound
        strictly shrinks the match set; engine fast path agrees with
        the per-position brute count."""
        s = search_index
        first = s.search(span_query(span_first("return", 8)), k=10**6)
        pr0 = s.search(span_query(span_position_range("return", 0, 8)), k=10**6)
        assert pr0.hits == first.hits
        bounded = s.search(span_query(span_position_range("return", 3, 8)), k=10**6)
        assert {d for d, _ in bounded.hits} <= {d for d, _ in first.hits}
        assert len(bounded.hits) < len(first.hits)

    def test_containing_within_engine(self, spark, search_index):
        """Containing keeps big spans (scored by big's intervals);
        within keeps little spans; both match sets are subsets of the
        unfiltered sides, and each matched doc has a nested pair."""
        s = search_index
        big_src = span_near(["return", "else"], 8, False)
        big_all = {d for d, _ in s.search(span_query(big_src), k=10**6).hits}
        cont = {
            d for d, _ in s.search(span_query(span_containing(big_src, "if")), k=10**6).hits
        }
        within = {
            d for d, _ in s.search(span_query(span_within("if", big_src)), k=10**6).hits
        }
        lit_all = {d for d, _ in s.search(span_query(span_term("if")), k=10**6).hits}
        assert cont <= big_all and within <= lit_all
        assert cont == within  # same doc-level condition, different spans
        assert cont  # non-trivial on the fixture corpus

    def test_span_multi_term_expansion(self, spark, search_index):
        """span_multi_term == span_or over the dictionary expansion;
        empty expansion raises."""
        idx = search_index.index
        src = span_multi_term(idx, "ret*")
        terms = set(idx.expand_terms("regexp", "ret.*"))
        got = {d for d, _ in search_index.search(span_query(src), k=10**6).hits}
        want = {
            d
            for d, _ in search_index.search(
                span_query(span_or(*sorted(terms))), k=10**6
            ).hits
        }
        assert got == want and got
        with pytest.raises(ValueError):
            span_multi_term(idx, "zzzznope*")

    def test_field_scoped_span_and_mask_identity(self, spark, multifield_index):
        """field-scoped span terms match their own field's postings;
        span_field_mask is the documented matching no-op (composition
        across fields is engine-native via composite keys)."""
        from lucene_spark.search import ast as A

        s = multifield_index
        title_span = span_term("vector", field="title")
        td = s.search(span_query(title_span), k=10)
        want = s.search(A.TermQuery("vector", field="title"), k=10)
        assert [d for d, _ in td.hits] == [d for d, _ in want.hits]
        # masking never rewrites what the span matches
        masked = span_query(span_field_mask(title_span, "content"))
        assert s.search(masked, k=10).hits == td.hits
        # cross-field composition: title term near a content term —
        # runs through one interval tree (the masking use case)
        cross = span_query(span_near([title_span, span_term("vector")], 30, False))
        got = s.search(cross, k=10**6)
        # every hit must contain the term in BOTH fields
        both = s.search(
            A.BooleanQuery(
                (
                    (A.Occur.MUST, A.TermQuery("vector", field="title")),
                    (A.Occur.MUST, A.TermQuery("vector")),
                )
            ),
            k=10**6,
        )
        assert {d for d, _ in got.hits} <= {d for d, _ in both.hits}


@pytest.fixture(scope="module")
def search_index(spark, corpus_pdf, tmp_path_factory):
    import shutil

    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.search.engine import Searcher

    pdf = corpus_pdf.copy().reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    d = str(tmp_path_factory.mktemp("spix"))
    IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4, positions=True)).build(
        spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False
    )
    yield Searcher(SearchIndex(spark, d))
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def multifield_index(spark, corpus_pdf, tmp_path_factory):
    import shutil

    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex
    from lucene_spark.search.engine import Searcher

    pdf = corpus_pdf.copy().reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    pdf["title"] = pdf["content"].str.split().str[:6].str.join(" ")
    d = str(tmp_path_factory.mktemp("spmix"))
    IndexBuilder(
        spark,
        IndexConfig(
            docs_per_chunk=128, term_buckets=4, positions=True, extra_fields=("title",)
        ),
    ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
    yield Searcher(SearchIndex(spark, d))
    shutil.rmtree(d, ignore_errors=True)
