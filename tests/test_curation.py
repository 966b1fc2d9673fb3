"""Curation pipeline: decontamination + deterministic sampling vs
python brute force."""

from __future__ import annotations

import hashlib
import re

import pytest

from lucene_spark.pipeline.curation import (
    contaminated_ids,
    decontaminate,
    rebalance_sources,
    sample_deterministic,
    sample_stratified,
)


def _grams(text: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _bucket(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1_000_000


@pytest.fixture(scope="module")
def frames(spark, corpus_pdf):
    docs = corpus_pdf.reset_index().rename(columns={"index": "doc_id"})[
        ["doc_id", "content"]
    ].rename(columns={"content": "text"})
    corpus = spark.createDataFrame(docs)
    # benchmark = snippets lifted from some docs (guaranteed overlap)
    # plus a novel row (guaranteed no overlap)
    bench_rows = [
        (" ".join(docs.loc[3, "text"].split()[5:15]),),
        (" ".join(docs.loc[77, "text"].split()[0:12]),),
        ("totally novel benchmark question nothing shares these words at all",),
    ]
    bench = spark.createDataFrame(bench_rows, "text string")
    return corpus, bench, docs, [r[0] for r in bench_rows]


def test_contaminated_ids_matches_brute(frames):
    corpus, bench, docs, bench_texts = frames
    n = 8
    bench_grams = set().union(*(_grams(t, n) for t in bench_texts))
    want = sorted(
        int(r.doc_id) for _, r in docs.iterrows() if _grams(r.text, n) & bench_grams
    )
    got = sorted(r["doc_id"] for r in contaminated_ids(corpus, bench, n=n).collect())
    assert got == want
    assert 3 in got and 77 in got


def test_decontaminate_removes_exactly(frames):
    corpus, bench, docs, _ = frames
    bad = {r["doc_id"] for r in contaminated_ids(corpus, bench, n=8).collect()}
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()}
    assert kept == set(docs.doc_id) - bad


def test_short_benchmark_rows_no_false_hits(spark, frames):
    corpus, _, _, _ = frames
    tiny = spark.createDataFrame([("only three words",)], "text string")
    assert contaminated_ids(corpus, tiny, n=8).count() == 0


def test_sample_deterministic_matches_brute(frames):
    corpus, _, docs, _ = frames
    for frac in (0.25, 0.5):
        want = sorted(d for d in docs.doc_id if _bucket(d) < int(frac * 1_000_000))
        got = sorted(
            r["doc_id"] for r in sample_deterministic(corpus, frac).select("doc_id").collect()
        )
        assert got == want
    # determinism: repeated runs identical
    a = sample_deterministic(corpus, 0.3).count()
    assert a == sample_deterministic(corpus, 0.3).count()


def test_sample_stratified(spark, corpus_pdf):
    docs = corpus_pdf.reset_index().rename(columns={"index": "doc_id"})
    docs["grp"] = ["even" if d % 2 == 0 else "odd" for d in docs.doc_id]
    df = spark.createDataFrame(docs[["doc_id", "grp"]])
    rates = {"even": 1.0, "odd": 0.2}
    got = {r["doc_id"] for r in sample_stratified(df, rates, "grp").collect()}
    want = {
        int(d)
        for d, g in zip(docs.doc_id, docs.grp)
        if _bucket(d) < int(rates[g] * 1_000_000)
    }
    assert got == want
    # default_rate=0 drops unknown groups entirely
    got2 = sample_stratified(df, {"even": 1.0}, "grp").count()
    assert got2 == sum(1 for d in docs.doc_id if d % 2 == 0)


def test_sample_stratified_null_group(spark):
    """A None key in rates addresses the NULL group (equality against
    NULL is NULL-valued, so the CASE needs isNull) — NULL-group rows
    must follow their rate, not fall through to default_rate."""
    rows = [(d, "a" if d % 2 == 0 else None) for d in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = sample_stratified(df, {"a": 0.0, None: 1.0}, "grp").collect()
    assert {r["doc_id"] for r in got} == {d for d in range(200) if d % 2 == 1}
    # and rebalance_sources over a corpus with NULL groups keeps them
    kept = rebalance_sources(df, "grp", 1.0).count()
    assert kept == 200


def test_rebalance_sources(spark, corpus_pdf):
    from lucene_spark.pipeline.curation import rebalance_sources

    docs = corpus_pdf.reset_index().rename(columns={"index": "doc_id"})
    # skewed mix: group 'big' holds 75% of rows
    docs["grp"] = ["big" if d % 4 != 0 else f"s{d % 3}" for d in docs.doc_id]
    df = spark.createDataFrame(docs[["doc_id", "grp"]])
    out = rebalance_sources(df, "grp", max_frac=0.30)
    got = {r["doc_id"] for r in out.collect()}
    # brute: rates from counts, same md5 buckets
    total = len(docs)
    counts = docs.grp.value_counts().to_dict()
    cap = 0.30 * total
    want = {
        int(d)
        for d, g in zip(docs.doc_id, docs.grp)
        if _bucket(d) < int((1.0 if counts[g] <= cap else cap / counts[g]) * 1_000_000)
    }
    assert got == want
    # small groups pass through whole; the big group is capped
    kept = out.toPandas().grp.value_counts().to_dict()
    for g, n in counts.items():
        if n <= cap:
            assert kept.get(g, 0) == n, g
    assert kept["big"] < counts["big"]
    # deterministic under re-run
    assert {r["doc_id"] for r in rebalance_sources(df, "grp", 0.30).collect()} == got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rebalance_sources(df, "grp", 0.0)
