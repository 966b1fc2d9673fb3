"""Document chunking vs a pure-python sliding-window brute force."""

from __future__ import annotations

import math

import pytest

from lucene_spark.pipeline.chunking import chunk_documents


def brute_chunks(text: str, ct: int, ov: int):
    toks = [t for t in text.split() if t]
    if not toks:
        return []
    stride = ct - ov
    n = len(toks)
    n_chunks = 1 if n <= ct else 1 + math.ceil((n - ct) / stride)
    out = []
    for i in range(n_chunks):
        w = toks[i * stride : i * stride + ct]
        out.append((i, len(w), i * stride, " ".join(w)))
    return out


@pytest.mark.parametrize("ct,ov", [(8, 0), (8, 2), (5, 4), (512, 64)])
def test_vs_brute(spark, corpus_pdf, ct, ov):
    df = spark.createDataFrame(corpus_pdf[["content"]].reset_index().rename(columns={"index": "doc_id"}))
    got = {}
    for r in chunk_documents(df, "content", "doc_id", ct, ov).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["begin_tok"], r["chunk_text"])
        )
    for d in range(len(corpus_pdf)):
        want = brute_chunks(corpus_pdf.loc[d, "content"], ct, ov)
        assert sorted(got.get(d, [])) == want, (d, ct, ov)


def test_coverage_and_overlap(spark, corpus_pdf):
    # every token index covered; neighbors share exactly `overlap`
    # tokens when the next window is full
    df = spark.createDataFrame(corpus_pdf[["content"]].head(20).reset_index().rename(columns={"index": "doc_id"}))
    rows = chunk_documents(df, "content", "doc_id", 16, 4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        n = len([t for t in corpus_pdf.loc[d, "content"].split() if t])
        covered = set()
        for r in rs:
            covered.update(range(r["begin_tok"], r["begin_tok"] + r["n_chunk_tokens"]))
        assert covered == set(range(n))
        for a, b in zip(rs, rs[1:]):
            assert b["begin_tok"] == a["begin_tok"] + 12  # stride = 16 - 4


def test_bad_overlap_raises(spark):
    df = spark.range(1).withColumn("text", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("a b"))
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "id", 8, 8)


def test_empty_doc_emits_nothing(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, ""), (1, "   "), (2, "one two")], "doc_id long, text string")
    rows = chunk_documents(df, "text", "doc_id", 4, 1).collect()
    assert {r["doc_id"] for r in rows} == {2}
