"""FieldExistsQuery (docs with any value for a field) — null-aware
docs-table predicate, parser `field:*` syntax, driver+distributed."""

from __future__ import annotations

import shutil

import pytest

from lucene_spark.fixtures import make_corpus
from lucene_spark.index.builder import IndexBuilder, IndexConfig
from lucene_spark.index.reader import SearchIndex
from lucene_spark.search import ast as A
from lucene_spark.search.engine import Searcher
from lucene_spark.search.parser import parse_query


@pytest.fixture(scope="module")
def nullable_index(tmp_path_factory, spark):
    """60-doc index whose 'tag' column is null for doc_id % 3 != 0."""
    from pyspark.sql import functions as F

    pdf = make_corpus(n_docs=60, seed=13)
    df = spark.createDataFrame(pdf).drop("content_sha256")
    d = str(tmp_path_factory.mktemp("ix_nullable"))
    from lucene_spark.index.builder import assign_doc_ids

    base = assign_doc_ids(df).withColumn(
        "tag", F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("t"), F.col("doc_id"))).otherwise(F.lit(None))
    )
    IndexBuilder(spark, IndexConfig(docs_per_chunk=32, term_buckets=2)).build(base, d, assign_ids=False)
    yield SearchIndex(spark, d)
    shutil.rmtree(d, ignore_errors=True)


class TestFieldExists:
    def test_parser_star_value(self):
        assert parse_query("tag:*") == A.FieldExistsQuery("tag")
        assert parse_query('lang:python') == A.FieldValueQuery("lang", "python")

    def test_match_set_and_constant_score(self, nullable_index):
        s = Searcher(nullable_index)
        td = s.search(A.FieldExistsQuery("tag"), k=100)
        assert {d for d, _ in td.hits} == set(range(0, 60, 3))
        assert all(x == 1.0 for _, x in td.hits)

    def test_as_boolean_filter(self, nullable_index):
        s = Searcher(nullable_index)
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.FieldExistsQuery("tag")),
            )
        )
        hits = {d for d, _ in s.search(q, k=100).hits}
        base = {d for d, _ in s.search(A.TermQuery("return"), k=100).hits}
        assert hits == {d for d in base if d % 3 == 0}

    def test_distributed_equals_driver(self, nullable_index):
        s = Searcher(nullable_index)
        q = A.BooleanQuery(
            (
                (A.Occur.MUST, A.TermQuery("return")),
                (A.Occur.FILTER, A.FieldExistsQuery("tag")),
            )
        )
        drv = s.search(q, k=20).hits
        dist = s.search(q, k=20, mode="distributed").hits
        assert [(d, round(x, 5)) for d, x in drv] == [(d, round(x, 5)) for d, x in dist]
