import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from lucene_spark.session import get_spark

    s = get_spark("lucene_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    from lucene_spark.fixtures import make_corpus

    return make_corpus(n_docs=200, seed=42)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf)


@pytest.fixture(scope="session")
def index_dir(tmp_path_factory, spark, corpus_df):
    """Built index over the 200-doc fixture corpus, small chunks so the
    hot-term chunking path is exercised."""
    from lucene_spark.index.builder import IndexBuilder, IndexConfig

    d = str(tmp_path_factory.mktemp("index"))
    builder = IndexBuilder(spark, IndexConfig(docs_per_chunk=128, term_buckets=4))
    builder.build(corpus_df.drop("content_sha256"), d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def search_index(spark, index_dir):
    from lucene_spark.index.reader import SearchIndex

    return SearchIndex(spark, index_dir)


@pytest.fixture(scope="session")
def oracle(corpus_pdf):
    """Oracle over the same docs with the engine's doc_id assignment
    (rank over (repo, path, commit) — FIXTURES.md)."""
    from lucene_spark.testing.oracle import OracleIndex

    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    texts = {i: ordered.loc[i, "content"] for i in range(len(ordered))}
    return OracleIndex.from_texts(texts)
