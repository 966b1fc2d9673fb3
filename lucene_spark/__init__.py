"""lucene_spark — a PySpark-native inverted-index + BM25 full-text engine.

A from-scratch rebuild of the *capabilities* of Apache Lucene 9.x
(reference checkout at /root/reference) on top of the Spark DataFrame
API. NOT a port: posting lists are DataFrame rows, segments are
partition-grouped table writes, segment merging is a sort-merge
aggregation, and the term dictionary is a term-sorted/bucketed Parquet
(or Iceberg) table whose FST role is played by Parquet dictionary +
min/max pruning.

Layout
------
- ``analysis``   tokenization (UAX#29-subset StandardAnalyzer equivalent)
- ``codec``      numpy kernels: SmallFloat norms, FOR/varint block packing,
                 competitive impacts (block-max metadata)
- ``index``      build pipeline: doc-id assignment, inversion, segments,
                 checkpointed/resumable builds, sort-merge segment merge
- ``search``     query AST + parser + rewrites, float32 BM25, block-max
                 WAND, Lucene-faithful top-k collection
- ``streaming``  Structured-Streaming incremental (NRT) indexing
- ``pipeline``   training-data-pipeline ops: dedup (exact/minhash/simhash/
                 jaccard), ANN similarity search, text quality/lang-id,
                 multimodal binary-column plumbing
- ``testing``    brute-force float32 BM25 oracle + helpers
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing any submodule (e.g. the tokenizer inside a Python
    # worker unpickling a UDF) must NOT drag in pyspark via this
    # package __init__ — 32 workers cold-importing pyspark concurrently
    # is a multi-second CPU storm per stage.
    if name == "get_spark":
        from lucene_spark.session import get_spark

        return get_spark
    raise AttributeError(name)
