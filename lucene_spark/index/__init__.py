from lucene_spark.index.builder import IndexBuilder, IndexConfig, assign_doc_ids  # noqa: F401
from lucene_spark.index.check import CheckIndexError, check_index  # noqa: F401
from lucene_spark.index.reader import SearchIndex  # noqa: F401
