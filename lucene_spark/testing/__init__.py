from lucene_spark.testing.oracle import OracleIndex  # noqa: F401
