from lucene_spark.streaming.nrt import StreamingIndexer

__all__ = ["StreamingIndexer"]
