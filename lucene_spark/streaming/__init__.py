from lucene_spark.streaming.dedup import stream_exact_dedup
from lucene_spark.streaming.neardup import stream_minhash_neardup
from lucene_spark.streaming.nrt import StreamingIndexer

__all__ = ["StreamingIndexer", "stream_exact_dedup", "stream_minhash_neardup"]
