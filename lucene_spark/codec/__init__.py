from lucene_spark.codec.smallfloat import (  # noqa: F401
    int4_to_long,
    int_to_byte4,
    byte4_to_int,
    long_to_int4,
    NORM_LENGTH_TABLE,
    int_to_byte4_np,
)
from lucene_spark.codec.forutil import (  # noqa: F401
    pack_postings,
    unpack_postings,
    BLOCK_SIZE,
)
from lucene_spark.codec.impacts import competitive_impacts  # noqa: F401
